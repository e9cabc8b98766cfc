"""End-to-end pipeline profile on a chr-scale simulated tumor/normal run.

Generates (and caches under ~/.cache/lancet2_tpu/fixtures) a seeded
multi-window fixture — a ref_kb-kilobase contig with somatic SNVs/indels
planted every ~1.7 kb at realistic coverage — then runs the requested
executor end-to-end (BAM decode -> gating -> assembly -> device evidence DP
-> features -> bgzip VCF) and prints windows/s + the stage profile.

Usage: python scripts/profile_e2e.py [--ref-kb 200] [--executor batch]
           [--device tpu] [--threads 8] [--warmup]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run_e2e(fx: dict, executor: str, device: str, threads: int,
            region: str | None = None, graph_backend: str = "auto",
            append_history: bool = False) -> dict:
    """One in-process pipeline run over the fixture; returns executor stats."""
    from lancet2_tpu.cli.main import build_parser, run_pipeline

    cache_dir = os.path.expanduser("~/.cache/lancet2_tpu/fixtures")
    out_vcf = os.path.join(cache_dir, "profile_out.vcf.gz")
    argv = [
        "pipeline",
        "-n", fx["normal"], "-t", fx["tumor"], "-r", fx["fasta"],
        "-o", out_vcf,
        "--executor", executor, "--device", device,
        "--graph-backend", graph_backend,
        "-T", str(threads),
    ]
    if region:
        argv += ["-R", region]
    if append_history:
        argv += ["--append-history"]
    parsed = build_parser().parse_args(argv)
    return run_pipeline(parsed, "profile_e2e " + " ".join(argv))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref-kb", type=int, default=200)
    ap.add_argument("--executor", default="batch", choices=["threads", "batch"])
    ap.add_argument("--device", default="tpu", choices=["cpu", "tpu"])
    ap.add_argument("--threads", type=int, default=8)
    ap.add_argument("--graph-backend", default="auto",
                    choices=["auto", "native", "numpy", "device"])
    ap.add_argument("--warmup", action="store_true",
                    help="run a small region first so device-kernel compiles "
                         "(~1-4 min/shape through the TPU tunnel, not "
                         "persistently cacheable) are excluded from the "
                         "timed run")
    ap.add_argument("--append-history", action="store_true")
    args = ap.parse_args()

    from lancet2_tpu.utils.simulate import make_chr_scale_fixture

    cache_dir = os.path.expanduser("~/.cache/lancet2_tpu/fixtures")
    os.makedirs(cache_dir, exist_ok=True)
    t0 = time.time()
    fx = make_chr_scale_fixture(args.ref_kb, cache_dir)
    print(f"fixture ready in {time.time()-t0:.1f}s: {fx['ref_len']} bp, "
          f"{len(fx['truth'])} somatic truth variants", file=sys.stderr)

    if args.warmup:
        t0 = time.time()
        if args.device == "tpu":
            from bench import _warm_executor_kernels

            _warm_executor_kernels()
        run_e2e(fx, args.executor, args.device, args.threads,
                region=f"{fx['chrom']}:1-12000",
                graph_backend=args.graph_backend)
        print(f"warmup done in {time.time()-t0:.1f}s", file=sys.stderr)

    t1 = time.time()
    stats = run_e2e(fx, args.executor, args.device, args.threads,
                    graph_backend=args.graph_backend,
                    append_history=args.append_history)
    wall = time.time() - t1
    n_win = stats.get("windows", 0)
    print(json.dumps({
        "windows": n_win,
        "wall_s": round(wall, 2),
        "windows_per_s": round(n_win / wall, 2) if wall else 0,
        "pipeline_windows_per_s": round(stats.get("windows_per_s", 0), 2),
        "stage_profile": stats.get("stage_profile"),
        "status_counts": stats.get("status_counts"),
    }, indent=2))


if __name__ == "__main__":
    main()

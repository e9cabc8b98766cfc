"""End-to-end pipeline profile on a chr-scale simulated tumor/normal run.

Generates (and caches under ~/.cache/lancet2_tpu/fixtures) a seeded
multi-window fixture — a ref_kb-kilobase contig with somatic SNVs/indels
planted every ~1.7 kb at realistic coverage — then runs the requested
executor end-to-end (BAM decode -> gating -> assembly -> device evidence DP
-> features -> bgzip VCF) and prints windows/s + the stage profile.

Usage: python scripts/profile_e2e.py [--ref-kb 200] [--executor batch]
           [--device tpu] [--threads 8] [--pair-chunk 512]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_chr_fixture(ref_kb: int, cache_dir: str, seed: int = 11,
                     normal_cov: float = 40.0, tumor_cov: float = 60.0) -> dict:
    """Chr-scale fixture: somatic SNV/INS/DEL planted round-robin every
    ~1.7 kb so most 1 kb windows are active; cached by content key."""
    key = f"e2e_r{ref_kb}kb_s{seed}_n{normal_cov}_t{tumor_cov}_v3"
    fixdir = os.path.join(cache_dir, hashlib.sha1(key.encode()).hexdigest()[:16])
    meta_path = os.path.join(fixdir, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            return json.load(f)

    from lancet2_tpu.utils.simulate import Variant, make_tumor_normal_fixture

    os.makedirs(fixdir, exist_ok=True)
    ref_len = ref_kb * 1000
    import numpy as np
    rng = np.random.default_rng(seed)
    somatic = []
    kinds = ["SNV", "INS", "DEL"]
    pos = 900
    i = 0
    while pos < ref_len - 1200:
        kind = kinds[i % 3]
        if kind == "SNV":
            somatic.append(Variant(pos, "A", "G", vaf=0.35))
        elif kind == "INS":
            ins = "".join("ACGT"[j] for j in rng.integers(0, 4, size=4))
            somatic.append(Variant(pos, "A", "A" + ins, vaf=0.35))
        else:
            somatic.append(Variant(pos, "ACGTA"[: 1 + int(rng.integers(2, 5))], "A", vaf=0.35))
        pos += 1700 + int(rng.integers(0, 400))
        i += 1
    # NOTE: Variant ref bases must match the reference; fix them up below
    fx = make_tumor_normal_fixture(
        fixdir, ref_len=ref_len, somatic=[], germline=[],
        normal_cov=normal_cov, tumor_cov=tumor_cov, seed=seed,
    )
    # regenerate with corrected ref alleles against the actual sequence
    ref_seq = fx["ref_seq"]
    fixed = []
    for v in somatic:
        if v.kind == "SNV":
            ref_b = ref_seq[v.pos0]
            alt_b = "G" if ref_b != "G" else "T"
            fixed.append(Variant(v.pos0, ref_b, alt_b, vaf=v.vaf))
        elif v.kind == "INS":
            anchor = ref_seq[v.pos0]
            fixed.append(Variant(v.pos0, anchor, anchor + v.alt[1:], vaf=v.vaf))
        else:
            span = len(v.ref)
            fixed.append(Variant(v.pos0, ref_seq[v.pos0 : v.pos0 + span], ref_seq[v.pos0], vaf=v.vaf))
    fx = make_tumor_normal_fixture(
        fixdir, ref_len=ref_len, somatic=fixed, germline=[],
        normal_cov=normal_cov, tumor_cov=tumor_cov, seed=seed,
    )
    meta = {
        "fasta": fx["fasta"], "normal": fx["normal"], "tumor": fx["tumor"],
        "chrom": fx["chrom"], "ref_len": ref_len,
        "truth": [(v.pos0, v.ref, v.alt) for v in fixed],
    }
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    return meta


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref-kb", type=int, default=200)
    ap.add_argument("--executor", default="batch", choices=["threads", "batch"])
    ap.add_argument("--device", default="tpu", choices=["cpu", "tpu"])
    ap.add_argument("--threads", type=int, default=8)
    ap.add_argument("--pair-chunk", type=int, default=None)
    ap.add_argument("--window-batch", type=int, default=None)
    args = ap.parse_args()

    cache_dir = os.path.expanduser("~/.cache/lancet2_tpu/fixtures")
    os.makedirs(cache_dir, exist_ok=True)
    t0 = time.time()
    fx = make_chr_fixture(args.ref_kb, cache_dir)
    print(f"fixture ready in {time.time()-t0:.1f}s: {fx['ref_len']} bp, "
          f"{len(fx['truth'])} somatic truth variants", file=sys.stderr)

    out_vcf = os.path.join(cache_dir, "profile_out.vcf.gz")
    argv = [
        "pipeline",
        "-n", fx["normal"], "-t", fx["tumor"], "-r", fx["fasta"],
        "-o", out_vcf,
        "--executor", args.executor, "--device", args.device,
        "-T", str(args.threads),
    ]
    from lancet2_tpu.cli.main import build_parser, run_pipeline

    parsed = build_parser().parse_args(argv)
    t1 = time.time()
    stats = run_pipeline(parsed, "profile_e2e " + " ".join(argv))
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

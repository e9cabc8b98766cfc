"""Isolate phase A (gate/collect/assemble/extract/annotate) under cProfile.

The batch executor's phase A runs in worker threads, which cProfile cannot
see; this driver runs the SAME prepare_window calls serially in the main
thread over the chr-scale fixture, so `analyze_profile.py --pstats` gets a
clean function-level attribution of the host-bound 90%+ of pipeline time.

Usage: python scripts/profile_phase_a.py [--ref-kb 100] [--out run.pstats]
"""

from __future__ import annotations

import argparse
import cProfile
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref-kb", type=int, default=100)
    ap.add_argument("--out", default="phase_a.pstats")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    from lancet2_tpu.utils.simulate import make_chr_scale_fixture

    cache_dir = os.path.expanduser("~/.cache/lancet2_tpu/fixtures")
    os.makedirs(cache_dir, exist_ok=True)
    fx = make_chr_scale_fixture(args.ref_kb, cache_dir)
    print(f"fixture: {fx['ref_len']} bp", file=sys.stderr)

    from lancet2_tpu.cbdg.graph import GraphParams
    from lancet2_tpu.core.read_collector import CollectorParams
    from lancet2_tpu.core.sample_info import make_sample_list
    from lancet2_tpu.core.variant_builder import BuilderParams, VariantBuilder
    from lancet2_tpu.core.window_builder import WindowBuilder, WindowParams
    from lancet2_tpu.hts.fasta import Reference

    ref = Reference(fx["fasta"])
    samples = make_sample_list([fx["normal"]], [fx["tumor"]], [])
    wb = WindowBuilder(ref, WindowParams())
    wb.add_whole_reference()
    wb.sort_input_regions()
    windows = wb.build_windows()
    print(f"{len(windows)} windows", file=sys.stderr)

    gp = GraphParams(num_samples=len(samples), build_backend="auto")
    params = BuilderParams(
        graph=gp,
        collector=CollectorParams(ref_path=fx["fasta"]),
        aligner_backend="evidence",
    )
    pool: dict = {}
    builder = VariantBuilder(params, ref, samples, reader_pool=pool)

    t0 = time.time()
    prof = cProfile.Profile()
    prof.enable()
    n_prepared = 0
    for w in windows:
        p = builder.prepare_window(w)
        if p is not None:
            n_prepared += 1
    prof.disable()
    dt = time.time() - t0
    print(f"phase A: {len(windows)} windows in {dt:.1f}s "
          f"({len(windows)/dt:.2f} win/s serial), {n_prepared} prepared",
          file=sys.stderr)
    prof.dump_stats(args.out)
    st = pstats.Stats(prof)
    st.sort_stats("cumulative").print_stats(args.top)


if __name__ == "__main__":
    main()

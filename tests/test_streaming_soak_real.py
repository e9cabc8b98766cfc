"""Real-content streaming soak (round-4 verdict #10).

The original soak (tests/test_streaming_soak.py) drives 150k all-N windows
— scheduler-only. This one pushes a multi-Mb simulated tumor/normal contig
with planted variants at realistic density through the FULL pipeline in
subprocesses, asserting:

  * streaming mode (BAI-backed BAM access + streamed window manifest)
    produces byte-identical records to in-memory mode
  * streaming peak RSS stays under a fixed budget, and the per-run RSS is
    measured per SUBPROCESS (getrusage high-water marks of an in-process
    run would be contaminated by earlier tests)

Scale knob: LANCET2_SOAK_KB (default 2000 = 2 Mb, CI-friendly; the
committed 10 Mb evidence run is recorded in profiling/history.jsonl).
Reference anchor: streamed 65,536-window batches for ~3M-window WGS
(src/lancet/core/pipeline_executor.cpp:137-150).
"""

from __future__ import annotations

import gzip
import os
import resource
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_pipeline(fx, out_vcf, extra, env_extra=None):
    """Run the CLI in a subprocess; returns (records, peak_rss_mb)."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    env.update(env_extra or {})
    before = resource.getrusage(resource.RUSAGE_CHILDREN).ru_maxrss
    cmd = [
        sys.executable, "-m", "lancet2_tpu.cli.main", "pipeline",
        "-n", fx["normal"], "-t", fx["tumor"], "-r", fx["fasta"],
        "-o", out_vcf, "-T", "2",
    ] + list(extra)
    res = subprocess.run(cmd, env=env, capture_output=True, text=True,
                         timeout=3600)
    assert res.returncode == 0, res.stderr[-4000:]
    after = resource.getrusage(resource.RUSAGE_CHILDREN).ru_maxrss
    # ru_maxrss is a high-water mark over ALL children: meaningful for the
    # FIRST (streaming) run; later runs report max(previous, own)
    peak_mb = max(after, before) / 1024.0
    with gzip.open(out_vcf, "rt") as fh:
        records = [l for l in fh.read().splitlines()
                   if l and not l.startswith("#")]
    return records, peak_mb


def test_streaming_soak_real_content(tmp_path):
    from lancet2_tpu.utils.simulate import make_chr_scale_fixture

    kb = int(os.environ.get("LANCET2_SOAK_KB", "2000"))
    fx = make_chr_scale_fixture(kb, str(tmp_path), seed=23,
                                normal_cov=12.0, tumor_cov=16.0)

    # streaming FIRST so its subprocess sets the children RSS high-water
    stream_recs, stream_rss = _run_pipeline(
        fx, str(tmp_path / "stream.vcf.gz"),
        ["--stream-bam", "--stream-windows", "on"],
    )
    mem_recs, _ = _run_pipeline(
        fx, str(tmp_path / "mem.vcf.gz"),
        ["--no-stream-bam", "--stream-windows", "off"],
    )

    assert stream_recs, "soak fixture must call variants"
    # planted density: roughly one somatic record per ~1.9 kb
    assert len(stream_recs) >= kb // 4, len(stream_recs)
    assert stream_recs == mem_recs, (
        f"streaming records diverge from in-memory "
        f"({len(stream_recs)} vs {len(mem_recs)})"
    )
    # bounded memory: JAX CPU arena (~0.9 GB) + streamed working set.
    # Budget scales sub-linearly with input size by design.
    budget_mb = 2600 + 60 * (kb / 1000)
    assert stream_rss < budget_mb, (
        f"streaming peak RSS {stream_rss:.0f} MB exceeds budget "
        f"{budget_mb:.0f} MB at {kb} kb"
    )

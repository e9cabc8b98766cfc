"""Executor / thread-count / backend record-identity regression tests.

The reference's determinism contract (SURVEY.md §4) is the integration
oracle: identical inputs must produce byte-identical VCF records no matter
how the work is scheduled. These tests pin the claim made at
core/batch_pipeline.py:16-18 ("record-identical to the threads executor")
and stand in for the reference's TSan runs (reference: pixi.toml sanitizer
matrix) by stressing the scheduler with -T 1/2/8 on both executors.
"""

from __future__ import annotations

import gzip

import pytest

from lancet2_tpu.cli.main import main as cli_main
from lancet2_tpu.utils.simulate import Variant, make_tumor_normal_fixture


@pytest.fixture(scope="module")
def fixture(tmp_path_factory):
    """Multi-window tumor/normal fixture with SNV + INS + DEL so every
    variant class and several windows exercise the store/flush path."""
    tmp = tmp_path_factory.mktemp("exec_ident")
    fx = make_tumor_normal_fixture(
        str(tmp), ref_len=12000, normal_cov=32, tumor_cov=45, seed=77
    )
    ref = fx["ref_seq"]
    somatic = [
        Variant(pos0=2200, ref=ref[2200], alt="G" if ref[2200] != "G" else "T", vaf=0.4),
        Variant(pos0=5600, ref=ref[5600], alt=ref[5600] + "ACGT", vaf=0.38),
        Variant(pos0=9100, ref=ref[9100:9105], alt=ref[9100], vaf=0.42),
    ]
    germline = [
        Variant(pos0=7300, ref=ref[7300], alt="A" if ref[7300] != "A" else "C", vaf=0.5),
    ]
    fx = make_tumor_normal_fixture(
        str(tmp), ref_len=12000, somatic=somatic, germline=germline,
        normal_cov=32, tumor_cov=45, seed=77,
    )
    return tmp, fx


def _records(tmp_path, fx, name: str, extra_args=()) -> list[str]:
    out_vcf = str(tmp_path / f"{name}.vcf.gz")
    args = [
        "pipeline",
        "-n", fx["normal"], "-t", fx["tumor"], "-r", fx["fasta"],
        "-o", out_vcf,
    ] + list(extra_args)
    assert cli_main(args) == 0
    with gzip.open(out_vcf, "rt") as fh:
        return [l for l in fh.read().splitlines() if l and not l.startswith("#")]


class TestExecutorIdentity:
    """One fixture through every scheduling strategy: byte-identical records."""

    def test_threads_vs_batch_record_identity(self, fixture):
        tmp, fx = fixture
        # same aligner backend (the batch executor forces 'evidence'), so any
        # diff is a scheduling/ordering bug, not a numeric-backend one
        threads = _records(tmp, fx, "thr_ev",
                           ["-T", "2", "--aligner-backend", "evidence"])
        batch = _records(tmp, fx, "batch", ["-T", "2", "--executor", "batch"])
        assert threads, "fixture must produce records"
        assert threads == batch

    def test_thread_count_invariance_threads_executor(self, fixture):
        """-T 1/2/8 byte-identity on the threads executor: out-of-order
        window completion + store sharding must not leak into the VCF
        (the reference's analogous guarantee is its TSan-checked
        determinism; SURVEY.md §5-2)."""
        tmp, fx = fixture
        runs = [
            _records(tmp, fx, f"thr_T{t}", ["-T", str(t)]) for t in (1, 2, 8)
        ]
        assert runs[0], "fixture must produce records"
        assert runs[0] == runs[1] == runs[2]

    def test_thread_count_invariance_batch_executor(self, fixture):
        tmp, fx = fixture
        runs = [
            _records(tmp, fx, f"batch_T{t}",
                     ["-T", str(t), "--executor", "batch"])
            for t in (1, 2, 8)
        ]
        assert runs[0], "fixture must produce records"
        assert runs[0] == runs[1] == runs[2]

    def test_status_histogram_identity_threads_vs_batch(self, fixture):
        """The per-window status-code histogram the operator reads at the
        end of a run (reference: pipeline_executor.cpp:79-93) must agree
        between the threads and batch executors — both resolve
        found-but-unsupported windows to MISSING_NO_MSA_VARIANTS exactly
        like the reference (variant_builder.cpp:264-273)."""
        from lancet2_tpu.cli.main import build_parser, run_pipeline

        tmp, fx = fixture

        def stats(name, extra):
            argv = [
                "pipeline", "-n", fx["normal"], "-t", fx["tumor"],
                "-r", fx["fasta"], "-o", str(tmp / f"{name}.vcf.gz"),
                "-T", "2",
            ] + extra
            parsed = build_parser().parse_args(argv)
            return run_pipeline(parsed, "test")

        s_thr = stats("hist_thr", ["--aligner-backend", "evidence"])
        s_bat = stats("hist_bat", ["--executor", "batch"])
        assert s_thr.get("status_counts") == s_bat.get("status_counts")

    def test_backend_identity_jax_vs_evidence(self, fixture):
        """The evidence (traceback-free) engine must reproduce the CIGAR-walk
        jax engine's records end-to-end, not just at unit level."""
        tmp, fx = fixture
        jax_recs = _records(tmp, fx, "thr_jax",
                            ["-T", "2", "--aligner-backend", "jax"])
        ev_recs = _records(tmp, fx, "thr_ev2",
                           ["-T", "2", "--aligner-backend", "evidence"])
        assert jax_recs == ev_recs

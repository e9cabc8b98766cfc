"""Batch-executor checkpoint/resume + contig check (CLI surface).

Reference: pipeline_runner.cpp ValidateAndPopulateParams (contig check);
checkpointing is this framework's addition (core/checkpoint.py) now wired
into the batch executor's per-batch ordered flush.
"""

import gzip
import json
import os
import shutil

import pytest

from lancet2_tpu.utils.simulate import Variant, make_tumor_normal_fixture


def _run_cli(args):
    from lancet2_tpu.cli.main import main as cli_main

    return cli_main(args)


def _records(path):
    with gzip.open(path, "rt") as fh:
        return [l for l in fh if not l.startswith("#")]


@pytest.fixture(scope="module")
def fixture(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("bc")
    fx = make_tumor_normal_fixture(str(tmp), ref_len=4200, normal_cov=28,
                                   tumor_cov=36, seed=301)
    ref_seq = fx["ref_seq"]
    som = [
        Variant(pos0=1200, ref=ref_seq[1200],
                alt="C" if ref_seq[1200] != "C" else "G", vaf=0.5),
        Variant(pos0=3200, ref=ref_seq[3200],
                alt="A" if ref_seq[3200] != "A" else "T", vaf=0.5),
    ]
    fx = make_tumor_normal_fixture(str(tmp), ref_len=4200, somatic=som,
                                   normal_cov=28, tumor_cov=36, seed=301)
    return str(tmp), fx


class TestBatchCheckpoint:
    def test_batch_saves_cursor_and_resumes_identically(self, fixture, monkeypatch):
        import lancet2_tpu.core.batch_pipeline as bp

        # small batches so the per-batch flush (and cursor save) fires
        monkeypatch.setattr(bp, "DEFAULT_WINDOW_BATCH", 2)
        tmp, fx = fixture
        base = ["pipeline", "-n", fx["normal"], "-t", fx["tumor"],
                "-r", fx["fasta"], "-T", "1", "--executor", "batch",
                "--checkpoint"]
        full = os.path.join(tmp, "bfull.vcf.gz")
        assert _run_cli(base + ["-o", full]) == 0
        assert not os.path.exists(full + ".ckpt")  # cleared on completion
        full_recs = _records(full)
        assert full_recs

        part = os.path.join(tmp, "bresume.vcf.gz")
        shutil.copy(full, part)
        with open(part + ".ckpt", "w") as fh:
            json.dump({"cursor_chrom_index": 0, "cursor_pos1": 2200, "done": 2}, fh)
        assert _run_cli(base + ["-o", part]) == 0
        assert not os.path.exists(part + ".ckpt")
        assert _records(part) == full_recs


class TestContigCheck:
    def test_mismatched_reference_rejected(self, fixture, tmp_path):
        from lancet2_tpu.hts.fasta import write_fasta
        from lancet2_tpu.utils.simulate import random_reference

        tmp, fx = fixture
        # different-length chrS -> contig check must fail fast
        wrong = str(tmp_path / "wrong.fa")
        write_fasta(wrong, {"chrS": random_reference(2100, seed=9)})
        with pytest.raises(SystemExit, match="contig check failed"):
            _run_cli(["pipeline", "-n", fx["normal"], "-t", fx["tumor"],
                      "-r", wrong, "-o", str(tmp_path / "x.vcf.gz"), "-T", "1"])

    def test_no_contig_check_bypasses(self, fixture, tmp_path):
        from lancet2_tpu.hts.fasta import write_fasta
        from lancet2_tpu.utils.simulate import random_reference

        tmp, fx = fixture
        wrong = str(tmp_path / "wrong2.fa")
        # same length, different content: passes the check (content is the
        # caller's responsibility); the flag bypasses even length mismatches
        write_fasta(wrong, {"chrS": random_reference(2100, seed=9)})
        out = str(tmp_path / "y.vcf.gz")
        assert _run_cli(["pipeline", "-n", fx["normal"], "-t", fx["tumor"],
                         "-r", wrong, "-o", out, "-T", "1",
                         "--no-contig-check"]) == 0

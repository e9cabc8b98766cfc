"""Multi-host manifest sharding + checkpoint/resume tests."""

import gzip
import json
import os

import pytest

from lancet2_tpu.parallel.manifest import (
    merge_vcf_shards,
    shard_manifest,
    windows_for_host,
)
from lancet2_tpu.utils.simulate import Variant, make_tumor_normal_fixture


class TestManifest:
    def test_shard_partition(self):
        shards = shard_manifest(10, 3)
        assert [(s.start, s.stop) for s in shards] == [(0, 4), (4, 7), (7, 10)]
        assert sum(s.stop - s.start for s in shards) == 10

    def test_windows_for_host(self):
        windows = list(range(7))
        got = [windows_for_host(windows, h, 2) for h in range(2)]
        assert got[0] + got[1] == windows


def _run_cli(args):
    from lancet2_tpu.cli.main import main as cli_main

    assert cli_main(args) == 0


def _records(path):
    with gzip.open(path, "rt") as fh:
        return [l for l in fh if not l.startswith("#")]


@pytest.fixture(scope="module")
def fixture(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("mh")
    fx = make_tumor_normal_fixture(str(tmp), ref_len=4200, normal_cov=28, tumor_cov=36, seed=301)
    ref_seq = fx["ref_seq"]
    som = [Variant(pos0=1200, ref=ref_seq[1200], alt="C" if ref_seq[1200] != "C" else "G", vaf=0.5),
           Variant(pos0=3200, ref=ref_seq[3200], alt="A" if ref_seq[3200] != "A" else "T", vaf=0.5)]
    fx = make_tumor_normal_fixture(str(tmp), ref_len=4200, somatic=som,
                                   normal_cov=28, tumor_cov=36, seed=301)
    return str(tmp), fx


class TestMultiHostShards:
    def test_two_host_shards_merge_equals_single_run(self, fixture):
        tmp, fx = fixture
        base = ["pipeline", "-n", fx["normal"], "-t", fx["tumor"], "-r", fx["fasta"], "-T", "2"]
        single = os.path.join(tmp, "single.vcf.gz")
        _run_cli(base + ["-o", single])

        # emulate two hosts by splitting the region manually along the
        # window manifest midpoint (3 windows + 4 windows of chrS)
        h0 = os.path.join(tmp, "host0.vcf.gz")
        h1 = os.path.join(tmp, "host1.vcf.gz")
        _run_cli(base + ["-o", h0, "-R", "chrS:1-2400", "-P", "0"])
        _run_cli(base + ["-o", h1, "-R", "chrS:2401-4200", "-P", "0"])
        merged = os.path.join(tmp, "merged.vcf.gz")
        n = merge_vcf_shards([h0, h1], merged, ["chrS"])
        assert n == len(_records(merged))

        single_keys = {tuple(r.split("\t")[:2]) for r in _records(single)}
        merged_keys = {tuple(r.split("\t")[:2]) for r in _records(merged)}
        # both truth variants present in the merged shards
        for pos in ("1201", "3201"):
            assert ("chrS", pos) in merged_keys
            assert ("chrS", pos) in single_keys
        # merged output genomically sorted, no duplicate loci
        positions = [int(r.split("\t")[1]) for r in _records(merged)]
        assert positions == sorted(positions)
        assert len(positions) == len(set(positions))


class TestCheckpointResume:
    def test_resume_record_identical(self, fixture, monkeypatch):
        import lancet2_tpu.core.pipeline as pipeline_mod

        monkeypatch.setattr(pipeline_mod, "FLUSH_LAG_WINDOWS", 0)
        tmp, fx = fixture
        base = [
            "pipeline", "-n", fx["normal"], "-t", fx["tumor"], "-r", fx["fasta"],
            "-T", "1", "--checkpoint",
        ]
        full = os.path.join(tmp, "full.vcf.gz")
        _run_cli(base + ["-o", full])
        assert not os.path.exists(full + ".ckpt")  # cleared on completion
        full_recs = _records(full)
        assert full_recs

        # craft an interrupted state: copy the full VCF as the partial file
        # and a checkpoint cursor in the middle of the contig
        part = os.path.join(tmp, "resume.vcf.gz")
        import shutil

        shutil.copy(full, part)
        ckpt = {"cursor_chrom_index": 0, "cursor_pos1": 2200, "done": 2}
        with open(part + ".ckpt", "w") as fh:
            json.dump(ckpt, fh)

        _run_cli(base + ["-o", part])
        assert not os.path.exists(part + ".ckpt")
        assert _records(part) == full_recs

    def test_resume_from_empty_partial(self, fixture, monkeypatch):
        import lancet2_tpu.core.pipeline as pipeline_mod

        monkeypatch.setattr(pipeline_mod, "FLUSH_LAG_WINDOWS", 0)
        tmp, fx = fixture
        out = os.path.join(tmp, "fresh.vcf.gz")
        # checkpoint flag with no existing ckpt: behaves like a normal run
        _run_cli([
            "pipeline", "-n", fx["normal"], "-t", fx["tumor"], "-r", fx["fasta"],
            "-T", "1", "--checkpoint", "-o", out,
        ])
        assert _records(out)

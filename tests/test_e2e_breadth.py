"""Breadth end-to-end coverage: insertions, boundary variants, MNPs."""

import gzip

import pytest

from lancet2_tpu.cli.main import main as cli_main
from lancet2_tpu.hts.bam import BamWriter
from lancet2_tpu.hts.fasta import write_fasta
from lancet2_tpu.utils.simulate import (
    ReadSimulator,
    Variant,
    make_tumor_normal_fixture,
    random_reference,
)


def _records(path):
    with gzip.open(path, "rt") as fh:
        return [l.rstrip("\n").split("\t") for l in fh if not l.startswith("#")]


def _run(args):
    assert cli_main(args) == 0


class TestInsertionEndToEnd:
    def test_germline_insertion_called(self, tmp_path):
        fx = make_tumor_normal_fixture(str(tmp_path), ref_len=3500, seed=601)
        ref_seq = fx["ref_seq"]
        ins = Variant(pos0=1700, ref=ref_seq[1700], alt=ref_seq[1700] + "TGCA", vaf=0.5)
        fx = make_tumor_normal_fixture(
            str(tmp_path), ref_len=3500, germline=[ins],
            normal_cov=38, tumor_cov=38, seed=601,
        )
        out = str(tmp_path / "ins.vcf.gz")
        _run(["pipeline", "-n", fx["normal"], "-t", fx["tumor"], "-r", fx["fasta"],
              "-o", out, "-T", "2"])
        hits = [r for r in _records(out)
                if abs(int(r[1]) - 1701) <= 4 and len(r[4]) > len(r[3])]
        assert hits, f"insertion not called: {[(r[1], r[3], r[4]) for r in _records(out)]}"
        assert "TYPE=INS" in hits[0][7]
        assert "LENGTH=4" in hits[0][7]
        assert "SHARED" in hits[0][7]

    def test_somatic_mnp_called(self, tmp_path):
        fx = make_tumor_normal_fixture(str(tmp_path), ref_len=3500, seed=602)
        ref_seq = fx["ref_seq"]
        # dinucleotide substitution
        ref2 = ref_seq[1600:1602]
        alt2 = "".join("ACGT"[("ACGT".index(b) + 1) % 4] for b in ref2)
        mnp = Variant(pos0=1600, ref=ref2, alt=alt2, vaf=0.5)
        fx = make_tumor_normal_fixture(
            str(tmp_path), ref_len=3500, somatic=[mnp],
            normal_cov=38, tumor_cov=50, seed=602,
        )
        out = str(tmp_path / "mnp.vcf.gz")
        _run(["pipeline", "-n", fx["normal"], "-t", fx["tumor"], "-r", fx["fasta"],
              "-o", out, "-T", "2"])
        hits = [r for r in _records(out) if abs(int(r[1]) - 1601) <= 2]
        assert hits
        info = hits[0][7]
        assert "TYPE=MNP" in info or "TYPE=SNV" in info  # may split or keep
        assert "CASE" in info


class TestWindowBoundaryRecovery:
    def test_variant_near_window_edge_called_via_overlap(self, tmp_path):
        """Variants at window-step boundaries must be recovered through the
        200bp overlap + dedup-by-coverage (reference architecture.md
        edge-variant guarantee)."""
        fx = make_tumor_normal_fixture(str(tmp_path), ref_len=4600, seed=603)
        ref_seq = fx["ref_seq"]
        # default windows (P=500, w=1000, step 800) start at 1: boundaries at
        # 801, 1601, 2401... place the variant within ~20bp of one
        pos = 2405
        alt = "C" if ref_seq[pos] != "C" else "G"
        fx = make_tumor_normal_fixture(
            str(tmp_path), ref_len=4600,
            somatic=[Variant(pos0=pos, ref=ref_seq[pos], alt=alt, vaf=0.5)],
            normal_cov=34, tumor_cov=46, seed=603,
        )
        out = str(tmp_path / "edge.vcf.gz")
        _run(["pipeline", "-n", fx["normal"], "-t", fx["tumor"], "-r", fx["fasta"],
              "-o", out, "-T", "2", "-P", "0"])
        recs = _records(out)
        hits = [r for r in recs if int(r[1]) == pos + 1]
        assert hits, f"boundary variant lost: {[(r[1], r[3], r[4]) for r in recs]}"
        # exactly one record for the locus despite two overlapping windows
        assert len(hits) == 1

"""Multi-sample (3+ BAM) and multiallelic end-to-end tests.

Covers the driver config "multi-sample mosaic calling — multi-color graph
edges and joint scoring" (BASELINE.json) on simulated data: one control and
two case samples where only one case carries the variant, plus a
multiallelic site with two distinct ALTs on separate samples.
"""

import gzip
import os

import pytest

from lancet2_tpu.cli.main import main as cli_main
from lancet2_tpu.hts.bam import BamWriter
from lancet2_tpu.hts.fasta import write_fasta
from lancet2_tpu.utils.simulate import ReadSimulator, Variant, random_reference


def _make_bam(path, ref_seq, sample, variants, cov, seed):
    w = BamWriter(path, [("chrS", len(ref_seq))], sample_name=sample)
    sim = ReadSimulator(ref_seq, seed=seed)
    sim.simulate(variants, cov, w, qname_prefix=sample.lower())
    w.close()


def _run(args):
    assert cli_main(args) == 0


def _records(path):
    with gzip.open(path, "rt") as fh:
        return [l.rstrip("\n") for l in fh if not l.startswith("#")]


class TestThreeSampleMosaic:
    def test_variant_attributed_to_right_sample(self, tmp_path):
        ref_seq = random_reference(3000, seed=401)
        fasta = str(tmp_path / "ref.fa")
        write_fasta(fasta, {"chrS": ref_seq})
        pos = 1500
        alt = "C" if ref_seq[pos] != "C" else "G"
        var = Variant(pos0=pos, ref=ref_seq[pos], alt=alt, vaf=0.5)

        normal = str(tmp_path / "normal.bam")
        tumor_a = str(tmp_path / "tumorA.bam")
        tumor_b = str(tmp_path / "tumorB.bam")
        _make_bam(normal, ref_seq, "NORMAL", [], 40, 402)
        _make_bam(tumor_a, ref_seq, "TUMA", [var], 45, 403)  # carrier
        _make_bam(tumor_b, ref_seq, "TUMB", [], 45, 404)  # non-carrier

        out = str(tmp_path / "ms.vcf.gz")
        _run([
            "pipeline", "-n", normal,
            "-s", f"{tumor_a}:case", "-s", f"{tumor_b}:case",
            "-r", fasta, "-o", out, "-T", "2",
        ])
        with gzip.open(out, "rt") as fh:
            lines = fh.read().splitlines()
        header_cols = [l for l in lines if l.startswith("#CHROM")][0].split("\t")
        # deterministic sample order: controls first, then cases by SM
        assert header_cols[9:] == ["NORMAL", "TUMA", "TUMB"]

        hits = [l for l in lines if not l.startswith("#") and l.split("\t")[1] == str(pos + 1)]
        assert hits, "mosaic variant not called"
        cols = hits[0].split("\t")
        assert "CASE" in cols[7]
        gts = [c.split(":")[0] for c in cols[9:]]
        ads = [c.split(":")[1] for c in cols[9:]]
        assert gts[0] == "0/0"  # NORMAL
        assert gts[1] in ("0/1", "1/1")  # carrier
        assert gts[2] == "0/0"  # non-carrier
        # carrier has ALT depth; non-carrier does not
        assert int(ads[1].split(",")[1]) > 5
        assert int(ads[2].split(",")[1]) <= 1


class TestMultiallelic:
    def test_two_alts_same_locus(self, tmp_path):
        ref_seq = random_reference(3000, seed=405)
        fasta = str(tmp_path / "ref.fa")
        write_fasta(fasta, {"chrS": ref_seq})
        pos = 1500
        bases = [b for b in "ACGT" if b != ref_seq[pos]]
        var_a = Variant(pos0=pos, ref=ref_seq[pos], alt=bases[0], vaf=0.99)
        var_b = Variant(pos0=pos, ref=ref_seq[pos], alt=bases[1], vaf=0.99)

        normal = str(tmp_path / "normal.bam")
        tumor_a = str(tmp_path / "ta.bam")
        tumor_b = str(tmp_path / "tb.bam")
        _make_bam(normal, ref_seq, "NORMAL", [], 40, 406)
        _make_bam(tumor_a, ref_seq, "TUMA", [var_a], 40, 407)
        _make_bam(tumor_b, ref_seq, "TUMB", [var_b], 40, 408)

        out = str(tmp_path / "ma.vcf.gz")
        _run([
            "pipeline", "-n", normal,
            "-s", f"{tumor_a}:case", "-s", f"{tumor_b}:case",
            "-r", fasta, "-o", out, "-T", "2",
        ])
        hits = [r for r in _records(out) if r.split("\t")[1] == str(pos + 1)]
        assert hits
        cols = hits[0].split("\t")
        alts = cols[4].split(",")
        assert sorted(alts) == sorted(bases[:2]), f"expected multiallelic, got {cols[4]}"
        assert "MULTIALLELIC" in cols[7]
        # AD has R=3 entries; PL has G=6 entries for K=3 alleles
        for sample_col in cols[9:]:
            fields = dict(zip(cols[8].split(":"), sample_col.split(":")))
            assert len(fields["AD"].split(",")) == 3
            assert len(fields["PL"].split(",")) == 6
        # each carrier is het/hom for its own ALT allele
        a_idx = alts.index(bases[0]) + 1
        b_idx = alts.index(bases[1]) + 1
        gt_a = cols[10].split(":")[0]
        gt_b = cols[11].split(":")[0]
        assert str(a_idx) in gt_a and str(b_idx) not in gt_a
        assert str(b_idx) in gt_b and str(a_idx) not in gt_b

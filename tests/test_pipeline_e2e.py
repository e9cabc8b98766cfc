"""End-to-end pipeline tests on simulated tumor/normal data.

The reference validates against GCS-hosted HCC1395 fixtures; here the
framework's seeded simulator plants truth variants and the full CLI pipeline
(window building, active-region gating, collection, assembly, extraction,
genotyping, ordered bgzip VCF output) must recover them with the right
STATE classification.
"""

import gzip
import os

import pytest

from lancet2_tpu.cli.main import main as cli_main
from lancet2_tpu.utils.simulate import Variant, make_tumor_normal_fixture


def _run_pipeline(tmp_path, fixture, extra_args=()):
    out_vcf = str(tmp_path / "out.vcf.gz")
    args = [
        "pipeline",
        "-n", fixture["normal"],
        "-t", fixture["tumor"],
        "-r", fixture["fasta"],
        "-o", out_vcf,
        "-T", "2",
    ] + list(extra_args)
    rc = cli_main(args)
    assert rc == 0
    with gzip.open(out_vcf, "rt") as fh:
        lines = fh.read().splitlines()
    header = [l for l in lines if l.startswith("#")]
    records = [l for l in lines if l and not l.startswith("#")]
    return header, records


def _parse_records(records):
    out = []
    for rec in records:
        cols = rec.split("\t")
        out.append(
            {
                "chrom": cols[0],
                "pos": int(cols[1]),
                "ref": cols[3],
                "alt": cols[4],
                "qual": float(cols[5]),
                "info": cols[7],
                "format": cols[8],
                "samples": cols[9:],
            }
        )
    return out


@pytest.fixture(scope="module")
def somatic_run(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("somatic")
    somatic = [Variant(pos0=2500, ref="", alt="", vaf=0.45)]
    # build fixture with a real ref-dependent variant
    fx = make_tumor_normal_fixture(
        str(tmp_path), ref_len=4200, normal_cov=30, tumor_cov=42, seed=101
    )
    ref_seq = fx["ref_seq"]
    alt_base = "C" if ref_seq[2500] != "C" else "G"
    somatic = [Variant(pos0=2500, ref=ref_seq[2500], alt=alt_base, vaf=0.45)]
    fx = make_tumor_normal_fixture(
        str(tmp_path), ref_len=4200, somatic=somatic,
        normal_cov=30, tumor_cov=42, seed=101,
    )
    header, records = _run_pipeline(tmp_path, fx)
    return fx, header, _parse_records(records)


class TestSomaticEndToEnd:
    def test_vcf_well_formed(self, somatic_run):
        _, header, records = somatic_run
        assert header[0] == "##fileformat=VCFv4.5"
        assert any(l.startswith("##contig=<ID=chrS") for l in header)
        assert header[-1].startswith("#CHROM")
        assert header[-1].split("\t")[9:] == ["NORMAL", "TUMOR"]
        for rec in records:
            assert len(rec["format"].split(":")) == 24
            for sample in rec["samples"]:
                assert len(sample.split(":")) == 24

    def test_somatic_snv_called(self, somatic_run):
        fx, _, records = somatic_run
        truth = fx["somatic"][0]
        hits = [
            r
            for r in records
            if r["pos"] == truth.pos0 + 1 and r["ref"] == truth.ref and truth.alt in r["alt"]
        ]
        assert hits, f"somatic SNV not called; records: {[(r['pos'], r['ref'], r['alt']) for r in records]}"
        call = hits[0]
        assert "CASE" in call["info"]
        assert "TYPE=SNV" in call["info"]
        assert call["qual"] > 1.0

    def test_normal_sample_is_ref(self, somatic_run):
        fx, _, records = somatic_run
        truth = fx["somatic"][0]
        call = [r for r in records if r["pos"] == truth.pos0 + 1][0]
        normal_gt = call["samples"][0].split(":")[0]
        tumor_gt = call["samples"][1].split(":")[0]
        assert normal_gt == "0/0"
        assert tumor_gt in ("0/1", "1/1")

    def test_no_confident_false_positives(self, somatic_run):
        # Sequencing-error clusters may yield low-QUAL records with tiny ALT
        # support (the reference emits them too and filters post-hoc with the
        # EBM scorer); no *confident* call should appear away from the truth.
        fx, _, records = somatic_run
        truth_pos = fx["somatic"][0].pos0 + 1
        for rec in records:
            if abs(rec["pos"] - truth_pos) <= 5:
                continue
            assert rec["qual"] < 2.0, f"confident false positive at {rec['pos']}"
            tumor_gt = rec["samples"][1].split(":")[0]
            assert tumor_gt == "0/0"

    def test_records_sorted(self, somatic_run):
        _, _, records = somatic_run
        positions = [r["pos"] for r in records]
        assert positions == sorted(positions)


class TestGermlineDeletion:
    def test_germline_del_called_in_both(self, tmp_path):
        fx = make_tumor_normal_fixture(
            str(tmp_path), ref_len=4000, normal_cov=40, tumor_cov=40, seed=202
        )
        ref_seq = fx["ref_seq"]
        germline = [Variant(pos0=2000, ref=ref_seq[2000:2008], alt=ref_seq[2000], vaf=0.5)]
        fx = make_tumor_normal_fixture(
            str(tmp_path), ref_len=4000, germline=germline,
            normal_cov=40, tumor_cov=40, seed=202,
        )
        _, records = _run_pipeline(tmp_path, fx)
        parsed = _parse_records(records)
        hits = [r for r in parsed if abs(r["pos"] - 2001) <= 2 and len(r["ref"]) > len(r["alt"])]
        assert hits, f"germline deletion not called: {[(r['pos'], r['ref'], r['alt']) for r in parsed]}"
        assert "SHARED" in hits[0]["info"]
        assert "TYPE=DEL" in hits[0]["info"]


class TestDeterminism:
    def test_identical_runs_identical_vcf(self, tmp_path):
        fx = make_tumor_normal_fixture(str(tmp_path), ref_len=3000, seed=77)
        ref_seq = fx["ref_seq"]
        alt = "A" if ref_seq[1500] != "A" else "T"
        fx = make_tumor_normal_fixture(
            str(tmp_path), ref_len=3000,
            somatic=[Variant(pos0=1500, ref=ref_seq[1500], alt=alt, vaf=0.5)],
            seed=77,
        )
        _, rec1 = _run_pipeline(tmp_path, fx)
        _, rec2 = _run_pipeline(tmp_path, fx)
        assert rec1 == rec2

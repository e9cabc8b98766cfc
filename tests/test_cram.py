"""CRAM 3.0 container + rANS-4x8 codec tests (hts/cram.py, hts/rans4x8.py).

Reference behavior: the reference reads CRAM via htslib (hts/extractor.cpp,
SURVEY.md §2 L2); here the format is implemented natively, so the oracle is
(a) the BAM path on the same records and (b) codec roundtrips.
"""

import gzip
import os

import numpy as np
import pytest

from lancet2_tpu.hts import rans4x8
from lancet2_tpu.hts.cram import (
    CramReader,
    CramWriter,
    M_GZIP,
    M_RANS4x8,
    bam_to_cram,
    read_cram_header,
    read_itf8,
    read_ltf8,
    write_itf8,
    write_ltf8,
)


class TestVarints:
    @pytest.mark.parametrize("v", [0, 1, 127, 128, 16383, 16384, 2097151,
                                   2097152, (1 << 28) - 1, 1 << 28,
                                   (1 << 31) - 1, -1, -2, -100])
    def test_itf8_roundtrip(self, v):
        buf = bytearray()
        write_itf8(buf, v)
        got, p = read_itf8(bytes(buf), 0)
        assert got == v and p == len(buf)

    @pytest.mark.parametrize("v", [0, 1, 127, 128, 1 << 14, 1 << 21, 1 << 28,
                                   1 << 35, 1 << 42, 1 << 49, (1 << 56) - 1,
                                   1 << 56, (1 << 63)])
    def test_ltf8_roundtrip(self, v):
        buf = bytearray()
        write_ltf8(buf, v)
        got, p = read_ltf8(bytes(buf), 0)
        assert got == v and p == len(buf)


class TestRans4x8:
    def _cases(self):
        rng = np.random.default_rng(3)
        return [
            b"", b"A", b"AAAA", b"ABAB" * 50,
            bytes(rng.integers(0, 4, 1000).astype(np.uint8)),
            bytes(rng.integers(30, 42, 5000).astype(np.uint8)),
            bytes(rng.integers(0, 256, 3000).astype(np.uint8)),
            bytes([0]) * 100,
            bytes([0, 1, 2, 3] * 100),
            bytes(range(256)) * 3,
        ]

    @pytest.mark.parametrize("order", [0, 1])
    def test_roundtrip(self, order):
        for data in self._cases():
            assert rans4x8.uncompress(rans4x8.compress(data, order)) == data

    def test_compresses_skewed_data(self):
        data = bytes(np.random.default_rng(0).choice(
            [65, 67], 10000, p=[0.9, 0.1]).astype(np.uint8))
        blob = rans4x8.compress(data, 0)
        assert len(blob) < len(data) // 2


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    from lancet2_tpu.utils.simulate import (
        Variant, make_tumor_normal_fixture, random_reference)

    d = str(tmp_path_factory.mktemp("cram"))
    ref = random_reference(5000, seed=4)
    make_tumor_normal_fixture(
        d, ref_len=5000,
        somatic=[Variant(pos0=2500, ref=ref[2500],
                         alt="A" if ref[2500] != "A" else "G", vaf=0.5)],
        germline=[Variant(pos0=1000, ref=ref[1000:1005], alt=ref[1000], vaf=0.5)],
        normal_cov=20, tumor_cov=20, seed=4)
    return d


class TestCramRoundtrip:
    @pytest.mark.parametrize("method", [M_GZIP, M_RANS4x8])
    def test_records_identical_to_bam(self, fixture_dir, tmp_path, method):
        from lancet2_tpu.hts.bam import BamReader

        cram = str(tmp_path / "t.cram")
        n = bam_to_cram(f"{fixture_dir}/tumor.bam", cram,
                        f"{fixture_dir}/ref.fa", method=method)
        br = BamReader(f"{fixture_dir}/tumor.bam", use_native=False)
        cr = CramReader(cram, f"{fixture_dir}/ref.fa")
        assert len(cr.all_records()) == n == len(br.all_records())
        for a, b in zip(br.all_records(), cr.all_records()):
            assert (a.qname, a.flag, a.ref_id, a.pos0, a.mapq) == \
                   (b.qname, b.flag, b.ref_id, b.pos0, b.mapq)
            assert a.seq == b.seq
            assert list(a.cigar) == list(b.cigar)
            assert np.array_equal(a.qual, b.qual)
            assert (a.next_ref_id, a.next_pos0, a.tlen) == \
                   (b.next_ref_id, b.next_pos0, b.tlen)
            assert a.tags == b.tags

    def test_fetch_parity(self, fixture_dir, tmp_path):
        from lancet2_tpu.hts.bam import BamReader

        cram = str(tmp_path / "t.cram")
        bam_to_cram(f"{fixture_dir}/tumor.bam", cram, f"{fixture_dir}/ref.fa")
        br = BamReader(f"{fixture_dir}/tumor.bam", use_native=False)
        cr = CramReader(cram, f"{fixture_dir}/ref.fa")
        fa = br.fetch("chrS", 2400, 2700)
        fb = cr.fetch("chrS", 2400, 2700)
        assert [r.qname for r in fa] == [r.qname for r in fb]

    def test_header_only_read(self, fixture_dir, tmp_path):
        cram = str(tmp_path / "t.cram")
        bam_to_cram(f"{fixture_dir}/normal.bam", cram, f"{fixture_dir}/ref.fa")
        text, refs = read_cram_header(cram)
        assert refs and refs[0][0] == "chrS"
        assert "@SQ" in text

    def test_sample_discovery_and_open_bam_dispatch(self, fixture_dir, tmp_path):
        from lancet2_tpu.hts.bam import open_bam, read_bam_header, parse_sample_name

        cram = str(tmp_path / "n.cram")
        bam_to_cram(f"{fixture_dir}/normal.bam", cram, f"{fixture_dir}/ref.fa")
        text, _ = read_bam_header(cram)  # CRAM-aware dispatch
        assert parse_sample_name(text)
        reader = open_bam(cram, ref=f"{fixture_dir}/ref.fa")
        assert type(reader).__name__ == "CramReader"
        assert reader.fetch("chrS", 1, 5000)

    def test_multislice_containers(self, fixture_dir, tmp_path):
        from lancet2_tpu.hts.bam import BamReader

        br = BamReader(f"{fixture_dir}/tumor.bam", use_native=False)
        cram = str(tmp_path / "multi.cram")
        w = CramWriter(cram, br.header_text, f"{fixture_dir}/ref.fa",
                       records_per_slice=100)
        for rec in br.all_records():
            w.add(rec)
        w.close()
        cr = CramReader(cram, f"{fixture_dir}/ref.fa")
        assert len(cr.all_records()) == len(br.all_records())
        assert [r.qname for r in cr.all_records()] == \
               [r.qname for r in br.all_records()]


class TestCramPipeline:
    def test_pipeline_vcf_identical_to_bam_input(self, fixture_dir, tmp_path):
        from lancet2_tpu.cli.main import main

        for s in ("normal", "tumor"):
            bam_to_cram(f"{fixture_dir}/{s}.bam", f"{fixture_dir}/{s}.cram",
                        f"{fixture_dir}/ref.fa")
        out_bam = str(tmp_path / "b.vcf.gz")
        out_cram = str(tmp_path / "c.vcf.gz")
        for out, ext in ((out_bam, "bam"), (out_cram, "cram")):
            rc = main(["pipeline", "-n", f"{fixture_dir}/normal.{ext}",
                       "-t", f"{fixture_dir}/tumor.{ext}",
                       "-r", f"{fixture_dir}/ref.fa", "-o", out, "-T", "1"])
            assert rc == 0
        recs_b = [l for l in gzip.open(out_bam, "rt") if not l.startswith("#")]
        recs_c = [l for l in gzip.open(out_cram, "rt") if not l.startswith("#")]
        assert recs_b == recs_c and recs_b

    def test_cram_cli_convert_roundtrip(self, fixture_dir, tmp_path):
        from lancet2_tpu.cli.main import main
        from lancet2_tpu.hts.bam import BamReader

        cram = str(tmp_path / "x.cram")
        back = str(tmp_path / "back.bam")
        assert main(["cram", f"{fixture_dir}/tumor.bam", "-r",
                     f"{fixture_dir}/ref.fa", "-o", cram,
                     "--codec", "rans4x8"]) == 0
        assert main(["cram", cram, "-r", f"{fixture_dir}/ref.fa",
                     "-o", back]) == 0
        orig = BamReader(f"{fixture_dir}/tumor.bam", use_native=False)
        rt = BamReader(back, use_native=False)
        assert [(r.qname, r.pos0, r.seq) for r in orig.all_records()] == \
               [(r.qname, r.pos0, r.seq) for r in rt.all_records()]

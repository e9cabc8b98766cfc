"""hts-layer tests: BGZF, FASTA/fai, CIGAR utils, BAM roundtrip, simulator."""

import gzip
import os

import numpy as np
import pytest

from lancet2_tpu.base import dna
from lancet2_tpu.hts import bgzf, cigar as cg
from lancet2_tpu.hts.bam import BamReader, BamRecord, BamWriter, parse_sample_name
from lancet2_tpu.hts.fasta import Reference, parse_region_spec, write_fasta
from lancet2_tpu.utils.simulate import (
    ReadSimulator,
    Variant,
    make_tumor_normal_fixture,
    random_reference,
)


class TestBgzf:
    def test_roundtrip(self, tmp_path):
        payload = b"hello bgzf world\n" * 10000
        path = str(tmp_path / "x.gz")
        w = bgzf.BgzfWriter(path)
        w.write(payload)
        w.close()
        assert bgzf.decompress_file(path) == payload
        # stdlib gzip reads multi-member BGZF transparently
        with gzip.open(path, "rb") as fh:
            assert fh.read() == payload

    def test_compress_bytes(self, tmp_path):
        data = os.urandom(200_000)
        path = str(tmp_path / "y.gz")
        with open(path, "wb") as fh:
            fh.write(bgzf.compress_bytes(data))
        assert bgzf.decompress_file(path) == data

    def test_eof_marker_present(self, tmp_path):
        path = str(tmp_path / "z.gz")
        w = bgzf.BgzfWriter(path)
        w.write(b"abc")
        w.close()
        raw = open(path, "rb").read()
        assert raw.endswith(bgzf.BGZF_EOF)


class TestFasta:
    def test_write_read(self, tmp_path):
        seqs = {"chr1": random_reference(500, 1), "chr2:x": random_reference(133, 2)}
        path = str(tmp_path / "r.fa")
        write_fasta(path, seqs)
        ref = Reference(path)
        assert [c.name for c in ref.list_chroms()] == ["chr1", "chr2:x"]
        assert ref.find_chrom("chr1").length == 500
        assert ref.fetch("chr1", 1, 500) == seqs["chr1"]
        assert ref.fetch("chr1", 11, 20) == seqs["chr1"][10:20]
        # clamping
        assert ref.fetch("chr2:x", 130, 999) == seqs["chr2:x"][129:]

    def test_region_spec(self):
        assert parse_region_spec("chr1") == ("chr1", None, None)
        assert parse_region_spec("chr1:100-200") == ("chr1", 100, 200)
        assert parse_region_spec("{HLA-A:01}:5-9") == ("HLA-A:01", 5, 9)
        assert parse_region_spec("chr1:1,000-2,000") == ("chr1", 1000, 2000)

    def test_region_samtools_fmt(self, tmp_path):
        path = str(tmp_path / "r.fa")
        write_fasta(path, {"c:1": "ACGTACGT"})
        ref = Reference(path)
        region = ref.make_region("c:1", 2, 5)
        assert region.to_samtools() == "{c:1}:2-5"
        assert region.seq() == "CGTA"


class TestCigar:
    def test_str_roundtrip(self):
        c = cg.cigar_from_str("5S10M2I3D8M")
        assert cg.cigar_to_str(c) == "5S10M2I3D8M"
        assert cg.query_length(c) == 5 + 10 + 2 + 8
        assert cg.reference_span(c) == 10 + 3 + 8

    def test_edit_distance(self):
        q = dna.encode("ACGTAACC")
        t = dna.encode("ACGTTACCG")
        # 4M 1D 4M: q=ACGT|AACC t=ACGT|T|ACC+G(unused)
        c = [(cg.M, 4), (cg.D, 1), (cg.M, 4)]
        # mismatches: q[4:8]=AACC vs t[5:9]=ACCG -> A=A, A!=C, C=C? AACC vs ACCG:
        # A-A match, A-C mm, C-C match, C-G mm => 2 mismatches + 1 del = 3
        assert cg.compute_edit_distance(c, q, t) == 3

    def test_soft_clips_excluded_from_nm(self):
        q = dna.encode("TTACGT")
        t = dna.encode("ACGT")
        c = [(cg.S, 2), (cg.M, 4)]
        assert cg.compute_edit_distance(c, q, t) == 0

    def test_ref_pos_to_query_pos(self):
        c = cg.cigar_from_str("3M2I3M2D3M")
        assert cg.ref_pos_to_query_pos(c, 0) == 0
        assert cg.ref_pos_to_query_pos(c, 2) == 2
        assert cg.ref_pos_to_query_pos(c, 3) == 5  # after 2I
        assert cg.ref_pos_to_query_pos(c, 6) == 8  # inside D -> query at deletion
        assert cg.ref_pos_to_query_pos(c, 8) == 8


class TestBam:
    def _mk_record(self, **kw):
        base = dict(
            qname="r1", flag=0, ref_id=0, pos0=100, mapq=60,
            cigar=[(cg.M, 8)], next_ref_id=-1, next_pos0=-1, tlen=0,
            seq="ACGTACGT", qual=np.full(8, 30, dtype=np.uint8),
            tags={"MD": "8", "NM": 0},
        )
        base.update(kw)
        return BamRecord(**base)

    def test_roundtrip(self, tmp_path):
        path = str(tmp_path / "t.bam")
        w = BamWriter(path, [("chr1", 10_000)], sample_name="S1")
        w.add(self._mk_record())
        w.add(self._mk_record(qname="r2", pos0=50, seq="GGGGCCCC", tags={"XX": 7, "ZZ": "hi", "BB": [1, 2, 3]}))
        w.close()

        r = BamReader(path)
        assert r.references == [("chr1", 10_000)]
        assert parse_sample_name(r.header_text) == "S1"
        recs = r.all_records()
        assert len(recs) == 2
        # sorted by position
        assert recs[0].qname == "r2" and recs[0].pos0 == 50
        assert recs[1].seq == "ACGTACGT"
        assert list(recs[1].qual) == [30] * 8
        assert recs[1].cigar == [(cg.M, 8)]
        assert recs[1].tags["MD"] == "8"
        assert recs[0].tags["XX"] == 7
        assert recs[0].tags["ZZ"] == "hi"
        assert recs[0].tags["BB"] == [1, 2, 3]

    def test_fetch_overlap_semantics(self, tmp_path):
        path = str(tmp_path / "f.bam")
        w = BamWriter(path, [("chr1", 10_000)])
        w.add(self._mk_record(qname="a", pos0=100))  # spans [100,108)
        w.add(self._mk_record(qname="b", pos0=200))
        w.add(self._mk_record(qname="c", pos0=104, cigar=[(cg.M, 4), (cg.D, 50), (cg.M, 4)]))
        w.close()
        r = BamReader(path)
        # region 1-based [105,110] overlaps a (ends 108) and c
        names = {x.qname for x in r.fetch("chr1", 105, 110)}
        assert names == {"a", "c"}
        assert {x.qname for x in r.fetch("chr1", 150, 160)} == {"c"}  # spans deletion
        assert {x.qname for x in r.fetch("chr1", 300, 400)} == set()
        assert r.fetch("chrMissing", 1, 10) == []


class TestSimulator:
    def test_snv_fixture(self, tmp_path):
        fx = make_tumor_normal_fixture(
            str(tmp_path), ref_len=3000,
            somatic=[Variant(pos0=1500, ref="A", alt="C", vaf=0.4)],
        )
        # force the somatic ref base to be consistent
        tumor = BamReader(fx["tumor"])
        normal = BamReader(fx["normal"])
        assert len(tumor.all_records()) > 100
        assert len(normal.all_records()) > 100

        ref_base = fx["ref_seq"][1500]
        # count tumor reads carrying alt at pos 1500
        alt = 0
        total = 0
        for rec in tumor.fetch(fx["chrom"], 1501, 1501):
            qpos = cg.ref_pos_to_query_pos(rec.cigar, 1500 - rec.pos0)
            if qpos < len(rec.seq):
                total += 1
                if rec.seq[qpos] == "C" and ref_base != "C":
                    alt += 1
        if ref_base != "C":
            assert total > 10
            assert 0.15 < alt / total < 0.75

    def test_indel_cigars(self, tmp_path):
        ref_seq = random_reference(2000, seed=3)
        from lancet2_tpu.hts.bam import BamWriter

        path = str(tmp_path / "i.bam")
        w = BamWriter(path, [("chrS", 2000)], sample_name="X")
        sim = ReadSimulator(ref_seq, seed=5)
        ins = Variant(pos0=1000, ref=ref_seq[1000], alt=ref_seq[1000] + "GGTT", vaf=1.0)
        sim.simulate([ins], 30.0, w)
        w.close()
        r = BamReader(path)
        with_ins = [rec for rec in r.fetch("chrS", 995, 1006) if any(op == cg.I for op, _ in rec.cigar)]
        assert len(with_ins) > 5
        # reads fully spanning the insertion carry the complete 4-base I op;
        # reads ending inside it carry a truncated run
        full = [rec for rec in with_ins if rec.pos0 + 5 <= 1000 and rec.reference_end0() >= 1006]
        assert len(full) > 3
        for rec in full:
            assert [l for op, l in rec.cigar if op == cg.I] == [4]

    def test_md_tags_present(self, tmp_path):
        fx = make_tumor_normal_fixture(str(tmp_path), ref_len=2000)
        r = BamReader(fx["normal"])
        assert all("MD" in rec.tags for rec in r.all_records()[:50])


class TestCloudUri:
    def test_detection_and_shape(self):
        from lancet2_tpu.hts.uri import is_cloud_uri, validate_uri_shape

        assert is_cloud_uri("s3://bucket/key.bam")
        assert is_cloud_uri("gs://b/k")
        assert not is_cloud_uri("/data/x.bam")
        assert not is_cloud_uri("relative/path.bam")
        validate_uri_shape("s3://bucket/key.bam")  # ok
        with pytest.raises(ValueError):
            validate_uri_shape("s3://bucketonly")
        with pytest.raises(ValueError):
            validate_uri_shape("gs:///nokey")

    def test_pipeline_fails_fast_on_cloud_uri(self, tmp_path):
        from lancet2_tpu.cli.main import main

        with pytest.raises(SystemExit) as e:
            main(["pipeline", "-n", "s3://bucket/n.bam", "-r", "ref.fa",
                  "-o", str(tmp_path / "o.vcf.gz")])
        assert "cloud URIs" in str(e.value) or "remote" in str(e.value)

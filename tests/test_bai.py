"""BAI index + streaming BAM reader (hts/bai.py).

Reference capability: htslib BAI random access used by hts::Extractor
(reference: src/lancet/hts/extractor.{h,cpp}). Verifies bin math against
the SAM-spec definition, index build/load round-trip, and that the
streaming reader's fetch() is record-identical to the in-memory reader.
"""

import numpy as np
import pytest

from lancet2_tpu.hts.bai import (
    BaiIndex,
    BamStreamReader,
    build_bai,
    reg2bin,
    reg2bins,
)
from lancet2_tpu.hts.bam import BamReader, read_bam_header
from lancet2_tpu.utils.simulate import make_tumor_normal_fixture


@pytest.fixture(scope="module")
def fixture(tmp_path_factory):
    d = tmp_path_factory.mktemp("bai")
    return make_tumor_normal_fixture(str(d), ref_len=60_000, seed=71,
                                     normal_cov=12, tumor_cov=12)


class TestBinMath:
    def test_reg2bin_leaf(self):
        # within one 16kb window -> leaf level (offset 4681)
        assert reg2bin(0, 100) == 4681
        assert reg2bin(16384, 16385) == 4682

    def test_reg2bin_levels(self):
        # spans a 16kb boundary -> parent 128kb bin
        assert reg2bin(16000, 17000) == 585
        # spans everything -> root
        assert reg2bin(0, 1 << 29) == 0

    def test_reg2bins_contains_reg2bin(self):
        rng = np.random.default_rng(5)
        for _ in range(50):
            beg = int(rng.integers(0, 1 << 22))
            end = beg + int(rng.integers(1, 40_000))
            assert reg2bin(beg, end) in reg2bins(beg, end)
        assert 0 in reg2bins(123, 456)


class TestBuildAndLoad:
    def test_round_trip(self, fixture, tmp_path):
        bai_path = build_bai(fixture["normal"], str(tmp_path / "n.bai"))
        idx = BaiIndex.load(bai_path)
        assert len(idx.bins) == 1  # one contig
        # metadata pseudo-bin present with (mapped, unmapped) counts
        meta = idx.bins[0].get(37450)
        assert meta is not None
        n_records = len(BamReader(fixture["normal"]).all_records())
        assert meta[1][0] + meta[1][1] == n_records
        # linear index is monotonically non-decreasing after back-fill
        lin = idx.linear[0]
        assert len(lin) > 0
        assert np.all(np.diff(lin.astype(np.int64)) >= 0)

    def test_header_only_read(self, fixture):
        header_text, refs = read_bam_header(fixture["normal"])
        full = BamReader(fixture["normal"])
        assert header_text == full.header_text
        assert refs == full.references


class TestStreamingFetch:
    def test_fetch_matches_in_memory(self, fixture):
        full = BamReader(fixture["normal"])
        stream = BamStreamReader(fixture["normal"])  # builds .bai on demand
        chrom = full.references[0][0]
        rng = np.random.default_rng(7)
        for _ in range(25):
            s1 = int(rng.integers(1, 59_000))
            e1 = s1 + int(rng.integers(1, 2_500))
            expect = [(r.qname, r.flag, r.pos0) for r in full.fetch(chrom, s1, e1)]
            got = [(r.qname, r.flag, r.pos0) for r in stream.fetch(chrom, s1, e1)]
            assert sorted(got) == sorted(expect), f"region {chrom}:{s1}-{e1}"

    def test_fetch_record_fields_identical(self, fixture):
        full = BamReader(fixture["normal"])
        stream = BamStreamReader(fixture["normal"])
        chrom = full.references[0][0]
        a = sorted(full.fetch(chrom, 30_000, 31_000), key=lambda r: (r.pos0, r.qname))
        b = sorted(stream.fetch(chrom, 30_000, 31_000), key=lambda r: (r.pos0, r.qname))
        assert len(a) == len(b) > 0
        for ra, rb in zip(a, b):
            assert ra.seq == rb.seq
            assert np.array_equal(ra.qual, rb.qual)
            assert ra.cigar == rb.cigar
            assert ra.tags == rb.tags

    def test_all_records_generator_is_lazy_and_complete(self, fixture):
        stream = BamStreamReader(fixture["normal"])
        gen = stream.all_records()
        first = next(gen)
        assert first.qname
        count = 1 + sum(1 for _ in gen)
        assert count == len(BamReader(fixture["normal"]).all_records())

    def test_empty_and_out_of_range_regions(self, fixture):
        stream = BamStreamReader(fixture["normal"])
        chrom = stream.references[0][0]
        assert stream.fetch("chrMissing", 1, 100) == []
        assert stream.fetch(chrom, 70_001, 71_000) == []  # beyond the contig


class TestPipelineWithStreaming:
    def test_cli_stream_bam_end_to_end(self, fixture, tmp_path):
        import gzip

        from lancet2_tpu.cli.main import main as cli_main

        out_mem = str(tmp_path / "mem.vcf.gz")
        out_str = str(tmp_path / "str.vcf.gz")
        base = ["pipeline", "-n", fixture["normal"], "-t", fixture["tumor"],
                "-r", fixture["fasta"], "-T", "2", "-R",
                f"{fixture['chrom']}:20000-28000"]
        assert cli_main(base + ["-o", out_mem]) == 0
        assert cli_main(base + ["-o", out_str, "--stream-bam"]) == 0

        def records(p):
            with gzip.open(p, "rt") as fh:
                return [l for l in fh if not l.startswith("#")]

        assert records(out_str) == records(out_mem)

    def test_stream_bam_batch_executor_process_prep(self, fixture, tmp_path):
        """Streaming readers through the batch executor with FORK process
        prep workers: the per-PID block-cache reopen (hts/bai.py
        _LruBlockCache._file) must keep forked workers from sharing a seek
        offset — records must match the in-memory threads run exactly."""
        import gzip

        from lancet2_tpu.cli.main import main as cli_main

        out_mem = str(tmp_path / "bmem.vcf.gz")
        out_str = str(tmp_path / "bstr.vcf.gz")
        base = ["pipeline", "-n", fixture["normal"], "-t", fixture["tumor"],
                "-r", fixture["fasta"], "-T", "2", "-R",
                f"{fixture['chrom']}:20000-28000", "--executor", "batch"]
        assert cli_main(base + ["-o", out_mem, "--prep-mode", "threads"]) == 0
        assert cli_main(base + ["-o", out_str, "--stream-bam",
                                "--prep-mode", "processes"]) == 0

        def records(p):
            with gzip.open(p, "rt") as fh:
                return [l for l in fh if not l.startswith("#")]

        # fixture plants no variants: the identity of the (possibly empty)
        # record sets and clean exits are the contract here
        assert records(out_str) == records(out_mem)


class TestCsiIndex:
    def test_reg2bin_csi_matches_bai_at_default_params(self):
        from lancet2_tpu.hts.bai import reg2bin, reg2bins
        from lancet2_tpu.hts.csi import reg2bin_csi, reg2bins_csi

        rng = np.random.default_rng(5)
        for _ in range(200):
            beg = int(rng.integers(0, 1 << 28))
            end = beg + int(rng.integers(1, 10000))
            assert reg2bin_csi(beg, end) == reg2bin(beg, end)
            assert sorted(set(reg2bins_csi(beg, end))) == sorted(set(reg2bins(beg, end)))

    def test_csi_stream_fetch_matches_memory_reader(self, tmp_path):
        import shutil

        from lancet2_tpu.hts.bai import BamStreamReader
        from lancet2_tpu.hts.bam import BamReader
        from lancet2_tpu.hts.csi import CsiIndex, build_csi
        from lancet2_tpu.utils.simulate import (
            Variant, make_tumor_normal_fixture, random_reference)

        d = str(tmp_path)
        ref = random_reference(4000, seed=6)
        make_tumor_normal_fixture(
            d, ref_len=4000,
            somatic=[Variant(pos0=2000, ref=ref[2000],
                             alt="T" if ref[2000] != "T" else "C", vaf=0.5)],
            normal_cov=15, tumor_cov=15, seed=6)
        bam = f"{d}/tumor.bam"
        csi = build_csi(bam, depth=6, min_shift=14)
        assert csi.endswith(".csi")
        idx = CsiIndex.load(csi)
        assert idx.depth == 6 and idx.min_shift == 14

        mem = BamReader(bam, use_native=False)
        stream = BamStreamReader(bam)  # picks up the .csi via _find_bai
        assert type(stream.index).__name__ == "CsiIndex"
        for lo, hi in ((1, 4000), (1900, 2100), (3500, 4000), (1, 50)):
            a = [(r.qname, r.pos0) for r in mem.fetch("chrS", lo, hi)]
            b = [(r.qname, r.pos0) for r in stream.fetch("chrS", lo, hi)]
            assert a == b, (lo, hi)

    def test_cli_index_csi(self, tmp_path):
        from lancet2_tpu.cli.main import main
        from lancet2_tpu.utils.simulate import (
            Variant, make_tumor_normal_fixture, random_reference)

        d = str(tmp_path)
        ref = random_reference(3000, seed=7)
        make_tumor_normal_fixture(
            d, ref_len=3000,
            somatic=[Variant(pos0=1500, ref=ref[1500],
                             alt="G" if ref[1500] != "G" else "A", vaf=0.5)],
            normal_cov=10, tumor_cov=10, seed=7)
        assert main(["index", f"{d}/normal.bam", "--csi", "--depth", "6"]) == 0
        import os
        assert os.path.exists(f"{d}/normal.bam.csi")


class TestCsiBoundarySpanningRead:
    def test_long_read_crossing_16kb_bin_boundary_is_fetched(self, tmp_path):
        """Regression: a record spanning a (1<<min_shift) window boundary
        lands in an ancestor bin; build_csi must seed every bin's loffset
        from the full-span window map (htslib semantics, like build_bai) or
        the 'vend > min_off' prune in chunks_for_region drops it."""
        from lancet2_tpu.hts.bam import BamRecord, BamWriter
        from lancet2_tpu.hts.csi import build_csi

        bam = str(tmp_path / "t.bam")
        w = BamWriter(bam, [("chr1", 40000)], sample_name="S")
        rng = np.random.default_rng(0)

        def rec(name, pos0, length):
            seq = "".join("ACGT"[i] for i in rng.integers(0, 4, length))
            return BamRecord(name, 0, 0, pos0, 60, [(0, length)], -1, -1, 0,
                             seq, np.full(length, 30, np.uint8), {})

        for i in range(20):
            w.add(rec(f"a{i}", 100 + i * 37, 100))
        w.add(rec("long", 15500, 2000))  # ends at 17500: crosses 16384
        for i in range(20):
            w.add(rec(f"b{i}", 16400 + i * 41, 100))
        w.close()

        build_csi(bam, min_shift=14, depth=6)
        mem = BamReader(bam, use_native=False)
        stream = BamStreamReader(bam)
        assert type(stream.index).__name__ == "CsiIndex"
        for lo, hi in ((16401, 17000), (1, 40000), (15000, 16000), (17400, 17600)):
            a = sorted(r.qname for r in mem.fetch("chr1", lo, hi))
            b = sorted(r.qname for r in stream.fetch("chr1", lo, hi))
            assert a == b, (lo, hi, set(a) ^ set(b))
        assert "long" in [r.qname for r in stream.fetch("chr1", 16401, 17000)]

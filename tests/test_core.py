"""Core-layer tests: window math, read collection, variant store, samples."""

import io

import numpy as np
import pytest

from lancet2_tpu.core.read_collector import CollectorParams, ReadCollector
from lancet2_tpu.core.sample_info import make_sample_list, parse_sample_spec
from lancet2_tpu.core.variant_store import VariantStore
from lancet2_tpu.core.window_builder import Window, WindowBuilder, WindowParams, step_size
from lancet2_tpu.cbdg.read import LABEL_CASE, LABEL_CTRL
from lancet2_tpu.hts.fasta import Reference, write_fasta
from lancet2_tpu.utils.simulate import make_tumor_normal_fixture, random_reference


class TestWindowBuilder:
    def test_step_size_math(self):
        # 1000bp window, 20% overlap -> 800 step (rounded to multiple of 100)
        assert step_size(WindowParams(1000, 20, 500)) == 800
        assert step_size(WindowParams(1000, 50, 500)) == 500
        assert step_size(WindowParams(1100, 20, 500)) == 900  # ceil(880/100)*100

    def test_windows_cover_region(self, tmp_path):
        path = str(tmp_path / "r.fa")
        write_fasta(path, {"c1": random_reference(10_000, 1)})
        ref = Reference(path)
        wb = WindowBuilder(ref, WindowParams(1000, 20, 500))
        wb.add_region_spec("c1:2000-6000")
        wb.sort_input_regions()
        windows = wb.build_windows()
        # padded region = 1500-6500; windows of 1000 step 800
        assert windows[0].start1 == 1500
        # reference convention: 1-based inclusive span start..start+window_len
        # (cli window spec "{}:{start}-{start+len}") -> 1001bp actual span
        assert windows[0].length == 1001
        assert all(w.genome_index == i for i, w in enumerate(windows))
        # consecutive windows overlap by 200bp
        assert windows[1].start1 - windows[0].start1 == 800
        # full region covered
        assert windows[-1].end1 >= 6000

    def test_padding_clamped_to_contig(self, tmp_path):
        path = str(tmp_path / "r.fa")
        write_fasta(path, {"c1": random_reference(3000, 2)})
        ref = Reference(path)
        wb = WindowBuilder(ref, WindowParams(1000, 20, 500))
        wb.add_region_spec("c1:1-3000")
        windows = wb.build_windows()
        assert windows[0].start1 == 1
        assert all(w.end1 <= 3000 for w in windows)

    def test_small_region_widened_to_window(self, tmp_path):
        path = str(tmp_path / "r.fa")
        write_fasta(path, {"c1": random_reference(9000, 3)})
        ref = Reference(path)
        wb = WindowBuilder(ref, WindowParams(1000, 20, 0))
        wb.add_region_spec("c1:5000-5010")
        windows = wb.build_windows()
        assert len(windows) == 1
        assert windows[0].length >= 1000

    def test_dedup_and_sort(self, tmp_path):
        path = str(tmp_path / "r.fa")
        write_fasta(path, {"a": random_reference(5000, 4), "b": random_reference(5000, 5)})
        ref = Reference(path)
        wb = WindowBuilder(ref, WindowParams(1000, 20, 0))
        wb.add_region_spec("b:1-2000")
        wb.add_region_spec("a:1-2000")
        wb.add_region_spec("a:1-2000")  # duplicate
        wb.sort_input_regions()
        assert len(wb.input_regions) == 2
        windows = wb.build_windows()
        assert windows[0].chrom == "a"


class TestSampleInfo:
    def test_parse_spec(self):
        assert parse_sample_spec("/x/y.bam:case") == ("/x/y.bam", LABEL_CASE)
        assert parse_sample_spec("/x/y.bam:tumor") == ("/x/y.bam", LABEL_CASE)
        assert parse_sample_spec("/x/y.bam:normal") == ("/x/y.bam", LABEL_CTRL)
        assert parse_sample_spec("/x/y.bam") == ("/x/y.bam", LABEL_CTRL)

    def test_deterministic_ordering(self, tmp_path):
        fx = make_tumor_normal_fixture(str(tmp_path), ref_len=1500, seed=31)
        samples = make_sample_list([fx["normal"]], [fx["tumor"]], [])
        # control sorts before case; indices assigned in order
        assert [s.sample_name for s in samples] == ["NORMAL", "TUMOR"]
        assert [s.sample_index for s in samples] == [0, 1]
        assert samples[0].tag == LABEL_CTRL and samples[1].tag == LABEL_CASE


class TestReadCollector:
    def test_deterministic_downsampling(self, tmp_path):
        fx = make_tumor_normal_fixture(
            str(tmp_path), ref_len=2500, normal_cov=80, tumor_cov=80, seed=41
        )
        samples = make_sample_list([fx["normal"]], [fx["tumor"]], [])
        params = CollectorParams(max_sample_cov=30.0)
        c1 = ReadCollector(params, [s for s in samples])
        reads1 = c1.collect("chrS", 500, 1500)
        c2 = ReadCollector(params, [s for s in samples])
        reads2 = c2.collect("chrS", 500, 1500)
        assert [r.qname for r in reads1] == [r.qname for r in reads2]
        # downsampled below raw count
        full = ReadCollector(CollectorParams(max_sample_cov=1000.0), samples).collect(
            "chrS", 500, 1500
        )
        assert len(reads1) < len(full)

    def test_pairs_symmetric(self, tmp_path):
        fx = make_tumor_normal_fixture(
            str(tmp_path), ref_len=2500, normal_cov=100, tumor_cov=10, seed=42
        )
        samples = make_sample_list([fx["normal"]], [], [])
        reads = ReadCollector(CollectorParams(max_sample_cov=30.0), samples).collect(
            "chrS", 1, 2500
        )
        # if both mates are in-region, they are kept or dropped together
        from collections import Counter

        counts = Counter(r.qname for r in reads)
        assert all(c in (1, 2) for c in counts.values())

    def test_sorted_deterministically(self, tmp_path):
        fx = make_tumor_normal_fixture(str(tmp_path), ref_len=2000, seed=43)
        samples = make_sample_list([fx["normal"]], [fx["tumor"]], [])
        reads = ReadCollector(CollectorParams(), samples).collect("chrS", 1, 2000)
        keys = [(r.tag, r.sample_name, r.qname, r.chrom_index, r.start0) for r in reads]
        assert keys == sorted(keys)


class _FakeCall:
    def __init__(self, chrom_index, pos1, ref, cov, alt_support=True, label="x"):
        self.chrom_index = chrom_index
        self.pos1 = pos1
        self.ref_allele = ref
        self._cov = cov
        self.has_alt_support = alt_support
        self.label = label

    def identity(self):
        return (self.chrom_index, self.pos1, self.ref_allele)

    def total_coverage(self):
        return self._cov

    def as_vcf_record(self):
        return f"{self.chrom_index}\t{self.pos1}\t{self.ref_allele}\t{self.label}"


class TestVariantStore:
    def _windows(self):
        return [Window("c", 0, 1 + i * 800, 1000 + i * 800, i) for i in range(5)]

    def test_dedup_keeps_higher_coverage(self):
        store = VariantStore(self._windows())
        store.add_variants([_FakeCall(0, 100, "A", cov=10, label="low")])
        store.add_variants([_FakeCall(0, 100, "A", cov=30, label="high")])
        store.add_variants([_FakeCall(0, 100, "A", cov=20, label="mid")])
        out = io.StringIO()
        assert store.flush_all(out) == 1
        assert "high" in out.getvalue()

    def test_ordered_flush_before_window(self):
        store = VariantStore(self._windows())
        store.add_variants(
            [
                _FakeCall(0, 2500, "A", 10),
                _FakeCall(0, 100, "C", 10),
                _FakeCall(0, 900, "G", 10),
            ]
        )
        out = io.StringIO()
        # window 2 starts at 1601: flush strictly before it
        n = store.flush_before_window(2, out)
        assert n == 2
        lines = out.getvalue().splitlines()
        assert [int(l.split("\t")[1]) for l in lines] == [100, 900]
        out2 = io.StringIO()
        assert store.flush_all(out2) == 1

    def test_drops_no_alt_support(self):
        store = VariantStore(self._windows())
        store.add_variants([_FakeCall(0, 50, "T", 10, alt_support=False)])
        out = io.StringIO()
        assert store.flush_all(out) == 0

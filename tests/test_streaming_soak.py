"""WGS-scale streaming soak: bounded memory over a huge window manifest.

The reference streams 65,536-window batches so a ~3M-window WGS run never
materializes the full manifest (core/pipeline_executor.cpp:137-150). Here a
synthetic 120 Mbp contig yields 150k windows; the executor consumes them from
the streaming iterator (windows are all-N so each terminates at the first
gate — this soaks the scheduler/flush/feeder machinery, not assembly) and
peak RSS growth must stay bounded.
"""

import os
import resource

import pytest

from lancet2_tpu.core.pipeline import PipelineExecutor
from lancet2_tpu.core.variant_builder import BuilderParams
from lancet2_tpu.core.window_builder import WindowBuilder, WindowParams
from lancet2_tpu.cbdg.graph import GraphParams
from lancet2_tpu.core.read_collector import CollectorParams
from lancet2_tpu.core.sample_info import make_sample_list
from lancet2_tpu.hts.bam import BamWriter
from lancet2_tpu.hts.fasta import write_fasta


class _ChromInfo:
    def __init__(self, name, index, length):
        self.name, self.index, self.length = name, index, length


class _SyntheticNRef:
    """Reference stub: one huge all-N contig (no FASTA on disk needed).

    Windows over it terminate at the all-N gate, so the soak measures the
    streaming scheduler itself."""

    def __init__(self, length):
        self._info = _ChromInfo("chrBig", 0, length)

    def list_chroms(self):
        return [self._info]

    def find_chrom(self, name):
        if name != "chrBig":
            raise KeyError(name)
        return self._info

    def fetch(self, chrom, start1, end1):
        return "N" * (end1 - start1 + 1)


@pytest.fixture(scope="module")
def tiny_bam(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("soak")
    fasta = str(tmp / "ref.fa")
    write_fasta(fasta, {"chrBig": "ACGT" * 50})
    bam = str(tmp / "empty.bam")
    w = BamWriter(bam, [("chrBig", 120_000_000)], sample_name="S1")
    w.close()
    return bam


class TestStreamingSoak:
    def test_150k_windows_bounded_memory(self, tiny_bam):
        n_target = 150_000
        length = 800 * (n_target - 1) + 1000  # step 800, window 1000
        ref = _SyntheticNRef(length)
        wb = WindowBuilder(ref, WindowParams())
        wb.add_whole_reference()
        wb.sort_input_regions()
        assert wb.expected_target_windows() >= n_target

        samples = make_sample_list([tiny_bam], [], [])
        params = BuilderParams(
            graph=GraphParams(num_samples=1),
            collector=CollectorParams(),
            skip_active_region=True,
        )

        rss_before = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        executor = PipelineExecutor(
            params, ref, samples, wb.iter_windows(), num_workers=4,
            total_hint=wb.expected_target_windows(),
        )

        class _Sink:
            def write(self, _):
                pass

        stats = executor.execute(_Sink())
        rss_after = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss

        assert stats["windows"] >= n_target - 1  # tail remainder may merge
        assert stats["status_counts"] == {
            "SKIPPED_NONLY_REF_BASES": stats["windows"]
        }
        # bounded feeder: the full manifest would be >150k Window objects;
        # allow modest growth for queue depth + done-tracking structures
        growth_mb = (rss_after - rss_before) / 1024.0
        assert growth_mb < 400, f"streaming soak grew RSS by {growth_mb:.0f} MB"

    def test_streaming_matches_monolithic_records(self, tiny_bam, tmp_path):
        """Output equivalence: the streaming executor produces the same
        ordered records as the list-mode executor on a small real fixture."""
        from lancet2_tpu.utils.simulate import Variant, make_tumor_normal_fixture
        from lancet2_tpu.cli.main import main as cli_main
        import gzip

        fx = make_tumor_normal_fixture(str(tmp_path), ref_len=4200,
                                       normal_cov=25, tumor_cov=35, seed=77)
        ref_seq = fx["ref_seq"]
        alt = "A" if ref_seq[2100] != "A" else "C"
        fx = make_tumor_normal_fixture(
            str(tmp_path), ref_len=4200,
            somatic=[Variant(2100, ref_seq[2100], alt, vaf=0.4)],
            normal_cov=25, tumor_cov=35, seed=77,
        )

        outputs = []
        for mode in ("off", "on"):
            out_vcf = str(tmp_path / f"out_{mode}.vcf.gz")
            rc = cli_main([
                "pipeline", "-n", fx["normal"], "-t", fx["tumor"],
                "-r", fx["fasta"], "-o", out_vcf, "-T", "2",
                "--stream-windows", mode,
            ])
            assert rc == 0
            with gzip.open(out_vcf, "rt") as fh:
                outputs.append([l for l in fh.read().splitlines()
                                if l and not l.startswith("##")])
        assert outputs[0] == outputs[1]

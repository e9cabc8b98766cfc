"""Native assembly core (native/assembly_core.cpp) parity tests.

The C++ engines are required to be bit-exact twins of their numpy baselines:
  * l2t_align_batch vs ops.affine_dp.align_batch_numpy + traceback_batch
  * l2t_kmer_pass  vs the vectorized middle of cbdg.graph.Graph._build_graph

Reference parity anchors: src/lancet/cbdg/graph.cpp:262-341 (BuildGraph),
src/lancet/caller/msa_builder.h:17-71, genotyper.cpp:89-191.
"""

import numpy as np
import pytest

from lancet2_tpu.base import native_core

pytestmark = pytest.mark.skipif(
    not native_core.available(), reason="native toolchain unavailable"
)


class TestAlignParity:
    @pytest.mark.parametrize("params_name", ["READ_TO_HAP", "HAP_TO_REF"])
    def test_random_batches_bit_exact(self, params_name):
        from lancet2_tpu.ops import affine_dp
        from lancet2_tpu.ops.affine_dp import align_batch_numpy, traceback_batch

        p = getattr(affine_dp, params_name)
        rng = np.random.default_rng(1234)
        for trial in range(12):
            B = 8
            Lq = int(rng.integers(5, 180))
            Lt = int(rng.integers(5, 400))
            qs = rng.integers(0, 5, (B, Lq)).astype(np.uint8)
            ts = rng.integers(0, 5, (B, Lt)).astype(np.uint8)
            for b in range(0, B, 2):  # related pairs exercise realistic paths
                L = min(Lq, Lt)
                qs[b, :L] = ts[b, :L]
                for _ in range(int(rng.integers(0, 5))):
                    pos = int(rng.integers(0, L))
                    qs[b, pos] = (qs[b, pos] + 1) % 4
            qlens = rng.integers(1, Lq + 1, B).astype(np.int64)
            tlens = rng.integers(1, Lt + 1, B).astype(np.int64)

            out = align_batch_numpy(qs, qlens, ts, tlens, p)
            cigars = traceback_batch(out["dirs"], qlens, out["t_end"], p)
            nat = native_core.align_batch(qs, qlens, ts, tlens, p)
            assert nat is not None
            for b in range(B):
                assert nat[b]["score"] == int(out["score"][b]), (trial, b)
                assert nat[b]["t_end"] == int(out["t_end"][b]), (trial, b)
                assert nat[b]["cigar"] == cigars[b], (trial, b)


class TestKmerPassParity:
    def _compare_graphs(self, tmp_path, seed):
        """Build every simulator window's graph twice (native off/on) and
        demand identical node tables, counts, edges, and haplotypes."""
        from lancet2_tpu.cbdg.graph import Graph, GraphParams
        from lancet2_tpu.core.read_collector import CollectorParams, ReadCollector
        from lancet2_tpu.core.sample_info import make_sample_list
        from lancet2_tpu.core.window_builder import WindowBuilder
        from lancet2_tpu.hts.fasta import Reference
        from lancet2_tpu.utils.simulate import (
            Variant, make_tumor_normal_fixture, random_reference,
        )

        d = str(tmp_path)
        ref_str = random_reference(9000, seed=seed)
        variants = []
        for pos in (2000, 4500, 7000):
            alt = "ACGT"[("ACGT".index(ref_str[pos]) + 1) % 4]
            variants.append(Variant(pos0=pos, ref=ref_str[pos], alt=alt, vaf=0.5))
        make_tumor_normal_fixture(
            d, ref_len=9000, somatic=variants[:2], germline=variants[2:],
            normal_cov=25, tumor_cov=30, seed=seed,
        )
        ref = Reference(f"{d}/ref.fa")
        samples = make_sample_list([f"{d}/normal.bam"], [f"{d}/tumor.bam"], [])
        collector = ReadCollector(CollectorParams(), samples)
        wb = WindowBuilder(ref)
        wb.add_whole_reference()
        wb.sort_input_regions()
        windows = wb.build_windows()

        gp = GraphParams(num_samples=len(samples))
        import lancet2_tpu.base.native_core as nc

        from lancet2_tpu.base.dna import encode

        for window in windows[::2]:
            reads = collector.collect(window.chrom, window.start1, window.end1)
            ref_codes = encode(ref.fetch(window.chrom, window.start1, window.end1))
            snapshots = []
            for forced_off in (True, False):
                g = Graph(gp)
                if forced_off:
                    orig = nc.available
                    nc.available = lambda: False
                    try:
                        g._build_graph(ref_codes, reads, 13)
                    finally:
                        nc.available = orig
                else:
                    assert nc.available()
                    g._build_graph(ref_codes, reads, 13)
                snapshots.append(
                    {
                        "node_ids": list(g.nodes.keys()),
                        "counts": {n: list(map(int, node.counts))
                                   for n, node in g.nodes.items()},
                        "roles": {n: node.role_counts for n, node in g.nodes.items()},
                        "signs": {n: node.sign for n, node in g.nodes.items()},
                        "labels": {n: node.label for n, node in g.nodes.items()},
                        "edges": {n: [(e.src, e.dst, e.kind) for e in node.edges]
                                  for n, node in g.nodes.items()},
                        "ref_ids": list(g.ref_node_ids),
                        "built": sorted(g.all_built_ids),
                    }
                )
            a, b = snapshots
            for key in a:
                assert a[key] == b[key], (window.to_samtools(), key)

    def test_simulator_windows_identical(self, tmp_path):
        self._compare_graphs(tmp_path, seed=33)


class TestNativeRepeatScans:
    """Parity of the native repeat/complexity kernels vs their Python twins
    (native/assembly_core.cpp::l2t_tandem_repeats / l2t_has_approx_repeat,
    native/bam_decoder.cpp::l2t_event_scan)."""

    def test_tandem_repeats_parity(self):
        import random

        from lancet2_tpu.base import native_core as nc
        from lancet2_tpu.base.sequence_complexity import (
            find_approx_repeats,
            find_exact_repeats,
            tandem_repeat_hits,
        )

        assert nc.available()
        rng = random.Random(7)
        for trial in range(150):
            n = rng.randint(1, 140)
            s = "".join(rng.choice("ACGT") for _ in range(n))
            if trial % 3 == 0 and n > 20:
                m = "".join(rng.choice("ACGT") for _ in range(rng.randint(1, 6)))
                ins = (m * 8)[: rng.randint(6, 30)]
                p = rng.randint(0, n - 1)
                s = s[:p] + ins + s[p:]
            py = find_exact_repeats(s) + find_approx_repeats(s)
            nat = tandem_repeat_hits(s)
            key = lambda r: (r.period, r.start_pos, r.span_length,
                             r.total_errors, r.is_exact, round(r.copies, 12))
            assert [key(r) for r in py] == [key(r) for r in nat], s

    def test_has_approx_repeat_parity(self):
        import numpy as np

        import lancet2_tpu.base.native_core as nc
        from lancet2_tpu.base import repeat as rp

        assert nc.available()
        rng = np.random.default_rng(11)
        for _ in range(80):
            n = int(rng.integers(5, 260))
            codes = rng.integers(0, 5, n).astype(np.uint8)
            k = int(rng.choice([3, 5, 11, 13, 33, 65]))
            if k >= n:
                k = max(2, n - 1)
            mm = int(rng.integers(1, 4))
            nat = nc.has_approx_repeat_native(codes, k, mm)
            orig = nc.has_approx_repeat_native
            nc.has_approx_repeat_native = lambda *a, **kw: None
            try:
                py = rp.has_approx_repeat(codes, k, mm)
            finally:
                nc.has_approx_repeat_native = orig
            assert nat == py

    def test_event_scan_parity(self, tmp_path):
        import numpy as np

        from lancet2_tpu.core import active_region as ar
        from lancet2_tpu.hts import native
        from lancet2_tpu.hts.bam import BamReader
        from lancet2_tpu.utils.simulate import make_tumor_normal_fixture

        fx = make_tumor_normal_fixture(str(tmp_path), ref_len=8000, seed=5)
        for path in (fx["normal"], fx["tumor"]):
            r = BamReader(path)
            assert r._cols is not None
            ev_pos, ev_kind, ev_off = native.event_scan(r._cols)
            for i in range(r._cols["count"]):
                rec = r._record_at(i)
                py = ar._record_events(rec)
                a, b = int(ev_off[i]), int(ev_off[i + 1])
                nat = list(zip(ev_pos[a:b].tolist(), ev_kind[a:b].tolist()))
                assert nat == py, (path, i)

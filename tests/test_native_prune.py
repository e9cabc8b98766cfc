"""Native prune-cascade parity: C++ l2t_prune_component vs the Python
compress -> lowcov -> compress -> tips pipeline (cbdg/graph.py, which itself
mirrors reference graph.cpp:515-840).

The oracle is the full observable surface: surviving node table (ids, order,
sequences, labels, counts, roles, edge sets) AND the enumerated haplotype
set (order-sensitive downstream: traversal indexing, walk order, dedup
keep-first)."""

from __future__ import annotations

import numpy as np
import pytest

from lancet2_tpu.base import native_core
from lancet2_tpu.base.dna import encode
from lancet2_tpu.base.hashing import hash_str64
from lancet2_tpu.cbdg.graph import Graph, GraphParams
from lancet2_tpu.cbdg.read import Read
from lancet2_tpu.utils.simulate import ReadSimulator, Variant, random_reference

pytestmark = pytest.mark.skipif(
    not native_core.available(), reason="native toolchain unavailable"
)


def _make_reads(ref: str, variants, seed: int, coverage: float = 45.0):
    sim = ReadSimulator(ref, "chrT", seed=seed)

    class _Collect:
        def __init__(self):
            self.recs = []

        def add(self, rec):
            self.recs.append(rec)

    col = _Collect()
    sim.simulate(variants, coverage, col, qname_prefix="p")
    reads = []
    for i, rec in enumerate(col.recs):
        reads.append(
            Read(
                qname=rec.qname,
                seq=rec.seq,
                qual=np.asarray(rec.qual, dtype=np.uint8),
                sample_name=f"S{i % 2}",
                sample_index=i % 2,
                tag=4 if i % 2 else 2,
                chrom_index=0,
                start0=rec.pos0,
                mapq=rec.mapq,
                sam_flag=rec.flag,
                insert_size=0,
                is_soft_clipped=False,
                passes_aln_filters=True,
                codes=encode(rec.seq),
                qname_hash=hash_str64(rec.qname),
            )
        )
    return reads


def _snapshot(graph: Graph, comp_ids=None):
    """Node-table snapshot; comp_ids filters to components of interest (the
    fused native path drops failed-anchor components from the table, the
    stepwise path leaves them unpruned — only passing components are
    observable downstream)."""
    table = []
    for nid, node in graph.nodes.items():
        if comp_ids is not None and node.comp_id not in comp_ids:
            continue
        table.append(
            (
                nid,
                node.codes.tobytes(),
                node.sign,
                node.label,
                tuple(int(c) for c in node.counts),
                tuple(node.role_counts),
                tuple(sorted((e.src, e.dst, e.kind) for e in node.edges)),
                node.comp_id,
            )
        )
    return table


def _run(ref_codes, reads, use_native: bool, monkeypatch):
    params = GraphParams(num_samples=2)
    g = Graph(params)
    if use_native:
        # pin the assemble_pass + Python-walks fallback (the node-table
        # oracle below needs materialized nodes; the default fully-native
        # walks path never materializes them — tests/test_native_walks.py
        # covers that path on the ComponentResult surface)
        monkeypatch.setattr(native_core, "assemble_full",
                            lambda *a, **k: None)
    if not use_native:
        monkeypatch.setattr(
            Graph, "_prune_component_native", lambda self, c, k: False
        )
        monkeypatch.setattr(
            Graph, "_assemble_native_k",
            lambda self, rc, rd, k, res: (False, False),
        )
    results = g.build_component_results(ref_codes, reads, "t")
    haps = [
        (p.sequence, p.min_weight())
        for comp in results
        for p in comp.paths
    ]
    if not use_native:
        monkeypatch.undo()
    return haps, g


@pytest.fixture()
def _compare(monkeypatch):
    def run(ref_codes, reads):
        native_haps, g_nat = _run(ref_codes, reads, True, monkeypatch)
        py_haps, g_py = _run(ref_codes, reads, False, monkeypatch)
        assert native_haps == py_haps
        passing = {n.comp_id for n in g_nat.nodes.values()}
        assert _snapshot(g_nat) == _snapshot(g_py, comp_ids=passing)
        return native_haps
    return run


@pytest.mark.parametrize("seed", [3, 17, 42])
def test_prune_parity_on_simulated_windows(seed, _compare):
    rng = np.random.default_rng(seed)
    ref = random_reference(1400, seed=seed)
    pos = int(rng.integers(400, 900))
    alt = "ACGT"[int(rng.integers(0, 4))]
    if ref[pos] == alt:
        alt = "G" if alt != "G" else "T"
    variants = [Variant(pos0=pos, ref=ref[pos], alt=alt, vaf=0.5)]
    if seed % 2:
        ins_pos = pos + 150
        variants.append(
            Variant(pos0=ins_pos, ref=ref[ins_pos], alt=ref[ins_pos] + "TTAC", vaf=0.5)
        )
    reads = _make_reads(ref, variants, seed)
    haps = _compare(encode(ref), reads)
    assert haps, "fixture must assemble at least the REF haplotype"


def test_prune_parity_tip_heavy(_compare):
    """Low coverage + errors => tips and singletons exercise lowcov/tips."""
    ref = random_reference(1200, seed=99)
    variants = [Variant(pos0=600, ref=ref[600:604], alt=ref[600], vaf=0.5)]
    reads = _make_reads(ref, variants, seed=7, coverage=14.0)
    _compare(encode(ref), reads)

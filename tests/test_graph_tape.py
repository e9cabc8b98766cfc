"""Parity: tape-packed BATCHED device graph construction vs numpy.

ops/graph_tape.py packs many windows into fixed-width overlapping tape
rows and builds every window's node/edge tables in one device dispatch.
Per-window results must be bit-identical to Graph._build_graph's numpy
path (ids, counts, roles, signs, labels, edges, ref path) — including
windows of different sizes sharing one batch, and the row-overlap
duplicate-occurrence handling on sequences longer than one tape row.
"""

import numpy as np
import pytest

from lancet2_tpu.base.dna import encode
from lancet2_tpu.cbdg.graph import LABEL_REFERENCE, Graph, GraphParams
from lancet2_tpu.ops.graph_tape import build_graphs_tape
from lancet2_tpu.utils.simulate import ReadSimulator, Variant, structured_reference


def _make_reads(ref_seq, variants, coverage, seed, sample_index, sample_name, tag):
    from lancet2_tpu.cbdg.read import Read

    sim = ReadSimulator(ref_seq, "chrT", seed=seed)

    class _W:
        def __init__(self):
            self.records = []

        def add(self, rec):
            self.records.append(rec)

    w = _W()
    sim.simulate(variants, coverage, w)
    return [Read.from_bam(r, sample_name, tag, sample_index) for r in w.records]


def _window_inputs(ref_codes, reads, k):
    seqs, quals, meta = [], [], []
    if len(ref_codes) >= k + 1:
        seqs.append(np.asarray(ref_codes, np.uint8))
        quals.append(None)
        meta.append((LABEL_REFERENCE, -1, 0, 0))
    for read in reads:
        if not read.passes_aln_filters or len(read.codes) < k + 1:
            continue
        seqs.append(read.codes)
        quals.append(read.qual)
        meta.append((read.tag, read.sample_index, read.tag, read.qname_hash))
    return seqs, quals, meta


def _numpy_table(ref_codes, reads, k):
    g = Graph(GraphParams(num_samples=2, build_backend="numpy"))
    g.curr_k = k
    g._build_graph(ref_codes, reads, k)
    table = {}
    for nid, node in g.nodes.items():
        table[nid] = (
            tuple(node.codes.tolist()), node.sign, node.label,
            tuple(node.counts.tolist()), tuple(node.role_counts),
            tuple(sorted(node.edges)),
        )
    return table, list(g.ref_node_ids), set(g.all_built_ids), list(g.nodes)


def _tape_table(out, seqs, meta, k):
    g = Graph(GraphParams(num_samples=2, build_backend="device"))
    g.curr_k = k
    g._materialize_tape_window(out, seqs, meta, k, 2)
    table = {}
    for nid, node in g.nodes.items():
        table[nid] = (
            tuple(node.codes.tolist()), node.sign, node.label,
            tuple(node.counts.tolist()), tuple(node.role_counts),
            tuple(sorted(node.edges)),
        )
    return table, list(g.ref_node_ids), set(g.all_built_ids), list(g.nodes)


@pytest.fixture(scope="module")
def batch_fixture():
    """Three windows of different sizes/content + one empty-ish window."""
    windows = []
    for wi, (n, seed) in enumerate([(900, 5), (1400, 6), (600, 7)]):
        ref_seq = structured_reference(
            n, [(n // 3, "homopolymer", "A", 8)], seed=seed)
        alt = "G" if ref_seq[n // 2] != "G" else "C"
        som = [Variant(n // 2, ref_seq[n // 2], alt, vaf=0.45)]
        normal = _make_reads(ref_seq, [], 30.0, 40 + wi, 0, "NORMAL", 2)
        tumor = _make_reads(ref_seq, som, 40.0, 50 + wi, 1, "TUMOR", 4)
        windows.append((encode(ref_seq), normal + tumor))
    return windows


class TestTapeBatchedParity:
    @pytest.mark.parametrize("k", [13, 25])
    def test_batched_windows_bit_identical(self, batch_fixture, k):
        inputs = [
            _window_inputs(ref_codes, reads, k)
            for ref_codes, reads in batch_fixture
        ]
        outs = build_graphs_tape(inputs, k, 2)
        assert len(outs) == len(inputs)
        for (ref_codes, reads), out, (seqs, quals, meta) in zip(
            batch_fixture, outs, inputs
        ):
            tn, refn, alln, ordern = _numpy_table(ref_codes, reads, k)
            tt, reft, allt, ordert = _tape_table(out, seqs, meta, k)
            assert refn == reft, "ref path ids differ"
            assert alln == allt, "built id set differs"
            assert set(tn) == set(tt)
            for nid in tn:
                assert tn[nid] == tt[nid], f"node {nid} differs"
            assert ordern == ordert, "materialization order differs"

    def test_long_reference_multi_row(self):
        """A 3 kb ref spans ~20 tape rows: overlap occurrences must not
        double-count and every adjacent pair must produce its edge."""
        k = 13
        ref_seq = structured_reference(3000, [(1500, "str", "AT", 10)], seed=9)
        reads = _make_reads(ref_seq, [], 12.0, 77, 0, "NORMAL", 2)
        ref_codes = encode(ref_seq)
        inputs = [_window_inputs(ref_codes, reads, k)]
        out = build_graphs_tape(inputs, k, 2)[0]
        tn, refn, alln, ordern = _numpy_table(ref_codes, reads, k)
        seqs, quals, meta = inputs[0]
        tt, reft, allt, ordert = _tape_table(out, seqs, meta, k)
        assert refn == reft
        assert alln == allt
        assert tn == tt
        assert ordern == ordert

    def test_empty_batch_entries(self):
        k = 13
        outs = build_graphs_tape([([], [], [])], k, 2)
        assert outs == [None]

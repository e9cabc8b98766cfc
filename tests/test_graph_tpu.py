"""Parity: device (XLA) graph construction vs the numpy reference path.

ops/graph_tpu.py runs canonicalization/sort/EE-filter/MateMer-dedup/
segment-sum on the accelerator; Graph._build_graph_xla must produce
bit-identical node tables (ids, counts, roles, signs, labels, edges) to the
numpy path, and the full pipeline through prune/traversal must yield the
same haplotypes. (Reference budget: Graph::BuildGraph 19.2% CPU,
/root/reference profiling history entry 1.)
"""

import numpy as np
import pytest

from lancet2_tpu.base.dna import encode
from lancet2_tpu.cbdg.graph import Graph, GraphParams
from lancet2_tpu.cbdg.read import Read
from lancet2_tpu.utils.simulate import ReadSimulator, Variant, structured_reference


def _make_reads(ref_seq, variants, coverage, seed, sample_index, sample_name, tag):
    """Simulate reads and adapt them to cbdg.Read objects."""
    sim = ReadSimulator(ref_seq, "chrT", seed=seed)

    class _Writer:
        def __init__(self):
            self.records = []

        def add(self, rec):
            self.records.append(rec)

    w = _Writer()
    sim.simulate(variants, coverage, w)
    reads = []
    for rec in w.records:
        reads.append(Read.from_bam(rec, sample_name, tag, sample_index))
    return reads


@pytest.fixture(scope="module")
def window_fixture():
    ref_seq = structured_reference(1000, [(420, "homopolymer", "A", 9)], seed=5)
    alt = "G" if ref_seq[500] != "G" else "C"
    somatic = [Variant(500, ref_seq[500], alt, vaf=0.45),
               Variant(700, ref_seq[700], ref_seq[700] + "TAC", vaf=0.45)]
    normal = _make_reads(ref_seq, [], 35.0, 21, 0, "NORMAL", 2)
    tumor = _make_reads(ref_seq, somatic, 50.0, 22, 1, "TUMOR", 4)
    return ref_seq, normal + tumor


def _node_table(graph):
    out = {}
    for nid, node in graph.nodes.items():
        out[nid] = (
            tuple(node.codes.tolist()),
            node.sign,
            node.label,
            tuple(node.counts.tolist()),
            tuple(node.role_counts),
            tuple(sorted(node.edges)),
        )
    return out


class TestDeviceGraphParity:
    @pytest.mark.parametrize("k", [13, 19, 25])
    def test_node_tables_bit_identical(self, window_fixture, k):
        ref_seq, reads = window_fixture
        ref_codes = encode(ref_seq)
        tables = {}
        for backend in ("numpy", "device"):
            g = Graph(GraphParams(num_samples=2, build_backend=backend))
            g.curr_k = k
            g._build_graph(ref_codes, reads, k)
            tables[backend] = (_node_table(g), list(g.ref_node_ids),
                               set(g.all_built_ids))
        assert tables["numpy"][1] == tables["device"][1], "ref path ids differ"
        assert tables["numpy"][2] == tables["device"][2], "built id sets differ"
        tn, td = tables["numpy"][0], tables["device"][0]
        assert set(tn) == set(td), (
            f"node id sets differ: only-numpy={len(set(tn)-set(td))} "
            f"only-device={len(set(td)-set(tn))}"
        )
        for nid in tn:
            assert tn[nid] == td[nid], f"node {nid} differs: {tn[nid]} vs {td[nid]}"

    def test_full_component_results_identical(self, window_fixture):
        ref_seq, reads = window_fixture
        ref_codes = encode(ref_seq)
        haps = {}
        for backend in ("numpy", "device"):
            g = Graph(GraphParams(num_samples=2, build_backend=backend))
            comps = g.build_component_results(ref_codes, reads, "parity")
            haps[backend] = [tuple(c.haplotype_sequences()) for c in comps]
        assert haps["numpy"] == haps["device"]
        assert any(len(h) > 1 for h in haps["numpy"]), "fixture produced no ALTs"

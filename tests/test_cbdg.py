"""cbdg-layer tests: kmer canonicalization, graph assembly, walk enumeration."""

import numpy as np
import pytest

from lancet2_tpu.base import dna
from lancet2_tpu.cbdg import Graph, GraphParams, LABEL_CASE, LABEL_CTRL
from lancet2_tpu.cbdg import kmer as km
from lancet2_tpu.cbdg.read import Read
from lancet2_tpu.utils.simulate import random_reference


def _mk_read(seq: str, sample_index: int, tag: int, qname: str, qual: int = 35) -> Read:
    from lancet2_tpu.base.hashing import hash_str64

    return Read(
        qname=qname,
        seq=seq,
        qual=np.full(len(seq), qual, dtype=np.uint8),
        sample_name="S%d" % sample_index,
        sample_index=sample_index,
        tag=tag,
        chrom_index=0,
        start0=0,
        mapq=60,
        sam_flag=0,
        insert_size=0,
        is_soft_clipped=False,
        passes_aln_filters=True,
        codes=dna.encode(seq),
        qname_hash=hash_str64(qname),
    )


def _reads_from_seq(hap: str, read_len: int, step: int, sample_index: int, tag: int, prefix: str):
    """Tile overlapping error-free reads over a haplotype."""
    out = []
    i = 0
    pos = 0
    while pos + read_len <= len(hap):
        out.append(_mk_read(hap[pos : pos + read_len], sample_index, tag, f"{prefix}{i}"))
        i += 1
        pos += step
    # ensure final suffix covered
    if pos < len(hap) and len(hap) >= read_len:
        out.append(_mk_read(hap[-read_len:], sample_index, tag, f"{prefix}{i}"))
    return out


class TestKmer:
    def test_kind_roundtrip(self):
        assert km.make_kind(km.PLUS, km.PLUS) == km.PP
        assert km.make_kind(km.PLUS, km.MINUS) == km.PM
        assert km.rev_kind(km.PP) == km.MM
        assert km.rev_kind(km.MM) == km.PP
        assert km.rev_kind(km.PM) == km.PM
        assert km.rev_kind(km.MP) == km.MP

    def test_canonicalize(self):
        fwd = dna.encode("AACGT")
        canon, signs = km.canonicalize_batch(np.stack([fwd, dna.revcomp_codes(fwd)]))
        assert dna.decode(canon[0]) == "AACGT"
        assert dna.decode(canon[1]) == "AACGT"
        assert signs[0] == km.PLUS and signs[1] == km.MINUS

    def test_canonicalize_palindrome(self):
        pal = dna.encode("ACGT")
        canon, signs = km.canonicalize_batch(pal[None, :])
        assert signs[0] == km.PLUS

    def test_ids_strand_invariant(self):
        fwd = dna.encode("GGATCCA")
        canon, _ = km.canonicalize_batch(np.stack([fwd, dna.revcomp_codes(fwd)]))
        ids = km.kmer_ids(canon)
        assert ids[0] == ids[1]

    def test_merge_codes_pp(self):
        # PP: append non-overlap suffix of k2
        k1 = dna.encode("ACCGG")
        k2 = dna.encode("CCGGT")  # overlap k-1=4
        merged = km.merge_codes(k1, k2, km.PP, 5)
        assert dna.decode(merged) == "ACCGGT"

    def test_merge_codes_mm(self):
        k1 = dna.encode("CCGGT")
        k2 = dna.encode("ACCGG")
        merged = km.merge_codes(k1, k2, km.MM, 5)
        assert dna.decode(merged) == "ACCGGT"


def _assemble(ref_seq: str, reads, num_samples=1, **kw):
    params = GraphParams(num_samples=num_samples, **kw)
    graph = Graph(params)
    return graph.build_component_results(dna.encode(ref_seq), reads), graph


class TestGraphAssembly:
    def test_ref_only_no_haplotypes(self):
        ref = random_reference(400, seed=21)
        reads = _reads_from_seq(ref, 100, 10, 0, LABEL_CTRL, "r")
        results, graph = _assemble(ref, reads)
        # Only the ref path exists -> every walk equals the ref anchor -> no ALTs
        total_alts = sum(r.num_alt_haplotypes for r in results)
        assert total_alts == 0

    def test_het_snv_assembles_alt_haplotype(self):
        ref = random_reference(500, seed=22)
        alt_hap = ref[:250] + ("C" if ref[250] != "C" else "G") + ref[251:]
        reads = []
        reads += _reads_from_seq(ref, 100, 12, 0, LABEL_CTRL, "ref")
        reads += _reads_from_seq(alt_hap, 100, 12, 0, LABEL_CTRL, "alt")
        results, graph = _assemble(ref, reads)
        assert len(results) == 1
        comp = results[0]
        assert comp.num_alt_haplotypes >= 1
        seqs = comp.haplotype_sequences()
        ref_anchor = seqs[0]
        # anchor is a substring of ref containing the variant site
        assert ref_anchor in ref
        start = ref.find(ref_anchor)
        assert start <= 250 < start + len(ref_anchor)
        # the alt haplotype should be the anchor with the SNV applied
        expected_alt = alt_hap[start : start + len(ref_anchor)]
        assert expected_alt in seqs[1:]

    def test_deletion_assembles(self):
        ref = random_reference(600, seed=23)
        alt_hap = ref[:300] + ref[310:]  # 10bp deletion
        reads = _reads_from_seq(ref, 110, 11, 0, LABEL_CTRL, "r") + _reads_from_seq(
            alt_hap, 110, 11, 0, LABEL_CTRL, "a"
        )
        results, graph = _assemble(ref, reads)
        assert results, "expected a component"
        seqs = results[0].haplotype_sequences()
        start = ref.find(seqs[0])
        expected_alt = None
        # the deletion haplotype restricted to the anchor span
        anchor_end = start + len(seqs[0])
        if start <= 300 and anchor_end >= 310:
            expected_alt = ref[start:300] + ref[310:anchor_end]
        assert expected_alt is not None
        assert expected_alt in seqs[1:]

    def test_somatic_only_in_case_color(self):
        ref = random_reference(500, seed=24)
        pos = 260
        alt_hap = ref[:pos] + ("A" if ref[pos] != "A" else "T") + ref[pos + 1 :]
        reads = []
        reads += _reads_from_seq(ref, 100, 10, 0, LABEL_CTRL, "n")  # normal: ref only
        reads += _reads_from_seq(ref, 100, 10, 1, LABEL_CASE, "t")  # tumor ref reads
        reads += _reads_from_seq(alt_hap, 100, 10, 1, LABEL_CASE, "ta")  # tumor alt
        results, graph = _assemble(ref, reads, num_samples=2)
        assert results
        seqs = results[0].haplotype_sequences()
        start = ref.find(seqs[0])
        expected_alt = alt_hap[start : start + len(seqs[0])]
        assert expected_alt in seqs[1:]

    def test_min_weight_ordering_and_dedup(self):
        ref = random_reference(500, seed=25)
        alt_hap = ref[:250] + ("C" if ref[250] != "C" else "G") + ref[251:]
        reads = _reads_from_seq(ref, 100, 8, 0, LABEL_CTRL, "r") + _reads_from_seq(
            alt_hap, 100, 8, 0, LABEL_CTRL, "a"
        )
        results, _ = _assemble(ref, reads)
        comp = results[0]
        seqs = comp.haplotype_sequences()
        assert len(set(seqs)) == len(seqs)  # dedup holds
        # path 0 is the ref anchor with per-base weights
        w = comp.haplotype_weights()
        assert len(w[0]) == len(seqs[0])
        assert all(len(wi) == len(si) for wi, si in zip(w, seqs))

    def test_low_coverage_window_yields_nothing(self):
        ref = random_reference(400, seed=26)
        # 2 reads only -> anchors never reach min_anchor_cov=5
        reads = _reads_from_seq(ref, 100, 300, 0, LABEL_CTRL, "r")[:2]
        results, _ = _assemble(ref, reads)
        assert results == []

    def test_error_kmers_pruned(self):
        ref = random_reference(500, seed=27)
        reads = _reads_from_seq(ref, 100, 10, 0, LABEL_CTRL, "r")
        # one singleton read with an error in the middle
        noisy = ref[200:300]
        noisy = noisy[:50] + ("A" if noisy[50] != "A" else "C") + noisy[51:]
        reads.append(_mk_read(noisy, 0, LABEL_CTRL, "noise"))
        results, _ = _assemble(ref, reads)
        total_alts = sum(r.num_alt_haplotypes for r in results)
        assert total_alts == 0  # singleton error branch pruned

    def test_complexity_metrics_populated(self):
        ref = random_reference(500, seed=28)
        alt_hap = ref[:250] + ("C" if ref[250] != "C" else "G") + ref[251:]
        reads = _reads_from_seq(ref, 100, 10, 0, LABEL_CTRL, "r") + _reads_from_seq(
            alt_hap, 100, 10, 0, LABEL_CTRL, "a"
        )
        results, _ = _assemble(ref, reads)
        m = results[0].metrics
        # a single clean bubble: CC==1, two branch points
        assert m.cyclomatic_complexity == 1
        assert m.num_branch_points == 2
        assert not m.is_complex
        assert m.graph_entanglement_index() >= 0.0

    def test_determinism(self):
        ref = random_reference(500, seed=29)
        alt_hap = ref[:250] + ("C" if ref[250] != "C" else "G") + ref[251:]
        reads = _reads_from_seq(ref, 100, 9, 0, LABEL_CTRL, "r") + _reads_from_seq(
            alt_hap, 100, 9, 0, LABEL_CTRL, "a"
        )
        r1, _ = _assemble(ref, reads)
        r2, _ = _assemble(ref, reads)
        assert [c.haplotype_sequences() for c in r1] == [c.haplotype_sequences() for c in r2]

"""Quantify the two deliberate semantic divergences from the reference.

1. Mapability gate: the reference's minimap2 returns NO HIT for unalignable
   reads (no seed chain, reference: src/lancet/caller/genotyper.cpp:376-411);
   our batched DP always produces a best-effort alignment and stands in a
   minimum-score gate (score >= min_score_frac * read_len). These tests
   sweep the gate and pin the contract: garbage reads contribute zero
   evidence at every gate value, clean-read allele assignments are
   invariant to the gate, and a half-clipped read either drops out or
   contributes its TRUE allele — the gate never flips an assignment.

2. Weighted MSA: the reference feeds per-base path weights into SPOA
   (reference: src/lancet/caller/msa_builder.h:72-101); our pseudo-MSA
   projects pairwise unweighted ALT->REF alignments. Weights shape the POA
   graph topology, whose observable effect is gap PLACEMENT consistency
   across haplotypes in repeat-adjacent bubbles (inconsistent placement
   would split one variant into several or mis-position it). These tests
   sweep repeat contexts and assert the extraction invariants that weighted
   SPOA guarantees: a shared indel extracts as ONE variant at ONE
   normalized position from every carrying haplotype, with correct
   per-haplotype local starts.
"""

from __future__ import annotations

import numpy as np
import pytest

from lancet2_tpu.base.dna import encode
from lancet2_tpu.base.hashing import hash_str64
from lancet2_tpu.caller.extractor import build_pseudo_msa, extract_variants
from lancet2_tpu.caller.genotyper import Genotyper
from lancet2_tpu.cbdg.read import Read
from lancet2_tpu.utils.simulate import random_reference


def _read(name: str, seq: str, start0: int, sample: str = "TUMOR") -> Read:
    return Read(
        qname=name,
        seq=seq,
        qual=np.full(len(seq), 35, dtype=np.uint8),
        sample_name=sample,
        sample_index=0,
        tag=4,
        chrom_index=0,
        start0=start0,
        mapq=60,
        sam_flag=0,
        insert_size=150,
        is_soft_clipped=False,
        passes_aln_filters=True,
        codes=encode(seq),
        qname_hash=hash_str64(name),
    )


@pytest.fixture(scope="module")
def snv_component():
    """REF anchor + one ALT haplotype with a SNV at offset 150."""
    ref_hap = random_reference(300, seed=21)
    alt_base = "A" if ref_hap[150] != "A" else "C"
    alt_hap = ref_hap[:150] + alt_base + ref_hap[151:]
    variants = extract_variants(
        build_pseudo_msa(ref_hap, [alt_hap]), 0, "chrT", 1001
    )
    assert len(variants) == 1
    return ref_hap, alt_hap, variants


class TestMapabilityGateSweep:
    """min_score_frac sweep (reference contract: genotyper.cpp:376-411)."""

    GATES = (0.15, 0.25, 0.40)

    def _genotype(self, fixture, reads, gate):
        ref_hap, alt_hap, variants = fixture
        g = Genotyper(backend="evidence", min_score_frac=gate)
        return g.genotype([ref_hap, alt_hap], reads, variants)

    def _clean_reads(self, fixture):
        ref_hap, alt_hap, _ = fixture
        reads = []
        for i, off in enumerate((60, 100, 130, 149)):
            reads.append(_read(f"ref{i}", ref_hap[off : off + 101], off))
            reads.append(_read(f"alt{i}", alt_hap[off : off + 101], off))
        return reads

    def test_garbage_reads_never_contribute(self, snv_component):
        """Random-sequence reads (minimap2: no seed chain -> no hit) must be
        gated out of the evidence table at EVERY gate value."""
        clean = self._clean_reads(snv_component)
        garbage = [
            _read(f"junk{i}", random_reference(101, seed=500 + i), 100)
            for i in range(4)
        ]
        for gate in self.GATES:
            with_junk = self._genotype(snv_component, clean + garbage, gate)
            without = self._genotype(snv_component, clean, gate)
            assert set(with_junk) == set(without)
            for vi in without:
                for sample in without[vi]:
                    a = without[vi][sample]
                    b = with_junk[vi][sample]
                    assert [d.name_hashes for d in a.allele_data] == [
                        d.name_hashes for d in b.allele_data
                    ], f"garbage read leaked evidence at gate {gate}"

    def test_clean_assignments_invariant_to_gate(self, snv_component):
        """Well-mapped reads' allele assignments must not depend on the
        gate value (the gate only mimics minimap2's no-hit behavior)."""
        clean = self._clean_reads(snv_component)
        tables = []
        for gate in self.GATES:
            geno = self._genotype(snv_component, clean, gate)
            table = {}
            for vi, supports in geno.items():
                for sample, sup in supports.items():
                    for allele, d in enumerate(sup.allele_data):
                        for h in d.name_hashes:
                            table[h] = allele
            tables.append(table)
        assert tables[0], "clean reads must produce evidence"
        assert tables[0] == tables[1] == tables[2]
        # and the assignments are correct: alt reads overlapping the SNV
        # carry allele 1, ref reads allele 0
        ref_hap, alt_hap, _ = snv_component
        for i, off in enumerate((60, 100, 130, 149)):
            h_ref = hash_str64(f"ref{i}") & 0xFFFFFFFF
            h_alt = hash_str64(f"alt{i}") & 0xFFFFFFFF
            assert tables[0][h_ref] == 0
            assert tables[0][h_alt] == 1

    def test_half_clipped_read_never_flips_allele(self, snv_component):
        """A read whose tail is garbage (soft-clip surrogate) may pass or
        fail the gate depending on the threshold, but whenever it passes it
        must be assigned its TRUE allele — the gate sweeps must never
        produce contradictory assignments."""
        ref_hap, alt_hap, _ = snv_component
        true_half = alt_hap[100:151]  # 51bp ending at the SNV
        clipped = _read("clip0", true_half + random_reference(50, seed=901), 100)
        clean = self._clean_reads(snv_component)
        h_clip = hash_str64("clip0") & 0xFFFFFFFF
        seen = {}
        for gate in self.GATES:
            geno = self._genotype(snv_component, clean + [clipped], gate)
            for vi, supports in geno.items():
                for sample, sup in supports.items():
                    for allele, d in enumerate(sup.allele_data):
                        if h_clip in d.name_hashes:
                            seen[gate] = allele
        assigned = set(seen.values())
        assert assigned <= {1}, (
            f"clipped ALT read mis-assigned across gates: {seen}"
        )


class TestRepeatAdjacentMsaPlacement:
    """Pseudo-MSA bubble invariants in repeat context (reference contract:
    weighted SPOA keeps equivalent gaps in consistent columns,
    msa_builder.h:72-101). If these ever fail, per-base path weights must
    be consumed by the MSA step."""

    @pytest.mark.parametrize("unit,copies", [("T", 8), ("AC", 5), ("CAG", 4)])
    def test_shared_deletion_extracts_once_across_haplotypes(self, unit, copies):
        """Two ALT haplotypes carry the SAME one-unit deletion inside a
        tandem repeat; one also carries a distant SNV. The deletion must
        extract as a single normalized (pos, REF, ALT) from both rows."""
        left = random_reference(80, seed=31)
        right = random_reference(80, seed=32)
        if left[-1] == unit[0]:  # keep the repeat boundary unambiguous
            left = left[:-1] + ("G" if unit[0] != "G" else "C")
        if right[0] == unit[-1]:
            right = ("G" if unit[-1] != "G" else "C") + right[1:]
        tract = unit * copies
        ref_hap = left + tract + right
        del_hap = left + unit * (copies - 1) + right
        snv_pos = 20
        snv_base = "A" if left[snv_pos] != "A" else "G"
        del_snv_hap = (left[:snv_pos] + snv_base + left[snv_pos + 1:]
                       + unit * (copies - 1) + right)

        variants = extract_variants(
            build_pseudo_msa(ref_hap, [del_hap, del_snv_hap]), 0, "chrT", 5001
        )
        dels = [v for v in variants
                if any(len(a.sequence) < len(v.ref_allele) for a in v.alts)]
        assert len(dels) == 1, (
            f"{unit}x{copies}: shared repeat deletion extracted "
            f"{len(dels)} times: "
            f"{[(v.genome_pos1, v.ref_allele, [a.sequence for a in v.alts]) for v in variants]}"
        )
        d = dels[0]
        assert len(d.alts) == 1, "both haplotypes must group into one ALT"
        carriers = set(d.alts[0].local_hap_starts)
        assert carriers == {1, 2}, (
            f"deletion must be attributed to both haplotypes, got {carriers}"
        )
        # normalized placement is unique: REF/ALT differ by one unit
        assert len(d.ref_allele) - len(d.alts[0].sequence) == len(unit)
        # the SNV extracts separately, attributed only to hap 2
        snvs = [v for v in variants
                if all(len(a.sequence) == len(v.ref_allele) == 1 for a in v.alts)]
        assert len(snvs) == 1
        assert set(snvs[0].alts[0].local_hap_starts) == {2}

    @pytest.mark.parametrize("unit,copies", [("T", 6), ("AC", 4)])
    def test_shared_insertion_placement_consistent(self, unit, copies):
        left = random_reference(70, seed=41)
        right = random_reference(70, seed=42)
        if left[-1] == unit[0]:
            left = left[:-1] + ("G" if unit[0] != "G" else "C")
        if right[0] == unit[-1]:
            right = ("G" if unit[-1] != "G" else "C") + right[1:]
        ref_hap = left + unit * copies + right
        ins_hap = left + unit * (copies + 1) + right
        snv_pos = 15
        snv_base = "T" if left[snv_pos] != "T" else "A"
        ins_snv_hap = (left[:snv_pos] + snv_base + left[snv_pos + 1:]
                       + unit * (copies + 1) + right)

        variants = extract_variants(
            build_pseudo_msa(ref_hap, [ins_hap, ins_snv_hap]), 0, "chrT", 9001
        )
        inss = [v for v in variants
                if any(len(a.sequence) > len(v.ref_allele) for a in v.alts)]
        assert len(inss) == 1, (
            f"{unit}x{copies}: shared repeat insertion extracted "
            f"{len(inss)} times"
        )
        ins = inss[0]
        assert len(ins.alts) == 1
        assert set(ins.alts[0].local_hap_starts) == {1, 2}
        assert len(ins.alts[0].sequence) - len(ins.ref_allele) == len(unit)

    def test_equivalent_gap_positions_normalize_identically(self):
        """The same physical deletion presented via haplotypes built from
        different (but sequence-identical) repeat decompositions must
        normalize to one representation — placement is decided by the
        aligner+parsimony, not by haplotype construction order."""
        left = random_reference(60, seed=51)
        right = random_reference(60, seed=52)
        if left[-1] == "A":
            left = left[:-1] + "G"
        if right[0] == "A":
            right = "C" + right[1:]
        ref_hap = left + "A" * 9 + right
        hap = left + "A" * 7 + right  # 2bp deletion in the homopolymer
        v1 = extract_variants(build_pseudo_msa(ref_hap, [hap]), 0, "c", 100)
        v2 = extract_variants(build_pseudo_msa(ref_hap, [hap, hap]), 0, "c", 100)
        assert len(v1) == 1 and len(v2) == 1
        assert (v1[0].genome_pos1, v1[0].ref_allele,
                [a.sequence for a in v1[0].alts]) == (
            v2[0].genome_pos1, v2[0].ref_allele,
            [a.sequence for a in v2[0].alts]
        )

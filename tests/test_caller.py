"""Caller-layer tests: extraction, likelihoods, support features, VCF records."""

import math

import numpy as np
import pytest

from lancet2_tpu.base.sequence_complexity import (
    SequenceComplexityScorer,
    format_complexity_score,
    max_homopolymer_run,
    local_shannon_entropy,
)
from lancet2_tpu.caller.extractor import extract_component_variants
from lancet2_tpu.caller.genotyper import Genotyper
from lancet2_tpu.caller.likelihood import (
    compute_continuous_mixture_lods,
    compute_genotype_pls,
    compute_genotype_quality,
    genotype_from_pl_index,
)
from lancet2_tpu.caller.support import ReadEvidence, VariantSupport
from lancet2_tpu.caller.variant import (
    TYPE_DEL,
    TYPE_INS,
    TYPE_MNP,
    TYPE_SNV,
    classify_variant,
)
from lancet2_tpu.caller.variant_call import SampleSummary, VariantCall
from lancet2_tpu.cbdg.read import LABEL_CASE, LABEL_CTRL
from lancet2_tpu.utils.simulate import random_reference


class TestClassify:
    def test_basic(self):
        assert classify_variant("A", "C") == TYPE_SNV
        assert classify_variant("A", "ACGT") == TYPE_INS
        assert classify_variant("ACGT", "A") == TYPE_DEL
        assert classify_variant("ATGC", "ACCC") == TYPE_MNP

    def test_shielded_multiallelic_core(self):
        # REF "ATGC" vs ALT "AT" squeezes to pure DEL despite padding
        assert classify_variant("ATGC", "AT") == TYPE_DEL


class TestExtractor:
    def _ref(self, n=400, seed=33):
        return random_reference(n, seed=seed)

    def test_snv(self):
        ref = self._ref()
        pos = 200
        alt_base = "C" if ref[pos] != "C" else "G"
        alt_hap = ref[:pos] + alt_base + ref[pos + 1 :]
        variants = extract_component_variants([ref, alt_hap], 0, "chr1", 1001)
        assert len(variants) == 1
        v = variants[0]
        assert v.genome_pos1 == 1001 + pos
        assert v.ref_allele == ref[pos]
        assert [a.sequence for a in v.alts] == [alt_base]
        assert v.alts[0].vtype == TYPE_SNV
        assert v.alts[0].local_hap_starts == {1: pos}

    def test_deletion(self):
        ref = self._ref()
        alt_hap = ref[:150] + ref[160:]  # delete ref[150:160]
        variants = extract_component_variants([ref, alt_hap], 0, "chr1", 1)
        assert len(variants) == 1
        v = variants[0]
        assert v.alts[0].vtype == TYPE_DEL
        assert v.alts[0].length == -10
        # anchored: REF allele = anchor + deleted bases
        assert len(v.ref_allele) == 11
        assert len(v.alts[0].sequence) == 1
        assert v.ref_allele[0] == v.alts[0].sequence[0]
        # position points at the anchor base before the deleted span
        anchor_pos0 = v.genome_pos1 - 1
        assert ref[anchor_pos0 + 1 : anchor_pos0 + 11] == v.ref_allele[1:]

    def test_insertion(self):
        ref = self._ref()
        ins = "GTCA"
        alt_hap = ref[:220] + ins + ref[220:]
        variants = extract_component_variants([ref, alt_hap], 0, "chr1", 1)
        assert len(variants) == 1
        v = variants[0]
        assert v.alts[0].vtype == TYPE_INS
        assert v.alts[0].length == 4
        assert len(v.ref_allele) == 1
        assert v.alts[0].sequence[1:] == ins or v.alts[0].sequence  # left-shift may rotate motif
        assert len(v.alts[0].sequence) == 5

    def test_multiallelic_snv(self):
        ref = self._ref()
        pos = 180
        bases = [b for b in "ACGT" if b != ref[pos]]
        hap1 = ref[:pos] + bases[0] + ref[pos + 1 :]
        hap2 = ref[:pos] + bases[1] + ref[pos + 1 :]
        variants = extract_component_variants([ref, hap1, hap2], 0, "chr1", 1)
        assert len(variants) == 1
        v = variants[0]
        assert sorted(a.sequence for a in v.alts) == sorted(bases[:2])
        # deterministic lexicographic ALT order
        assert [a.sequence for a in v.alts] == sorted(a.sequence for a in v.alts)
        # each ALT maps to its haplotype
        hap_map = {a.sequence: list(a.local_hap_starts) for a in v.alts}
        assert hap_map[bases[0]] == [1] and hap_map[bases[1]] == [2]

    def test_two_separate_snvs(self):
        ref = self._ref()
        p1, p2 = 120, 300
        b1 = "A" if ref[p1] != "A" else "T"
        b2 = "A" if ref[p2] != "A" else "T"
        alt_hap = ref[:p1] + b1 + ref[p1 + 1 : p2] + b2 + ref[p2 + 1 :]
        variants = extract_component_variants([ref, alt_hap], 0, "chr1", 1)
        assert len(variants) == 2
        assert variants[0].genome_pos1 == 1 + p1
        assert variants[1].genome_pos1 == 1 + p2

    def test_identical_hap_no_variants(self):
        ref = self._ref()
        assert extract_component_variants([ref, ref], 0, "chr1", 1) == []


class TestLikelihood:
    def test_hom_ref(self):
        pls = compute_genotype_pls([30, 0])
        assert list(pls)[0] == 0
        assert pls[1] > 50 and pls[2] > pls[1]

    def test_het(self):
        pls = compute_genotype_pls([15, 14])
        assert int(np.argmin(pls)) == 1
        assert genotype_from_pl_index(1) == (0, 1)

    def test_hom_alt(self):
        pls = compute_genotype_pls([0, 40])
        assert int(np.argmin(pls)) == 2
        assert genotype_from_pl_index(2) == (1, 1)

    def test_multiallelic_shape(self):
        pls = compute_genotype_pls([10, 10, 10])
        assert pls.size == 6  # K(K+1)/2 for K=3
        assert genotype_from_pl_index(4) == (1, 2)

    def test_gq(self):
        assert compute_genotype_quality(np.array([0, 40, 200], dtype=np.uint32)) == 40
        assert compute_genotype_quality(np.array([0, 2000], dtype=np.uint32)) == 99

    def test_overdispersion_plateau(self):
        # PLs should grow sublinearly with depth (DM tail absorbs depth)
        pl_low = compute_genotype_pls([30, 15])[0]
        pl_high = compute_genotype_pls([300, 150])[0]
        assert pl_high < 10 * pl_low

    def test_cmlod_direction(self):
        high_alt = [np.full(0, 0), np.full(20, 35)]
        low_alt = [np.full(0, 0), np.full(2, 35)]
        lod_hi = compute_continuous_mixture_lods(
            [np.zeros(0, np.int64), np.full(20, 35, np.int64)], [0, 20]
        )
        lod_lo = compute_continuous_mixture_lods(
            [np.full(18, 35, np.int64), np.full(2, 35, np.int64)], [18, 2]
        )
        assert lod_hi[1] > lod_lo[1] > 0


def _mk_evidence(allele, strand=0, bq=35, mq=60, rname=0, **kw):
    base = dict(
        insert_size=300,
        alignment_start=100,
        aln_score=100.0,
        folded_read_pos=0.3,
        rname_hash=rname,
        ref_nm=0 if allele == 0 else 1,
        own_hap_nm=0,
        assigned_haplotype_id=allele,
        allele=allele,
        strand=strand,
        base_qual=bq,
        map_qual=mq,
        is_soft_clipped=False,
        is_proper_pair=True,
    )
    base.update(kw)
    return ReadEvidence(**base)


class TestSupport:
    def test_dedup_by_rname(self):
        sup = VariantSupport()
        sup.add_evidence(_mk_evidence(1, rname=7))
        sup.add_evidence(_mk_evidence(1, rname=7, strand=1))  # same fragment
        assert sup.total_allele_cov(1) == 1

    def test_counts_and_sb(self):
        sup = VariantSupport()
        for i in range(10):
            sup.add_evidence(_mk_evidence(0, strand=i % 2, rname=i))
        for i in range(6):
            sup.add_evidence(_mk_evidence(1, strand=i % 2, rname=100 + i))
        assert sup.total_ref_cov() == 10
        assert sup.total_alt_cov() == 6
        assert abs(sup.strand_bias_log_or()) < 0.5  # balanced strands

    def test_one_sided_strand_bias(self):
        sup = VariantSupport()
        for i in range(10):
            sup.add_evidence(_mk_evidence(0, strand=i % 2, rname=i))
        for i in range(8):
            sup.add_evidence(_mk_evidence(1, strand=0, rname=100 + i))  # all fwd
        assert sup.strand_bias_log_or() < -1.0

    def test_mwu_features_none_when_no_alt(self):
        sup = VariantSupport()
        for i in range(5):
            sup.add_evidence(_mk_evidence(0, rname=i))
        assert sup.mapping_qual_cohen_d() is None
        assert sup.base_qual_cohen_d() is None

    def test_fsse_uniform_high(self):
        sup = VariantSupport()
        for i in range(12):
            sup.add_evidence(_mk_evidence(1, rname=i, alignment_start=100 + 9 * i))
        fsse = sup.compute_fsse()
        assert fsse is not None and fsse > 0.8

    def test_fsse_jackpot_low(self):
        sup = VariantSupport()
        for i in range(12):
            sup.add_evidence(_mk_evidence(1, rname=i, alignment_start=100))
        assert sup.compute_fsse() == 0.0

    def test_hse(self):
        sup = VariantSupport()
        for i in range(9):
            sup.add_evidence(_mk_evidence(1, rname=i, assigned_haplotype_id=1))
        hse = sup.compute_hse(3)
        assert hse == 0.0  # perfectly concentrated on one path
        sup2 = VariantSupport()
        for i in range(9):
            sup2.add_evidence(_mk_evidence(1, rname=i, assigned_haplotype_id=i % 3))
        assert sup2.compute_hse(3) > 0.9


class TestSeqComplexity:
    def test_hrun_entropy(self):
        assert max_homopolymer_run("AAAATGC") == 4
        assert local_shannon_entropy("AAAA") == 0.0
        assert local_shannon_entropy("ACGT") == pytest.approx(2.0)

    def test_format(self):
        assert format_complexity_score(1.5) == "1.5"
        assert format_complexity_score(2.0) == "2"
        assert format_complexity_score(0.123456) == "0.123"

    def test_scorer_homopolymer_context(self):
        scorer = SequenceComplexityScorer()
        ref = "ACGTC" + "A" * 12 + "GTCAGTACGATCGT" * 4
        cplx = scorer.score(ref, 10, 1, ref[:10] + "T" + ref[11:], 10, 1)
        assert cplx.context_hrun >= 10
        assert cplx.tr_period >= 1  # poly-A is a period-1 TR

    def test_delta_hrun_extension(self):
        scorer = SequenceComplexityScorer()
        ref = "GTCATCGGAT" + "AAAA" + "CGTACGTGCA"
        # variant turns the C before AAAA into A -> extends homopolymer
        alt = "GTCATCGGA" + "TAAAAA"[1:] + "CGTACGTGCA"
        cplx = scorer.score(ref, 9, 1, "GTCATCGGA" + "A" + "AAAACGTACGTGCA", 9, 1)
        assert cplx.delta_hrun >= 1


class TestVariantCallRecord:
    def _call(self, case_ctrl=True):
        from lancet2_tpu.caller.variant import AltAllele, RawVariant
        from lancet2_tpu.base.sequence_complexity import SequenceComplexity

        var = RawVariant(
            chrom_index=0, chrom_name="chr1", genome_pos1=1234,
            local_ref_start0=100, ref_allele="A",
        )
        var.alts.append(AltAllele(sequence="C", vtype=TYPE_SNV, length=1,
                                  local_hap_starts={1: 100}))
        var.seq_cx = SequenceComplexity()
        var.num_total_haps = 2
        var.max_path_cv = 0.1

        supports = {}
        s_t = VariantSupport()
        for i in range(12):
            s_t.add_evidence(_mk_evidence(0, strand=i % 2, rname=i))
        for i in range(8):
            s_t.add_evidence(_mk_evidence(1, strand=i % 2, rname=50 + i))
        supports["TUMOR"] = s_t
        s_n = VariantSupport()
        for i in range(15):
            s_n.add_evidence(_mk_evidence(0, strand=i % 2, rname=i))
        supports["NORMAL"] = s_n

        samples = [
            SampleSummary("NORMAL", LABEL_CTRL, sampled_bases=40000, window_length=1000),
            SampleSummary("TUMOR", LABEL_CASE, sampled_bases=60000, window_length=1000),
        ]
        return VariantCall(var, supports, samples, 1000)

    def test_record_shape(self):
        call = self._call()
        rec = call.as_vcf_record()
        cols = rec.split("\t")
        assert len(cols) == 11  # 9 fixed + 2 samples
        assert cols[0] == "chr1" and cols[1] == "1234"
        assert cols[3] == "A" and cols[4] == "C"
        fmt_keys = cols[8].split(":")
        assert len(fmt_keys) == 24
        for sample_col in cols[9:]:
            assert len(sample_col.split(":")) == 24

    def test_somatic_state_and_qual(self):
        call = self._call()
        assert "CASE" in call.info_field
        assert call.site_quality > 1.0  # SOLOR positive for tumor-only alt
        assert call.has_alt_support

    def test_genotypes(self):
        call = self._call()
        cols = call.as_vcf_record().split("\t")
        normal_gt = cols[9].split(":")[0]
        tumor_gt = cols[10].split(":")[0]
        assert normal_gt == "0/0"
        assert tumor_gt == "0/1"


class TestGenotyperEndToEnd:
    def test_snv_allele_assignment(self):
        from tests.test_cbdg import _reads_from_seq

        ref = random_reference(400, seed=55)
        pos = 200
        alt_base = "C" if ref[pos] != "C" else "G"
        alt_hap = ref[:pos] + alt_base + ref[pos + 1 :]
        variants = extract_component_variants([ref, alt_hap], 0, "chr1", 1)
        assert len(variants) == 1

        ref_reads = _reads_from_seq(ref, 100, 15, 0, LABEL_CTRL, "r")
        alt_reads = _reads_from_seq(alt_hap, 100, 15, 0, LABEL_CTRL, "a")
        geno = Genotyper()
        result = geno.genotype([ref, alt_hap], ref_reads + alt_reads, variants)
        assert 0 in result
        support = result[0]["S0"]
        ref_cov = support.total_ref_cov()
        alt_cov = support.total_alt_cov()
        assert alt_cov > 0 and ref_cov > 0
        # reads tile the haplotype at step 15; reads with start in
        # (pos-100, pos] overlap the variant — no allele bleeding expected
        # for error-free reads
        exp_alt = sum(1 for i in range(len(alt_reads)) if i * 15 <= pos < i * 15 + 100)
        exp_ref = sum(1 for i in range(len(ref_reads)) if i * 15 <= pos < i * 15 + 100)
        assert abs(alt_cov - exp_alt) <= 1
        assert abs(ref_cov - exp_ref) <= 1

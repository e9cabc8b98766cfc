"""Base-layer unit tests: DNA codes, hashing, repeats, statistics."""

import math

import numpy as np
import pytest

from lancet2_tpu.base import dna, hashing, repeat, stats
from lancet2_tpu.base.phred import phred_to_error_prob


class TestDna:
    def test_encode_decode_roundtrip(self):
        seq = "ACGTNacgtnXYZ"
        codes = dna.encode(seq)
        assert dna.decode(codes) == "ACGTNACGTNNNN"

    def test_revcomp_str(self):
        assert dna.revcomp_str("ACGT") == "ACGT"
        assert dna.revcomp_str("AACCGGTT") == "AACCGGTT"[::-1].translate(
            str.maketrans("ACGT", "TGCA")
        )
        assert dna.revcomp_str("GATTACA") == "TGTAATC"

    def test_revcomp_codes_matches_str(self):
        seq = "GATTACANNC"
        rc = dna.revcomp_codes(dna.encode(seq))
        assert dna.decode(rc) == dna.revcomp_str(seq)

    def test_code_order_is_lexicographic(self):
        # A<C<G<T both as chars and as codes — canonical selection relies on it.
        assert list(dna.encode("ACGT")) == sorted(dna.encode("TGCA"))


class TestHashing:
    def test_deterministic(self):
        assert hashing.hash_str64("GATTACA") == hashing.hash_str64("GATTACA")
        assert hashing.hash_str64("GATTACA") != hashing.hash_str64("GATTACC")

    def test_kmer_matrix_matches_rows(self):
        kmers = np.stack([dna.encode("ACGTACGTACGTA"), dna.encode("ACGTACGTACGTT")])
        ids = hashing.hash_kmer_matrix(kmers)
        assert ids[0] != ids[1]
        # same row twice -> same hash
        ids2 = hashing.hash_kmer_matrix(np.stack([kmers[0], kmers[0]]))
        assert ids2[0] == ids2[1]

    def test_length_sensitivity(self):
        a = hashing.hash_kmer_matrix(dna.encode("AAAA")[None, :])[0]
        b = hashing.hash_kmer_matrix(dna.encode("AAAAA")[None, :])[0]
        assert a != b


class TestRepeat:
    def test_exact_repeat_detected(self):
        # "ACGTACGT" contains duplicate 4-mer ACGT
        assert repeat.has_exact_repeat(dna.encode("ACGTACGT"), 4)
        assert not repeat.has_exact_repeat(dna.encode("ACGTTTGCA"), 4)

    def test_hamming(self):
        a = dna.encode("ACGTACGT")
        b = dna.encode("ACGAACGA")
        assert repeat.hamming_dist(a, b) == 2

    def test_approx_repeat(self):
        # Two 8-mers differing in 1 base, separated by junk with no repeats.
        seq = "ACGTACGG" + "TTCTCATC" + "ACGAACGG"
        codes = dna.encode(seq)
        assert repeat.has_approx_repeat(codes, 8, max_mismatch=2)
        assert not repeat.has_exact_repeat(codes, 8)

    def test_no_approx_repeat_in_random(self):
        rng = np.random.default_rng(7)
        codes = rng.integers(0, 4, size=200).astype(np.uint8)
        # k=31 random: extremely unlikely to have <=2-mismatch pair
        assert not repeat.has_approx_repeat(codes, 31, max_mismatch=2)


class TestStats:
    def test_online_stats_matches_numpy(self):
        rng = np.random.default_rng(0)
        vals = rng.normal(35.0, 2.0, size=1000)
        acc = stats.OnlineStats()
        acc.add_many(vals)
        assert acc.mean == pytest.approx(vals.mean(), rel=1e-12)
        assert acc.variance == pytest.approx(vals.var(ddof=1), rel=1e-10)

    def test_online_stats_merge(self):
        rng = np.random.default_rng(1)
        a_vals, b_vals = rng.normal(size=100), rng.normal(size=57)
        a, b = stats.OnlineStats(), stats.OnlineStats()
        a.add_many(a_vals)
        b.add_many(b_vals)
        a.merge(b)
        both = np.concatenate([a_vals, b_vals])
        assert a.mean == pytest.approx(both.mean())
        assert a.variance == pytest.approx(both.var(ddof=1))

    def test_median_conventions(self):
        assert stats.median_u32([]) == 0
        assert stats.median_u32([5]) == 5
        assert stats.median_u32([1, 2, 3]) == 2
        assert stats.median_u32([1, 2, 3, 4]) == 2  # (2+3)//2

    def test_mann_whitney_empty_groups(self):
        assert stats.mann_whitney_effect_size([], [1, 2]) is None
        assert stats.mann_whitney_effect_size([1, 2], []) is None

    def test_mann_whitney_zero_variance(self):
        assert stats.mann_whitney_effect_size([5, 5, 5], [5, 5]) == 0.0

    def test_mann_whitney_directionality(self):
        ref = [10.0] * 50
        alt = [8.0] * 50
        es = stats.mann_whitney_effect_size(ref, alt)
        assert es is not None and es < -0.5

    def test_mann_whitney_vs_scipy_formula(self):
        # Golden check against the closed-form U statistics on a small case
        # with ties (mirrors the reference's scipy-generated golden TSVs).
        ref = [1.0, 2.0, 2.0, 4.0]
        alt = [2.0, 5.0, 6.0]
        # ranks: 1:[1], 2,2,2 -> midrank 3, 4:[5], 5:[6], 6:[7]
        # alt ranks = 3 + 6 + 7 = 16; U = 16 - 3*4/2 = 10; E[U] = 6
        # tie term: t=3 -> 24; VarU = (12/12)*((7+1) - 24/(7*6)) = 8 - 4/7
        expected_z = (10 - 6) / math.sqrt(8 - 24 / 42.0)
        es = stats.mann_whitney_effect_size(ref, alt)
        assert es == pytest.approx(expected_z / math.sqrt(7))

    REF_MW_TSV = "/root/reference/tests/data/base/mann_whitney_scipy_ref.tsv"

    @pytest.mark.skipif(
        not __import__("os").path.exists(REF_MW_TSV),
        reason="reference golden TSV not present",
    )
    def test_mann_whitney_vs_reference_scipy_golden_tsv(self):
        """Golden-master cross-validation against the reference's committed
        scipy-generated effect sizes (the reference's own independent-oracle
        strategy, /root/reference/tests/CMakeLists.txt golden TSVs)."""
        import csv

        with open(self.REF_MW_TSV) as f:
            rows = list(csv.DictReader(f, delimiter="\t"))
        assert len(rows) >= 10
        for row in rows:
            ref_vals = [float(x) for x in row["ref_vals"].split(",") if x]
            alt_vals = [float(x) for x in row["alt_vals"].split(",") if x]
            got = stats.mann_whitney_effect_size(ref_vals, alt_vals)
            if not ref_vals or not alt_vals:
                # empty-group rows: reference emits NaN, this impl None
                assert got is None or row["expected_effect_size"] in ("", "nan")
                continue
            expected = float(row["expected_effect_size"])
            assert got == pytest.approx(expected, abs=1e-12), (
                f"seed={row['groups_seed']} n_ref={row['n_ref']}"
            )

    def test_coverage_invariance(self):
        # Same bias at 10x replication should give (nearly) the same effect size.
        rng = np.random.default_rng(3)
        ref = rng.normal(60, 5, 40)
        alt = rng.normal(58, 5, 40)
        e1 = stats.mann_whitney_effect_size(ref, alt)
        e2 = stats.mann_whitney_effect_size(np.tile(ref, 10), np.tile(alt, 10))
        assert abs(e1 - e2) < 0.05

    def test_polar(self):
        assert stats.polar_radius(0, 0) == 0.0
        assert stats.polar_angle(1, 0) == pytest.approx(math.pi / 2)
        assert stats.polar_angle(0, 1) == 0.0
        assert stats.polar_radius(3, 4) == pytest.approx(math.log10(6.0))


class TestPhred:
    def test_table(self):
        assert phred_to_error_prob(0) == 1.0
        assert phred_to_error_prob(10) == pytest.approx(0.1)
        assert phred_to_error_prob(30) == pytest.approx(1e-3)
        v = phred_to_error_prob(np.array([20, 40]))
        assert v == pytest.approx([1e-2, 1e-4])

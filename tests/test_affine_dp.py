"""Alignment DP tests: batched engine vs brute-force scalar DP oracle."""

import numpy as np
import pytest

from lancet2_tpu.base import dna
from lancet2_tpu.ops.affine_dp import (
    HAP_TO_REF,
    READ_TO_HAP,
    AlignParams,
    OP_D,
    OP_I,
    OP_M,
    align_and_traceback,
    align_batch_numpy,
)
from lancet2_tpu.utils.simulate import random_reference

NEG = -(1 << 28)


def oracle_dp(q, t, p: AlignParams):
    """Scalar exact dual-affine DP (independent formulation for testing)."""
    Lq, Lt = len(q), len(t)
    q1, e1 = p.gap_open1, p.gap_extend1
    dual = p.dual
    q2, e2 = (p.gap_open2, p.gap_extend2) if dual else (q1, e1)

    H = np.full((Lq + 1, Lt + 1), NEG, dtype=np.int64)
    Va = np.full_like(H, NEG)
    Vb = np.full_like(H, NEG)
    Fa = np.full_like(H, NEG)
    Fb = np.full_like(H, NEG)
    H[0, 0] = 0
    for j in range(1, Lt + 1):
        if p.free_target_ends:
            H[0, j] = 0
        else:
            opts = [-(q1 + e1 * j)]
            if dual:
                opts.append(-(q2 + e2 * j))
            H[0, j] = max(opts)
    for i in range(1, Lq + 1):
        opts = [-(q1 + e1 * i)]
        if dual:
            opts.append(-(q2 + e2 * i))
        H[i, 0] = max(opts)
    for i in range(1, Lq + 1):
        for j in range(1, Lt + 1):
            if q[i - 1] >= 4 or t[j - 1] >= 4:
                s = 0
            else:
                s = p.match if q[i - 1] == t[j - 1] else -p.mismatch
            Va[i, j] = max(H[i - 1, j] - q1 - e1, Va[i - 1, j] - e1)
            Fa[i, j] = max(H[i, j - 1] - q1 - e1, Fa[i, j - 1] - e1)
            best = max(H[i - 1, j - 1] + s, Va[i, j], Fa[i, j])
            if dual:
                Vb[i, j] = max(H[i - 1, j] - q2 - e2, Vb[i - 1, j] - e2)
                Fb[i, j] = max(H[i, j - 1] - q2 - e2, Fb[i, j - 1] - e2)
                best = max(best, Vb[i, j], Fb[i, j])
            H[i, j] = best
    if p.free_target_ends:
        return int(H[Lq].max())
    return int(H[Lq, Lt])


def _pad_batch(seqs, pad_to):
    out = np.full((len(seqs), pad_to), 5, dtype=np.uint8)
    lens = np.zeros(len(seqs), dtype=np.int64)
    for i, s in enumerate(seqs):
        out[i, : len(s)] = s
        lens[i] = len(s)
    return out, lens


def _batch_align(pairs, p):
    qs, qlens = _pad_batch([a for a, _ in pairs], max(len(a) for a, _ in pairs))
    ts, tlens = _pad_batch([b for _, b in pairs], max(len(b) for _, b in pairs))
    return align_and_traceback(qs, qlens, ts, tlens, p)


def _cigar_score(q, t, t_start, cigar, p: AlignParams):
    """Score an explicit alignment path (validates traceback consistency)."""
    score = 0
    qpos, tpos = 0, t_start
    for op, length in cigar:
        if op == OP_M:
            for _ in range(length):
                if q[qpos] >= 4 or t[tpos] >= 4:
                    score += 0
                elif q[qpos] == t[tpos]:
                    score += p.match
                else:
                    score -= p.mismatch
                qpos += 1
                tpos += 1
        elif op == OP_I:
            cost1 = p.gap_open1 + p.gap_extend1 * length
            cost2 = p.gap_open2 + p.gap_extend2 * length if p.dual else cost1
            score -= min(cost1, cost2)
            qpos += length
        elif op == OP_D:
            cost1 = p.gap_open1 + p.gap_extend1 * length
            cost2 = p.gap_open2 + p.gap_extend2 * length if p.dual else cost1
            score -= min(cost1, cost2)
            tpos += length
    return score, qpos, tpos


@pytest.mark.parametrize("params", [READ_TO_HAP, HAP_TO_REF], ids=["fitting", "global"])
def test_random_vs_oracle(params):
    rng = np.random.default_rng(42)
    pairs = []
    for _ in range(24):
        lq = int(rng.integers(5, 40))
        lt = int(rng.integers(5, 60))
        q = rng.integers(0, 4, lq).astype(np.uint8)
        t = rng.integers(0, 4, lt).astype(np.uint8)
        pairs.append((q, t))
    results = _batch_align(pairs, params)
    for (q, t), res in zip(pairs, results):
        assert res["score"] == oracle_dp(q, t, params), (dna.decode(q), dna.decode(t))


@pytest.mark.parametrize("params", [READ_TO_HAP, HAP_TO_REF], ids=["fitting", "global"])
def test_traceback_path_is_consistent(params):
    rng = np.random.default_rng(43)
    pairs = []
    for _ in range(16):
        lq = int(rng.integers(8, 50))
        lt = int(rng.integers(8, 70))
        pairs.append(
            (rng.integers(0, 4, lq).astype(np.uint8), rng.integers(0, 4, lt).astype(np.uint8))
        )
    results = _batch_align(pairs, params)
    for (q, t), res in zip(pairs, results):
        score, q_used, t_used = _cigar_score(q, t, res["t_start"], res["cigar"], params)
        assert q_used == len(q)  # query fully consumed
        assert t_used == res["t_end"]
        if not params.free_target_ends:
            assert t_used == len(t)
        # path score equals DP score (gap runs never mix systems under convex params)
        assert score == res["score"]


def test_fitting_finds_substring():
    t = dna.encode(random_reference(300, seed=9))
    q = t[100:180].copy()
    res = _batch_align([(q, t)], READ_TO_HAP)[0]
    assert res["score"] == 80  # perfect match
    assert res["t_start"] == 100 and res["t_end"] == 180
    assert res["cigar"] == [(OP_M, 80)]


def test_fitting_with_snv_and_insertion():
    ref = random_reference(400, seed=10)
    t = dna.encode(ref)
    # read with an SNV at offset 20 and 3bp insertion at offset 50
    q_seq = ref[100:150] + "GGG" + ref[150:180]
    q = dna.encode(q_seq)
    q[20] = (q[20] + 1) % 4
    res = _batch_align([(q, t)], READ_TO_HAP)[0]
    ops = res["cigar"]
    assert (OP_I, 3) in ops
    # score: 80 matches - (1 match->mismatch: -1-4) - gap(12+3*3)
    assert res["score"] == 80 - 5 - 21
    assert res["t_start"] == 100


def test_global_large_deletion_convex():
    # 200bp deletion should use the cheap convex system (open 26, ext 1)
    ref = random_reference(600, seed=11)
    hap = ref[:200] + ref[400:]
    res = _batch_align([(dna.encode(hap), dna.encode(ref))], HAP_TO_REF)[0]
    assert (OP_D, 200) in res["cigar"]
    assert res["score"] == -(26 + 200 * 1)


def test_global_small_gap_uses_affine1():
    ref = random_reference(100, seed=12)
    hap = ref[:50] + ref[52:]
    res = _batch_align([(dna.encode(hap), dna.encode(ref))], HAP_TO_REF)[0]
    assert (OP_D, 2) in res["cigar"]
    assert res["score"] == -(6 + 2 * 2)


def test_n_bases_score_zero():
    q = dna.encode("ACGTNACGT")
    t = dna.encode("ACGTTACGT")
    res = _batch_align([(q, t)], READ_TO_HAP)[0]
    assert res["score"] == 8  # 8 matches + N-column 0
    assert res["cigar"] == [(OP_M, 9)]


def test_batch_mixed_lengths():
    rng = np.random.default_rng(13)
    t_long = rng.integers(0, 4, 500).astype(np.uint8)
    pairs = [
        (t_long[50:120], t_long),
        (t_long[400:460], t_long[:480]),
        (rng.integers(0, 4, 30).astype(np.uint8), t_long[:100]),
    ]
    results = _batch_align(pairs, READ_TO_HAP)
    assert results[0]["score"] == 70 and results[0]["t_start"] == 50
    assert results[1]["score"] == 60 and results[1]["t_start"] == 400
    for (q, t), res in zip(pairs, results):
        assert res["score"] == oracle_dp(q, t, READ_TO_HAP)


class TestJaxParity:
    @pytest.mark.parametrize("params", [READ_TO_HAP, HAP_TO_REF], ids=["fitting", "global"])
    def test_jax_matches_numpy(self, params):
        from lancet2_tpu.ops.affine_dp_jax import align_dirs_jax

        rng = np.random.default_rng(77)
        B, Lq, Lt = 8, 40, 64
        qs = rng.integers(0, 4, (B, Lq)).astype(np.uint8)
        ts = rng.integers(0, 4, (B, Lt)).astype(np.uint8)
        qlens = rng.integers(5, Lq + 1, B).astype(np.int64)
        tlens = rng.integers(10, Lt + 1, B).astype(np.int64)
        for b in range(B):
            qs[b, qlens[b]:] = 5
            ts[b, tlens[b]:] = 5
        ref = align_batch_numpy(qs, qlens, ts, tlens, params)
        score, t_end, dirs = align_dirs_jax(qs, qlens, ts, tlens, params)
        np.testing.assert_array_equal(score, ref["score"])
        np.testing.assert_array_equal(t_end, ref["t_end"])
        # dirs must reproduce identical CIGARs through the shared traceback
        from lancet2_tpu.ops.affine_dp import traceback_batch

        c_np = traceback_batch(ref["dirs"], qlens, ref["t_end"], params)
        c_jx = traceback_batch(dirs, qlens, t_end.astype(np.int64), params)
        assert c_np == c_jx

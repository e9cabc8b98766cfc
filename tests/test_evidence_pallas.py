"""Parity: Pallas evidence kernel vs the XLA-scan engine (bit-exact).

The Pallas kernel (ops/evidence_pallas.py) must reproduce the XLA engine
(ops/evidence_dp.py) EXACTLY — scores, spans, NM, and every per-region
evidence statistic, including float accumulators (the kernel replicates the
engine's float op order). Pairs whose deletion-run descent overflows D_MAX
are flagged and re-run on the XLA engine by evidence_dp_exact, so the
combined result is exact on every input.

On CPU (CI) the kernel runs in Pallas interpret mode; the TPU hardware run
is exercised by bench.py and the batch executor.
"""

from __future__ import annotations

import numpy as np
import pytest

from lancet2_tpu.ops.evidence_dp import R_MAX, evidence_dp
from lancet2_tpu.ops.evidence_pallas import (
    D_MAX,
    evidence_dp_exact,
    evidence_dp_pallas,
)

KEYS = ["score", "t_end", "t_start", "nm", "qv", "aligned", "min_bq",
        "raw", "pbq", "matches"]


def _rand_case(rng, B, Lq, Lt, n_regions, similar=True):
    q = rng.integers(0, 5, (B, Lq)).astype(np.uint8)
    qu = rng.integers(2, 41, (B, Lq)).astype(np.uint8)
    t = rng.integers(0, 5, (B, Lt)).astype(np.uint8)
    if similar:
        for b in range(B):
            off = rng.integers(0, Lt - Lq)
            t[b, off : off + Lq] = np.where(
                rng.random(Lq) < 0.85, q[b], t[b, off : off + Lq]
            )
            if b % 2 == 0:  # plant a winning small indel in half the pairs
                g = int(rng.integers(1, 4))
                cut = Lq // 2
                if b % 4 == 0:  # deletion: target keeps g extra bases
                    t[b, off + cut + g : off + Lq] = q[b, cut : Lq - g]
                else:  # insertion: query has g bases absent from target
                    t[b, off + cut : off + Lq - g] = q[b, cut + g : Lq]
    q_lens = rng.integers(8, Lq + 1, B).astype(np.int32)
    t_lens = rng.integers(Lq, Lt + 1, B).astype(np.int32)
    regions = np.zeros((B, R_MAX, 2), np.int32)
    for b in range(B):
        for r in range(n_regions):
            s = int(rng.integers(0, Lt - 2))
            e = s + int(rng.integers(1, 12))
            if rng.random() < 0.15:
                e = s  # inactive slot
            regions[b, r] = (s, min(e, Lt))
    return q, qu, q_lens, t, t_lens, regions


def _assert_equal(ref, got, tag):
    for k in KEYS:
        a, b = np.asarray(ref[k]), np.asarray(got[k])
        assert np.array_equal(a, b), (
            f"{tag}: {k} mismatch at {np.argwhere(a != b)[:5].tolist()}; "
            f"ref {a[a != b][:5]} got {b[a != b][:5]}"
        )


@pytest.mark.parametrize("n_regions", [1, 2, 3])
def test_pallas_parity_random(n_regions):
    rng = np.random.default_rng(100 + n_regions)
    case = _rand_case(rng, B=24, Lq=24, Lt=48, n_regions=n_regions)
    ref = evidence_dp(*case)
    got = evidence_dp_exact(*case)
    _assert_equal(ref, got, f"R={n_regions}")


def test_pallas_parity_dissimilar_pairs():
    """Random unrelated sequences exercise messy alignment paths."""
    rng = np.random.default_rng(7)
    case = _rand_case(rng, B=16, Lq=16, Lt=32, n_regions=2, similar=False)
    ref = evidence_dp(*case)
    got = evidence_dp_exact(*case)
    _assert_equal(ref, got, "dissimilar")


def test_parity_winning_short_indels():
    """Planted 1-8bp indels between long exact anchors — the caller's core
    workload. The winning deletion path must charge go + ge*gap exactly
    (a round-2 kernel bug undercharged every deletion by one ge; random
    fixtures never exercised a winning deletion on the fast path)."""
    rng = np.random.default_rng(42)
    pairs = []
    for gap in (1, 2, 3, 4, 6, 8):
        anchor = rng.integers(0, 4, 48).astype(np.uint8)
        a1, a2 = anchor[:24], anchor[24:]
        mid = rng.integers(0, 4, gap).astype(np.uint8)
        # deletion in query (target keeps mid)
        pairs.append((np.concatenate([a1, a2]), np.concatenate([a1, mid, a2])))
        # insertion in query (query keeps mid)
        pairs.append((np.concatenate([a1, mid, a2]), np.concatenate([a1, a2])))
    Lq = max(len(q) for q, _ in pairs)
    Lt = max(len(t) for _, t in pairs)
    B = len(pairs)
    q = np.full((B, Lq), 4, np.uint8)
    t = np.full((B, Lt), 4, np.uint8)
    q_lens = np.zeros(B, np.int32)
    t_lens = np.zeros(B, np.int32)
    for b, (qq, tt) in enumerate(pairs):
        q[b, : len(qq)] = qq
        t[b, : len(tt)] = tt
        q_lens[b], t_lens[b] = len(qq), len(tt)
    qu = np.full((B, Lq), 35, np.uint8)
    regions = np.zeros((B, R_MAX, 2), np.int32)
    regions[:, 0] = (22, 28)  # spans the indel site
    ref = evidence_dp(q, qu, q_lens, t, t_lens, regions)
    got = evidence_dp_exact(q, qu, q_lens, t, t_lens, regions)
    _assert_equal(ref, got, "short-indels")
    # the deletion path must actually win (sanity of the fixture)
    assert int(np.asarray(ref["nm"]).max()) >= 1


def test_overflow_fallback_long_deletion():
    """A query spanning a >D_MAX-column target skip must flag overflow on
    the fast path, and evidence_dp_exact must still match the engine."""
    rng = np.random.default_rng(3)
    # with free target ends the deletion only pays when flanked by long
    # exact anchors on BOTH sides: gap cost go+ge*gap must beat mismatching
    # either 60-base anchor (~5 per base)
    Lq, gap = 120, D_MAX + 2
    Lt = Lq + gap + 16
    half = 60
    t_row = rng.integers(0, 4, Lt).astype(np.uint8)
    q_row = np.concatenate([t_row[:half], t_row[half + gap : half + gap + (Lq - half)]])
    B = 8
    q = np.tile(q_row, (B, 1)).astype(np.uint8)
    qu = np.full((B, Lq), 35, np.uint8)
    t = np.tile(t_row, (B, 1))
    q_lens = np.full(B, Lq, np.int32)
    t_lens = np.full(B, Lt, np.int32)
    regions = np.zeros((B, R_MAX, 2), np.int32)
    regions[:, 0] = (half + 2, half + 6)  # inside the skipped run
    ref = evidence_dp(q, qu, q_lens, t, t_lens, regions)
    raw = evidence_dp_pallas(q, qu, q_lens, t, t_lens, regions)
    # the deletion run must actually win for this fixture to be meaningful
    assert int(np.asarray(ref["nm"]).max()) >= gap
    assert raw["overflow"].all(), "long-deletion pairs must flag overflow"
    got = evidence_dp_exact(q, qu, q_lens, t, t_lens, regions)
    _assert_equal(ref, got, "overflow-fallback")


def test_padding_invariance():
    """Batch padding to the kernel tile must not alter real-pair outputs."""
    rng = np.random.default_rng(5)
    case = _rand_case(rng, B=3, Lq=17, Lt=33, n_regions=1)
    ref = evidence_dp(*case)
    got = evidence_dp_exact(*case)
    _assert_equal(ref, got, "padding")


def test_pipelined_genotyper_device_path(monkeypatch):
    """Genotyper.run_evidence_pairs' submit-all/finalize-all device path
    must match the host XLA path exactly (here via interpret mode)."""
    from lancet2_tpu.caller import genotyper as gmod

    rng = np.random.default_rng(21)
    n = 37  # not a multiple of the chunk, exercises tail padding
    pair_q, pair_qu, pair_t, pair_meta = [], [], [], []
    for i in range(n):
        lq = int(rng.integers(10, 25))
        lt = int(rng.integers(lq, 40))
        q = rng.integers(0, 4, lq).astype(np.uint8)
        t = rng.integers(0, 4, lt).astype(np.uint8)
        if i % 2 == 0:  # half the pairs pass the mapability gate: embed the
            off = int(rng.integers(0, lt - lq + 1))  # query in the target
            t[off : off + lq] = q
        regions = np.zeros((R_MAX, 2), np.int32)
        for r in range(int(rng.integers(1, 3))):  # <=2 active slots
            s = int(rng.integers(0, lt - 1))
            regions[r] = (s, min(s + int(rng.integers(1, 6)), lt))
        pair_q.append(q)
        pair_qu.append(rng.integers(2, 41, lq).astype(np.uint8))
        pair_t.append(t)
        pair_meta.append((i, 0, regions, []))

    g = gmod.Genotyper(backend="evidence")
    monkeypatch.setattr(gmod, "_PAIR_CHUNK", 16)
    monkeypatch.setattr(gmod, "_on_device", lambda: False)
    ref = g.run_evidence_pairs(pair_q, pair_qu, pair_t, pair_meta)
    monkeypatch.setattr(gmod, "_on_device", lambda: True)
    got = g.run_evidence_pairs(pair_q, pair_qu, pair_t, pair_meta)

    # the device path is a two-pass dispatch: region accumulators are only
    # computed for pairs that pass the mapability gate AND overlap a variant
    # region — the ONLY pairs whose region outputs assemble_evidence ever
    # reads (caller/genotyper.py:458-475). Scalar outputs must match on every
    # pair; region outputs on the consumed subset.
    def _assert_effective_equal(ref, got, tag):
        n_pairs = len(pair_q)
        scalar = ["score", "t_end", "t_start", "nm"]
        for k in scalar:
            assert np.array_equal(ref[k], got[k]), f"{tag}: {k} mismatch"
        consumed = []
        for i in range(n_pairs):
            min_score = len(pair_q[i]) * g.min_score_frac
            gate = (ref["score"][i] >= min_score
                    and ref["t_end"][i] > ref["t_start"][i])
            reg = pair_meta[i][2]
            ovl = bool(((reg[:, 1] > ref["t_start"][i])
                        & (reg[:, 0] < ref["t_end"][i])
                        & (reg[:, 1] > reg[:, 0])).any())
            if gate and ovl:
                consumed.append(i)
        assert consumed, "fixture must exercise consumed pairs"
        for k in KEYS:
            if k in scalar:
                continue
            a, b = np.asarray(ref[k])[consumed], np.asarray(got[k])[consumed]
            assert np.array_equal(a, b), f"{tag}: {k} mismatch on consumed pairs"

    _assert_effective_equal(ref, got, "pipelined")

    # the full record-level identity of the two dispatch modes (every VCF
    # byte) is pinned by tests/test_two_pass_evidence.py and the executor
    # identity suite on realistic fixtures.

    # multi-chip: chunks round-robined over the 8 virtual CPU devices must
    # be record-identical to the single-device path
    import jax

    g_multi = gmod.Genotyper(backend="evidence", devices=list(jax.devices()))
    assert len(g_multi.devices) >= 2
    got_multi = g_multi.run_evidence_pairs(pair_q, pair_qu, pair_t, pair_meta)
    _assert_effective_equal(ref, got_multi, "multi-device")

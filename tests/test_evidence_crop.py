"""Pass-2 crop exactness: re-running the evidence DP on the pass-1
alignment span [t_start, t_end) must reproduce the full-target outputs
bit-exactly.

Argument (caller/genotyper.py pass-2): every cell of the optimal fitting
path lies in the span by definition; cropped-target alignments are a
subset of full-target alignments with identical scores, lane ORDER is
preserved under the shift so every tie-break resolves the same way, and
region masks shifted WITHOUT clamping (negative starts allowed) evaluate
to the same truths on all crop lanes. This fuzz drives the adversarial
edges of that argument: alignments starting/ending with insertions,
regions straddling t_start/t_end or entirely before/after the span,
deletion runs crossing region boundaries.
"""

from __future__ import annotations

import numpy as np
import pytest

from lancet2_tpu.ops.evidence_dp import R_MAX, evidence_dp


def _rand_pair(rng):
    Lt = 128
    t = rng.integers(0, 4, Lt).astype(np.uint8)
    # query copied from a random target window with mutations/indels
    off = int(rng.integers(0, 60))
    qlen = int(rng.integers(24, 56))
    q = t[off : off + qlen].copy()
    for _ in range(int(rng.integers(0, 4))):
        p = int(rng.integers(0, len(q)))
        kind = rng.integers(0, 3)
        if kind == 0:
            q[p] = (q[p] + 1 + rng.integers(0, 3)) % 4
        elif kind == 1 and len(q) > 8:
            dl = int(rng.integers(1, 5))
            q = np.concatenate([q[:p], q[p + dl:]])
        else:
            ins = rng.integers(0, 4, int(rng.integers(1, 5))).astype(np.uint8)
            q = np.concatenate([q[:p], ins, q[p:]])
    q = q[:56]
    regions = np.zeros((R_MAX, 2), np.int32)
    # slot 0: somewhere around the alignment (often straddling its edges)
    a = int(rng.integers(max(0, off - 6), min(Lt - 2, off + qlen + 6)))
    regions[0] = (a, a + int(rng.integers(1, 7)))
    if rng.random() < 0.5:
        b = int(rng.integers(0, Lt - 2))
        regions[1] = (b, b + int(rng.integers(1, 5)))
    return q, t, regions


def _run(qs, qus, qlens, ts, tlens, regions):
    out = evidence_dp(qs, qus, qlens, ts, tlens, regions)
    return {k: np.asarray(v) for k, v in out.items()}


def test_crop_rerun_is_bit_exact():
    rng = np.random.default_rng(77)
    N = 400
    qs = np.full((N, 56), 5, np.uint8)
    qus = np.zeros((N, 56), np.uint8)
    qlens = np.zeros(N, np.int64)
    ts = np.full((N, 128), 5, np.uint8)
    tlens = np.full(N, 128, np.int64)
    regions = np.zeros((N, R_MAX, 2), np.int32)
    for i in range(N):
        q, t, reg = _rand_pair(rng)
        qs[i, : len(q)] = q
        qus[i, : len(q)] = rng.integers(10, 40, len(q))
        qlens[i] = len(q)
        ts[i] = t
        regions[i] = reg

    full = _run(qs, qus, qlens, ts, tlens, regions)
    t_s = full["t_start"].astype(np.int64)
    t_e = full["t_end"].astype(np.int64)
    ok = t_e > t_s
    assert ok.sum() > N * 0.9

    # crop every gate-passing pair to its span and re-run
    idx = np.flatnonzero(ok)
    Lc = 64
    qs2 = qs[idx]
    qus2 = qus[idx]
    ql2 = qlens[idx]
    ts2 = np.full((idx.size, Lc), 5, np.uint8)
    tl2 = (t_e - t_s)[idx]
    reg2 = regions[idx] - t_s[idx, None, None].astype(np.int32)
    inact = regions[idx][:, :, 1] <= regions[idx][:, :, 0]
    reg2[inact] = 0
    for j, i in enumerate(idx):
        span = ts[i, t_s[i] : t_e[i]]
        assert len(span) <= Lc, int(tl2[j])
        ts2[j, : len(span)] = span

    crop = _run(qs2, qus2, ql2, ts2, tl2, reg2)

    assert np.array_equal(crop["score"], full["score"][idx])
    assert np.array_equal(crop["nm"], full["nm"][idx])
    assert np.array_equal(crop["t_start"] + t_s[idx], full["t_start"][idx])
    assert np.array_equal(crop["t_end"] + t_s[idx], full["t_end"][idx])
    # region stats compared wherever assembly reads them (slot overlap)
    active = regions[idx][:, :, 1] > regions[idx][:, :, 0]
    ov = ((regions[idx][:, :, 1] > t_s[idx, None])
          & (regions[idx][:, :, 0] < t_e[idx, None]) & active)
    for k in ("qv", "aligned", "min_bq", "raw", "pbq", "matches"):
        a, b = crop[k], full[k][idx]
        assert np.array_equal(a[ov], b[ov]), k

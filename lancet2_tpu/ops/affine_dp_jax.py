"""JAX/XLA batched dual-affine alignment DP (device twin of affine_dp.py).

Same recurrences as the numpy baseline — scan over query rows; vertical gaps
elementwise; horizontal gaps via the exact max-plus cummax identity — jitted
per (B, Lq, Lt) bucket shape. Two entry points:

  * align_scores_jax:  score/t_end only (no direction matrix) — the fast path
    used for benchmarking and for TPU allele assignment where CIGARs are not
    needed; O(B*Lt) memory.
  * align_dirs_jax:    also emits the packed per-cell direction bytes consumed
    by the host traceback (affine_dp.traceback_batch).

Scores are int32; bases are uint8 codes (0..3 ACGT, 4=N, >=5 pad).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from lancet2_tpu.ops.affine_dp import AlignParams, NEG_INF

# numpy scalar: creating a jnp value at import time would initialize the
# JAX backend before callers can select a platform (axon plugin quirk)
_NEG = np.int32(NEG_INF)


def _subs(qi, targets, p: AlignParams):
    eq = qi[:, None] == targets
    any_n = (qi[:, None] >= 4) | (targets >= 4)
    return jnp.where(any_n, 0, jnp.where(eq, p.match, -p.mismatch)).astype(jnp.int32)


def _row_step(p: AlignParams, Lt: int, with_dirs: bool):
    q1, e1 = p.gap_open1, p.gap_extend1
    dual = p.dual
    q2, e2 = (p.gap_open2, p.gap_extend2) if dual else (q1, e1)
    jcols = jnp.arange(1, Lt + 1, dtype=jnp.int32)

    def step(carry, row_in):
        H_prev, V1_prev, V2_prev, final_H = carry
        qi, i, t_codes, t_valid, q_lens = row_in

        sub = _subs(qi, t_codes, p)
        diag = H_prev[:, :-1] + sub

        v1_open = H_prev[:, 1:] - (q1 + e1)
        v1_ext = V1_prev[:, 1:] - e1
        V1_row = jnp.maximum(v1_open, v1_ext)
        v1_is_ext = v1_ext >= v1_open
        if dual:
            v2_open = H_prev[:, 1:] - (q2 + e2)
            v2_ext = V2_prev[:, 1:] - e2
            V2_row = jnp.maximum(v2_open, v2_ext)
            v2_is_ext = v2_ext >= v2_open
        else:
            V2_row = jnp.full_like(V1_row, _NEG)
            v2_is_ext = jnp.zeros_like(v1_is_ext)

        H_tmp = jnp.maximum(diag, jnp.maximum(V1_row, V2_row))

        col0_1 = -(q1 + e1 * i)
        col0 = jnp.maximum(col0_1, -(q2 + e2 * i)) if dual else col0_1
        h_col0 = jnp.full((H_prev.shape[0], 1), col0, dtype=jnp.int32)

        Htmp_full = jnp.concatenate([h_col0, H_tmp], axis=1)
        C1 = Htmp_full[:, :-1] + e1 * jcols[None, :]
        F1_row = jax.lax.cummax(C1, axis=1) - (q1 + e1) - e1 * (jcols[None, :] - 1) - e1
        if dual:
            C2 = Htmp_full[:, :-1] + e2 * jcols[None, :]
            F2_row = jax.lax.cummax(C2, axis=1) - (q2 + e2) - e2 * (jcols[None, :] - 1) - e2
        else:
            F2_row = jnp.full_like(F1_row, _NEG)

        H_row = jnp.maximum(H_tmp, jnp.maximum(F1_row, F2_row))

        if with_dirs:
            f1_is_ext = jnp.concatenate(
                [jnp.zeros((F1_row.shape[0], 1), bool), F1_row[:, 1:] == F1_row[:, :-1] - e1],
                axis=1,
            )
            if dual:
                f2_is_ext = jnp.concatenate(
                    [jnp.zeros((F2_row.shape[0], 1), bool), F2_row[:, 1:] == F2_row[:, :-1] - e2],
                    axis=1,
                )
            else:
                f2_is_ext = jnp.zeros_like(f1_is_ext)
            winner = jnp.full(H_tmp.shape, 4, dtype=jnp.uint8)  # F2
            winner = jnp.where(F1_row >= H_row, 3, winner)
            winner = jnp.where(V2_row >= H_row, 2, winner)
            winner = jnp.where(V1_row >= H_row, 1, winner)
            winner = jnp.where(diag >= H_row, 0, winner)
            packed = (
                winner
                | (v1_is_ext.astype(jnp.uint8) << 3)
                | (v2_is_ext.astype(jnp.uint8) << 4)
                | (f1_is_ext.astype(jnp.uint8) << 5)
                | (f2_is_ext.astype(jnp.uint8) << 6)
            )
        else:
            packed = jnp.zeros((1,), dtype=jnp.uint8)  # placeholder

        H_row = jnp.where(t_valid, H_row, _NEG)
        H_full = jnp.concatenate([h_col0, H_row], axis=1)
        V1_full = jnp.concatenate([jnp.full_like(h_col0, _NEG), jnp.where(t_valid, V1_row, _NEG)], axis=1)
        V2_full = jnp.concatenate([jnp.full_like(h_col0, _NEG), jnp.where(t_valid, V2_row, _NEG)], axis=1)

        q_active = (i <= q_lens)[:, None]
        H_next = jnp.where(q_active, H_full, H_prev)
        V1_next = jnp.where(q_active, V1_full, V1_prev)
        V2_next = jnp.where(q_active, V2_full, V2_prev)
        final_H = jnp.where((i == q_lens)[:, None], H_next, final_H)
        return (H_next, V1_next, V2_next, final_H), packed

    return step


def _make_align(p: AlignParams, with_dirs: bool):
    q1, e1 = p.gap_open1, p.gap_extend1
    dual = p.dual
    q2, e2 = (p.gap_open2, p.gap_extend2) if dual else (q1, e1)

    def run(queries, q_lens, targets, t_lens):
        B, Lq = queries.shape
        Lt = targets.shape[1]
        jcols = jnp.arange(1, Lt + 1, dtype=jnp.int32)
        t_valid = jcols[None, :] <= t_lens[:, None]

        if p.free_target_ends:
            H0 = jnp.zeros((B, Lt + 1), dtype=jnp.int32)
        else:
            del1 = -(q1 + e1 * jcols)
            row0 = jnp.maximum(del1, -(q2 + e2 * jcols)) if dual else del1
            row0 = jnp.where(t_valid, row0[None, :], _NEG)
            H0 = jnp.concatenate([jnp.zeros((B, 1), jnp.int32), row0.astype(jnp.int32)], axis=1)
        V0 = jnp.full((B, Lt + 1), _NEG, dtype=jnp.int32)

        step = _row_step(p, Lt, with_dirs)
        rows_i = jnp.arange(1, Lq + 1, dtype=jnp.int32)
        q_cols = queries.T  # [Lq, B]

        def scan_step(carry, x):
            i, qi = x
            return step(carry, (qi, i, targets, t_valid, q_lens))

        (Hf, _, _, final_H), dirs = jax.lax.scan(
            scan_step, (H0, V0, V0, H0), (rows_i, q_cols)
        )

        if p.free_target_ends:
            masked = jnp.where(
                jnp.concatenate([jnp.zeros((B, 1), bool), t_valid], axis=1), final_H, _NEG
            )
            t_end = jnp.argmax(masked, axis=1)
            score = jnp.take_along_axis(masked, t_end[:, None], axis=1)[:, 0]
        else:
            t_end = t_lens.astype(jnp.int32)
            score = jnp.take_along_axis(final_H, t_end[:, None], axis=1)[:, 0]

        if with_dirs:
            return score, t_end, jnp.transpose(dirs, (1, 0, 2))  # [B, Lq, Lt]
        return score, t_end

    return run


_CACHE: dict = {}


def _jitted(p: AlignParams, with_dirs: bool):
    key = (p, with_dirs)
    fn = _CACHE.get(key)
    if fn is None:
        fn = jax.jit(_make_align(p, with_dirs))
        _CACHE[key] = fn
    return fn


def align_scores_jax(queries, q_lens, targets, t_lens, p: AlignParams):
    """Scores + end positions only. Returns numpy arrays."""
    fn = _jitted(p, False)
    score, t_end = fn(
        jnp.asarray(queries, jnp.uint8),
        jnp.asarray(q_lens, jnp.int32),
        jnp.asarray(targets, jnp.uint8),
        jnp.asarray(t_lens, jnp.int32),
    )
    return np.asarray(score), np.asarray(t_end)


def align_dirs_jax(queries, q_lens, targets, t_lens, p: AlignParams):
    """Scores, end positions, and packed direction matrix (for traceback)."""
    fn = _jitted(p, True)
    score, t_end, dirs = fn(
        jnp.asarray(queries, jnp.uint8),
        jnp.asarray(q_lens, jnp.int32),
        jnp.asarray(targets, jnp.uint8),
        jnp.asarray(t_lens, jnp.int32),
    )
    return np.asarray(score), np.asarray(t_end), np.asarray(dirs)

"""Pallas TPU kernel: batched glocal (fitting) affine-gap DP, score-only.

The framework's hottest op (the reference's 36% minimap2 ksw_extz2 budget,
SURVEY.md §6). The XLA-scan twin in affine_dp_jax is the semantics baseline;
this kernel keeps the whole DP state resident in VMEM and runs the row loop
inside one Mosaic program, eliminating per-step HBM round trips.

Formulation per query row (identical to affine_dp.py):
  diag   = H_prev[:, j-1] + s(q_i, t_j)
  V      = max(H_prev - (go+ge), V_prev - ge)          (elementwise)
  H_tmp  = max(diag, V)
  F[j]   = cummax_k<=j(H_tmp[k-1] + ge*k) - (go+ge) - ge*(j-1) - ge
  H      = max(H_tmp, F)
with the horizontal cummax computed by a log-step shift-max over lanes
(pltpu.roll + column masking). Fitting mode: H row 0 = 0 (free leading
target gap), score = max over valid target columns of the H row at i=q_len.

Layout: grid over batch tiles of B_TILE pairs; targets [B_TILE, Lt] with the
target axis on lanes; queries transposed [Lq, B_TILE] so each row read is a
cheap sublane slice. int32 state.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lancet2_tpu.ops.affine_dp import AlignParams, NEG_INF, READ_TO_HAP

B_TILE = 128


def _shift_right_neg(x: jnp.ndarray, shift: int, col_ids: jnp.ndarray) -> jnp.ndarray:
    """y[:, j] = x[:, j-shift] for j >= shift else NEG (lane-axis shift)."""
    rolled = pltpu.roll(x, shift, axis=1)
    return jnp.where(col_ids >= shift, rolled, np.int32(NEG_INF))


def _make_kernel(Lq: int, Lt: int, p: AlignParams):
    go, ge = p.gap_open1, p.gap_extend1
    if p.dual or not p.free_target_ends:
        raise NotImplementedError("pallas kernel covers the fitting single-affine mode")

    log_steps = max(1, int(np.ceil(np.log2(Lt))))

    def kernel(q_ref, qlen_ref, t_ref, tlen_ref, score_ref, tend_ref):
        t_codes = t_ref[:, :].astype(jnp.int32)  # [B, Lt]
        q_lens = qlen_ref[:, 0]  # [B]
        t_lens = tlen_ref[:, 0]
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (B_TILE, Lt), 1)
        t_valid = col_ids < t_lens[:, None]
        jcols = col_ids + 1  # 1-based target positions

        H0 = jnp.zeros((B_TILE, Lt), jnp.int32)  # columns 1..Lt of row 0
        V0 = jnp.full((B_TILE, Lt), np.int32(NEG_INF), jnp.int32)
        finalH0 = H0

        def row_update(i, qi, carry):
            # i is the 1-based row; qi [B] this row's query bases
            H_prev, V_prev, final_H = carry
            qi = qi.astype(jnp.int32)[:, None]  # [B, 1]
            any_n = (qi >= 4) | (t_codes >= 4)
            sub = jnp.where(any_n, 0, jnp.where(qi == t_codes, p.match, -p.mismatch))

            # H[i-1][0]: 0 for the virtual row 0 (free leading target gap),
            # else the query-prefix insertion cost
            col0_prev = jnp.where(i == 1, 0, -(go + ge * (i - 1)))
            h_col0_prev = jnp.full((B_TILE, 1), 0, jnp.int32) + col0_prev
            H_prev_full = jnp.concatenate([h_col0_prev, H_prev[:, :-1]], axis=1)
            diag = H_prev_full + sub

            v_open = H_prev - (go + ge)
            V_row = jnp.maximum(v_open, V_prev - ge)
            H_tmp = jnp.maximum(diag, V_row)

            # horizontal gaps: prefix max of C[k] = H_tmp_full[k-1] + ge*k
            h_col0 = jnp.full((B_TILE, 1), -(go + ge * i), jnp.int32)
            Htmp_shift = jnp.concatenate([h_col0, H_tmp[:, :-1]], axis=1)
            C = Htmp_shift + ge * jcols
            run = C
            for s in range(log_steps):
                run = jnp.maximum(run, _shift_right_neg(run, 1 << s, col_ids))
            F_row = run - (go + ge) - ge * (jcols - 1) - ge

            H_row = jnp.maximum(H_tmp, F_row)
            # No per-row target masking: DP deps flow only left->right and
            # top->down, so padded columns (sub=0, like N) can never improve a
            # valid cell; the final column mask below is sufficient. Rows past
            # a pair's q_len likewise keep evolving harmlessly — final_H was
            # already captured at i == q_len.
            final_H = jnp.where((i == q_lens)[:, None], H_row, final_H)
            return H_row, V_row, final_H

        # Mosaic needs tile-aligned sublane loads: fetch 8 query rows per
        # aligned block, unroll the 8 row updates with static indices.
        def chunk_body(c, carry):
            qblock = q_ref[pl.ds(c * 8, 8), :]  # [8, B] aligned load
            for r in range(8):
                carry = row_update(c * 8 + r + 1, qblock[r, :], carry)
            return carry

        _, _, final_H = jax.lax.fori_loop(0, Lq // 8, chunk_body, (H0, V0, finalH0))

        masked = jnp.where(t_valid, final_H, np.int32(NEG_INF))
        best = jnp.max(masked, axis=1)
        score_ref[:, 0] = best
        # Mosaic lacks integer argmax: first-max column via min over matches
        is_max = masked == best[:, None]
        first_col = jnp.min(jnp.where(is_max, col_ids, np.int32(Lt)), axis=1)
        tend_ref[:, 0] = first_col + 1

    return kernel


@functools.partial(jax.jit, static_argnames=("Lq", "Lt"))
def _run(queries_t, q_lens, targets, t_lens, Lq: int, Lt: int):
    B = targets.shape[0]
    grid = (B // B_TILE,)
    kernel = _make_kernel(Lq, Lt, READ_TO_HAP)
    score, tend = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((Lq, B_TILE), lambda b: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((B_TILE, 1), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B_TILE, Lt), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B_TILE, 1), lambda b: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((B_TILE, 1), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B_TILE, 1), lambda b: (b, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
        ),
    )(queries_t, q_lens, targets, t_lens)
    return score[:, 0], tend[:, 0]


def sw_fitting_scores_pallas(queries, q_lens, targets, t_lens):
    """Batched fitting-DP scores via the Pallas kernel.

    queries [B, Lq] uint8 (pad 5), targets [B, Lt] uint8. B is padded up to a
    multiple of B_TILE internally. Returns (scores [B] int32, t_end [B]).
    """
    queries = np.asarray(queries, dtype=np.uint8)
    targets = np.asarray(targets, dtype=np.uint8)
    q_lens = np.asarray(q_lens, dtype=np.int32)
    t_lens = np.asarray(t_lens, dtype=np.int32)
    B, Lq = queries.shape
    Lt = targets.shape[1]
    qpad = (-Lq) % 8
    if qpad:  # kernel consumes query rows in aligned blocks of 8
        queries = np.concatenate([queries, np.full((B, qpad), 5, np.uint8)], axis=1)
        Lq += qpad
    pad = (-B) % B_TILE
    if pad:
        queries = np.concatenate([queries, np.full((pad, Lq), 5, np.uint8)])
        targets = np.concatenate([targets, np.full((pad, Lt), 5, np.uint8)])
        q_lens = np.concatenate([q_lens, np.full(pad, Lq, np.int32)])
        t_lens = np.concatenate([t_lens, np.full(pad, Lt, np.int32)])
    score, tend = _run(
        jnp.asarray(queries.T), jnp.asarray(q_lens[:, None]),
        jnp.asarray(targets), jnp.asarray(t_lens[:, None]), Lq, Lt,
    )
    return np.asarray(score)[:B], np.asarray(tend)[:B]

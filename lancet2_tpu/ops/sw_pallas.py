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
cheap sublane slice.

Two state dtypes:
  * int16 (default when score bounds allow): DP state packs two values per
    32-bit VPU lane, halving vector-register traffic — the kernel is
    issue-bound, so this is ~2x. Bounds: all live values stay within
    [NEG16 - ge*Lq, Lq*match + ge*Lt]; guarded by `_int16_safe`.
  * int32 fallback for long targets/queries.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lancet2_tpu.ops.affine_dp import AlignParams, NEG_INF, READ_TO_HAP

B_TILE = 256
NEG16 = np.int16(-8192)
_SHIFT_STYLE = "concat"  # "roll" (rotate+mask) or "concat" (fill-block concat)
_STATE_DTYPE = "int32"  # "int32" or "float32" DP state


def _int16_safe(Lq: int, Lt: int, p: AlignParams) -> bool:
    """int16 DP state would halve vreg traffic, but the v5e Mosaic target
    rejects i16 maximum/subtract/ordered-compare vector ops (probed on
    hardware), so the kernel always runs int32 state. Kept for when a
    target with packed-16-bit VPU arithmetic shows up."""
    return False


def _shift_right_neg(x: jnp.ndarray, shift: int, col_ids: jnp.ndarray, neg) -> jnp.ndarray:
    """y[:, j] = x[:, j-shift] for j >= shift else NEG (lane-axis shift).

    Mosaic's rotate only handles 32-bit data, so 16-bit uses a fill-block
    concatenate (lane-axis concats preserve the packed 32-bit lane layout).
    """
    if x.dtype == jnp.int16 or _SHIFT_STYLE == "concat":
        fill = jnp.full((x.shape[0], shift), neg, x.dtype)
        return jnp.concatenate([fill, x[:, :-shift]], axis=1)
    rolled = pltpu.roll(x, shift, axis=1)
    return jnp.where(col_ids >= shift, rolled, neg)


def _shift1_col0(x: jnp.ndarray, col0, first_col: jnp.ndarray, sdt) -> jnp.ndarray:
    """Shift right by one lane, inserting the (traced scalar) col0 value."""
    if x.dtype == jnp.int16:
        blk = jnp.broadcast_to(col0.astype(jnp.int32)[None, None], (x.shape[0], 1))
        return jnp.concatenate([blk.astype(sdt), x[:, :-1]], axis=1)
    return jnp.where(first_col, col0.astype(sdt), pltpu.roll(x, 1, axis=1))


def _make_kernel(Lq: int, Lt: int, p: AlignParams, use_i16: bool):
    go, ge = p.gap_open1, p.gap_extend1
    if p.dual or not p.free_target_ends:
        raise NotImplementedError("pallas kernel covers the fitting single-affine mode")

    log_steps = max(1, int(np.ceil(np.log2(Lt))))
    if use_i16:
        sdt, ndt, neg = jnp.int16, np.int16, NEG16
    elif _STATE_DTYPE == "float32":
        # VPU-native float path: all values are small integers (|x| < 2^20),
        # exact in f32; max/select/add lower to the native float ALUs
        sdt, ndt, neg = jnp.float32, np.float32, np.float32(-(1 << 20))
    else:
        sdt, ndt, neg = jnp.int32, np.int32, np.int32(NEG_INF)
    s_match, s_mis, s_zero = ndt(p.match), ndt(-p.mismatch), ndt(0)

    def kernel(q_ref, qlen_ref, t_ref, tlen_ref, score_ref, tend_ref):
        t32 = t_ref[:, :].astype(jnp.int32)  # [B, Lt]
        t_codes = t32.astype(sdt)
        q_lens = qlen_ref[:, 0]  # [B] int32
        t_lens = tlen_ref[:, 0]
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (B_TILE, Lt), 1)
        t_valid = col_ids < t_lens[:, None]
        t_is_n = t32 >= 4  # loop-invariant; >= compares stay 32-bit (VPU i16
        # ordered compares are unsupported on v5e — only eq survives narrow)
        # loop-invariant halves of the substitution matrix (N scores 0)
        sub_m = jnp.where(t_is_n, s_zero, s_match)
        sub_x = jnp.where(t_is_n, s_zero, s_mis)
        first_col = col_ids == 0
        # F[j] = cummax(C)[j] - (go+ge) - ge*(j-1) - ge  with C = shift(H_tmp) + ge*j
        ramp = (ge * (col_ids + 1)).astype(sdt)  # ge * j (1-based)
        f_off = ramp + ndt(go + ge)

        H0 = jnp.zeros((B_TILE, Lt), sdt)  # columns 1..Lt of row 0
        V0 = jnp.full((B_TILE, Lt), neg, sdt)
        finalH0 = H0

        def row_update(i, qi, carry):
            # i is the 1-based row (traced int32); qi [B] this row's query bases
            H_prev, V_prev, final_H = carry
            # reshape to [B, 1] in 32-bit first: Mosaic only supports
            # minor-dim insertion for 32-bit types, then narrow
            qi32 = qi.astype(jnp.int32)[:, None] if qi.dtype != jnp.int32 else qi[:, None]
            qi = qi32.astype(sdt)
            eq = qi == t_codes
            sub = jnp.where(qi32 >= 4, s_zero, jnp.where(eq, sub_m, sub_x))

            # H[i-1][0]: 0 for the virtual row 0 (free leading target gap),
            # else the query-prefix insertion cost
            col0_prev = jnp.where(i == 1, 0, -(go + ge * (i - 1)))
            H_prev_full = _shift1_col0(H_prev, col0_prev, first_col, sdt)
            diag = H_prev_full + sub

            v_open = H_prev - ndt(go + ge)
            V_row = jnp.maximum(v_open, V_prev - ndt(ge))
            H_tmp = jnp.maximum(diag, V_row)

            # horizontal gaps: prefix max of C[k] = H_tmp_full[k-1] + ge*k
            col0 = -(go + ge * i)
            Htmp_shift = _shift1_col0(H_tmp, col0, first_col, sdt)
            run = Htmp_shift + ramp
            for s in range(log_steps):
                run = jnp.maximum(run, _shift_right_neg(run, 1 << s, col_ids, neg))
            F_row = run - f_off

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

        masked32 = jnp.where(t_valid, final_H.astype(jnp.int32), np.int32(NEG_INF))
        best = jnp.max(masked32, axis=1)
        score_ref[:, 0] = best
        # Mosaic lacks integer argmax: first-max column via min over matches
        is_max = masked32 == best[:, None]
        first = jnp.min(jnp.where(is_max, col_ids, np.int32(Lt)), axis=1)
        tend_ref[:, 0] = first + 1

    return kernel


@functools.partial(jax.jit, static_argnames=("Lq", "Lt"))
def _run(queries_t, q_lens, targets, t_lens, Lq: int, Lt: int):
    return fitting_scores_device(queries_t, q_lens, targets, t_lens, Lq, Lt)


def fitting_scores_device(queries_t, q_lens, targets, t_lens, Lq: int, Lt: int):
    """Jit-composable Pallas dispatch. Shapes must already satisfy:
    B % B_TILE == 0, Lq % 8 == 0; queries transposed [Lq, B]; q_lens/t_lens
    [B, 1] int32. Returns (scores [B] int32, t_end [B] int32, 1-based)."""
    B = targets.shape[0]
    grid = (B // B_TILE,)
    kernel = _make_kernel(Lq, Lt, READ_TO_HAP, _int16_safe(Lq, Lt, READ_TO_HAP))
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
        cost_estimate=pl.CostEstimate(
            flops=40 * B * Lq * Lt, bytes_accessed=B * (Lq + Lt) * 2, transcendentals=0
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
        jnp.asarray(queries.T.astype(np.int32)), jnp.asarray(q_lens[:, None]),
        jnp.asarray(targets), jnp.asarray(t_lens[:, None]), Lq, Lt,
    )
    return np.asarray(score)[:B], np.asarray(tend)[:B]

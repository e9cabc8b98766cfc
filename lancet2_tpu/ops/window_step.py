"""Batched device window step — the flagship compute of the framework.

One jitted dispatch processes a fixed-shape batch of windows end-to-end on
device (SURVEY.md §7 architecture sketch, steps 6-7):

  inputs  reads [W, R, L]   uint8 base codes (5 = pad), read lens [W, R]
          haps  [W, H, LH]  assembled haplotype codes,   hap lens [W, H]
          var_start/var_len/hap_allele describing one variant region per
          haplotype (allele index per hap; 0 = REF hap)
          read_sample [W, R] sample index per read

  compute 1. glocal affine DP scores of every (read, hap) pair — the
             reference's 36% minimap2 budget as one batched kernel
          2. allele assignment = argmax over haplotype scores
          3. per-(window, sample, allele) depth counts via one-hot matmul
          4. Dirichlet-Multinomial PLs + GQ per (window, sample)

This is the compile surface used by __graft_entry__ (single-chip check) and
dryrun_multichip (W axis sharded over the device mesh; counts stay local —
windows are embarrassingly parallel, collectives only aggregate run stats).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from lancet2_tpu.ops.affine_dp import READ_TO_HAP, AlignParams
from lancet2_tpu.ops.affine_dp_jax import _make_align
from lancet2_tpu.ops.genotype_tpu import batched_genotype_pls


def _pallas_ok(params: AlignParams) -> bool:
    return not params.dual and params.free_target_ends


def _dp_scores_pallas(q, ql, t, tl):
    """Pad to the Pallas kernel's alignment contract and dispatch.

    q [B, L] uint8, ql [B], t [B, LH] uint8, tl [B] -> scores [B] int32.
    """
    from lancet2_tpu.ops.sw_pallas import B_TILE, fitting_scores_device

    B, L = q.shape
    LH = t.shape[1]
    Lp = -(-L // 8) * 8
    LHp = -(-LH // 128) * 128
    Bp = -(-B // B_TILE) * B_TILE
    q = jnp.pad(q, ((0, Bp - B), (0, Lp - L)), constant_values=5)
    t = jnp.pad(t, ((0, Bp - B), (0, LHp - LH)), constant_values=5)
    ql = jnp.pad(ql.astype(jnp.int32), (0, Bp - B), constant_values=Lp)
    tl = jnp.pad(tl.astype(jnp.int32), (0, Bp - B), constant_values=LHp)
    scores, _ = fitting_scores_device(
        q.T.astype(jnp.int32), ql[:, None], t, tl[:, None], Lp, LHp
    )
    return scores[:B]


_BAND_Q = 64  # band-start quantization (lane-block granularity)


def _extract_band(t, tl, ro, L: int, margin: int):
    """Banded target extraction: per-pair window of the haplotype around the
    read's expected diagonal (its mapped offset into the window).

    The reference reaches the same economy through minimap2's seed-and-extend
    (genotyper.cpp:89-191 builds per-haplotype seed indexes); here the mapper
    -provided offset IS the seed, and the band is extracted with a chain of
    lane-block selects (XLA per-row gathers are ~30x slower on TPU, measured).

    t [B, LH] u8, tl [B] i32, ro [B] i32 (expected target start of the read)
    -> (t_band [B, Lb], tl_band [B], used) with Lb = roundup(L+2*margin, 128).
    """
    B, LH = t.shape
    Lb = -(-(L + 2 * margin) // 128) * 128
    if LH <= Lb:
        return t, tl, False
    max_blk = (LH - Lb) // _BAND_Q
    sblk = jnp.clip((ro - margin) // _BAND_Q, 0, max_blk)
    out = jnp.zeros((B, Lb), t.dtype)
    for k in range(max_blk + 1):
        out = jnp.where(
            (sblk == k)[:, None],
            jax.lax.slice_in_dim(t, k * _BAND_Q, k * _BAND_Q + Lb, axis=1),
            out,
        )
    tl_band = jnp.clip(tl - sblk * _BAND_Q, 0, Lb)
    return out, tl_band, True


def make_window_step(num_samples: int, num_alleles: int, params: AlignParams = READ_TO_HAP,
                     dp_backend: str = "auto", band_margin: int | None = None):
    """Build the jittable window-batch step function.

    dp_backend: 'pallas' (Mosaic kernel — TPU only), 'scan' (XLA lax.scan
    engine — any backend), or 'auto' (pallas on TPU when params fit the
    kernel's fitting single-affine mode, else scan).

    band_margin: when set, the step takes an extra read_offset [W, R] input
    (each read's expected start inside the window) and runs the DP over a
    banded target window of roundup(L+2*margin, 128) columns instead of the
    full haplotype — exact whenever the optimal path stays inside the band
    (soft-clips/indel drift up to ~margin bp).
    """
    align = _make_align(params, with_dirs=False)

    def _use_pallas() -> bool:
        if dp_backend == "pallas":
            return True
        if dp_backend == "auto":
            return _pallas_ok(params) and jax.default_backend() in ("tpu", "axon")
        return False

    def step(reads, read_lens, read_sample, read_valid, haps, hap_lens, hap_allele,
             read_offset=None):
        W, R, L = reads.shape
        H, LH = haps.shape[1], haps.shape[2]

        # flatten all (window, read, hap) pairs into one DP batch
        q = jnp.broadcast_to(reads[:, :, None, :], (W, R, H, L)).reshape(-1, L)
        ql = jnp.broadcast_to(read_lens[:, :, None], (W, R, H)).reshape(-1)
        t = jnp.broadcast_to(haps[:, None, :, :], (W, R, H, LH)).reshape(-1, LH)
        tl = jnp.broadcast_to(hap_lens[:, None, :], (W, R, H)).reshape(-1)
        tl = tl.astype(jnp.int32)

        if band_margin is not None and read_offset is not None:
            ro = jnp.broadcast_to(
                read_offset.astype(jnp.int32)[:, :, None], (W, R, H)
            ).reshape(-1)
            t, tl, _ = _extract_band(t, tl, ro, L, band_margin)

        if _use_pallas():
            scores = _dp_scores_pallas(q, ql, t, tl)
        else:
            scores, _t_end = align(q, ql.astype(jnp.int32), t, tl)
        scores = scores.reshape(W, R, H)

        # allele assignment: best haplotype per read (mask invalid reads)
        best_hap = jnp.argmax(scores, axis=-1)  # [W, R]
        best_score = jnp.max(scores, axis=-1)
        assigned_allele = jnp.take_along_axis(
            hap_allele, best_hap, axis=1
        )  # [W, R] via hap_allele [W, H]

        # minimum-score gate stands in for mapability filtering
        ok = read_valid & (best_score >= (ql.reshape(W, R, H)[:, :, 0] // 4))

        # per-(window, sample, allele) depth counts: one-hot contraction
        sample_oh = jax.nn.one_hot(read_sample, num_samples, dtype=jnp.float32)
        allele_oh = jax.nn.one_hot(assigned_allele, num_alleles, dtype=jnp.float32)
        allele_oh = allele_oh * ok[:, :, None].astype(jnp.float32)
        counts = jnp.einsum("wrs,wra->wsa", sample_oh, allele_oh)  # [W, S, A]

        pls, gq, best_gt = batched_genotype_pls(
            counts.reshape(-1, num_alleles), num_alleles
        )
        G = num_alleles * (num_alleles + 1) // 2
        return {
            "scores": scores,
            "allele_counts": counts,
            "pls": pls.reshape(W, num_samples, G),
            "gq": gq.reshape(W, num_samples),
            "best_gt": best_gt.reshape(W, num_samples),
        }

    return step


def synth_window_batch(
    rng: np.random.Generator,
    num_windows: int = 8,
    reads_per_window: int = 64,
    read_len: int = 128,
    num_haps: int = 4,
    hap_len: int = 512,
    num_samples: int = 2,
):
    """Synthetic fixed-shape window batch for benches and compile checks."""
    W, R, L, H, LH = num_windows, reads_per_window, read_len, num_haps, hap_len
    haps = rng.integers(0, 4, (W, H, LH)).astype(np.uint8)
    # ALT haps = ref hap with one SNV
    haps[:, 1:, :] = haps[:, :1, :]
    for h in range(1, H):
        pos = LH // 2 + h
        haps[:, h, pos] = (haps[:, h, pos] + 1) % 4
    reads = np.zeros((W, R, L), dtype=np.uint8)
    read_offset = np.zeros((W, R), dtype=np.int32)
    read_sample = rng.integers(0, num_samples, (W, R)).astype(np.int32)
    src_hap = rng.integers(0, 2, (W, R)).astype(np.int32)  # REF or first ALT
    for w in range(W):
        for r in range(R):
            start = int(rng.integers(0, LH - L))
            reads[w, r] = haps[w, src_hap[w, r], start : start + L]
            read_offset[w, r] = start
    read_lens = np.full((W, R), L, dtype=np.int32)
    hap_lens = np.full((W, H), LH, dtype=np.int32)
    hap_allele = np.minimum(np.arange(H), 1)[None, :].repeat(W, axis=0).astype(np.int32)
    read_valid = np.ones((W, R), dtype=bool)
    return dict(
        reads=jnp.asarray(reads),
        read_lens=jnp.asarray(read_lens),
        read_sample=jnp.asarray(read_sample),
        read_valid=jnp.asarray(read_valid),
        haps=jnp.asarray(haps),
        hap_lens=jnp.asarray(hap_lens),
        hap_allele=jnp.asarray(hap_allele),
        read_offset=jnp.asarray(read_offset),
    )

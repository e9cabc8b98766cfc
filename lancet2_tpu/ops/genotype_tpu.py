"""Batched on-device genotyping math (jax twin of caller.likelihood).

Dirichlet-Multinomial PLs for a whole batch of variants at once: counts
[B, K] -> PLs [B, G] with G = K(K+1)/2, plus GQ and best-genotype indices.
Pure vectorized special-function math — trivially on-device (reference
spends 0.2% CPU here; on TPU it fuses into the window step).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from lancet2_tpu.caller.likelihood import (
    DM_ALPHA_FLOOR,
    DM_BACKGROUND_ERROR,
    DM_OVERDISPERSION,
)


def genotype_alpha_matrix(num_alleles: int) -> np.ndarray:
    """[G, K] Dirichlet alphas in VCF genotype order (static per K)."""
    precision = (1.0 - DM_OVERDISPERSION) / DM_OVERDISPERSION
    rows = []
    for b in range(num_alleles):
        for a in range(b + 1):
            mu = np.full(num_alleles, DM_BACKGROUND_ERROR / num_alleles)
            main = 1.0 - DM_BACKGROUND_ERROR
            if a == b:
                mu[a] += main
            else:
                mu[a] += main / 2.0
                mu[b] += main / 2.0
            rows.append(np.maximum(DM_ALPHA_FLOOR, mu * precision))
    return np.stack(rows)


@partial(jax.jit, static_argnames=("num_alleles",))
def batched_genotype_pls(counts: jnp.ndarray, num_alleles: int):
    """counts [B, K] float/int -> (pls [B, G] int32, gq [B] int32, best [B]).

    ln P(c|a) = lnG(sum a) - lnG(N + sum a) + sum[lnG(c_i+a_i) - lnG(a_i)]
    """
    alphas = jnp.asarray(genotype_alpha_matrix(num_alleles))  # [G, K]
    c = counts.astype(jnp.float32)[:, None, :]  # [B, 1, K]
    a = alphas[None, :, :]  # [1, G, K]
    lg = jax.scipy.special.gammaln
    ll = jnp.sum(lg(c + a) - lg(a), axis=-1)
    ll = ll + lg(jnp.sum(a, axis=-1)) - lg(jnp.sum(c + a, axis=-1))  # [B, G]
    best_ll = jnp.max(ll, axis=-1, keepdims=True)
    raw = -10.0 * (ll - best_ll) / jnp.log(10.0)
    pls = jnp.round(raw).astype(jnp.int32)
    best = jnp.argmin(pls, axis=-1).astype(jnp.int32)
    # GQ = second smallest PL (min is 0 after normalization), capped at 99
    top2 = -jax.lax.top_k(-pls, 2)[0]
    gq = jnp.minimum(top2[:, 1] - top2[:, 0], 99).astype(jnp.int32)
    return pls, gq, best


@partial(jax.jit, static_argnames=("num_alleles",))
def _pls_f64(counts, num_alleles: int):
    alphas = jnp.asarray(genotype_alpha_matrix(num_alleles), jnp.float64)
    c = counts.astype(jnp.float64)[:, None, :]
    a = alphas[None, :, :]
    lg = jax.scipy.special.gammaln
    ll = jnp.sum(lg(c + a) - lg(a), axis=-1)
    ll = ll + lg(jnp.sum(a, axis=-1)) - lg(jnp.sum(c + a, axis=-1))
    best_ll = jnp.max(ll, axis=-1, keepdims=True)
    raw = -10.0 * (ll - best_ll) / jnp.log(10.0)
    return jnp.round(raw).astype(jnp.int64)


_SHARDED_PLS_CACHE: dict = {}


def _sharded_pls_fn(mesh, num_alleles: int):
    """shard_map of the f64 PL engine over the mesh's first axis: PL rows
    are embarrassingly parallel (per-(call, sample) counts), so each device
    computes its row shard — no collectives, byte-identical to the
    single-device dispatch (dryrun-asserted)."""
    from jax.sharding import PartitionSpec as P

    key = (id(mesh), num_alleles)
    fn = _SHARDED_PLS_CACHE.get(key)
    if fn is not None:
        return fn
    axis = mesh.axis_names[0]

    def local(c):
        return _pls_f64(c, num_alleles)

    fn = jax.jit(jax.shard_map(
        local, mesh=mesh, in_specs=P(axis), out_specs=P(axis)
    ))
    _SHARDED_PLS_CACHE[key] = fn
    return fn


def batched_genotype_pls_exact(counts, num_alleles: int,
                               mesh=None) -> np.ndarray:
    """Device DM PLs, bit-equal to the host float64 engine.

    float32 is NOT enough here: measured 74/1108 (K=2) and 61/1108 (K=3)
    off-by-one integer-PL mismatches vs the host float64 path, including
    low-depth rows — lgamma cancellation error cannot be bounded by a cheap
    rounding-margin guard. Under scoped x64 the device computes in float64
    (TPU software emulation; this op is ~0.2% of the reference CPU budget,
    so the emulation cost is noise) and matched the host on every tested
    row (0/1216 mismatches, K∈{2,3}, depths 0..3000).

    The batch dim is bucketed so jitted executables are reused.
    Returns pls [B, G] int64 numpy (caller derives GQ from the ints).
    """
    counts = np.asarray(counts, np.int64)
    B = counts.shape[0]
    Bb = B
    for b in (64, 256, 1024, 4096, 16384):
        if B <= b:
            Bb = b
            break
    if mesh is not None:
        d = mesh.devices.size
        Bb = max(Bb, d) + (-max(Bb, d)) % d
    if Bb != B:
        counts = np.pad(counts, ((0, Bb - B), (0, 0)))
    with jax.enable_x64(True):
        if mesh is not None:
            pls = _sharded_pls_fn(mesh, num_alleles)(jnp.asarray(counts))
        else:
            pls = _pls_f64(jnp.asarray(counts), num_alleles)
        return np.asarray(pls)[:B]

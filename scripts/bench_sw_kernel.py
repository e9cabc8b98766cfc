"""Micro-bench + hardware-correctness check for the Pallas fitting-DP kernel.

Runs on whatever device JAX selects (the attached TPU under axon). Verifies
kernel scores against the numpy baseline on a small random batch, then times
the kernel and the XLA-scan engine at the headline shapes with the chained
-scan method from bench.py (explicit data dependency between iterations, one
host transfer at the end).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from lancet2_tpu.ops.affine_dp import READ_TO_HAP, align_batch_numpy
from lancet2_tpu.ops.affine_dp_jax import _make_align
from lancet2_tpu.ops import sw_pallas

CHAIN_K = 16


def check_correctness():
    rng = np.random.default_rng(7)
    B, Lq, Lt = 256, 48, 256
    q = rng.integers(0, 4, (B, Lq)).astype(np.uint8)
    t = rng.integers(0, 4, (B, Lt)).astype(np.uint8)
    ql = rng.integers(8, Lq + 1, B).astype(np.int32)
    tl = rng.integers(30, Lt + 1, B).astype(np.int32)
    for b in range(B):
        q[b, ql[b]:] = 5
        t[b, tl[b]:] = 5
    ref = align_batch_numpy(q, ql.astype(np.int64), t, tl.astype(np.int64), READ_TO_HAP)
    s, e = sw_pallas.sw_fitting_scores_pallas(q, ql, t, tl)
    np.testing.assert_array_equal(ref["score"], s.astype(np.int64))
    np.testing.assert_array_equal(ref["t_end"], e.astype(np.int64))
    print("hardware correctness: OK (int16 path =", sw_pallas._int16_safe(Lq, Lt, READ_TO_HAP), ")")


def bench_engine(name, fn, B, Lq, Lt):
    """fn(q_t [Lq,B] u8, ql [B,1] i32, t [B,Lt] u8, tl [B,1] i32) -> scores [B]."""
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.integers(0, 4, (Lq, B)), jnp.uint8)
    t = jnp.asarray(rng.integers(0, 4, (B, Lt)), jnp.uint8)
    ql = jnp.full((B, 1), Lq, jnp.int32)
    tl = jnp.full((B, 1), Lt, jnp.int32)

    def chained(q, ql, t, tl):
        def body(carry, _):
            s = fn(carry, ql, t, tl)
            nxt = (carry + (s[None, :] & 1).astype(jnp.uint8)) % 4
            return nxt, s[0]
        _, ss = jax.lax.scan(body, q, None, length=CHAIN_K)
        return ss

    run = jax.jit(chained)
    np.asarray(run(q, ql, t, tl))  # compile + warm
    t0 = time.perf_counter()
    np.asarray(run(q, ql, t, tl))
    per = (time.perf_counter() - t0) / CHAIN_K
    gcups = B * Lq * Lt / per / 1e9
    print(f"{name:28s} B={B} Lq={Lq} Lt={Lt}: {per*1e3:8.2f} ms/batch  {gcups:8.2f} GCUPS")
    return gcups


def main():
    print("device:", jax.devices()[0].device_kind)
    check_correctness()

    def pallas_fn(q_t, ql, t, tl):
        s, _ = sw_pallas.fitting_scores_device(
            q_t.astype(jnp.int32), ql, t, tl, q_t.shape[0], t.shape[1]
        )
        return s

    scan_align = _make_align(READ_TO_HAP, with_dirs=False)

    def scan_fn(q_t, ql, t, tl):
        s, _ = scan_align(q_t.T, ql[:, 0], t, tl[:, 0])
        return s

    for (B, Lq, Lt) in [(2048, 152, 1024), (8192, 128, 512)]:
        bench_engine("pallas", pallas_fn, B, Lq, Lt)
        bench_engine("xla-scan", scan_fn, B, Lq, Lt)


if __name__ == "__main__":
    main()

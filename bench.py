"""Benchmark: device window-step throughput + alignment-kernel GCUPS.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extra": {...}}

Measurement note: through the axon TPU tunnel, `block_until_ready` does not
reliably wait for device completion, so both benches run K iterations inside
one jitted `lax.scan` with an explicit data dependency between iterations
(the previous output perturbs the next input) and a single host transfer at
the end. Per-iteration time = total / K, with the one-off RTT amortized.

Baseline (BASELINE.md): the reference CPU caller averages 414 ms/window
=> ~2.4 windows/s/core, ~154 windows/s for the 64-thread baseline in the
driver's north star. Headline metric = device-compute windows/s/chip of the
batched window step (all read x haplotype glocal DP + allele counting + DM
genotyping); vs_baseline = value / 154.
"""

from __future__ import annotations

import json
import time

import numpy as np

CHAIN_K = 16


def bench_sw_kernel():
    """Amortized fitting-DP GCUPS over a chained-scan of CHAIN_K aligns
    (the Pallas Mosaic kernel — the flagship alignment engine)."""
    import jax
    import jax.numpy as jnp

    from lancet2_tpu.ops.sw_pallas import fitting_scores_device

    B, Lq, Lt = 2048, 152, 1024

    def chained(q, ql, t, tl):
        def body(carry, _):
            s, _te = fitting_scores_device(
                carry.T.astype(jnp.int32), ql[:, None], t, tl[:, None], Lq, Lt
            )
            # fold the score into the next query -> sequential dependency
            nxt = (carry + (s[:, None] & 1).astype(jnp.uint8)) % 4
            return nxt, s[0]
        _, ss = jax.lax.scan(body, q, None, length=CHAIN_K)
        return ss

    fn = jax.jit(chained)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.integers(0, 4, (B, Lq)), jnp.uint8)
    t = jnp.asarray(rng.integers(0, 4, (B, Lt)), jnp.uint8)
    ql = jnp.full((B,), Lq, jnp.int32)
    tl = jnp.full((B,), Lt, jnp.int32)
    np.asarray(fn(q, ql, t, tl))  # compile + warm
    t0 = time.perf_counter()
    np.asarray(fn(q, ql, t, tl))
    per_align = (time.perf_counter() - t0) / CHAIN_K
    return B * Lq * Lt / per_align / 1e9, per_align


def bench_evidence_pallas():
    """Amortized evidence-kernel rate at the executor's dispatch shape: the
    full genotype-stage Pallas kernel (scores + NM + per-region evidence
    stats). EVERY output lane is consumed by the chained carry — the
    round-1 bench consumed only `score`, letting XLA dead-code-eliminate
    the evidence planes and report a ~3000x-too-fast number."""
    import jax
    import jax.numpy as jnp

    from lancet2_tpu.ops.evidence_pallas import _device_call

    B, Lq, Lt, R, K = 2048, 160, 384, 2, 4
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.integers(0, 4, (B, Lq)), jnp.uint8)
    qu = jnp.asarray(rng.integers(20, 40, (B, Lq)), jnp.uint8)
    t = jnp.asarray(rng.integers(0, 4, (B, Lt)), jnp.uint8)
    ql = jnp.full((B, 1), Lq, jnp.int32)
    tl = jnp.full((B, 1), Lt, jnp.int32)
    reg = np.zeros((B, 8), np.int32)
    reg[:, 0], reg[:, 4] = 100, 106
    reg[:, 1], reg[:, 5] = 300, 301
    reg = jnp.asarray(reg)
    interpret = jax.default_backend() == "cpu"

    def chained(qq):
        def body(carry, _):
            iout, fout = _device_call(
                carry, qu, t, ql, tl, reg,
                Lq=Lq, Lt=Lt, R=R, b_tile=128, interpret=interpret,
            )
            bump = (iout.sum() + fout.sum().astype(jnp.int32)) & 1
            nxt = (carry + bump.astype(jnp.uint8)) % 4
            return nxt, iout[0, 0]
        _, ss = jax.lax.scan(body, qq, None, length=K)
        return ss

    fn = jax.jit(chained)
    np.asarray(fn(q))
    t0 = time.perf_counter()
    np.asarray(fn(q))
    per = (time.perf_counter() - t0) / K
    return B * Lq * Lt / per / 1e9, per


def bench_window_step():
    """Amortized device window-step throughput on a representative shape."""
    import jax
    import jax.numpy as jnp

    from lancet2_tpu.ops.window_step import make_window_step, synth_window_batch

    W, R, L, H, LH, MARGIN = 16, 128, 128, 4, 512, 64
    rng = np.random.default_rng(1)
    batch = synth_window_batch(
        rng, num_windows=W, reads_per_window=R, read_len=L, num_haps=H,
        hap_len=LH, num_samples=2,
    )
    step = make_window_step(2, 2, band_margin=MARGIN)
    args_static = (
        batch["read_lens"], batch["read_sample"], batch["read_valid"],
        batch["haps"], batch["hap_lens"], batch["hap_allele"], batch["read_offset"],
    )

    def chained(reads, read_lens, read_sample, read_valid, haps, hap_lens, hap_allele, ro):
        def body(carry, _):
            out = step(carry, read_lens, read_sample, read_valid, haps, hap_lens,
                       hap_allele, ro)
            bump = (out["allele_counts"].sum().astype(jnp.uint8) & 1)
            nxt = (carry + bump) % 4
            return nxt, out["gq"][0, 0]
        _, ss = jax.lax.scan(body, reads, None, length=CHAIN_K)
        return ss

    fn = jax.jit(chained)
    np.asarray(fn(batch["reads"], *args_static))
    t0 = time.perf_counter()
    np.asarray(fn(batch["reads"], *args_static))
    per_step = (time.perf_counter() - t0) / CHAIN_K
    lb = -(-(L + 2 * MARGIN) // 128) * 128  # banded DP width
    cells = W * R * H * L * min(lb, LH)
    return W / per_step, cells / per_step / 1e9, per_step


def _enable_compile_cache():
    import os

    import jax

    cache_dir = os.path.expanduser("~/.cache/lancet2_tpu/xla")
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def main():
    import jax

    _enable_compile_cache()

    device = jax.devices()[0]
    sw_gcups, sw_dt = bench_sw_kernel()
    ev_gcups, ev_dt = bench_evidence_pallas()
    win_per_s, step_gcups, step_dt = bench_window_step()

    baseline_64t_windows_per_s = 154.0  # 2.4 win/s/core x 64 (BASELINE.md)
    result = {
        "metric": "microassembly_device_windows_per_s_per_chip",
        "value": round(win_per_s, 2),
        "unit": "windows/s",
        "vs_baseline": round(win_per_s / baseline_64t_windows_per_s, 3),
        "extra": {
            "device": str(device),
            "sw_kernel_gcups": round(sw_gcups, 2),
            "sw_kernel_ms_per_batch": round(sw_dt * 1e3, 2),
            "evidence_dp_gcups": round(ev_gcups, 2),
            "evidence_dp_ms_per_batch": round(ev_dt * 1e3, 2),
            "window_step_gcups": round(step_gcups, 2),
            "window_step_ms": round(step_dt * 1e3, 2),
            "window_step_shape": "W16xR128xH4 (128bp reads, 512bp haps, 256-col band)",
            "note": "device compute path only (banded batched DP + allele counts + DM PLs); host BAM IO not included; chained-scan timing; GCUPS counts banded cells",
        },
    }
    print(json.dumps(result))
    try:
        from lancet2_tpu.utils.profiling import append_history

        append_history({"kind": "bench", **result})
    except Exception:
        pass


if __name__ == "__main__":
    main()

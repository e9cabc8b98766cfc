"""Indexed evidence dispatch: dedup pair inputs into read/haplotype pools.

The two-pass device stream previously shipped every (read x hap x
region-chunk) pair as fully expanded [B, Lq]/[B, Lt] rows — ~700 B per pair
through the TPU tunnel, whose limited effective bandwidth made transfer
(not kernel cells) ~90% of the measured device wall (round-4 profile). A
window's reads each align against every haplotype, so the expanded stream
ships each read 2-6x and each haplotype once per read; this module ships
the UNIQUE reads and haplotypes of a window-batch group ONCE ("pools") and
per pair only four i32 indices. Fixed-shape gather jits expand pairs on
device and feed the existing Mosaic kernels:

    G1: (reads_q, haps, read_ix, hap_ix, band_start) -> q [B,Lq], t [B,Lt]
    S : span kernel (R=0, lean inputs)                       [Mosaic]
    -- host gate: score/overlap/taint -> needed pair indices --
    G2: (reads_q, reads_qu, haps, sel indices) -> q,qu,t     [XLA only]
    E : full evidence kernel (R<=2)                          [Mosaic]

G1/G2 are XLA-only (cheap compiles even through the tunnel compiler); S
and E reuse the exact kernels of ops/evidence_pallas.py at one fixed shape
each, so the indexed protocol introduces no new Mosaic compiles.
Intermediate q/t arrays never leave the device; the host reads back
32 B/pair of span scalars plus 192 B/pair for the needed subset only.

Bit-exactness: a gathered q row equals the expanded row (pools are padded
with N=5 exactly like the old per-pair padding); a gathered t row equals
the expanded band row on every column < t_len, and DP cells at column c
depend only on columns <= c, so all extracted outputs (taken at columns
<= t_len) are bit-identical to the expanded protocol (parity-tested,
tests/test_evidence_fused.py).

Reference anchor: this replaces the per-read minimap2 budget
(src/lancet/caller/genotyper.cpp:376-411) like the expanded protocol did —
only the transport representation changed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from lancet2_tpu.ops.evidence_pallas import (
    _count_dispatch,
    _device_call,
    _span_call,
    B_TILE,
    FOUT_W,
    IOUT_W,
    IOUT_W_SPAN,
)

# pool-shape buckets: executables are reused across batches; padding rows
# are inert (value 5 = N, length 1). Kept within ~25% padding — a 36k-read
# batch padded to a 65536 bucket was measured shipping 44% dead bytes
NR_BUCKETS = (512, 1024, 2048, 4096, 8192, 12288, 16384, 24576, 32768,
              40960, 49152, 65536)
NH_BUCKETS = (64, 256, 1024, 4096)
LH_BUCKETS = (1536, 3072, 6144)


def _bucket(n: int, buckets) -> int:
    for b in buckets:
        if n <= b:
            return b
    return -(-n // 128) * 128


class DevicePools:
    """Device-resident read/hap pools for one window-batch group.

    Base quals stay HOST-side (`reads_qu_host`): only the ~16% pass-2
    subset ever reads them, so shipping the full qual pool per batch was
    pure waste — pass-2 chunks gather their qual rows on host and ship
    <=cap rows each (evidence_indexed_submit)."""

    def __init__(self, reads_q, reads_qu, read_lens, haps, hap_lens,
                 device=None):
        import contextlib

        reads_q = np.asarray(reads_q, np.uint8)
        reads_qu = np.asarray(reads_qu, np.uint8)
        read_lens = np.asarray(read_lens, np.int32)
        haps = np.asarray(haps, np.uint8)
        nr, lq = reads_q.shape
        nh, lh = haps.shape
        nrb = _bucket(nr, NR_BUCKETS)
        nhb = _bucket(nh, NH_BUCKETS)
        lhb = _bucket(lh, LH_BUCKETS)
        if nrb != nr or lq % 8:
            lqb = lq + ((-lq) % 8)
            reads_q = np.pad(reads_q, ((0, nrb - nr), (0, lqb - lq)),
                             constant_values=5)
            read_lens = np.pad(read_lens, (0, nrb - nr), constant_values=1)
            if lqb != lq:
                reads_qu = np.pad(reads_qu, ((0, 0), (0, lqb - lq)))
        if nhb != nh or lhb != lh:
            haps = np.pad(haps, ((0, nhb - nh), (0, lhb - lh)),
                          constant_values=5)
        self.lq = reads_q.shape[1]
        self.lh = haps.shape[1]
        # 4-bit base packing: codes are 0..5, so two bases share a byte —
        # halves the dominant pool transfer; G1 unpacks after the gather
        packed_q = (reads_q[:, 0::2] | (reads_q[:, 1::2] << 4)).astype(
            np.uint8
        )
        ctx = jax.default_device(device) if device is not None \
            else contextlib.nullcontext()
        with ctx:
            self.reads_q = jnp.asarray(packed_q)
            self.haps = jnp.asarray(haps)
        # host copies for gate math, pass-2 qual gathers, and fallbacks
        self.read_lens_host = read_lens
        self.reads_qu_host = reads_qu
        _count_dispatch(
            packed_q.nbytes + haps.nbytes + read_lens.nbytes, 0,
        )


@functools.partial(jax.jit, static_argnames=("Lt",))
def _gather_qt(reads_q, haps, read_ix, hap_ix, band_start, Lt: int):
    """Expand one pair chunk from the pools: q by row gather + 4-bit
    unpack, t by banded window gather (clipped; columns >= t_len are
    masked by the kernel's extraction and never influence extracted
    outputs)."""
    qp = reads_q[read_ix]                      # [B, Lq/2] packed
    b, half = qp.shape
    q = jnp.stack([qp & 15, qp >> 4], axis=-1).reshape(b, half * 2)
    lh = haps.shape[1]
    cols = band_start[:, None] + jnp.arange(Lt, dtype=jnp.int32)[None, :]
    cols = jnp.clip(cols, 0, lh - 1)
    t = haps[hap_ix[:, None], cols]
    return q, t


def _pad_ix(arr, n, fill=0):
    m = len(arr)
    if m == n:
        return np.ascontiguousarray(arr, np.int32)
    out = np.full(n, fill, np.int32)
    out[:m] = arr
    return out


def span_indexed_submit(pools: DevicePools, read_ix, hap_ix, band_start,
                        tlens, Lt: int, chunk: int):
    """Pass-1 span dispatch for one pair chunk (indices only cross the
    tunnel). Returns the device iout handle [chunk, IOUT_W_SPAN]."""
    n = len(read_ix)
    rix = _pad_ix(read_ix, chunk)
    hix = _pad_ix(hap_ix, chunk)
    bst = _pad_ix(band_start, chunk)
    tl = _pad_ix(tlens, chunk, fill=1)
    ql = pools.read_lens_host[rix].copy()
    if n < chunk:
        ql[n:] = 1
    q, t = _gather_qt(
        pools.reads_q, pools.haps,
        jnp.asarray(rix), jnp.asarray(hix), jnp.asarray(bst), Lt=Lt,
    )
    interpret = jax.default_backend() == "cpu"
    iout = _span_call(
        q, jnp.asarray(ql[:, None]), t, jnp.asarray(tl[:, None]),
        Lq=pools.lq, Lt=Lt, b_tile=B_TILE, interpret=interpret,
    )
    _count_dispatch(chunk * (3 * 4 + 8), chunk * IOUT_W_SPAN * 4)
    return iout


def evidence_indexed_submit(pools: DevicePools, read_ix, hap_ix, band_start,
                            tlens, reg8, Lt: int, cap: int, R: int = 2):
    """Pass-2 full-evidence dispatch over <=cap selected pairs (indices +
    packed regions only cross the tunnel). Returns device (iout, fout)."""
    n = len(read_ix)
    rix = _pad_ix(read_ix, cap)
    hix = _pad_ix(hap_ix, cap)
    bst = _pad_ix(band_start, cap)
    tl = _pad_ix(tlens, cap, fill=1)
    ql = pools.read_lens_host[rix].copy()
    reg = np.zeros((cap, 8), np.int32)
    reg[:n] = reg8
    if n < cap:
        ql[n:] = 1
    # quals gathered on host and shipped only for this <=cap subset (the
    # pool keeps quals host-side — see DevicePools)
    qu = pools.reads_qu_host[rix]
    q, t = _gather_qt(
        pools.reads_q, pools.haps,
        jnp.asarray(rix), jnp.asarray(hix), jnp.asarray(bst), Lt=Lt,
    )
    interpret = jax.default_backend() == "cpu"
    iout, fout = _device_call(
        q, jnp.asarray(qu), t,
        jnp.asarray(ql[:, None]), jnp.asarray(tl[:, None]),
        jnp.asarray(reg),
        Lq=pools.lq, Lt=Lt, R=R, b_tile=B_TILE, interpret=interpret,
    )
    _count_dispatch(cap * (3 * 4 + 8 + 32) + qu.nbytes,
                    cap * (IOUT_W + FOUT_W) * 4)
    return iout, fout


def expand_pairs_numpy(reads_q, reads_qu, read_lens, haps,
                       read_ix, hap_ix, band_start, tlens, Lt: int):
    """Host expansion of indexed pairs into the exact rows the old expanded
    protocol shipped (N=5 padding beyond t_len) — the CPU-executor path and
    the fallback used for taint re-runs."""
    reads_q = np.asarray(reads_q)
    haps = np.asarray(haps)
    qs = reads_q[read_ix]
    qus = np.asarray(reads_qu)[read_ix]
    qlens = np.asarray(read_lens)[read_ix].astype(np.int64)
    lh = haps.shape[1]
    rel = np.arange(Lt, dtype=np.int64)[None, :]
    cols = np.asarray(band_start)[:, None] + rel
    ts = haps[np.asarray(hap_ix)[:, None], np.minimum(cols, lh - 1)]
    ts[rel >= np.asarray(tlens)[:, None]] = 5  # band-relative padding
    return qs, qus, qlens, ts, np.asarray(tlens).astype(np.int64)

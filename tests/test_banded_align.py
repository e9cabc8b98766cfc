"""Banded global-alignment certificate: native banded DP must be
bit-identical to the full numpy DP on every pair (score, t_start/end, CIGAR).

The native engine (native/assembly_core.cpp l2t_align_batch) runs global
(HAP_TO_REF) pairs through a BAND_W=96 parallelogram band first; a
certificate (score > match*minL - (BAND_W+1)*min_extend) proves the band
contained the optimum, else it reruns full. These tests cover both sides:
certified pairs (typical haplotype-vs-anchor shapes) and fallback pairs
(huge indels / unrelated sequences that fail the certificate).
"""

from __future__ import annotations

import numpy as np
import pytest

from lancet2_tpu.base import native_core
from lancet2_tpu.ops.affine_dp import (
    HAP_TO_REF,
    align_batch_numpy,
    traceback_batch,
)

pytestmark = pytest.mark.skipif(
    not native_core.available(), reason="native core unavailable"
)


def _numpy_reference(qs, qlens, ts, tlens, p):
    out = align_batch_numpy(qs, qlens, ts, tlens, p)
    cigars = traceback_batch(out["dirs"], qlens, out["t_end"], p)
    return out, cigars


def _native(qs, qlens, ts, tlens, p):
    return native_core.align_batch(qs, qlens, ts, tlens, p)


def _mutate(rng, ref, n_snv=0, ins=None, dele=None):
    seq = list(ref)
    for _ in range(n_snv):
        i = int(rng.integers(0, len(seq)))
        seq[i] = int((seq[i] + 1 + rng.integers(0, 3)) % 4)
    if ins is not None:
        pos, length = ins
        seq[pos:pos] = list(rng.integers(0, 4, length))
    if dele is not None:
        pos, length = dele
        del seq[pos : pos + length]
    return np.array(seq, np.uint8)


def _pad(seqs):
    width = max(len(s) for s in seqs)
    out = np.full((len(seqs), width), 5, np.uint8)
    lens = np.zeros(len(seqs), np.int64)
    for i, s in enumerate(seqs):
        out[i, : len(s)] = s
        lens[i] = len(s)
    return out, lens


class TestBandedGlobalParity:
    def _check(self, alt_seqs, ref_seq):
        qs, qlens = _pad(alt_seqs)
        ts, tlens = _pad([ref_seq] * len(alt_seqs))
        nat = _native(qs, qlens, ts, tlens, HAP_TO_REF)
        ref_out, ref_cigars = _numpy_reference(qs, qlens, ts, tlens, HAP_TO_REF)
        for b in range(len(alt_seqs)):
            assert nat[b]["score"] == int(ref_out["score"][b]), b
            assert nat[b]["t_end"] == int(ref_out["t_end"][b]), b
            assert nat[b]["cigar"] == ref_cigars[b], b

    def test_certified_typical_haplotypes(self):
        """SNVs + small indels: the band certificate holds, banded path."""
        rng = np.random.default_rng(11)
        ref = rng.integers(0, 4, 1200).astype(np.uint8)
        alts = [
            _mutate(rng, ref, n_snv=3),
            _mutate(rng, ref, n_snv=1, ins=(400, 12)),
            _mutate(rng, ref, n_snv=2, dele=(700, 9)),
            _mutate(rng, ref, ins=(100, 40), dele=(900, 25)),
        ]
        self._check(alts, ref)

    def test_fallback_large_indel(self):
        """A 150 bp deletion: certificate can still hold (D shifts the band),
        and a 150 bp insertion somewhere else plus deletions force higher
        imbalance — both must match full DP either way."""
        rng = np.random.default_rng(12)
        ref = rng.integers(0, 4, 1500).astype(np.uint8)
        alts = [
            _mutate(rng, ref, dele=(300, 150)),
            _mutate(rng, ref, ins=(200, 150)),
            _mutate(rng, ref, ins=(200, 120), dele=(1000, 110)),
        ]
        self._check(alts, ref)

    def test_fallback_unrelated_sequence(self):
        """Random vs random fails the certificate -> full-DP fallback."""
        rng = np.random.default_rng(13)
        ref = rng.integers(0, 4, 600).astype(np.uint8)
        alt = rng.integers(0, 4, 580).astype(np.uint8)
        self._check([alt], ref)

    def test_short_sequences_band_covers_all(self):
        rng = np.random.default_rng(14)
        ref = rng.integers(0, 4, 120).astype(np.uint8)
        alts = [_mutate(rng, ref, n_snv=2), _mutate(rng, ref, ins=(50, 5))]
        self._check(alts, ref)

    def test_randomized_sweep(self):
        """Randomized fuzz over shapes/mutation mixes (the regression net)."""
        rng = np.random.default_rng(15)
        for trial in range(10):
            n = int(rng.integers(300, 2000))
            ref = rng.integers(0, 4, n).astype(np.uint8)
            kind = trial % 5
            if kind == 0:
                alt = _mutate(rng, ref, n_snv=int(rng.integers(0, 8)))
            elif kind == 1:
                alt = _mutate(rng, ref, ins=(int(rng.integers(0, n)),
                                             int(rng.integers(1, 60))))
            elif kind == 2:
                alt = _mutate(rng, ref, dele=(int(rng.integers(0, n - 80)),
                                              int(rng.integers(1, 80))))
            elif kind == 3:
                alt = _mutate(rng, ref, n_snv=4,
                              ins=(int(rng.integers(0, n)), 30),
                              dele=(int(rng.integers(0, n - 140)), 35))
            else:
                alt = rng.integers(0, 4, int(rng.integers(250, n))).astype(
                    np.uint8
                )
            self._check([alt], ref)

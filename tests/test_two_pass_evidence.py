"""Two-pass device evidence dispatch parity (span prefilter + full kernel).

The production TPU path runs the R=0 span kernel over every pair, then the
full evidence kernel over only gate-passing, region-overlapping pairs
(~22% measured). This pins bit-exactness vs the host engine on the
observable surface: span fields for ALL pairs, region fields wherever
assemble_evidence would read them (gate passed + slot overlap)."""

from __future__ import annotations

import numpy as np
import pytest

from lancet2_tpu.base.dna import encode
from lancet2_tpu.caller import genotyper as gmod
from lancet2_tpu.ops.evidence_dp import R_MAX
from lancet2_tpu.utils.simulate import random_reference


@pytest.fixture()
def pair_set():
    rng = np.random.default_rng(5)
    ref = random_reference(300, seed=5)
    hapA = encode(ref[100:228])
    alt = "G" if ref[164] != "G" else "T"
    hapB = encode(ref[100:164] + alt + ref[165:228])
    pair_q, pair_qu, pair_t, pair_meta = [], [], [], []
    for ri in range(20):
        off = int(rng.integers(100, 180))
        # every 3rd read is garbage: gate-failing pairs must be excluded by
        # the prefilter exactly as the full path would exclude them
        seq = (ref[off:off + 40] if ri % 3 else random_reference(40, seed=100 + ri))
        for h, hap in enumerate((hapA, hapB)):
            regions = np.zeros((R_MAX, 2), np.int32)
            regions[0] = (64, 65)
            if ri % 4 == 0:  # some pairs exercise the R=2 kernel
                regions[1] = (100, 101)
            pair_q.append(encode(seq))
            pair_qu.append(np.full(40, 35, np.uint8))
            pair_t.append(hap)
            pair_meta.append((ri, h, regions, [(0, h)]))
    return pair_q, pair_qu, pair_t, pair_meta


def test_two_pass_matches_host_engine(pair_set):
    pair_q, pair_qu, pair_t, pair_meta = pair_set
    g = gmod.Genotyper(backend="evidence")
    saved = (gmod._PAIR_CHUNK, gmod._QUERY_BUCKETS)
    gmod._PAIR_CHUNK, gmod._QUERY_BUCKETS = 16, (64,)
    on_dev = gmod._on_device
    gmod._on_device = lambda: True  # interpret-mode Pallas on CPU
    try:
        two_pass = g.run_evidence_pairs(pair_q, pair_qu, pair_t, pair_meta)
    finally:
        gmod._on_device = on_dev
        gmod._PAIR_CHUNK, gmod._QUERY_BUCKETS = saved
    host = gmod.Genotyper(backend="evidence").run_evidence_pairs(
        pair_q, pair_qu, pair_t, pair_meta
    )

    t_s = np.asarray(host["t_start"])
    t_e = np.asarray(host["t_end"])
    ql = np.asarray([len(q) for q in pair_q])
    gate = (np.asarray(host["score"]) >= (0.25 * ql).astype(int)) & (t_e > t_s)
    n = len(pair_q)
    regions = np.stack([m[2] for m in pair_meta])
    active = regions[:, :, 1] > regions[:, :, 0]
    slot_read = (gate[:, None]
                 & (regions[:, :, 1] > t_s[:, None])
                 & (regions[:, :, 0] < t_e[:, None]) & active)

    for k in ("score", "t_end", "t_start", "nm"):
        assert np.array_equal(np.asarray(two_pass[k]), np.asarray(host[k])), k
    for k in ("qv", "aligned", "min_bq", "raw", "pbq", "matches"):
        a, b = np.asarray(two_pass[k]), np.asarray(host[k])
        assert np.array_equal(a[slot_read], b[slot_read]), k
    # sanity: the prefilter actually excluded something
    assert (~(gate & slot_read.any(axis=1))).sum() > 0

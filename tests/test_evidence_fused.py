"""Indexed (pool + gather) evidence dispatch parity.

The round-5 device protocol ships unique read/hap pools once and per-pair
indices (ops/evidence_fused.py) instead of expanded rows. These tests pin:

  * build_pair_indices == build_evidence_pairs (pair order, target rows,
    band-shifted regions, vis assignment) — the prep-worker builder
  * run_evidence_indexed device path (interpret Pallas) == the host engine
    on the observable output surface (span everywhere; region slots
    wherever assemble_evidence reads them)
  * expand_pairs_numpy reproduces the old expanded rows exactly (N=5
    padding beyond t_len)
"""

from __future__ import annotations

from types import SimpleNamespace

import numpy as np
import pytest

from lancet2_tpu.base.dna import encode
from lancet2_tpu.caller import genotyper as gmod
from lancet2_tpu.ops.evidence_dp import R_MAX
from lancet2_tpu.utils.simulate import random_reference


def _mk_read(seq_codes, start0):
    return SimpleNamespace(
        codes=np.asarray(seq_codes, np.uint8),
        qual=np.full(len(seq_codes), 35, np.uint8),
        length=len(seq_codes),
        start0=start0,
    )


def _mk_variant(local_ref_start0, ref_allele, alt_seq, hap_starts):
    alt = SimpleNamespace(sequence=alt_seq, local_hap_starts=hap_starts)
    return SimpleNamespace(
        local_ref_start0=local_ref_start0, ref_allele=ref_allele, alts=[alt]
    )


@pytest.fixture()
def component():
    rng = np.random.default_rng(9)
    ref = random_reference(400, seed=9)
    hap_ref = encode(ref[80:300])          # 220 bp REF haplotype
    alt = "G" if ref[200] != "G" else "T"
    hap_alt = encode(ref[80:200] + alt + ref[201:300])
    hap_codes = [hap_ref, hap_alt]
    anchor_pos1 = 81
    reads = []
    for ri in range(24):
        off = int(rng.integers(60, 260))
        ln = int(rng.integers(30, 61))
        seq = (random_reference(ln, seed=500 + ri) if ri % 5 == 0
               else ref[off:off + ln])
        reads.append(_mk_read(encode(seq), off))
    variants = [
        _mk_variant(120, ref[200], alt, {1: 120}),
        _mk_variant(40, ref[120], ref[120], {1: 40}),
    ]
    return hap_codes, reads, variants, anchor_pos1


def test_indexed_builder_matches_expanded(component):
    hap_codes, reads, variants, anchor = component
    g = gmod.Genotyper(backend="evidence")
    margin = 16  # small margin so banding actually engages for most reads
    pq, pqu, pt, pm = g.build_evidence_pairs(
        hap_codes, reads, variants, anchor_pos1=anchor,
        band_margin=margin, max_regions=2,
    )
    idx = g.build_pair_indices(
        [len(h) for h in hap_codes], reads, variants,
        anchor_pos1=anchor, band_margin=margin, max_regions=2,
    )
    # the indexed builder prunes pairs whose every region slot clipped to
    # empty (they can never contribute evidence), keeping each read's
    # first REF pair — apply the same criterion to the expanded list
    meta_r_all = np.array([m[0] for m in pm])
    meta_h_all = np.array([m[1] for m in pm])
    regions_exp_all = np.stack([m[2] for m in pm])
    active_any = (regions_exp_all[:, :, 1] > regions_exp_all[:, :, 0]).any(1)
    first_ref = np.zeros(len(pm), bool)
    seen = set()
    for i, (r, h, _reg, _vis) in enumerate(pm):
        if h == 0 and r not in seen:
            first_ref[i] = True
            seen.add(r)
    keep = active_any | first_ref
    kept = np.flatnonzero(keep)
    n = kept.size
    assert len(idx["read_ix"]) == n
    assert n < len(pm)  # pruning engaged on this fixture

    pq = [pq[i] for i in kept]
    pt = [pt[i] for i in kept]
    pm = [pm[i] for i in kept]
    assert np.array_equal(idx["read_ix"], meta_r_all[kept])
    assert np.array_equal(idx["hap_local"], meta_h_all[kept])
    assert np.array_equal(idx["regions"], regions_exp_all[kept])
    for i, m in enumerate(pm):
        assert idx["vis_table"][idx["meta_vis"][i]] == m[3]

    # expanded rows == pool-gathered rows (incl. N padding beyond t_len)
    from lancet2_tpu.ops.evidence_fused import expand_pairs_numpy

    lq = max(r.length for r in reads)
    lt = max(len(t) for t in pt)
    nr = len(reads)
    reads_q = np.full((nr, lq), 5, np.uint8)
    reads_qu = np.zeros((nr, lq), np.uint8)
    read_lens = np.zeros(nr, np.int32)
    for i, r in enumerate(reads):
        reads_q[i, : r.length] = r.codes
        reads_qu[i, : r.length] = r.qual
        read_lens[i] = r.length
    hw = max(len(h) for h in hap_codes)
    haps = np.full((len(hap_codes), hw), 5, np.uint8)
    for i, h in enumerate(hap_codes):
        haps[i, : len(h)] = h
    qs, qus, qlens, ts, tlens = expand_pairs_numpy(
        reads_q, reads_qu, read_lens, haps,
        idx["read_ix"], idx["hap_local"], idx["band_start"], idx["tlens"],
        lt,
    )
    for i in range(n):
        t_row = np.full(lt, 5, np.uint8)
        t_row[: len(pt[i])] = pt[i]
        assert np.array_equal(ts[i], t_row), f"target row {i}"
        q_row = np.full(lq, 5, np.uint8)
        q_row[: len(pq[i])] = pq[i]
        assert np.array_equal(qs[i], q_row), f"query row {i}"
        assert qlens[i] == len(pq[i])
        assert tlens[i] == len(pt[i])


def _pools_and_pairs(component, margin=16):
    hap_codes, reads, variants, anchor = component
    g = gmod.Genotyper(backend="evidence")
    idx = g.build_pair_indices(
        [len(h) for h in hap_codes], reads, variants,
        anchor_pos1=anchor, band_margin=margin, max_regions=2,
    )
    lq = 64
    nr = len(reads)
    reads_q = np.full((nr, lq), 5, np.uint8)
    reads_qu = np.zeros((nr, lq), np.uint8)
    read_lens = np.zeros(nr, np.int32)
    for i, r in enumerate(reads):
        reads_q[i, : r.length] = r.codes
        reads_qu[i, : r.length] = r.qual
        read_lens[i] = r.length
    hw = max(len(h) for h in hap_codes)
    haps = np.full((len(hap_codes), hw), 5, np.uint8)
    hap_lens = np.zeros(len(hap_codes), np.int32)
    for i, h in enumerate(hap_codes):
        haps[i, : len(h)] = h
        hap_lens[i] = len(h)
    pools = dict(reads_q=reads_q, reads_qu=reads_qu, read_lens=read_lens,
                 haps=haps, hap_lens=hap_lens)
    pairs = dict(read_ix=idx["read_ix"], hap_ix=idx["hap_local"],
                 band_start=idx["band_start"], tlens=idx["tlens"],
                 regions=idx["regions"], lt_bucket=128)
    return pools, pairs


def test_indexed_device_path_matches_host(component):
    pools, pairs = _pools_and_pairs(component)
    g = gmod.Genotyper(backend="evidence")
    on_dev = gmod._on_device
    gmod._on_device = lambda: True  # interpret-mode Pallas on CPU
    try:
        got = g.run_evidence_indexed(pools, pairs, pair_chunk=256)
    finally:
        gmod._on_device = on_dev
    want = gmod.Genotyper(backend="evidence").run_evidence_indexed(
        pools, pairs, pair_chunk=256
    )

    t_s = np.asarray(want["t_start"])
    t_e = np.asarray(want["t_end"])
    ql = pools["read_lens"][pairs["read_ix"]]
    gate = (np.asarray(want["score"]) >= (0.25 * ql).astype(int)) & (t_e > t_s)
    regions = pairs["regions"]
    active = regions[:, :, 1] > regions[:, :, 0]
    slot_read = (gate[:, None]
                 & (regions[:, :, 1] > t_s[:, None])
                 & (regions[:, :, 0] < t_e[:, None]) & active)
    for k in ("score", "t_end", "t_start", "nm"):
        assert np.array_equal(np.asarray(got[k]), np.asarray(want[k])), k
    for k in ("qv", "aligned", "min_bq", "raw", "pbq", "matches"):
        a, b = np.asarray(got[k]), np.asarray(want[k])
        assert np.array_equal(a[slot_read], b[slot_read]), k
    assert gate.sum() > 0 and (~gate).sum() > 0  # gate engages both ways


def test_indexed_sharded_span_matches_plain(component):
    """The shard_map indexed span (pools replicated, pairs sharded) must be
    byte-identical to the per-chunk span_indexed_submit path."""
    import jax

    from lancet2_tpu.ops.evidence_fused import (
        DevicePools,
        span_indexed_submit,
    )
    from lancet2_tpu.ops.evidence_pallas import span_pairs_finalize
    from lancet2_tpu.parallel.evidence_spmd import span_indexed_sharded
    from lancet2_tpu.parallel.mesh import make_mesh

    pools, pairs = _pools_and_pairs(component)
    dev = DevicePools(pools["reads_q"], pools["reads_qu"],
                      pools["read_lens"], pools["haps"], pools["hap_lens"])
    n = len(pairs["read_ix"])
    lt = pairs["lt_bucket"]

    mesh = make_mesh(jax.devices())
    got = span_indexed_sharded(
        mesh, dev, pairs["read_ix"], pairs["hap_ix"],
        pairs["band_start"], pairs["tlens"], lt,
    )
    iout = span_indexed_submit(
        dev, pairs["read_ix"], pairs["hap_ix"], pairs["band_start"],
        pairs["tlens"], lt, chunk=((n + 127) // 128) * 128,
    )
    want = span_pairs_finalize(iout, None, n)
    for k in ("score", "t_end", "t_start", "nm", "overflow"):
        assert np.array_equal(np.asarray(want[k]), np.asarray(got[k])), k

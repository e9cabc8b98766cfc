"""Tape-packed batched device graph construction (the production XLA pass).

The first device pass (ops/graph_tpu.py) padded every window to one
[S, L] grid — the ref row forced L≈2048 (13x wasted lanes for 151 bp
reads) and each (k, S, L) bucket was a fresh multi-minute Mosaic/XLA
compile through the TPU tunnel, so `--graph-backend auto` could never
pick it. This module is the redesign the round-3 verdict asked for
(docs/ARCHITECTURE.md "tape-packed"):

  * every sequence of a WINDOW BATCH is packed into fixed-width
    overlapping tape rows [NR, TW=160] — one shape for everything, so
    exactly one compile per (k, row-bucket) for the life of the process
  * rows overlap by k-1 bases; row r owns occurrence range
    [r*B, r*B + M) with stride B = M-1, so every adjacent k-mer pair of
    the original sequence appears inside some single row (edges need
    consecutive occurrences); duplicated overlap occurrences collapse in
    the MateMer (kmer, qname-hash, tag) dedup exactly like repeated
    k-mers inside one read do, so counts stay exact
  * one global lexsort keyed (win, canon-words, qhash, tag, ord) groups
    all windows at once; per-(node,sample) counts, role counts,
    first-occurrence sign/label, EDGE dedup, and the ref-path node map
    are all segment ops — outputs are COMPACT (node/edge capacity
    buckets, not per-lane padding), so the device->host transfer is a
    few MB per batch instead of hundreds
  * per-window results are bit-identical to Graph._build_graph (the
    numpy/native twins): node identity = FNV-1a-64 of the canonical
    k-mer (hashed on host over the n_uniq survivors only), MateMer
    dedup, expected-error filter, and first-occurrence ordering all
    reproduce graph.cpp:262-341 semantics (parity: tests/test_graph_tape.py)

Replaces the reference's Graph::BuildGraph budget (23.4% cumulative CPU,
profiling/history.jsonl entry 1).
"""

from __future__ import annotations

from functools import partial

import numpy as np

from lancet2_tpu.base.phred import PHRED_TO_ERROR_PROB

TW = 160                      # tape row width (bases)
_BASES_PER_WORD = 8           # 4-bit codes per u32 word, MSB-first
_ROW_BUCKETS = (1024, 4096, 16384, 65536, 262144)

# occurrence-ordinal packing: (seq_ord << 12 | offset) << 4 | sign<<3 | label
_OFF_BITS = 12
_ORD_SHIFT = 4


def _num_words(k: int) -> int:
    return -(-k // _BASES_PER_WORD)


def _bucket(n: int, buckets) -> int:
    for b in buckets:
        if n <= b:
            return b
    return n


def _make_tape_engine(k: int, num_samples: int, NR: int, NCAP: int,
                      ECAP: int, RCAP: int):
    import jax
    import jax.numpy as jnp

    W = _num_words(k)
    M = TW - k + 1

    def pack_words(kmers):
        n = kmers.shape[0]
        pad = W * _BASES_PER_WORD - k
        padded = jnp.concatenate(
            [kmers.astype(jnp.uint32), jnp.zeros((n, pad), jnp.uint32)],
            axis=1)
        words = padded.reshape(n, W, _BASES_PER_WORD)
        shifts = jnp.arange(_BASES_PER_WORD - 1, -1, -1, dtype=jnp.uint32) * 4
        return (words << shifts[None, None, :]).sum(axis=2, dtype=jnp.uint32)

    def run(tape, quals, win, qlo, qhi, tag, sample, is_ref, occ_cnt,
            pair_cnt, seq_ord, base_off, ref_base, row_valid):
        """tape/quals [NR, TW] u8; the rest are [NR] row metadata."""
        n_occ = NR * M
        offs = jnp.arange(M, dtype=jnp.int32)
        occ_valid = (offs[None, :] < occ_cnt[:, None]) & row_valid[:, None]

        # ---- k-mers + canonicalization -------------------------------
        idx = offs[None, :, None] + jnp.arange(k, dtype=jnp.int32)[None, None, :]
        kmers = jnp.take_along_axis(
            tape[:, None, :].repeat(M, axis=1), idx, axis=2
        ).reshape(n_occ, k)
        comp_table = jnp.asarray([3, 2, 1, 0, 4, 5], jnp.uint8)
        rc = comp_table[kmers[:, ::-1].astype(jnp.int32)]
        fwd_w = pack_words(kmers)
        rc_w = pack_words(rc)
        diff = fwd_w != rc_w
        any_diff = diff.any(axis=1)
        first_w = jnp.argmax(diff, axis=1)
        rows = jnp.arange(n_occ)
        is_plus = jnp.where(
            any_diff, fwd_w[rows, first_w] <= rc_w[rows, first_w], True)
        canon_w = jnp.where(is_plus[:, None], fwd_w, rc_w)
        signs = jnp.where(is_plus, 0, 1).astype(jnp.int32)
        ovalid = occ_valid.reshape(-1)
        canon_w = jnp.where(ovalid[:, None], canon_w, jnp.uint32(0xFFFFFFFF))

        # ---- expected-error filter -----------------------------------
        errs = jnp.asarray(PHRED_TO_ERROR_PROB, jnp.float32)[
            jnp.clip(quals, 0, 255).astype(jnp.int32)]
        prefix = jnp.concatenate(
            [jnp.zeros((NR, 1), jnp.float32), jnp.cumsum(errs, axis=1)],
            axis=1)
        window_err = prefix[:, k:] - prefix[:, :-k]       # [NR, M]
        ee_ok = (jnp.floor(window_err) <= 0) & (~is_ref[:, None])
        ee_ok = (ee_ok & occ_valid).reshape(-1)

        # ---- per-occurrence metadata + global lexsort ----------------
        occ_row = jnp.repeat(jnp.arange(NR, dtype=jnp.int32), M)
        o_win = win[occ_row]
        o_qlo, o_qhi, o_tag = qlo[occ_row], qhi[occ_row], tag[occ_row]
        o_sample = sample[occ_row]
        # window-local grid ordinal + first-occurrence payload (sign/label
        # ride the ordinal so one segment_min recovers all three)
        grid_ord = (seq_ord[occ_row] << _OFF_BITS) + base_off[occ_row] \
            + jnp.tile(offs, NR)
        label_occ = jnp.where(is_ref[occ_row], 1,
                              tag[occ_row]).astype(jnp.int32)
        ordl = (grid_ord << _ORD_SHIFT) | (signs << 3) | label_occ
        ordl = jnp.where(ovalid, ordl, jnp.int32(0x7FFFFFFF))

        keys = [ordl, o_tag, o_qlo, o_qhi]
        for w in range(W - 1, -1, -1):
            keys.append(canon_w[:, w])
        keys.append(jnp.where(ovalid, o_win, jnp.int32(0x7FFFFFFF)))
        order = jnp.lexsort(tuple(keys))

        s_w = canon_w[order]
        s_win = o_win[order]
        s_qlo, s_qhi, s_tag = o_qlo[order], o_qhi[order], o_tag[order]
        s_sample = o_sample[order]
        s_ee = ee_ok[order]
        s_ordl = ordl[order]
        s_valid = ovalid[order]

        new_kmer = jnp.concatenate(
            [jnp.array([True]),
             (s_w[1:] != s_w[:-1]).any(axis=1) | (s_win[1:] != s_win[:-1])])
        new_kmer = new_kmer & s_valid
        node_rank = jnp.cumsum(new_kmer.astype(jnp.int32)) - 1
        n_uniq = jnp.sum(new_kmer.astype(jnp.int32))
        seg = jnp.where(s_valid, jnp.minimum(node_rank, NCAP - 1), NCAP)

        new_group = new_kmer | jnp.concatenate(
            [jnp.array([True]),
             (s_qlo[1:] != s_qlo[:-1]) | (s_qhi[1:] != s_qhi[:-1])
             | (s_tag[1:] != s_tag[:-1])])
        new_group = new_group & s_valid
        grp_id = jnp.cumsum(new_group.astype(jnp.int32)) - 1
        grp_id = jnp.minimum(grp_id, n_occ - 1)
        grp_has_ee = jax.ops.segment_sum(
            s_ee.astype(jnp.int32), grp_id, num_segments=n_occ) > 0
        lane_contrib = (new_group & grp_has_ee[grp_id]).astype(jnp.int32)

        # ---- compact per-node outputs --------------------------------
        sample_oh = jax.nn.one_hot(
            jnp.clip(s_sample, 0, num_samples - 1), num_samples,
            dtype=jnp.int32)
        counts = jax.ops.segment_sum(
            sample_oh * lane_contrib[:, None], seg, num_segments=NCAP + 1)
        role_oh = jax.nn.one_hot(
            (s_tag == 4).astype(jnp.int32), 2, dtype=jnp.int32)
        roles = jax.ops.segment_sum(
            role_oh * lane_contrib[:, None], seg, num_segments=NCAP + 1)
        first_ordl = jax.ops.segment_min(
            jnp.where(s_valid, s_ordl, jnp.int32(0x7FFFFFFF)), seg,
            num_segments=NCAP + 1)
        node_w = jax.ops.segment_max(
            jnp.where(new_kmer[:, None], s_w, 0), seg, num_segments=NCAP + 1)
        node_win = jax.ops.segment_max(
            jnp.where(new_kmer, s_win, -1), seg, num_segments=NCAP + 1)

        # ---- edges: consecutive owned occurrence pairs ---------------
        inv = jnp.zeros(n_occ, jnp.int32).at[order].set(
            jnp.minimum(node_rank, NCAP - 1))
        inv2 = inv.reshape(NR, M)
        pair_valid = (offs[None, :] < pair_cnt[:, None]) & row_valid[:, None]
        e_src = jnp.where(pair_valid, inv2, NCAP)
        e_dst = jnp.where(
            pair_valid,
            jnp.concatenate([inv2[:, 1:], jnp.zeros((NR, 1), jnp.int32)],
                            axis=1),
            NCAP,
        )
        e_src = e_src.reshape(-1)
        e_dst = e_dst.reshape(-1)
        eorder = jnp.lexsort((e_dst, e_src))
        se_src, se_dst = e_src[eorder], e_dst[eorder]
        e_new = jnp.concatenate(
            [jnp.array([True]),
             (se_src[1:] != se_src[:-1]) | (se_dst[1:] != se_dst[:-1])])
        e_new = e_new & (se_src < NCAP)
        e_rank = jnp.cumsum(e_new.astype(jnp.int32)) - 1
        n_edges = jnp.sum(e_new.astype(jnp.int32))
        e_slot = jnp.where(e_new, jnp.minimum(e_rank, ECAP - 1), ECAP)
        edges = jnp.full((ECAP + 1, 2), -1, jnp.int32)
        edges = edges.at[e_slot].set(
            jnp.stack([se_src, se_dst], axis=1), mode="drop")

        # ---- ref-path node map ---------------------------------------
        ref_slot = ref_base[occ_row] + jnp.tile(offs, NR)
        ref_mask = is_ref[occ_row] & ovalid & (ref_base[occ_row] >= 0)
        ref_slot = jnp.where(ref_mask, jnp.minimum(ref_slot, RCAP - 1), RCAP)
        ref_map = jnp.full(RCAP + 1, -1, jnp.int32)
        ref_map = ref_map.at[ref_slot].set(inv, mode="drop")

        return {
            "node_words": node_w[:NCAP],
            "counts": counts[:NCAP],
            "roles": roles[:NCAP],
            "first_ordl": first_ordl[:NCAP],
            "node_win": node_win[:NCAP],
            "n_uniq": n_uniq,
            "edges": edges[:ECAP],
            "n_edges": n_edges,
            "ref_map": ref_map[:RCAP],
        }

    return run


_ENGINES: dict = {}


def _get_engine(k: int, num_samples: int, NR: int, NCAP: int, ECAP: int,
                RCAP: int):
    import jax

    key = (k, num_samples, NR, NCAP, ECAP, RCAP)
    fn = _ENGINES.get(key)
    if fn is None:
        fn = jax.jit(_make_tape_engine(k, num_samples, NR, NCAP, ECAP, RCAP))
        _ENGINES[key] = fn
    return fn


def unpack_words(words: np.ndarray, k: int) -> np.ndarray:
    n, W = words.shape
    shifts = (np.arange(_BASES_PER_WORD - 1, -1, -1, dtype=np.uint32) * 4)
    bases = (words[:, :, None] >> shifts[None, None, :]) & np.uint32(0xF)
    return bases.reshape(n, W * _BASES_PER_WORD)[:, :k].astype(np.uint8)


def build_graphs_tape(batch, k: int, num_samples: int):
    """Batched device construction over many windows at once.

    batch: list of (seqs, quals, meta) per window — same per-window inputs
    as ops.graph_tpu.build_graph_device (ref first; sequences shorter than
    k+1 pre-filtered by the caller). Returns a list of per-window dicts
    with keys {ids, codes, counts, roles, first_ord, signs, labels,
    edges (uniq-row pairs), ref_rows} or None for empty windows.
    """
    import jax.numpy as jnp

    from lancet2_tpu.base.hashing import hash_kmer_matrix

    M = TW - k + 1
    B = M - 1  # row stride in occurrences: every adjacent pair lives in a row

    rows = []  # (win, seq_codes_slice, qual_slice, meta, occ_cnt, pair_cnt,
    #            seq_ord, base_off, ref_base)
    ref_bases = []  # per window: ref-map slot offset
    ref_lens = []
    rcap_used = 0
    for wi, (seqs, quals, meta) in enumerate(batch):
        ref_len = 0
        if meta and meta[0][0] == 1:  # LABEL_REFERENCE
            ref_len = len(seqs[0]) - k + 1
        ref_bases.append(rcap_used)
        ref_lens.append(ref_len)
        for si, codes in enumerate(seqs):
            n_occ_seq = len(codes) - k + 1
            if n_occ_seq <= 0:
                continue
            q = quals[si]
            is_ref_seq = meta[si][0] == 1
            r = 0
            while r * B < n_occ_seq or (r == 0 and n_occ_seq > 0):
                base = r * B
                occ = min(M, n_occ_seq - base)
                pair = max(0, min(B, n_occ_seq - 1 - base))
                rows.append((
                    wi, codes[base : base + TW],
                    None if q is None else q[base : base + TW],
                    meta[si], occ, pair, si, base,
                    (rcap_used + base) if is_ref_seq else -1,
                ))
                r += 1
                if base + M >= n_occ_seq:
                    break
        rcap_used += ref_len

    if not rows:
        return [None for _ in batch]

    NR = _bucket(len(rows), _ROW_BUCKETS)
    n_occ = NR * M
    NCAP = max(1 << 16, n_occ // 8)
    ECAP = 2 * NCAP
    RCAP = max(1 << 14, _bucket(rcap_used, (1 << 14, 1 << 16, 1 << 18, 1 << 20)))

    while True:
        out = _dispatch(rows, k, num_samples, NR, NCAP, ECAP, RCAP)
        if int(out["n_uniq"]) <= NCAP and int(out["n_edges"]) <= ECAP:
            break
        NCAP *= 4
        ECAP *= 4

    return _materialize(out, batch, ref_bases, ref_lens, k)


def _dispatch(rows, k, num_samples, NR, NCAP, ECAP, RCAP):
    import jax.numpy as jnp

    tape = np.zeros((NR, TW), np.uint8)
    quals = np.zeros((NR, TW), np.uint8)
    win = np.zeros(NR, np.int32)
    qlo = np.zeros(NR, np.uint32)
    qhi = np.zeros(NR, np.uint32)
    tag = np.zeros(NR, np.int32)
    sample = np.zeros(NR, np.int32)
    is_ref = np.zeros(NR, bool)
    occ_cnt = np.zeros(NR, np.int32)
    pair_cnt = np.zeros(NR, np.int32)
    seq_ord = np.zeros(NR, np.int32)
    base_off = np.zeros(NR, np.int32)
    ref_base = np.full(NR, -1, np.int32)
    row_valid = np.zeros(NR, bool)

    for i, (wi, codes, q, meta, occ, pair, so, bo, rb) in enumerate(rows):
        L = len(codes)
        tape[i, :L] = codes
        lab, smp, tg, qh = meta
        if lab == 1:
            quals[i, :L] = 255  # ref never passes the EE gate anyway
        elif q is not None:
            quals[i, :L] = q
        # no-qual reads keep qual 0 (error prob ~1 -> EE fails), matching
        # graph_tpu.build_graph_device / the numpy twin
        win[i] = wi
        qlo[i] = qh & 0xFFFFFFFF
        qhi[i] = (qh >> 32) & 0xFFFFFFFF
        tag[i] = tg
        sample[i] = max(smp, 0)
        is_ref[i] = lab == 1
        occ_cnt[i] = occ
        pair_cnt[i] = pair
        seq_ord[i] = so
        base_off[i] = bo
        ref_base[i] = rb
        row_valid[i] = True

    fn = _get_engine(k, num_samples, NR, NCAP, ECAP, RCAP)
    out = fn(
        jnp.asarray(tape), jnp.asarray(quals), jnp.asarray(win),
        jnp.asarray(qlo), jnp.asarray(qhi), jnp.asarray(tag),
        jnp.asarray(sample), jnp.asarray(is_ref), jnp.asarray(occ_cnt),
        jnp.asarray(pair_cnt), jnp.asarray(seq_ord), jnp.asarray(base_off),
        jnp.asarray(ref_base), jnp.asarray(row_valid),
    )
    return {kk: np.asarray(v) for kk, v in out.items()}


def _materialize(out, batch, ref_bases, ref_lens, k):
    from lancet2_tpu.base.hashing import hash_kmer_matrix

    n_uniq = int(out["n_uniq"])
    node_win = out["node_win"][:n_uniq]
    words = out["node_words"][:n_uniq]
    counts = out["counts"][:n_uniq]
    roles = out["roles"][:n_uniq]
    first_ordl = out["first_ordl"][:n_uniq]
    n_edges = int(out["n_edges"])
    edges = out["edges"][:n_edges]
    ref_map = out["ref_map"]

    codes = unpack_words(words, k)
    ids = hash_kmer_matrix(codes)

    # per-window contiguous node ranges (win is the major sort key)
    results = []
    starts = np.searchsorted(node_win, np.arange(len(batch)))
    stops = np.searchsorted(node_win, np.arange(len(batch)) + 1)
    e_src_win = node_win[edges[:, 0]] if n_edges else np.empty(0, np.int32)
    e_starts = np.searchsorted(e_src_win, np.arange(len(batch)))
    e_stops = np.searchsorted(e_src_win, np.arange(len(batch)) + 1)

    for wi in range(len(batch)):
        lo, hi = int(starts[wi]), int(stops[wi])
        if hi <= lo:
            results.append(None)
            continue
        fo = first_ordl[lo:hi]
        e = edges[int(e_starts[wi]) : int(e_stops[wi])]
        rr = ref_map[ref_bases[wi] : ref_bases[wi] + ref_lens[wi]]
        results.append({
            "ids": ids[lo:hi],
            "codes": codes[lo:hi],
            "counts": counts[lo:hi],
            "roles": roles[lo:hi],
            "first_ord": fo >> _ORD_SHIFT,      # seq_ord<<12 | offset
            "signs": (fo >> 3) & 1,
            "labels": fo & 7,
            "edges": e - lo,                    # window-local uniq rows
            "ref_rows": np.where(rr >= 0, rr - lo, -1),
        })
    return results

"""Device k-mer graph construction: canonicalize/sort/segment-sum on XLA.

The reference's Graph::BuildGraph is 19.2% of its CPU budget (reference:
src/lancet/cbdg/graph.cpp:262-341; profiling/history.jsonl entry 1). This
module reformulates the construction pass as fixed-shape tensor ops so it
runs on the accelerator:

  1. every (sequence, offset) k-mer occurrence becomes one lane
  2. canonicalization = lexicographic min(fwd, revcomp) on 4-bit-packed
     big-endian words (word compare == base-code lex compare)
  3. node identity = the packed canonical words themselves while on device;
     occurrences are grouped by a multi-word lexsort + boundary cumsum
     (a jit-free np.unique equivalent)
  4. per-read expected-error k-mer filter via qual prefix sums
     (reference: graph.cpp:296-304)
  5. MateMer dedup = first occurrence per (kmer, qname-hash, tag) group
     with >=1 expected-error-clean member (reference: graph.cpp:290-307)
  6. per-(node, sample) support counts + per-role counts = segment sums

The host maps surviving packed keys to FNV-1a-64 node ids (hashing n_uniq
strings, not n_occ) and keeps prune/compress/traversal unchanged — outputs
are bit-identical to Graph._build_graph (parity-tested in
tests/test_graph_tpu.py).

Shapes are static per (R, L, k) bucket: n_occ = R*(L-k+1) lanes padded with
invalid occurrences; all outputs are n_occ-padded with validity masks.
"""

from __future__ import annotations

from functools import partial

import numpy as np

from lancet2_tpu.base.phred import PHRED_TO_ERROR_PROB

_BASES_PER_WORD = 8  # 4 bits per base code (0..4; N=4), MSB-first


def _num_words(k: int) -> int:
    return -(-k // _BASES_PER_WORD)


def _make_engine(k: int, num_samples: int):
    import jax
    import jax.numpy as jnp

    W = _num_words(k)

    def pack_words(kmers):
        """[n, k] u8 codes -> [n, W] u32 big-endian 4-bit packed words."""
        n = kmers.shape[0]
        pad = W * _BASES_PER_WORD - k
        padded = jnp.concatenate(
            [kmers.astype(jnp.uint32),
             jnp.zeros((n, pad), jnp.uint32)], axis=1)
        words = padded.reshape(n, W, _BASES_PER_WORD)
        shifts = jnp.arange(_BASES_PER_WORD - 1, -1, -1, dtype=jnp.uint32) * 4
        return (words << shifts[None, None, :]).sum(axis=2, dtype=jnp.uint32)

    def run(seq_codes, seq_quals, seq_lens, seq_label, seq_sample, seq_tag,
            seq_qhash_lo, seq_qhash_hi, seq_is_ref, seq_valid):
        """seq_codes [S, L] u8; quals [S, L] u8; lens [S] i32; label/sample/
        tag [S] i32; qhash split into two u32 halves; is_ref/valid [S] bool.

        Returns per-occurrence and per-group tensors (see keys below)."""
        S, L = seq_codes.shape
        M = L - k + 1  # occurrence slots per sequence
        n_occ = S * M

        # ---- occurrence grid -----------------------------------------
        offs = jnp.arange(M, dtype=jnp.int32)
        occ_valid = (offs[None, :] < (seq_lens[:, None] - k + 1)) & seq_valid[:, None]

        # k-mer windows: gather [S, M, k]
        idx = offs[None, :, None] + jnp.arange(k, dtype=jnp.int32)[None, None, :]
        kmers = jnp.take_along_axis(
            seq_codes[:, None, :].repeat(M, axis=1), idx, axis=2
        )  # [S, M, k]
        kmers = kmers.reshape(n_occ, k)

        # ---- canonicalization ----------------------------------------
        comp_table = jnp.asarray([3, 2, 1, 0, 4, 5], jnp.uint8)
        rc = comp_table[kmers[:, ::-1].astype(jnp.int32)]
        fwd_w = pack_words(kmers)          # [n_occ, W]
        rc_w = pack_words(rc)
        # lexicographic fwd <= rc via first differing word
        diff = fwd_w != rc_w
        any_diff = diff.any(axis=1)
        first_w = jnp.argmax(diff, axis=1)
        rows = jnp.arange(n_occ)
        is_plus = jnp.where(
            any_diff,
            fwd_w[rows, first_w] <= rc_w[rows, first_w],
            True,
        )
        canon_w = jnp.where(is_plus[:, None], fwd_w, rc_w)  # [n_occ, W]
        signs = jnp.where(is_plus, 0, 1).astype(jnp.uint8)

        # invalid occurrences sort to the end: max key
        canon_w = jnp.where(occ_valid.reshape(-1, 1), canon_w,
                            jnp.uint32(0xFFFFFFFF))

        # ---- expected-error filter (read occurrences only) -----------
        errs = jnp.asarray(PHRED_TO_ERROR_PROB, jnp.float32)[
            jnp.clip(seq_quals, 0, 255).astype(jnp.int32)
        ]  # [S, L]
        prefix = jnp.concatenate(
            [jnp.zeros((S, 1), jnp.float32), jnp.cumsum(errs, axis=1)], axis=1)
        window_err = prefix[:, k:] - prefix[:, :-k]  # [S, L-k+1] == [S, M]
        ee_ok = (jnp.floor(window_err) <= 0) & (~seq_is_ref[:, None])
        ee_ok = (ee_ok & occ_valid).reshape(-1)

        # ---- sort by (kmer words, qhash, tag) -------------------------
        occ_seq = jnp.repeat(jnp.arange(S, dtype=jnp.int32), M)
        occ_qlo = seq_qhash_lo[occ_seq]
        occ_qhi = seq_qhash_hi[occ_seq]
        occ_tag = seq_tag[occ_seq]
        occ_sample = seq_sample[occ_seq]
        occ_orig = jnp.arange(n_occ, dtype=jnp.int32)

        # lexsort: minor keys first (original index last for determinism)
        sort_keys = [occ_orig, occ_tag, occ_qlo, occ_qhi]
        for w in range(W - 1, -1, -1):
            sort_keys.append(canon_w[:, w])
        order = jnp.lexsort(tuple(sort_keys))

        s_w = canon_w[order]
        s_qlo, s_qhi, s_tag = occ_qlo[order], occ_qhi[order], occ_tag[order]
        s_sample = occ_sample[order]
        s_ee = ee_ok[order]
        s_orig = occ_orig[order]
        s_valid = occ_valid.reshape(-1)[order]
        s_sign = signs[order]
        s_is_ref = seq_is_ref[occ_seq][order]

        # ---- kmer segments (np.unique equivalent) ---------------------
        new_kmer = jnp.concatenate(
            [jnp.array([True]),
             (s_w[1:] != s_w[:-1]).any(axis=1)])
        new_kmer = new_kmer & s_valid  # padding lanes never open segments
        seg_id = jnp.cumsum(new_kmer.astype(jnp.int32)) - 1  # [n_occ]

        # matemer groups: (kmer, qhash, tag) boundaries
        new_group = new_kmer | jnp.concatenate(
            [jnp.array([True]),
             (s_qlo[1:] != s_qlo[:-1]) | (s_qhi[1:] != s_qhi[:-1])
             | (s_tag[1:] != s_tag[:-1])])
        new_group = new_group & s_valid
        grp_id = jnp.cumsum(new_group.astype(jnp.int32)) - 1

        # group contributes 1 support when any member passed the EE filter
        grp_has_ee = jax.ops.segment_sum(
            s_ee.astype(jnp.int32), grp_id, num_segments=n_occ) > 0
        grp_rep = new_group  # group-opening lane carries the contribution
        lane_contrib = (grp_rep & grp_has_ee[grp_id]).astype(jnp.int32)

        # ---- per-(node, sample) counts --------------------------------
        # segment-sum of one-hot sample contributions
        sample_oh = jax.nn.one_hot(
            jnp.clip(s_sample, 0, num_samples - 1), num_samples, dtype=jnp.int32)
        counts = jax.ops.segment_sum(
            sample_oh * lane_contrib[:, None], seg_id, num_segments=n_occ)
        role_oh = jax.nn.one_hot(
            (s_tag == 4).astype(jnp.int32), 2, dtype=jnp.int32)  # LABEL_CASE=4
        roles = jax.ops.segment_sum(
            role_oh * lane_contrib[:, None], seg_id, num_segments=n_occ)

        # ---- first occurrence (original order) per kmer ---------------
        BIG = jnp.int32(n_occ)
        first_idx = jax.ops.segment_min(
            jnp.where(s_valid, s_orig, BIG), seg_id, num_segments=n_occ)
        n_uniq = jnp.sum(new_kmer.astype(jnp.int32))

        # segment-opening lane emits the node's packed words
        uniq_w = jax.ops.segment_max(
            jnp.where(s_valid[:, None], s_w, 0), seg_id, num_segments=n_occ)

        # per-occurrence inverse (original order) for host edge building
        inverse = jnp.zeros(n_occ, jnp.int32).at[s_orig].set(seg_id)

        return {
            "uniq_words": uniq_w,          # [n_occ, W] padded
            "counts": counts,              # [n_occ, num_samples]
            "roles": roles,                # [n_occ, 2]
            "first_idx": first_idx,        # [n_occ]
            "n_uniq": n_uniq,              # scalar
            "inverse": inverse,            # [n_occ] occurrence -> uniq index
            "occ_sign": signs,             # [n_occ] original order
            "occ_valid": occ_valid.reshape(-1),
        }

    return run


_ENGINES: dict = {}


def _get_engine(k: int, num_samples: int, S: int, L: int):
    import jax

    key = (k, num_samples, S, L)
    fn = _ENGINES.get(key)
    if fn is None:
        fn = jax.jit(_make_engine(k, num_samples))
        _ENGINES[key] = fn
    return fn


def _bucket(n: int, buckets=(64, 128, 256, 512, 1024, 2048, 4096, 8192)) -> int:
    for b in buckets:
        if n <= b:
            return b
    return n


def unpack_words(words: np.ndarray, k: int) -> np.ndarray:
    """[n, W] u32 packed words -> [n, k] u8 codes (inverse of pack_words)."""
    n, W = words.shape
    shifts = (np.arange(_BASES_PER_WORD - 1, -1, -1, dtype=np.uint32) * 4)
    bases = (words[:, :, None] >> shifts[None, None, :]) & np.uint32(0xF)
    return bases.reshape(n, W * _BASES_PER_WORD)[:, :k].astype(np.uint8)


def build_graph_device(seqs, seq_quals, seq_meta, k: int, num_samples: int):
    """Device construction pass over one window's sequences.

    seqs: list of [len] u8 code arrays (ref first when present);
    seq_quals: list of [len] u8 or None; seq_meta: (label, sample, tag, qhash).

    Returns the host-materialization inputs mirroring Graph._build_graph's
    intermediates: dict with uniq ids/codes/signs/labels/counts/roles in
    first-occurrence order plus the per-occurrence (seq, offset) -> uniq-id
    mapping for edge building. Sequences shorter than k+1 must be
    pre-filtered by the caller.
    """
    import jax.numpy as jnp

    from lancet2_tpu.base.hashing import hash_kmer_matrix

    S = len(seqs)
    if S == 0:
        return None
    max_len = max(len(s) for s in seqs)
    Lb = _bucket(max_len, (160, 320, 640, 1280, 2048, 4096))
    Sb = _bucket(S)

    codes = np.zeros((Sb, Lb), np.uint8)
    quals = np.zeros((Sb, Lb), np.uint8)
    lens = np.zeros(Sb, np.int32)
    label = np.zeros(Sb, np.int32)
    sample = np.zeros(Sb, np.int32)
    tag = np.zeros(Sb, np.int32)
    qlo = np.zeros(Sb, np.uint32)
    qhi = np.zeros(Sb, np.uint32)
    is_ref = np.zeros(Sb, bool)
    valid = np.zeros(Sb, bool)
    for i, s in enumerate(seqs):
        codes[i, : len(s)] = s
        if seq_quals[i] is not None:
            quals[i, : len(s)] = seq_quals[i]
        lens[i] = len(s)
        lab, smp, tg, qh = seq_meta[i]
        label[i], sample[i], tag[i] = lab, max(smp, 0), tg
        qlo[i] = qh & 0xFFFFFFFF
        qhi[i] = (qh >> 32) & 0xFFFFFFFF
        is_ref[i] = lab == 1  # LABEL_REFERENCE
        valid[i] = True
        if is_ref[i]:
            quals[i, : len(s)] = 255  # ref occurrences never pass the EE gate

    fn = _get_engine(k, num_samples, Sb, Lb)
    out = fn(
        jnp.asarray(codes), jnp.asarray(quals), jnp.asarray(lens),
        jnp.asarray(label), jnp.asarray(sample), jnp.asarray(tag),
        jnp.asarray(qlo), jnp.asarray(qhi), jnp.asarray(is_ref),
        jnp.asarray(valid),
    )
    out = {kk: np.asarray(v) for kk, v in out.items()}

    n_uniq = int(out["n_uniq"])
    uniq_words = out["uniq_words"][:n_uniq]
    counts = out["counts"][:n_uniq]
    roles = out["roles"][:n_uniq]
    first_idx = out["first_idx"][:n_uniq]

    # host: map packed canonical words -> codes -> FNV node ids (n_uniq only)
    canon_codes = unpack_words(uniq_words, k)
    ids = hash_kmer_matrix(canon_codes)

    # per-occurrence mapping in (seq, offset) grid order, trimmed to real S/M
    M = Lb - k + 1
    inverse = out["inverse"].reshape(Sb, M)
    occ_sign = out["occ_sign"].reshape(Sb, M)
    occ_valid = out["occ_valid"].reshape(Sb, M)

    return {
        "ids": ids,                    # [n_uniq] u64, segment order (sorted)
        "codes": canon_codes,          # [n_uniq, k] u8
        "counts": counts,              # [n_uniq, num_samples]
        "roles": roles,                # [n_uniq, 2]
        "first_idx": first_idx,        # [n_uniq] first occurrence (grid order)
        "inverse": inverse[:S],        # [S, M] occurrence -> uniq row
        "occ_sign": occ_sign[:S],      # [S, M]
        "occ_valid": occ_valid[:S],    # [S, M]
        "grid_m": M,
    }

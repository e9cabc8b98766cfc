"""Traceback-free evidence DP: per-(read, variant) scoring in one batched pass.

The host genotyper recovers CIGARs (direction matrices + traceback) and then
walks them per (alignment, variant) to compute the local-region statistics
behind the combined allele-assignment score (caller/scoring.py). That
pointer-chasing is the host pipeline's dominant cost and cannot ship to the
accelerator as-is.

This engine removes the traceback entirely: every statistic the evidence
model needs is carried through the DP as an accumulator that follows the
argmax path — the classic tropical-semiring companion-value technique.
Per (read, haplotype) pair and up to R_MAX variant regions on that
haplotype, one scan over query rows yields:

  score, t_start, t_end           alignment identity/span
  nm                              SAM edit distance of the optimal path
  per region r: raw score (M-ops substitution total), PBQ-weighted score
  (gap extends included), matches, aligned columns, min base quality
  (weakest link incl. deletion flanks), query pos at region start

which is exactly the reference's ReadAlleleAssignment input surface
(reference: caller/local_scorer.cpp RegionAccumulator + combined_scorer.cpp)
— no direction matrices, no host walk. Horizontal (deletion) gaps use a
packed value+source cummax so the accumulators can be gathered from the
gap-opening column and the whole deletion run's region overlap added in
closed form; ties replicate the traceback engine's preferences
(diag > V > F; earliest gap source; extension over open).

Semantics notes (match caller/scoring.py exactly):
  * deletion min-BQ borrows the flanking base quals once per run,
    UNGATED by the region (reference quirk, reproduced)
  * N columns score 0 in raw/pbq; N==N counts as a match for identity
  * NM counts any code inequality (incl. N vs base) + indel bases
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from lancet2_tpu.base.phred import PHRED_TO_CONFIDENCE
from lancet2_tpu.ops.affine_dp import NEG_INF, READ_TO_HAP, AlignParams

R_MAX = 4
_NEG = np.int32(NEG_INF)

# accumulator bank layout (int accs + float accs kept in separate stacks)
# int accs: [start_col, nm, qv_0..3, aligned_0..3, minbq_0..3]
_I_START, _I_NM = 0, 1
_I_QV = 2           # 4 slots
_I_ALIGNED = 6      # 4 slots
_I_MINBQ = 10       # 4 slots
N_IACC = 14
# float accs: [raw_0..3, pbq_0..3, match_0..3]
_F_RAW, _F_PBQ, _F_MATCH = 0, 4, 8
N_FACC = 12


def _select(cond, a, b):
    return jnp.where(cond, a, b)


def _make_engine(p: AlignParams):
    if p.dual or not p.free_target_ends:
        raise NotImplementedError("evidence DP covers the fitting single-affine mode")
    go, ge = p.gap_open1, p.gap_extend1

    def run(queries, quals, q_lens, targets, t_lens, regions):
        """queries [B, Lq] u8; quals [B, Lq] u8; targets [B, Lt] u8;
        regions [B, R_MAX, 2] int32 (start, end; end<=start = inactive)."""
        B, Lq = queries.shape
        Lt = targets.shape[1]
        jcols = jnp.arange(1, Lt + 1, dtype=jnp.int32)  # [Lt]
        tcols = jcols - 1  # target index of column j
        t_codes = targets.astype(jnp.int32)
        t_valid = jcols[None, :] <= t_lens[:, None]

        conf_table = jnp.asarray(PHRED_TO_CONFIDENCE, jnp.float32)
        conf = conf_table[jnp.clip(quals, 0, 255).astype(jnp.int32)]  # [B, Lq]
        quals_i = quals.astype(jnp.int32)

        vs = regions[:, :, 0]  # [B, R]
        ve = regions[:, :, 1]
        active = ve > vs

        # region membership per column (static per pair): [B, R, Lt]
        in_reg_col = (
            (tcols[None, None, :] >= vs[:, :, None])
            & (tcols[None, None, :] < ve[:, :, None])
            & active[:, :, None]
        )
        # prefix count of region columns < j (for deletion-run overlap):
        # pref[b, r, j] = |{t in [0, j) : t in region r}| for j = 0..Lt
        pref = jnp.concatenate(
            [jnp.zeros((B, R_MAX, 1), jnp.int32),
             jnp.cumsum(in_reg_col.astype(jnp.int32), axis=2)],
            axis=2,
        )  # [B, R, Lt+1]

        # prefix-min of quals (for the column-0 pure-insertion path)
        BIG_BQ = jnp.int32(255)

        # ---- initial state (row 0) --------------------------------------
        H0 = jnp.zeros((B, Lt + 1), jnp.int32)
        V0 = jnp.full((B, Lt + 1), _NEG, jnp.int32)
        # iacc[b, a, j]
        iacc0 = jnp.zeros((B, N_IACC, Lt + 1), jnp.int32)
        iacc0 = iacc0.at[:, _I_START, :].set(
            jnp.arange(0, Lt + 1, dtype=jnp.int32)[None, :]
        )
        iacc0 = iacc0.at[:, _I_QV : _I_QV + R_MAX, :].set(-1)
        iacc0 = iacc0.at[:, _I_MINBQ : _I_MINBQ + R_MAX, :].set(BIG_BQ)
        facc0 = jnp.zeros((B, N_FACC, Lt + 1), jnp.float32)
        vacc_i0 = iacc0
        vacc_f0 = facc0

        final = (H0, iacc0, facc0)

        # column 0 accumulators per row (pure query-prefix insertion path)
        in0 = ((vs <= 0) & (ve > 0) & active)  # [B, R] insertion at target pos 0

        def row_step(carry, x):
            (H_prev, Hi_prev, Hf_prev, V_prev, Vi_prev, Vf_prev,
             final_H, final_i, final_f, minq_prefix) = carry
            i, qi, qconf, qual_row = x  # i: 1-based row; qi [B]; qconf [B]

            qi32 = qi.astype(jnp.int32)  # [B] query base of row i (q[i-1])

            # --- column-0 state of this row -------------------------------
            col0_val = jnp.full((B,), -(go + ge * i), jnp.int32)
            minq_prefix = jnp.minimum(minq_prefix, qual_row)  # min over q[0..i-1]
            col0_i = jnp.zeros((B, N_IACC), jnp.int32)
            col0_i = col0_i.at[:, _I_NM].set(i)
            col0_i = col0_i.at[:, _I_QV : _I_QV + R_MAX].set(-1)
            col0_i = col0_i.at[:, _I_ALIGNED : _I_ALIGNED + R_MAX].set(
                jnp.where(in0, i, 0)
            )
            col0_i = col0_i.at[:, _I_MINBQ : _I_MINBQ + R_MAX].set(
                jnp.where(in0, minq_prefix[:, None], BIG_BQ)
            )
            col0_f = jnp.zeros((B, N_FACC), jnp.float32)
            col0_f = col0_f.at[:, _F_PBQ : _F_PBQ + R_MAX].set(
                jnp.where(in0, ge * i.astype(jnp.float32), 0.0)
            )

            # --- diagonal candidate --------------------------------------
            any_n = (qi32[:, None] >= 4) | (t_codes >= 4)
            eq = qi32[:, None] == t_codes
            sub = jnp.where(any_n, 0, jnp.where(eq, p.match, -p.mismatch)).astype(
                jnp.int32
            )  # [B, Lt]
            diag = H_prev[:, :-1] + sub

            in_reg = in_reg_col  # [B, R, Lt] membership of target col j-1... (tcols)
            subf = sub.astype(jnp.float32)
            # diag accumulators = H_prev accs at col j-1 + per-pair contribs
            di = Hi_prev[:, :, :-1]
            df = Hf_prev[:, :, :-1]
            di = di.at[:, _I_NM, :].add((~eq).astype(jnp.int32))
            di = di.at[:, _I_ALIGNED : _I_ALIGNED + R_MAX, :].add(
                in_reg.astype(jnp.int32)
            )
            di = di.at[:, _I_MINBQ : _I_MINBQ + R_MAX, :].set(
                jnp.where(
                    in_reg,
                    jnp.minimum(di[:, _I_MINBQ : _I_MINBQ + R_MAX, :], qual_row[:, None, None]),
                    di[:, _I_MINBQ : _I_MINBQ + R_MAX, :],
                )
            )
            # qv: target col consumed is j-1 == vs
            consume_vs = (tcols[None, None, :] == vs[:, :, None]) & active[:, :, None]
            qv_old = di[:, _I_QV : _I_QV + R_MAX, :]
            di = di.at[:, _I_QV : _I_QV + R_MAX, :].set(
                jnp.where(consume_vs & (qv_old < 0), i - 1, qv_old)
            )
            df = df.at[:, _F_RAW : _F_RAW + R_MAX, :].add(
                jnp.where(in_reg, subf[:, None, :], 0.0)
            )
            df = df.at[:, _F_PBQ : _F_PBQ + R_MAX, :].add(
                jnp.where(in_reg, subf[:, None, :] * qconf[:, None, None], 0.0)
            )
            df = df.at[:, _F_MATCH : _F_MATCH + R_MAX, :].add(
                jnp.where(in_reg & eq[:, None, :], 1.0, 0.0)
            )

            # --- vertical (insertion) candidate ---------------------------
            v_open = H_prev[:, 1:] - (go + ge)
            v_ext = V_prev[:, 1:] - ge
            V_row = jnp.maximum(v_open, v_ext)
            use_ext = v_ext >= v_open  # [B, Lt]
            vi = _select(use_ext[:, None, :], Vi_prev[:, :, 1:], Hi_prev[:, :, 1:])
            vf = _select(use_ext[:, None, :], Vf_prev[:, :, 1:], Hf_prev[:, :, 1:])
            # insertion sits at hap position j = count of consumed targets
            # (reference InRegion test at the insertion's tpos)
            ins_in = (
                (jcols[None, None, :] >= vs[:, :, None])
                & (jcols[None, None, :] < ve[:, :, None])
                & active[:, :, None]
            )
            vi = vi.at[:, _I_NM, :].add(1)
            vi = vi.at[:, _I_ALIGNED : _I_ALIGNED + R_MAX, :].add(
                ins_in.astype(jnp.int32)
            )
            vi = vi.at[:, _I_MINBQ : _I_MINBQ + R_MAX, :].set(
                jnp.where(
                    ins_in,
                    jnp.minimum(vi[:, _I_MINBQ : _I_MINBQ + R_MAX, :], qual_row[:, None, None]),
                    vi[:, _I_MINBQ : _I_MINBQ + R_MAX, :],
                )
            )
            vf = vf.at[:, _F_PBQ : _F_PBQ + R_MAX, :].add(
                jnp.where(ins_in, float(ge), 0.0)
            )

            # --- H_tmp = max(diag, V) (diag wins ties) --------------------
            use_diag = diag >= V_row
            H_tmp = jnp.maximum(diag, V_row)
            ti = _select(use_diag[:, None, :], di, vi)
            tf = _select(use_diag[:, None, :], df, vf)

            # --- F (deletions) via packed cummax --------------------------
            Htmp_full = jnp.concatenate([col0_val[:, None], H_tmp], axis=1)
            C = Htmp_full[:, :-1] + ge * jcols[None, :]  # source k = col index+1
            ks = jcols[None, :]
            # int32 packing: |C| < 2^17 for Lq,Lt <= 8191 with unit scores;
            # low 13 bits carry (Lt - k) so value ties prefer the EARLIEST
            # source column (matching np.maximum.accumulate's tie behavior).
            # Unreachable cells sit at NEG_INF; clamp so packing stays valid.
            Cc = jnp.clip(C, -(1 << 17) + 1, (1 << 17) - 1)
            packed = ((Cc + (1 << 17)) << 13) + (Lt - ks)
            run_max = jax.lax.cummax(packed, axis=1)
            k_star = Lt - (run_max & ((1 << 13) - 1))  # [B, Lt]
            c_star = (run_max >> 13) - (1 << 17)
            F_row = c_star - (go + ge) - ge * (jcols[None, :] - 1) - ge

            # gather accumulators from the gap-opening column (k*-1)
            ti_full = jnp.concatenate([col0_i[:, :, None], ti], axis=2)
            tf_full = jnp.concatenate([col0_f[:, :, None], tf], axis=2)
            src = (k_star - 1)[:, None, :]  # column index into full banks
            fi = jnp.take_along_axis(ti_full, jnp.broadcast_to(src, ti_full[:, :, : Lt].shape), axis=2)
            ff = jnp.take_along_axis(tf_full, jnp.broadcast_to(src, tf_full[:, :, : Lt].shape), axis=2)
            # deletion run covers target indices [k*-1, j) (j = jcols)
            run_len = jcols[None, :] - k_star + 1  # = j - (k*-1)
            fi = fi.at[:, _I_NM, :].add(run_len)
            # per-region overlap via prefix counts: pref[, , j] - pref[, , k*-1]
            lo = jnp.take_along_axis(
                pref, jnp.broadcast_to((k_star - 1)[:, None, :], (B, R_MAX, Lt)), axis=2
            )
            hi_c = jnp.take_along_axis(
                pref, jnp.broadcast_to(jcols[None, None, :], (B, R_MAX, Lt)), axis=2
            )
            overlap = (hi_c - lo).astype(jnp.int32)
            fi = fi.at[:, _I_ALIGNED : _I_ALIGNED + R_MAX, :].add(overlap)
            ff = ff.at[:, _F_PBQ : _F_PBQ + R_MAX, :].add(overlap.astype(jnp.float32) * ge)
            # deletion flanking min-BQ (ungated by region; once per run).
            # At row i the deletion's qpos = i: flanks are q[i-1] (this row's
            # base) and q[i] (next row's base, when it exists).
            flank_prev = qual_row  # qpos-1 = i-1 >= 0 always for rows >= 1
            flank_next = jnp.where(
                i < q_lens, quals_i[:, jnp.minimum(i, Lq - 1)], BIG_BQ
            )
            flank = jnp.minimum(flank_prev, flank_next)[:, None, None]
            # the reference's CIGAR walk breaks at the first ref-consuming op
            # at/after the region end, so deletion flanks only register for
            # runs starting before ve
            run_before_end = ((k_star - 1)[:, None, :] < ve[:, :, None]) & active[:, :, None]
            fi = fi.at[:, _I_MINBQ : _I_MINBQ + R_MAX, :].set(
                jnp.where(
                    run_before_end,
                    jnp.minimum(fi[:, _I_MINBQ : _I_MINBQ + R_MAX, :], flank),
                    fi[:, _I_MINBQ : _I_MINBQ + R_MAX, :],
                )
            )
            # qv: region start inside the run
            vs_in_run = (
                (vs[:, :, None] >= (k_star - 1)[:, None, :])
                & (vs[:, :, None] < jcols[None, None, :])
                & active[:, :, None]
            )
            qv_old = fi[:, _I_QV : _I_QV + R_MAX, :]
            fi = fi.at[:, _I_QV : _I_QV + R_MAX, :].set(
                jnp.where(vs_in_run & (qv_old < 0), i, qv_old)
            )

            # --- H = max(H_tmp, F) (H_tmp wins ties) ----------------------
            use_tmp = H_tmp >= F_row
            H_row = jnp.maximum(H_tmp, F_row)
            hi = _select(use_tmp[:, None, :], ti, fi)
            hf = _select(use_tmp[:, None, :], tf, ff)

            H_full = jnp.concatenate([col0_val[:, None], H_row], axis=1)
            Hi_full = jnp.concatenate([col0_i[:, :, None], hi], axis=2)
            Hf_full = jnp.concatenate([col0_f[:, :, None], hf], axis=2)
            V_full = jnp.concatenate([jnp.full((B, 1), _NEG), V_row], axis=1)
            Vi_full = jnp.concatenate([col0_i[:, :, None], vi], axis=2)
            Vf_full = jnp.concatenate([col0_f[:, :, None], vf], axis=2)

            q_active = (i <= q_lens)[:, None]
            H_next = _select(q_active, H_full, H_prev)
            Hi_next = _select(q_active[:, :, None], Hi_full, Hi_prev)
            Hf_next = _select(q_active[:, :, None], Hf_full, Hf_prev)
            V_next = _select(q_active, V_full, V_prev)
            Vi_next = _select(q_active[:, :, None], Vi_full, Vi_prev)
            Vf_next = _select(q_active[:, :, None], Vf_full, Vf_prev)

            hit = (i == q_lens)[:, None]
            final_H = _select(hit, H_next, final_H)
            final_i = _select(hit[:, :, None], Hi_next, final_i)
            final_f = _select(hit[:, :, None], Hf_next, final_f)

            return (
                H_next, Hi_next, Hf_next, V_next, Vi_next, Vf_next,
                final_H, final_i, final_f, minq_prefix,
            ), None

        rows_i = jnp.arange(1, Lq + 1, dtype=jnp.int32)
        carry0 = (
            H0, iacc0, facc0, V0, vacc_i0, vacc_f0,
            H0, iacc0, facc0, jnp.full((B,), 255, jnp.int32),
        )
        (carry, _) = jax.lax.scan(
            row_step,
            carry0,
            (rows_i, queries.T, conf.T, quals_i.T),
        )
        final_H, final_i, final_f = carry[6], carry[7], carry[8]

        masked = jnp.where(
            jnp.concatenate([jnp.zeros((B, 1), bool), t_valid], axis=1), final_H, _NEG
        )
        t_end = jnp.argmax(masked, axis=1).astype(jnp.int32)
        score = jnp.take_along_axis(masked, t_end[:, None], axis=1)[:, 0]
        sel = t_end[:, None, None]
        out_i = jnp.take_along_axis(
            final_i, jnp.broadcast_to(sel, (B, N_IACC, 1)), axis=2
        )[:, :, 0]
        out_f = jnp.take_along_axis(
            final_f, jnp.broadcast_to(sel, (B, N_FACC, 1)), axis=2
        )[:, :, 0]

        return {
            "score": score,
            "t_end": t_end,
            "t_start": out_i[:, _I_START],
            "nm": out_i[:, _I_NM],
            "qv": out_i[:, _I_QV : _I_QV + R_MAX],
            "aligned": out_i[:, _I_ALIGNED : _I_ALIGNED + R_MAX],
            "min_bq": out_i[:, _I_MINBQ : _I_MINBQ + R_MAX],
            "raw": out_f[:, _F_RAW : _F_RAW + R_MAX],
            "pbq": out_f[:, _F_PBQ : _F_PBQ + R_MAX],
            "matches": out_f[:, _F_MATCH : _F_MATCH + R_MAX],
        }

    return run


_CACHE: dict = {}


def evidence_dp(queries, quals, q_lens, targets, t_lens, regions,
                p: AlignParams = READ_TO_HAP):
    """Run the jitted evidence DP; numpy in/out.

    regions: [B, R_MAX, 2] int32 (start, end) hap coordinates; end<=start
    deactivates a slot. Returns dict of [B] / [B, R_MAX] arrays.
    """
    key = p
    fn = _CACHE.get(key)
    if fn is None:
        fn = jax.jit(_make_engine(p))
        _CACHE[key] = fn
    out = fn(
        jnp.asarray(queries, jnp.uint8),
        jnp.asarray(quals, jnp.uint8),
        jnp.asarray(q_lens, jnp.int32),
        jnp.asarray(targets, jnp.uint8),
        jnp.asarray(t_lens, jnp.int32),
        jnp.asarray(regions, jnp.int32),
    )
    return {k: np.asarray(v) for k, v in out.items()}

"""Evidence DP parity: traceback-free accumulators vs the host CIGAR walk."""

import numpy as np
import pytest

from lancet2_tpu.base import dna
from lancet2_tpu.caller.scoring import (
    compute_edit_distance_cigar,
    compute_local_score,
    ref_pos_to_query_pos,
)
from lancet2_tpu.ops.affine_dp import READ_TO_HAP, align_and_traceback
from lancet2_tpu.ops.evidence_dp import R_MAX, evidence_dp
from lancet2_tpu.utils.simulate import random_reference


def _host_reference(q, quals, t, regions):
    """Host pipeline answer for one pair: align+traceback+CIGAR walks."""
    qs = q[None, :]
    ts = t[None, :]
    res = align_and_traceback(qs, [len(q)], ts, [len(t)], READ_TO_HAP)[0]
    t_start, t_end, cigar = res["t_start"], res["t_end"], res["cigar"]
    hap_slice = t[t_start:t_end]
    out = {
        "score": res["score"],
        "t_start": t_start,
        "t_end": t_end,
        "nm": compute_edit_distance_cigar(cigar, q, hap_slice),
        "regions": [],
    }
    for vs, ve in regions:
        if ve <= vs:
            out["regions"].append(None)
            continue
        local = compute_local_score(cigar, q, hap_slice, quals, t_start, vs, ve - vs)
        qpos = ref_pos_to_query_pos(cigar, max(0, vs - t_start))
        out["regions"].append(
            {
                "raw": local.raw_score,
                "pbq": local.pbq_score,
                "identity": local.identity,
                "min_bq": local.base_qual,
                "qpos": qpos,
            }
        )
    return out


def _mk_case(rng, Lq=80, Lt=300, mutate=True):
    t = dna.encode(random_reference(Lt, seed=int(rng.integers(1 << 30))))
    start = int(rng.integers(0, Lt - Lq))
    q = t[start : start + Lq].copy()
    if mutate:
        kind = rng.integers(0, 4)
        if kind == 0:  # SNV
            p = int(rng.integers(5, Lq - 5))
            q[p] = (q[p] + 1 + rng.integers(0, 3)) % 4
        elif kind == 1:  # small insertion in read
            p = int(rng.integers(10, Lq - 12))
            ins = rng.integers(0, 4, int(rng.integers(1, 5))).astype(np.uint8)
            q = np.concatenate([q[:p], ins, q[p:]])[:Lq]
        elif kind == 2:  # deletion in read (read skips target bases)
            p = int(rng.integers(10, Lq - 12))
            d = int(rng.integers(1, 8))
            q = np.concatenate([q, t[start + Lq : start + Lq + d]])
            q = np.concatenate([q[:p], q[p + d :]])
        # kind 3: perfect read
    quals = rng.integers(15, 41, len(q)).astype(np.uint8)
    # regions: around the middle of the read's target span + one random
    mid = start + Lq // 2
    regions = [
        (mid, mid + 1),
        (mid - 5, mid + 6),
        (int(rng.integers(0, Lt - 10)), int(rng.integers(0, Lt - 10)) + 3),
        (0, 0),  # inactive
    ]
    return q, quals, t, regions


def _pad(arrs, width, fill):
    out = np.full((len(arrs), width), fill, dtype=arrs[0].dtype)
    for i, a in enumerate(arrs):
        out[i, : len(a)] = a
    return out


class TestEvidenceDpParity:
    def test_random_cases(self):
        rng = np.random.default_rng(500)
        cases = [_mk_case(rng) for _ in range(24)]
        Lq = max(len(c[0]) for c in cases)
        Lt = max(len(c[2]) for c in cases)
        qs = _pad([c[0] for c in cases], Lq, np.uint8(5))
        quals = _pad([c[1] for c in cases], Lq, np.uint8(0))
        ts = _pad([c[2] for c in cases], Lt, np.uint8(5))
        qlens = np.array([len(c[0]) for c in cases], np.int32)
        tlens = np.array([len(c[2]) for c in cases], np.int32)
        regions = np.zeros((len(cases), R_MAX, 2), np.int32)
        for i, c in enumerate(cases):
            for r, (vs, ve) in enumerate(c[3]):
                regions[i, r] = (vs, ve)

        out = evidence_dp(qs, quals, qlens, ts, tlens, regions)

        mismatches = []
        for i, (q, qu, t, regs) in enumerate(cases):
            host = _host_reference(q, qu, t, regs)
            assert out["score"][i] == host["score"], f"case {i} score"
            assert out["t_end"][i] == host["t_end"], f"case {i} t_end"
            assert out["t_start"][i] == host["t_start"], f"case {i} t_start"
            assert out["nm"][i] == host["nm"], f"case {i} nm"
            for r, want in enumerate(host["regions"]):
                if want is None:
                    continue
                got_aligned = int(out["aligned"][i, r])
                got_matches = float(out["matches"][i, r])
                got_identity = got_matches / got_aligned if got_aligned else 0.0
                got_minbq = int(out["min_bq"][i, r])
                got_minbq = 0 if got_minbq == 255 else got_minbq
                got_qv = int(out["qv"][i, r])
                got_qv = max(0, got_qv)
                row = (
                    i, r,
                    abs(float(out["raw"][i, r]) - want["raw"]) < 1e-3,
                    abs(float(out["pbq"][i, r]) - want["pbq"]) < 1e-2,
                    abs(got_identity - want["identity"]) < 1e-6,
                    got_minbq == want["min_bq"],
                    got_qv == want["qpos"],
                )
                if not all(row[2:]):
                    mismatches.append((row, dict(want), {
                        "raw": float(out["raw"][i, r]),
                        "pbq": float(out["pbq"][i, r]),
                        "identity": got_identity,
                        "min_bq": got_minbq,
                        "qpos": got_qv,
                    }))
        assert not mismatches, mismatches[:4]

    def test_no_regions(self):
        rng = np.random.default_rng(501)
        q, quals, t, _ = _mk_case(rng)
        regions = np.zeros((1, R_MAX, 2), np.int32)
        out = evidence_dp(
            q[None, :], quals[None, :], [len(q)], t[None, :], [len(t)], regions
        )
        host = _host_reference(q, quals, t, [(0, 0)] * R_MAX)
        assert out["score"][0] == host["score"]
        assert out["nm"][0] == host["nm"]
        assert (out["aligned"][0] == 0).all()


class TestEvidenceBackendEquivalence:
    def test_genotyper_backends_agree(self):
        """The traceback-free backend must reproduce the CIGAR-walk backend's
        evidence exactly (depths, quals, NMs, positions, scores)."""
        from tests.test_cbdg import _reads_from_seq
        from lancet2_tpu.caller.extractor import extract_component_variants
        from lancet2_tpu.caller.genotyper import Genotyper
        from lancet2_tpu.cbdg.read import LABEL_CTRL

        ref = random_reference(400, seed=55)
        pos = 200
        alt_base = "C" if ref[pos] != "C" else "G"
        alt_hap = ref[:pos] + alt_base + ref[pos + 1 :]
        del_hap = ref[:150] + ref[158:]
        variants = extract_component_variants([ref, alt_hap, del_hap], 0, "chr1", 1)
        reads = (
            _reads_from_seq(ref, 100, 21, 0, LABEL_CTRL, "r")
            + _reads_from_seq(alt_hap, 100, 21, 0, LABEL_CTRL, "a")
            + _reads_from_seq(del_hap, 100, 21, 0, LABEL_CTRL, "d")
        )
        g_np = Genotyper(backend="numpy").genotype([ref, alt_hap, del_hap], reads, variants)
        g_ev = Genotyper(backend="evidence").genotype([ref, alt_hap, del_hap], reads, variants)
        assert set(g_np) == set(g_ev)
        for vi in g_np:
            assert set(g_np[vi]) == set(g_ev[vi])
            for sname in g_np[vi]:
                a, b = g_np[vi][sname], g_ev[vi][sname]
                assert len(a.allele_data) == len(b.allele_data)
                for i in range(len(a.allele_data)):
                    da, db = a.allele_data[i], b.allele_data[i]
                    assert da.fwd_base_quals == db.fwd_base_quals
                    assert da.rev_base_quals == db.rev_base_quals
                    assert da.ref_nm_values == db.ref_nm_values
                    assert da.own_hap_nm_values == db.own_hap_nm_values
                    assert da.folded_read_positions == db.folded_read_positions
                    assert da.haplotype_ids == db.haplotype_ids
                    np.testing.assert_allclose(da.aln_scores, db.aln_scores, atol=1e-3)

"""Read -> haplotype allele assignment via batched glocal alignment.

Replaces the reference's per-read minimap2 pipeline (reference:
src/lancet/caller/genotyper.{h,cpp}) with one batched DP over all
(read x haplotype) pairs of a component — the reference's measured 36%
minimap2 CPU budget becomes a single data-parallel device dispatch.

Semantics preserved:
  * every read is aligned to every haplotype — no early exit (cross-haplotype
    score comparison requires all alignments)
  * per (alignment, variant) overlap: local region scoring, keep the best
    CombinedScore per variant across haplotypes
  * the NM baseline against the REF haplotype is computed once per read
  * evidence rows feed VariantSupport keyed (variant -> sample)

Divergence note: minimap2 returns "no hit" for unalignable reads (no seed
chain); our DP always produces a best-effort alignment, so a minimum score
gate (score >= read_len/4 by default) stands in for mapability filtering.

The jax backend runs the jitted XLA engine on host CPU with every batch
dimension bucketed to fixed shapes (pair count, read length, haplotype
length), so executables are compiled once and reused across all windows
(~2.5x over the numpy engine; measured: the direction-matrix emission only
adds ~20%% over score-only on CPU, so a candidate-prefilter two-pass does
not pay here — the TPU batch path instead uses the traceback-free evidence
kernel, ops/evidence_pallas.py).
"""

from __future__ import annotations

import numpy as np

from lancet2_tpu.base.dna import encode
from lancet2_tpu.caller.scoring import (
    ReadAlleleAssignment,
    compute_edit_distance_cigar,
    score_read_at_variant,
)
from lancet2_tpu.caller.support import STRAND_FWD, STRAND_REV, ReadEvidence, VariantSupport
from lancet2_tpu.caller.variant import RawVariant
from lancet2_tpu.cbdg.read import Read
from lancet2_tpu.ops.affine_dp import READ_TO_HAP, align_batch_numpy, traceback_batch

REF_HAP_IDX = 0
_PAIR_CHUNK = 512

# cumulative two-pass dispatch stats (pairs seen / pairs sent to the full
# evidence kernel) — read by bench.py to derive the measured pass-2 fraction
PASS2_STATS = {"total": 0, "pass2": 0}

# SPMD coverage accounting: when a mesh is attached, every device phase
# must go through shard_map — these count the plain-dispatch fallbacks the
# mesh path still took (dryrun asserts they stay zero; the only legitimate
# fallback is a sub-threshold batch, governed by SPMD_MIN_ROWS_PER_DEVICE)
SPMD_MIN_ROWS_PER_DEVICE = 128
MESH_FALLBACK_STATS = {"plain_span_with_mesh": 0, "plain_ev_with_mesh": 0}


_TARGET_BUCKETS = (64, 128, 256, 384, 512, 768, 1024, 1280, 1536, 2048, 4096, 8192)
_QUERY_BUCKETS = (160, 320, 640, 1280)
_DEVICE_TARGET_BUCKETS = (256, 384, 512, 768, 1024, 1536, 2048, 4096, 8192)


def _on_device() -> bool:
    import jax

    return jax.default_backend() in ("tpu", "axon")


def _evidence_engine():
    """Evidence-DP engine for the current backend: the Pallas kernel on TPU
    (the XLA-scan engine's per-row gathers are ~2000x slower through the
    device path — measured), the XLA engine elsewhere."""
    if _on_device():
        from lancet2_tpu.ops.evidence_pallas import evidence_dp_exact

        return evidence_dp_exact
    from lancet2_tpu.ops.evidence_dp import evidence_dp

    return evidence_dp


def _bucket(n: int, buckets=(64, 128, 256, 512, 1024, 2048, 4096, 8192)) -> int:
    """Round a length up to a fixed bucket so jitted shapes are reused."""
    for b in buckets:
        if n <= b:
            return b
    return n


def _pad(seqs: list[np.ndarray], width: int | None = None):
    max_len = max((len(s) for s in seqs), default=1)
    width = width if width is not None else max_len
    out = np.full((len(seqs), width), 5, dtype=np.uint8)
    lens = np.zeros(len(seqs), dtype=np.int64)
    for i, s in enumerate(seqs):
        out[i, : len(s)] = s
        lens[i] = len(s)
    return out, lens


class Genotyper:
    """backend: 'numpy' (baseline), 'jax' (jitted CPU XLA, CIGAR traceback),
    or 'evidence' (traceback-free on-path-accumulator DP — the device
    formulation; see ops/evidence_dp.py)."""

    def __init__(self, backend: str = "numpy", min_score_frac: float = 0.25,
                 devices: list | None = None, mesh=None):
        self.backend = backend
        self.min_score_frac = min_score_frac
        # multi-chip: evidence-DP chunks round-robin over these devices
        # (windows/pairs are embarrassingly parallel — per-device streams,
        # no collectives; record-identical to single-device, tested)
        self.devices = devices
        # mesh set => pass-1 span runs as ONE shard_map dispatch per
        # super-chunk over the mesh instead of per-device round-robin
        # (parallel/evidence_spmd.py; byte-identical, dryrun-asserted)
        self.mesh = mesh

    # ------------------------------------------------------------------
    # evidence-DP backend: no CIGARs anywhere. Split into three phases so
    # the cross-window batch executor can fuse phase-2 device dispatches:
    #   build_evidence_pairs -> run_evidence_pairs -> assemble_evidence
    # ------------------------------------------------------------------
    def build_evidence_pairs(self, hap_codes, reads, variants,
                             anchor_pos1: int | None = None,
                             band_margin: int | None = None,
                             max_regions: int | None = None):
        """Phase 1: enumerate (read, hap, region-chunk) pairs for one window.

        With band_margin set (and anchor_pos1 giving the haplotypes' genomic
        start), each pair's target is the haplotype BAND around the read's
        mapped diagonal — read_len + 2*margin columns instead of the full
        haplotype. Exact whenever the optimal path stays inside the band;
        reads whose true alignment lies outside their band score low and hit
        the mapability gate, mirroring minimap2's no-hit behavior
        (reference: caller/genotyper.cpp:376-411 seeds per-haplotype indexes
        for the same economy). Regions and t_start/t_end stay in band
        coordinates — all downstream comparisons are relative.
        """
        from lancet2_tpu.ops.evidence_dp import R_MAX

        if max_regions is None:
            # the Pallas kernel is specialized to <=R_KERNEL_MAX active
            # region slots; group accordingly when that engine will run
            if _on_device():
                from lancet2_tpu.ops.evidence_pallas import R_KERNEL_MAX

                max_regions = R_KERNEL_MAX
            else:
                max_regions = R_MAX
        max_regions = min(max_regions, R_MAX)

        n_haps = len(hap_codes)
        # per-hap region chunks: (chunk_regions [R_MAX, 2], chunk_vis [R_MAX])
        hap_chunks: list[list[tuple[np.ndarray, list[int]]]] = []
        for h in range(n_haps):
            carried = []
            for vi, variant in enumerate(variants):
                bounds = self._extract_hap_bounds(variant, h)
                if bounds is not None:
                    carried.append((vi, bounds[0], bounds[1], bounds[2]))
            chunks = []
            for off in range(0, max(len(carried), 1), max_regions):
                group = carried[off : off + max_regions]
                regions = np.zeros((R_MAX, 2), np.int32)
                vis = []
                for r, (vi, vs, vlen, allele) in enumerate(group):
                    regions[r] = (vs, vs + vlen)
                    vis.append((vi, allele))
                chunks.append((regions, vis))
            hap_chunks.append(chunks)

        # build the pair list: (read, hap, chunk). The per-pair band slice +
        # region shift used to run as ~8 small numpy ops per pair (~150 us) —
        # at executor scale (~300k pairs per chr-scale batch run) that WAS
        # the pipeline wall clock. All band gathers and region shifts are now
        # one vectorized op per (hap, chunk) over every read at once; the
        # remaining per-pair loop only appends precomputed row views, so
        # values and pair order are bit-identical to the scalar form.
        use_band = band_margin is not None and anchor_pos1 is not None
        pair_q, pair_qu, pair_t, pair_meta = [], [], [], []
        if not use_band:
            for r, read in enumerate(reads):
                for h in range(n_haps):
                    hap = hap_codes[h]
                    for ci, (regions, vis) in enumerate(hap_chunks[h]):
                        pair_t.append(hap)
                        pair_meta.append((r, h, regions, vis))
                        pair_q.append(read.codes)
                        pair_qu.append(read.qual)
            return pair_q, pair_qu, pair_t, pair_meta

        n_reads = len(reads)
        ro = np.fromiter(
            (rd.start0 + 1 - anchor_pos1 for rd in reads), np.int64, n_reads
        )
        bandw = np.fromiter((rd.length for rd in reads), np.int64, n_reads)
        bandw += 2 * band_margin

        # per hap: banded row + per-chunk shifted regions for each read whose
        # band is narrower than the haplotype (others use the full hap)
        per_hap: list[tuple[dict, list]] = []
        for h in range(n_haps):
            hap = hap_codes[h]
            lh = len(hap)
            sel = bandw < lh
            band_rows: dict[int, np.ndarray] = {}
            chunk_bregs: list[dict[int, np.ndarray]] = []
            if sel.any():
                idx_sel = np.nonzero(sel)[0]
                bs = np.clip(ro[idx_sel] - band_margin, 0, lh - bandw[idx_sel])
                bw_sel = bandw[idx_sel]
                for bw in np.unique(bw_sel):
                    grp = bw_sel == bw
                    g_idx = idx_sel[grp]
                    gathered = hap[
                        bs[grp][:, None] + np.arange(int(bw))[None, :]
                    ]
                    for gi, r in enumerate(g_idx):
                        band_rows[int(r)] = gathered[gi]
                for regions, _vis in hap_chunks[h]:
                    active = regions[:, 1] > regions[:, 0]
                    breg = np.clip(
                        regions[None, :, :] - bs[:, None, None],
                        0,
                        bw_sel[:, None, None],
                    ).astype(np.int32)
                    breg[:, ~active, :] = 0
                    chunk_bregs.append(
                        {int(r): breg[si] for si, r in enumerate(idx_sel)}
                    )
            else:
                chunk_bregs = [{} for _ in hap_chunks[h]]
            per_hap.append((band_rows, chunk_bregs))

        for r, read in enumerate(reads):
            codes, qual = read.codes, read.qual
            for h in range(n_haps):
                hap = hap_codes[h]
                band_rows, chunk_bregs = per_hap[h]
                row = band_rows.get(r)
                for ci, (regions, vis) in enumerate(hap_chunks[h]):
                    if row is not None:
                        pair_t.append(row)
                        pair_meta.append((r, h, chunk_bregs[ci][r], vis))
                    else:
                        pair_t.append(hap)
                        pair_meta.append((r, h, regions, vis))
                    pair_q.append(codes)
                    pair_qu.append(qual)
        return pair_q, pair_qu, pair_t, pair_meta

    def build_pair_indices(self, hap_lens, reads, variants,
                           anchor_pos1: int, band_margin: int,
                           max_regions: int):
        """Indexed form of build_evidence_pairs for ONE component: no
        per-pair sequence copies — pairs are (read_ix, hap_local,
        band_start, t_len, shifted regions), fully vectorized. Pair order
        is read-major then (hap, chunk), identical to the expanded builder
        (bit-identity depends on it: best-per-(read, variant) tie-breaks
        iterate pairs in order)."""
        from lancet2_tpu.ops.evidence_dp import R_MAX

        if band_margin is None:
            band_margin = 1 << 30  # no banding: every pair gets the full hap
        n_haps = len(hap_lens)
        n_reads = len(reads)
        # per-hap region chunks (same grouping as build_evidence_pairs)
        hap_chunks: list[list[tuple[np.ndarray, list]]] = []
        for h in range(n_haps):
            carried = []
            for vi, variant in enumerate(variants):
                bounds = self._extract_hap_bounds(variant, h)
                if bounds is not None:
                    carried.append((vi, bounds[0], bounds[1], bounds[2]))
            chunks = []
            for off in range(0, max(len(carried), 1), max_regions):
                group = carried[off : off + max_regions]
                regions = np.zeros((R_MAX, 2), np.int32)
                vis = []
                for r, (vi, vs, vlen, allele) in enumerate(group):
                    regions[r] = (vs, vs + vlen)
                    vis.append((vi, allele))
                chunks.append((regions, vis))
            hap_chunks.append(chunks)

        cols = [(h, ci) for h in range(n_haps)
                for ci in range(len(hap_chunks[h]))]
        C = len(cols)
        if n_reads == 0 or C == 0:
            z = np.zeros(0, np.int32)
            return dict(read_ix=z, hap_local=z, band_start=z, tlens=z,
                        regions=np.zeros((0, R_MAX, 2), np.int32),
                        meta_vis=z, vis_table=[])

        ro = np.fromiter(
            (rd.start0 + 1 - anchor_pos1 for rd in reads), np.int64, n_reads
        )
        rlen = np.fromiter((rd.length for rd in reads), np.int64, n_reads)
        bandw = rlen + 2 * band_margin
        hl = np.asarray(hap_lens, np.int64)

        # per (read, hap) band start + target length [n_reads, n_haps]
        banded = bandw[:, None] < hl[None, :]
        bs = np.clip(
            ro[:, None] - band_margin, 0,
            np.maximum(hl[None, :] - bandw[:, None], 0),
        )
        bs = np.where(banded, bs, 0).astype(np.int64)
        tl = np.where(banded, bandw[:, None], hl[None, :]).astype(np.int64)

        col_h = np.fromiter((h for h, _ci in cols), np.int64, C)
        read_ix = np.repeat(np.arange(n_reads, dtype=np.int32), C)
        hap_local = np.tile(col_h.astype(np.int32), n_reads)
        band_start = bs[:, col_h].ravel().astype(np.int32)
        tlens = tl[:, col_h].ravel().astype(np.int32)

        # shifted regions per (col, read) -> (read-major, col) pair order
        vis_table: list = []
        meta_vis_col = np.empty(C, np.int32)
        regs_by_col = np.empty((C, n_reads, R_MAX, 2), np.int32)
        for j, (h, ci) in enumerate(cols):
            regions, vis = hap_chunks[h][ci]
            meta_vis_col[j] = len(vis_table)
            vis_table.append(vis)
            shifted = np.clip(
                regions[None, :, :] - bs[:, h, None, None],
                0, tl[:, h, None, None],
            ).astype(np.int32)
            inact = regions[:, 1] <= regions[:, 0]
            shifted[:, inact, :] = 0
            regs_by_col[j] = np.where(
                banded[:, h, None, None], shifted, regions[None, :, :]
            )
        regions_all = regs_by_col.transpose(1, 0, 2, 3).reshape(
            n_reads * C, R_MAX, 2
        )
        meta_vis = np.tile(meta_vis_col, n_reads)

        # EXACT pair pruning: a pair whose every region slot band-clipped
        # to empty can never contribute evidence (assembly reads a pair
        # only through active-slot overlap), so it never needs to ship or
        # align. Kept regardless: each read's FIRST REF-hap pair — the
        # per-read NM-baseline source (assemble_evidence* takes the first
        # REF pair in order). Identical results, ~35% fewer pairs on the
        # chr-scale bench (reference aligns every read to every haplotype
        # — caller/genotyper.cpp:376-411 — but only because minimap2
        # can't know which alignments feed evidence; the band geometry
        # here proves it upfront).
        keep = (regions_all[:, :, 1] > regions_all[:, :, 0]).any(axis=1)
        keep = keep.reshape(n_reads, C)
        keep[:, 0] = True  # (h=0, ci=0): the REF baseline pair
        keep = keep.ravel()
        return dict(read_ix=read_ix[keep], hap_local=hap_local[keep],
                    band_start=band_start[keep], tlens=tlens[keep],
                    regions=regions_all[keep], meta_vis=meta_vis[keep],
                    vis_table=vis_table)

    def _chunk_inputs(self, pair_q, pair_qu, pair_t, pair_meta, lo, hi,
                      on_device: bool, pin_bucket: int | None = None):
        """Pad one pair chunk [lo, hi) to bucketed shapes."""
        from lancet2_tpu.ops.evidence_dp import R_MAX

        n_pairs = hi - lo
        bq = _bucket(max(len(s) for s in pair_q[lo:hi]), _QUERY_BUCKETS)
        if on_device:
            # Mosaic compiles through the tunnel are expensive (minutes,
            # cached only in-process): pin the pair-count bucket to the
            # chunk size and coarsen target buckets so only a handful of
            # shapes ever compile
            bt = _bucket(max(len(s) for s in pair_t[lo:hi]), _DEVICE_TARGET_BUCKETS)
            bb = pin_bucket if pin_bucket is not None else _PAIR_CHUNK
        else:
            bt = _bucket(max(len(s) for s in pair_t[lo:hi]), _TARGET_BUCKETS)
            # bucket list must cover the largest pair chunk: an exact-n
            # fallback would mint a fresh XLA shape per run (never cached)
            bb = _bucket(n_pairs, (64, 128, 256, 512, 1024, 2048, 4096))
        qs, qlens = _pad(pair_q[lo:hi] + [pair_q[lo]] * (bb - n_pairs), bq)
        qus, _ = _pad(pair_qu[lo:hi] + [pair_qu[lo]] * (bb - n_pairs), bq)
        ts, tlens = _pad(pair_t[lo:hi] + [pair_t[lo]] * (bb - n_pairs), bt)
        regions = np.zeros((bb, R_MAX, 2), np.int32)
        for b in range(n_pairs):
            regions[b] = pair_meta[lo + b][2]
        return qs, qus, qlens, ts, tlens, regions

    def run_evidence_pairs(self, pair_q, pair_qu, pair_t, pair_meta):
        """Phase 2: chunked/bucketed evidence-DP over the pair list.

        On TPU all chunks are SUBMITTED before any is read back: JAX
        dispatch is async, so device execution of chunk i overlaps host
        padding of chunk i+1, and the device->host gets (each paying the
        tunnel's ~250ms latency floor) overlap each other via
        copy_to_host_async. Descent-overflow pairs re-run on the host XLA
        engine, keeping results bit-exact vs ops.evidence_dp (tested)."""
        if _on_device():
            return self._run_evidence_pairs_device(
                pair_q, pair_qu, pair_t, pair_meta
            )
        from lancet2_tpu.ops.evidence_dp import evidence_dp

        outs = {}
        for lo in range(0, len(pair_q), _PAIR_CHUNK):
            hi = min(lo + _PAIR_CHUNK, len(pair_q))
            chunk = self._chunk_inputs(
                pair_q, pair_qu, pair_t, pair_meta, lo, hi, on_device=False
            )
            out = evidence_dp(*chunk)
            for key, arr in out.items():
                outs.setdefault(key, []).append(arr[: hi - lo])
        return {k: np.concatenate(v) for k, v in outs.items()}

    def _run_evidence_pairs_device(self, pair_q, pair_qu, pair_t, pair_meta):
        """Two-pass device dispatch. Pass 1: the R=0 SPAN kernel (score,
        t_end, t_start, NM — no region accumulators, ~score-only cost) over
        EVERY pair. Pass 2: the full R-specialized evidence kernel over only
        the pairs that pass the mapability gate AND overlap a variant region
        — measured 22% of real-pipeline pairs, so the expensive kernel does
        ~4.5x less work. Excluded pairs' region outputs are never read by
        assemble_evidence (their gate/overlap checks fail identically), so
        results stay bit-exact vs the single-pass path (tested)."""
        import numpy as np

        from lancet2_tpu.ops.evidence_pallas import (
            span_pairs_finalize,
            span_pairs_submit,
        )
        from lancet2_tpu.ops.evidence_dp import R_MAX

        n = len(pair_q)
        import contextlib

        import jax

        devices = self.devices

        # ---- pass 1: span kernel, all chunks submitted before any read ---
        pend = []
        for ci, lo in enumerate(range(0, n, _PAIR_CHUNK)):
            hi = min(lo + _PAIR_CHUNK, n)
            qs, qus, qlens, ts, tlens, regions = self._chunk_inputs(
                pair_q, pair_qu, pair_t, pair_meta, lo, hi, on_device=True
            )
            ctx = (
                jax.default_device(devices[ci % len(devices)])
                if devices
                else contextlib.nullcontext()
            )
            with ctx:
                iout, fout, B = span_pairs_submit(qs, qus, qlens, ts, tlens)
            pend.append((iout, fout, B, lo, hi, regions))
        for iout, _f, *_rest in pend:
            iout.copy_to_host_async()

        score = np.zeros(n, np.int64)
        t_end = np.zeros(n, np.int64)
        t_start = np.zeros(n, np.int64)
        nm = np.zeros(n, np.int64)
        tainted = np.zeros(n, bool)
        overlap = np.zeros(n, bool)
        for iout, fout, B, lo, hi, regions in pend:
            span = span_pairs_finalize(iout, fout, B)
            m = hi - lo
            score[lo:hi] = span["score"][:m]
            t_end[lo:hi] = span["t_end"][:m]
            t_start[lo:hi] = span["t_start"][:m]
            nm[lo:hi] = span["nm"][:m]
            tainted[lo:hi] = span["overflow"][:m]
            reg = regions[:m]
            active = reg[:, :, 1] > reg[:, :, 0]
            overlap[lo:hi] = (
                (reg[:, :, 1] > span["t_start"][:m, None])
                & (reg[:, :, 0] < span["t_end"][:m, None])
                & active
            ).any(axis=1)

        qlens_all = np.fromiter((len(q) for q in pair_q), np.int64, count=n)
        min_scores = (self.min_score_frac * qlens_all).astype(np.int64)
        pass_gate = (score >= min_scores) & (t_end > t_start)
        needed = np.flatnonzero(pass_gate & overlap & ~tainted)
        host_rerun = np.flatnonzero(tainted)
        PASS2_STATS["total"] += n
        PASS2_STATS["pass2"] += int(needed.size)

        outs = {
            "score": score, "t_end": t_end, "t_start": t_start, "nm": nm,
            "qv": np.full((n, R_MAX), -1, np.int64),
            "aligned": np.zeros((n, R_MAX), np.int64),
            "min_bq": np.full((n, R_MAX), 255, np.int64),
            "raw": np.zeros((n, R_MAX), np.float64),
            "pbq": np.zeros((n, R_MAX), np.float64),
            "matches": np.zeros((n, R_MAX), np.float64),
        }

        # ---- pass 2: full evidence kernel on the needed subset ----------
        if needed.size:
            sub = self._evidence_device_full(
                [pair_q[i] for i in needed], [pair_qu[i] for i in needed],
                [pair_t[i] for i in needed], [pair_meta[i] for i in needed],
                chunk_size=min(_PAIR_CHUNK, 512),
            )
            for k in outs:
                outs[k][needed] = np.asarray(sub[k]).astype(
                    outs[k].dtype, copy=False
                )

        # tainted spans: t_start/nm came through a capped descent — rerun
        # those pairs wholesale on the host XLA engine (bit-exact)
        if host_rerun.size:
            from lancet2_tpu.ops.evidence_pallas import host_evidence_dp

            hq = [pair_q[i] for i in host_rerun]
            hqu = [pair_qu[i] for i in host_rerun]
            ht = [pair_t[i] for i in host_rerun]
            hm = [pair_meta[i] for i in host_rerun]
            chunk = self._chunk_inputs(hq, hqu, ht, hm, 0, len(hq),
                                       on_device=False)
            sub = host_evidence_dp(*chunk)
            for k in outs:
                outs[k][host_rerun] = np.asarray(sub[k])[: len(hq)].astype(
                    outs[k].dtype, copy=False
                )
        return outs

    def _evidence_device_full(self, pair_q, pair_qu, pair_t, pair_meta,
                              chunk_size: int):
        """Single-pass full evidence dispatch over a pair list (the pass-2
        engine; also exercised stand-alone by the parity suite through
        evidence_dp_exact)."""
        import contextlib

        import jax

        from lancet2_tpu.ops.evidence_pallas import (
            R_KERNEL_MAX,
            evidence_pairs_finalize,
            evidence_pairs_submit,
        )

        devices = self.devices
        # partition pairs by active-region count (stable): the kernel is
        # R-specialized and a single 2-region pair forces a whole chunk onto
        # the ~1.7x-costlier R=2 kernel; outputs are inverse-permuted below
        n_act = np.fromiter(
            ((m[2][:, 1] > m[2][:, 0]).sum() for m in pair_meta),
            count=len(pair_meta), dtype=np.int64,
        )
        order = np.argsort(n_act > 1, kind="stable")
        if not np.array_equal(order, np.arange(len(order))):
            pair_q = [pair_q[i] for i in order]
            pair_qu = [pair_qu[i] for i in order]
            pair_t = [pair_t[i] for i in order]
            pair_meta = [pair_meta[i] for i in order]

        pending = []
        for ci, lo in enumerate(range(0, len(pair_q), chunk_size)):
            hi = min(lo + chunk_size, len(pair_q))
            chunk = self._chunk_inputs(
                pair_q, pair_qu, pair_t, pair_meta, lo, hi, on_device=True,
                pin_bucket=chunk_size,
            )
            regions = chunk[5]
            active = regions[:, :, 1] > regions[:, :, 0]
            if active[:, R_KERNEL_MAX:].any():
                # pairs built without the device region cap (defensive):
                # run this chunk through the splitting wrapper synchronously
                pending.append(("sync", chunk, hi - lo))
                continue
            ctx = (
                jax.default_device(devices[ci % len(devices)])
                if devices
                else contextlib.nullcontext()
            )
            with ctx:
                iout, fout, B, R = evidence_pairs_submit(*chunk)
            pending.append(("async", (iout, fout, B, R, chunk), hi - lo))

        # start every device->host copy before reading any result
        for kind, item, _n in pending:
            if kind == "async":
                item[0].copy_to_host_async()
                item[1].copy_to_host_async()

        outs: dict[str, list] = {}
        for kind, item, n_pairs in pending:
            if kind == "sync":
                from lancet2_tpu.ops.evidence_pallas import evidence_dp_exact

                out = evidence_dp_exact(*item)
            else:
                iout, fout, B, R, chunk = item
                out = evidence_pairs_finalize(iout, fout, B, R)
                ovf = out.pop("overflow")
                if ovf[:n_pairs].any():
                    from lancet2_tpu.ops.evidence_pallas import host_evidence_dp

                    idx = np.flatnonzero(ovf[:n_pairs])
                    sub = host_evidence_dp(
                        *(np.asarray(a)[idx] for a in chunk)
                    )
                    for k in out:
                        out[k][idx] = sub[k]
            for key, arr in out.items():
                outs.setdefault(key, []).append(arr[:n_pairs])
        inv = np.empty_like(order)
        inv[order] = np.arange(len(order))
        return {k: np.concatenate(v)[inv] for k, v in outs.items()}

    # ------------------------------------------------------------------
    # array-form phase 2: same two-pass dispatch as run_evidence_pairs but
    # over pre-padded [N, Lq]/[N, Lt] arrays (the packed prep-worker
    # protocol, core/prep_worker.py) — chunking is pure array slicing, no
    # per-pair Python. Results are identical to the list form: padding rows
    # never influence per-pair outputs (parity-tested).
    # ------------------------------------------------------------------
    def run_evidence_arrays(self, qs, qus, qlens, ts, tlens, regions,
                            pair_chunk: int | None = None):
        chunk = pair_chunk if pair_chunk is not None else _PAIR_CHUNK
        if _on_device():
            return self._run_evidence_arrays_device(
                qs, qus, qlens, ts, tlens, regions, chunk
            )
        # host XLA-scan engine carries ~80 [B, Lt] planes: cap the chunk so
        # the executor's tunnel-sized 8192-pair dispatches don't balloon
        # host memory (the device kernel is VMEM-tiled and unaffected)
        chunk = min(chunk, 2048)
        from lancet2_tpu.ops.evidence_dp import evidence_dp

        n = qs.shape[0]
        outs: dict[str, list] = {}
        for lo in range(0, n, chunk):
            hi = min(lo + chunk, n)
            bb = _bucket(hi - lo, (64, 128, 256, 512, 1024, 2048, 4096))
            out = evidence_dp(*self._pad_chunk_arrays(
                qs, qus, qlens, ts, tlens, regions, lo, hi, bb
            ))
            for k, arr in out.items():
                outs.setdefault(k, []).append(np.asarray(arr)[: hi - lo])
        return {k: np.concatenate(v) for k, v in outs.items()}

    @staticmethod
    def _pad_chunk_arrays(qs, qus, qlens, ts, tlens, regions, lo, hi, bb):
        """Slice [lo, hi) and pad the batch dim to bb rows (inert rows:
        all-N bases, length 1 — their outputs are never read)."""
        n = hi - lo
        if n == bb:
            return (qs[lo:hi], qus[lo:hi], qlens[lo:hi],
                    ts[lo:hi], tlens[lo:hi], regions[lo:hi])
        pad = bb - n
        return (
            np.pad(qs[lo:hi], ((0, pad), (0, 0)), constant_values=5),
            np.pad(qus[lo:hi], ((0, pad), (0, 0))),
            np.pad(qlens[lo:hi], (0, pad), constant_values=1),
            np.pad(ts[lo:hi], ((0, pad), (0, 0)), constant_values=5),
            np.pad(tlens[lo:hi], (0, pad), constant_values=1),
            np.pad(regions[lo:hi], ((0, pad), (0, 0), (0, 0))),
        )

    def _run_evidence_arrays_device(self, qs, qus, qlens, ts, tlens, regions,
                                    chunk):
        import contextlib

        import jax

        from lancet2_tpu.ops.evidence_dp import R_MAX
        from lancet2_tpu.ops.evidence_pallas import (
            span_pairs_finalize,
            span_pairs_submit,
        )

        n = qs.shape[0]
        devices = self.devices

        # ---- pass 1: span kernel over every pair -------------------------
        # mesh path only when the batch fills at least one tile per device:
        # tiny batches would pad D*B_TILE rows of dead work per dispatch
        use_mesh = self.mesh is not None and n >= self.mesh.devices.size * 128
        if use_mesh:
            from lancet2_tpu.parallel.evidence_spmd import span_arrays_sharded

            span = span_arrays_sharded(self.mesh, qs, qus, qlens, ts, tlens)
            score = span["score"].astype(np.int64)
            t_end = span["t_end"].astype(np.int64)
            t_start = span["t_start"].astype(np.int64)
            nm = span["nm"].astype(np.int64)
            tainted = span["overflow"].astype(bool)
        else:
            pend = []
            for ci, lo in enumerate(range(0, n, chunk)):
                hi = min(lo + chunk, n)
                cqs, cqus, cql, cts, ctl, _creg = self._pad_chunk_arrays(
                    qs, qus, qlens, ts, tlens, regions, lo, hi, chunk
                )
                ctx = (
                    jax.default_device(devices[ci % len(devices)])
                    if devices
                    else contextlib.nullcontext()
                )
                with ctx:
                    iout, fout, B = span_pairs_submit(cqs, cqus, cql, cts, ctl)
                pend.append((iout, fout, B, lo, hi))
            for iout, _f, *_rest in pend:
                iout.copy_to_host_async()

            score = np.zeros(n, np.int64)
            t_end = np.zeros(n, np.int64)
            t_start = np.zeros(n, np.int64)
            nm = np.zeros(n, np.int64)
            tainted = np.zeros(n, bool)
            for iout, fout, B, lo, hi in pend:
                span = span_pairs_finalize(iout, fout, B)
                m = hi - lo
                score[lo:hi] = span["score"][:m]
                t_end[lo:hi] = span["t_end"][:m]
                t_start[lo:hi] = span["t_start"][:m]
                nm[lo:hi] = span["nm"][:m]
                tainted[lo:hi] = span["overflow"][:m]
        active = regions[:, :, 1] > regions[:, :, 0]
        overlap = (
            (regions[:, :, 1] > t_start[:, None])
            & (regions[:, :, 0] < t_end[:, None])
            & active
        ).any(axis=1)

        min_scores = (self.min_score_frac * qlens).astype(np.int64)
        pass_gate = (score >= min_scores) & (t_end > t_start)
        needed = np.flatnonzero(pass_gate & overlap & ~tainted)
        host_rerun = np.flatnonzero(tainted)
        PASS2_STATS["total"] += n
        PASS2_STATS["pass2"] += int(needed.size)

        outs = {
            "score": score, "t_end": t_end, "t_start": t_start, "nm": nm,
            "qv": np.full((n, R_MAX), -1, np.int64),
            "aligned": np.zeros((n, R_MAX), np.int64),
            "min_bq": np.full((n, R_MAX), 255, np.int64),
            "raw": np.zeros((n, R_MAX), np.float64),
            "pbq": np.zeros((n, R_MAX), np.float64),
            "matches": np.zeros((n, R_MAX), np.float64),
        }

        # ---- pass 2: full evidence kernel on the needed subset -----------
        # 2048-pair pass-2 chunks: each dispatch pays the tunnel round trip,
        # and the pass-2 stream previously went out in 512-pair chunks (4x
        # the dispatches for the same cells)
        if needed.size:
            sub = self._evidence_arrays_full(
                qs[needed], qus[needed], qlens[needed],
                ts[needed], tlens[needed], regions[needed],
                chunk_size=min(chunk, 2048),
            )
            for k in outs:
                outs[k][needed] = np.asarray(sub[k]).astype(
                    outs[k].dtype, copy=False
                )

        if host_rerun.size:
            from lancet2_tpu.ops.evidence_pallas import host_evidence_dp

            sub = host_evidence_dp(
                qs[host_rerun], qus[host_rerun], qlens[host_rerun],
                ts[host_rerun], tlens[host_rerun], regions[host_rerun],
            )
            for k in outs:
                outs[k][host_rerun] = np.asarray(sub[k]).astype(
                    outs[k].dtype, copy=False
                )
        return outs

    # ------------------------------------------------------------------
    # indexed phase 2 (the production device protocol): pools of unique
    # reads/haps + per-pair indices instead of expanded rows — ~5x less
    # tunnel traffic (ops/evidence_fused.py). Results are bit-identical to
    # run_evidence_arrays on the expanded rows (parity-tested).
    # ------------------------------------------------------------------
    def run_evidence_indexed(self, pools: dict, pairs: dict,
                             pair_chunk: int | None = None):
        """pools: reads_q/reads_qu [NR, Lq] u8, read_lens [NR] i32,
                  haps [NH, LH] u8
        pairs: read_ix/hap_ix/band_start/tlens [n] i32,
               regions [n, R_MAX, 2] i32 (band coordinates)."""
        return self.finish_evidence_indexed(
            self.begin_evidence_indexed(pools, pairs, pair_chunk)
        )

    def begin_evidence_indexed(self, pools: dict, pairs: dict,
                               pair_chunk: int | None = None):
        """Submit pass 1 (pool transfer + span dispatches, all async) and
        return a continuation state for finish_evidence_indexed. The batch
        executor overlaps the previous batch's host phase C under these
        device dispatches."""
        chunk = pair_chunk if pair_chunk is not None else _PAIR_CHUNK
        if not _on_device():
            return ("host", pools, pairs, chunk)
        return ("device",
                self._begin_evidence_indexed_device(pools, pairs, chunk))

    def finish_evidence_indexed(self, state):
        kind, *rest = state
        if kind == "host":
            from lancet2_tpu.ops.evidence_fused import expand_pairs_numpy

            pools, pairs, chunk = rest
            lt = int(pairs.get("lt_bucket") or _bucket(
                int(np.max(pairs["tlens"], initial=1)), _TARGET_BUCKETS))
            qs, qus, qlens, ts, tlens = expand_pairs_numpy(
                pools["reads_q"], pools["reads_qu"], pools["read_lens"],
                pools["haps"], pairs["read_ix"], pairs["hap_ix"],
                pairs["band_start"], pairs["tlens"], lt,
            )
            return self.run_evidence_arrays(
                qs, qus, qlens, ts, tlens, pairs["regions"],
                pair_chunk=chunk,
            )
        return self._finish_evidence_indexed_device(rest[0])

    def _begin_evidence_indexed_device(self, pools: dict, pairs: dict,
                                       chunk: int):
        from lancet2_tpu.ops.evidence_dp import R_MAX
        from lancet2_tpu.ops.evidence_fused import (
            DevicePools,
            evidence_indexed_submit,
            expand_pairs_numpy,
            span_indexed_submit,
        )
        from lancet2_tpu.ops.evidence_pallas import span_pairs_finalize

        read_ix = np.asarray(pairs["read_ix"], np.int64)
        hap_ix = np.asarray(pairs["hap_ix"], np.int64)
        band_start = np.asarray(pairs["band_start"], np.int64)
        tlens = np.asarray(pairs["tlens"], np.int64)
        regions = np.asarray(pairs["regions"], np.int32)
        n = len(read_ix)
        lt = int(pairs.get("lt_bucket") or _bucket(
            int(np.max(tlens, initial=1)), _DEVICE_TARGET_BUCKETS))

        dev = DevicePools(pools["reads_q"], pools["reads_qu"],
                          pools["read_lens"], pools["haps"],
                          pools.get("hap_lens"))

        # ---- pass 1: span over every pair (sharded when a mesh is set) ---
        use_mesh = (self.mesh is not None
                    and n >= self.mesh.devices.size * SPMD_MIN_ROWS_PER_DEVICE)
        if self.mesh is not None and not use_mesh:
            MESH_FALLBACK_STATS["plain_span_with_mesh"] += 1
        if use_mesh:
            from lancet2_tpu.parallel.evidence_spmd import (
                span_indexed_sharded_submit,
            )

            iout = span_indexed_sharded_submit(
                self.mesh, dev, read_ix, hap_ix, band_start, tlens, lt
            )
            pend = [(iout, 0, n)]
        else:
            # super-chunking: a batch group carries ~65k pairs, and each
            # submit costs two tunnel dispatches (gather + kernel) at a
            # ~20-40 ms floor each — one full 8*chunk super-chunk replaces
            # eight chunk-sized submits (grid size is the only executable
            # difference; the Mosaic tile program is identical). A larger
            # size is used ONLY when the remainder fills it: padded rows
            # run the full row loop, so half-empty super-chunks would cost
            # more kernel time than the dispatches they save.
            import os as _os

            if _os.environ.get("LANCET2_SPAN_SUPER", "1") == "1":
                sizes = (chunk * 8, chunk * 4, chunk)
            else:
                sizes = (chunk,)
            pend = []
            lo = 0
            while lo < n:
                rem = n - lo
                sz = next((s for s in sizes[:-1] if rem >= s), sizes[-1])
                hi = min(lo + sz, n)
                iout = span_indexed_submit(
                    dev, read_ix[lo:hi], hap_ix[lo:hi], band_start[lo:hi],
                    tlens[lo:hi], lt, sz,
                )
                pend.append((iout, lo, hi))
                lo = hi
            for iout, *_rest in pend:
                iout.copy_to_host_async()
        # pass-1 dispatches are in flight; everything from the span read
        # onward runs in _finish_evidence_indexed_device so the caller can
        # overlap host work under the device stream
        return dict(dev=dev, pools=pools, pend=pend, n=n, lt=lt,
                    chunk=chunk, read_ix=read_ix, hap_ix=hap_ix,
                    band_start=band_start, tlens=tlens, regions=regions)

    def _finish_evidence_indexed_device(self, st: dict):
        from lancet2_tpu.ops.evidence_dp import R_MAX
        from lancet2_tpu.ops.evidence_fused import (
            evidence_indexed_submit,
            expand_pairs_numpy,
        )
        from lancet2_tpu.ops.evidence_pallas import span_pairs_finalize

        dev, pools, pend = st["dev"], st["pools"], st["pend"]
        n, lt, chunk = st["n"], st["lt"], st["chunk"]
        read_ix, hap_ix = st["read_ix"], st["hap_ix"]
        band_start, tlens, regions = (st["band_start"], st["tlens"],
                                      st["regions"])

        score = np.zeros(n, np.int64)
        t_end = np.zeros(n, np.int64)
        t_start = np.zeros(n, np.int64)
        nm = np.zeros(n, np.int64)
        tainted = np.zeros(n, bool)
        for iout, lo, hi in pend:
            span = span_pairs_finalize(iout, None, hi - lo)
            score[lo:hi] = span["score"]
            t_end[lo:hi] = span["t_end"]
            t_start[lo:hi] = span["t_start"]
            nm[lo:hi] = span["nm"]
            tainted[lo:hi] = span["overflow"]

        active = regions[:, :, 1] > regions[:, :, 0]
        overlap = (
            (regions[:, :, 1] > t_start[:, None])
            & (regions[:, :, 0] < t_end[:, None])
            & active
        ).any(axis=1)
        qlens_all = dev.read_lens_host[read_ix].astype(np.int64)
        min_scores = (self.min_score_frac * qlens_all).astype(np.int64)
        pass_gate = (score >= min_scores) & (t_end > t_start)
        needed = np.flatnonzero(pass_gate & overlap & ~tainted)
        host_rerun = np.flatnonzero(tainted)
        PASS2_STATS["total"] += n
        PASS2_STATS["pass2"] += int(needed.size)

        outs = {
            "score": score, "t_end": t_end, "t_start": t_start, "nm": nm,
            "qv": np.full((n, R_MAX), -1, np.int64),
            "aligned": np.zeros((n, R_MAX), np.int64),
            "min_bq": np.full((n, R_MAX), 255, np.int64),
            "raw": np.zeros((n, R_MAX), np.float64),
            "pbq": np.zeros((n, R_MAX), np.float64),
            "matches": np.zeros((n, R_MAX), np.float64),
        }

        # ---- pass 2: full kernel over the needed subset, indices only ----
        # stable partition by active-region count: 1-region pairs keep the
        # cheaper R=1 kernel (same two warmed shapes as the expanded path)
        if needed.size:
            from lancet2_tpu.ops.evidence_pallas import (
                evidence_pairs_finalize,
                host_evidence_dp,
            )

            # R must cover the HIGHEST active slot index, not the count:
            # band-clipping can empty a leading slot, leaving an active
            # region at slot 1 of an otherwise 1-region pair
            need_act = active[needed]
            if need_act[:, 2:].any():
                # defensive: >R_KERNEL_MAX active slots can't come from the
                # device prep path — route to the exact host engine
                over = need_act[:, 2:].any(axis=1)
                host_rerun = np.union1d(host_rerun, needed[over])
                needed = needed[~over]
                need_act = need_act[~over]
            r_need = np.where(need_act[:, 1], 2, 1)

            # CROP: the pass-1 optimal path's target cells all lie in
            # [t_start, t_end), so pass 2 re-runs the DP on that span only
            # — identical outputs (ties/extraction are shift-invariant;
            # fuzz-pinned by tests/test_evidence_crop.py) at ~2x fewer
            # kernel cells. Regions shift WITHOUT clamping (negative
            # starts reproduce the full-coordinate mask truths exactly).
            c_off = np.zeros(n, np.int64)
            c_off[needed] = t_start[needed]
            c_len = np.ones(n, np.int64)
            c_len[needed] = t_end[needed] - t_start[needed]
            small = min(256, lt)  # lane dim stays a multiple of 128
            lt_of = np.where(c_len <= small, small, lt)

            cap = min(chunk, 2048)
            # R=1 carries the bulk of pass 2: chunk it 4x larger (same
            # dispatch-floor argument as the span super-chunks); R=2 is
            # rare and keeps the small shape
            cap_big = min(chunk, 8192)
            pend2 = []
            use_mesh2 = self.mesh is not None
            classes = [
                (R, L, needed[(r_need == R)
                              & (lt_of[needed] == L)])
                for R in (1, 2) for L in sorted({small, lt})
            ]
            for R, L, sel in classes:
                if sel.size == 0:
                    continue
                if use_mesh2:
                    from lancet2_tpu.parallel.evidence_spmd import (
                        evidence_indexed_sharded,
                    )

                    reg8 = np.concatenate(
                        [regions[sel, :, 0] - c_off[sel, None],
                         regions[sel, :, 1] - c_off[sel, None]], axis=1
                    ).astype(np.int32)
                    iout, fout = evidence_indexed_sharded(
                        self.mesh, dev, read_ix[sel], hap_ix[sel],
                        band_start[sel] + c_off[sel], c_len[sel], reg8,
                        L, R,
                    )
                    pend2.append((iout, fout, sel, R))
                    continue
                import os as _os

                p2_big = _os.environ.get("LANCET2_PASS2_BIG", "1") == "1"
                lo = 0
                while lo < sel.size:
                    rem = sel.size - lo
                    # bulk chunks only when FULL (padded rows cost full
                    # kernel rows); R=2 is rare and keeps the small shape
                    use_cap = cap_big if (
                        p2_big and R == 1 and rem >= cap_big
                    ) else cap
                    idx = sel[lo : lo + use_cap]
                    reg8 = np.concatenate(
                        [regions[idx, :, 0] - c_off[idx, None],
                         regions[idx, :, 1] - c_off[idx, None]], axis=1
                    ).astype(np.int32)
                    iout, fout = evidence_indexed_submit(
                        dev, read_ix[idx], hap_ix[idx],
                        band_start[idx] + c_off[idx], c_len[idx], reg8,
                        L, use_cap, R=R,
                    )
                    pend2.append((iout, fout, idx, R))
                    lo += idx.size
            for iout, fout, *_rest in pend2:
                iout.copy_to_host_async()
                fout.copy_to_host_async()
            extra_rerun = []
            for iout, fout, idx, R in pend2:
                sub = evidence_pairs_finalize(iout, fout, idx.size, R)
                ovf = sub.pop("overflow")
                if ovf.any():
                    extra_rerun.append(idx[ovf])
                # t_start/t_end come back in crop coordinates
                sub["t_start"] = sub["t_start"] + c_off[idx]
                sub["t_end"] = sub["t_end"] + c_off[idx]
                for k in outs:
                    outs[k][idx] = np.asarray(sub[k]).astype(
                        outs[k].dtype, copy=False
                    )
            if extra_rerun:
                host_rerun = np.union1d(
                    host_rerun, np.concatenate(extra_rerun)
                )

        # tainted pairs rerun wholesale on the host XLA engine (bit-exact)
        if host_rerun.size:
            from lancet2_tpu.ops.evidence_pallas import host_evidence_dp

            idx = np.asarray(host_rerun, np.int64)
            qs, qus, qlens, ts, tl = expand_pairs_numpy(
                pools["reads_q"], pools["reads_qu"], pools["read_lens"],
                pools["haps"], read_ix[idx], hap_ix[idx],
                band_start[idx], tlens[idx], lt,
            )
            sub = host_evidence_dp(qs, qus, qlens, ts, tl, regions[idx])
            for k in outs:
                outs[k][idx] = np.asarray(sub[k]).astype(
                    outs[k].dtype, copy=False
                )
        return outs

    def _evidence_arrays_full(self, qs, qus, qlens, ts, tlens, regions,
                              chunk_size: int):
        """Array-form single-pass full evidence dispatch (the pass-2 engine)."""
        import contextlib

        import jax

        from lancet2_tpu.ops.evidence_pallas import (
            R_KERNEL_MAX,
            evidence_pairs_finalize,
            evidence_pairs_submit,
        )

        devices = self.devices
        n = qs.shape[0]
        # stable partition by active-region count so 2-region pairs don't
        # force whole chunks onto the costlier R=2 kernel
        n_act = (regions[:, :, 1] > regions[:, :, 0]).sum(axis=1)
        order = np.argsort(n_act > 1, kind="stable")
        if not np.array_equal(order, np.arange(n)):
            qs, qus, qlens = qs[order], qus[order], qlens[order]
            ts, tlens, regions = ts[order], tlens[order], regions[order]

        pending = []
        for ci, lo in enumerate(range(0, n, chunk_size)):
            hi = min(lo + chunk_size, n)
            chunk = self._pad_chunk_arrays(
                qs, qus, qlens, ts, tlens, regions, lo, hi, chunk_size
            )
            creg = chunk[5]
            if (creg[:, R_KERNEL_MAX:, 1] > creg[:, R_KERNEL_MAX:, 0]).any():
                pending.append(("sync", chunk, hi - lo))
                continue
            ctx = (
                jax.default_device(devices[ci % len(devices)])
                if devices
                else contextlib.nullcontext()
            )
            with ctx:
                iout, fout, B, R = evidence_pairs_submit(*chunk)
            pending.append(("async", (iout, fout, B, R, chunk), hi - lo))

        for kind, item, _n in pending:
            if kind == "async":
                item[0].copy_to_host_async()
                item[1].copy_to_host_async()

        outs: dict[str, list] = {}
        for kind, item, n_pairs in pending:
            if kind == "sync":
                from lancet2_tpu.ops.evidence_pallas import evidence_dp_exact

                out = evidence_dp_exact(*item)
            else:
                iout, fout, B, R, chunk = item
                out = evidence_pairs_finalize(iout, fout, B, R)
                ovf = out.pop("overflow")
                if ovf[:n_pairs].any():
                    from lancet2_tpu.ops.evidence_pallas import host_evidence_dp

                    idx = np.flatnonzero(ovf[:n_pairs])
                    sub = host_evidence_dp(*(np.asarray(a)[idx] for a in chunk))
                    for k in out:
                        out[k][idx] = sub[k]
            for key, arr in out.items():
                outs.setdefault(key, []).append(arr[:n_pairs])
        inv = np.empty_like(order)
        inv[order] = np.arange(len(order))
        return {k: np.concatenate(v)[inv] for k, v in outs.items()}

    def assemble_evidence_packed(self, reads, variants, comp, outs):
        """Phase 3 over a PackedComponent (core/prep_worker.py): the gate /
        overlap / field math runs vectorized over all pairs; Python touches
        only the surviving candidates (measured ~16% of pairs). Result- and
        ORDER-identical to assemble_evidence on the tuple form: candidates
        iterate in (pair, slot) order — the same nesting as the scalar
        loops — so best-per-(read,variant) tie-breaks match exactly, and
        evidence rows append per read in read order."""
        n = comp.pair_stop - comp.pair_start
        result: dict[int, dict[str, VariantSupport]] = {}
        if n == 0:
            return result
        meta_r, meta_h, meta_vis = comp.meta_r, comp.meta_h, comp.meta_vis
        regions = comp.regions
        score = np.asarray(outs["score"])
        t_start = np.asarray(outs["t_start"])
        t_end = np.asarray(outs["t_end"])
        nm = np.asarray(outs["nm"])

        n_reads = len(reads)
        if hasattr(reads, "length"):  # ReadCols (columnar payload)
            read_len = reads.length
        else:
            read_len = np.fromiter(
                (r.length for r in reads), np.int64, n_reads
            )
        min_score = (self.min_score_frac * read_len).astype(np.int64)
        pm = (score >= min_score[meta_r]) & (t_end > t_start)

        # per-read NM baseline from the first REF-haplotype pair
        baseline = read_len.copy()
        sel = np.flatnonzero(meta_h == REF_HAP_IDX)
        if sel.size:
            ur, ui = np.unique(meta_r[sel], return_index=True)
            ridx = sel[ui]
            ok = pm[ridx]
            baseline[ur[ok]] = nm[ridx[ok]]

        active = regions[:, :, 1] > regions[:, :, 0]
        ov = ((regions[:, :, 1] > t_start[:, None])
              & (regions[:, :, 0] < t_end[:, None]) & active)
        pi, si = np.nonzero(ov & pm[:, None])
        if pi.size == 0:
            return result

        aligned = np.asarray(outs["aligned"])[pi, si]
        matches = np.asarray(outs["matches"])[pi, si]
        identity = np.where(aligned > 0, matches / np.maximum(aligned, 1), 0.0)
        raw = np.asarray(outs["raw"])[pi, si]
        pbq = np.asarray(outs["pbq"])[pi, si]
        min_bq = np.asarray(outs["min_bq"])[pi, si]
        qv = np.maximum(np.asarray(outs["qv"])[pi, si], 0)
        # int(float(score) - raw): trunc-toward-zero, matching the scalar int()
        gscore = np.trunc(score[pi].astype(np.float64) - raw).astype(np.int64)
        combined = gscore.astype(np.float64) + pbq * identity
        rl = read_len[meta_r[pi]]
        rel = np.where(rl > 0, qv / np.maximum(rl, 1), 0.5)
        folded = np.minimum(rel, 1.0 - rel)
        bq = np.where(min_bq == 255, 0, min_bq)
        own_nm = nm[pi]
        hap_of = meta_h[pi]
        read_of = meta_r[pi]

        # best-per-(read, variant): candidates already in (pair, slot)
        # order == the scalar loops' nesting; dict updates keep insertion
        # position, preserving the per-read variant iteration order
        winners: dict[int, dict[int, tuple]] = {}
        vis_table = comp.vis_table
        for c in range(pi.size):
            vt = vis_table[meta_vis[pi[c]]]
            s = si[c]
            if s >= len(vt):
                continue  # inactive slot (regions row padded) — not a vis
            vi, allele = vt[s]
            per_read = winners.setdefault(int(read_of[c]), {})
            prev = per_read.get(vi)
            if prev is None or combined[c] > prev[0]:
                per_read[vi] = (combined[c], c, allele)

        columnar = hasattr(reads, "flags")
        for r in sorted(winners):
            if columnar:
                fl = int(reads.flags[r])
                strand = STRAND_REV if fl & 4 else STRAND_FWD
                sample_name = reads.sample_names[reads.sample_idx[r]]
                insert_size = int(reads.insert_size[r])
                start0 = int(reads.start0[r])
                qname_hash = int(reads.qname_hash[r])
                mapq = int(reads.mapq[r])
                is_clip, is_pp = bool(fl & 1), bool(fl & 2)
            else:
                read = reads[r]
                strand = STRAND_REV if read.is_reverse else STRAND_FWD
                sample_name = read.sample_name
                insert_size = read.insert_size
                start0 = read.start0
                qname_hash = read.qname_hash
                mapq = read.mapq
                is_clip, is_pp = read.is_soft_clipped, read.is_proper_pair
            for vi, (comb, c, allele) in winners[r].items():
                supports = result.setdefault(vi, {})
                support = supports.setdefault(sample_name, VariantSupport())
                support.add_evidence(
                    ReadEvidence(
                        insert_size=insert_size,
                        alignment_start=start0,
                        aln_score=float(comb),
                        folded_read_pos=float(folded[c]),
                        rname_hash=qname_hash & 0xFFFFFFFF,
                        ref_nm=int(baseline[r]),
                        own_hap_nm=int(own_nm[c]),
                        assigned_haplotype_id=int(hap_of[c]),
                        allele=int(allele),
                        strand=strand,
                        base_qual=int(bq[c]),
                        map_qual=mapq,
                        is_soft_clipped=is_clip,
                        is_proper_pair=is_pp,
                    )
                )
        return result

    def assemble_evidence(self, reads, variants, pair_meta, outs):
        """Phase 3: per-read allele assignment + VariantSupport assembly."""
        # per-read assembly (mirrors the CIGAR-walk backend's logic)
        result: dict[int, dict[str, VariantSupport]] = {}
        idx_of: dict[tuple[int, int, int], int] = {}
        for idx, (r, h, _reg, _vis) in enumerate(pair_meta):
            idx_of.setdefault((r, h), idx)  # first chunk holds the aln stats

        pair_index = 0
        per_read_pairs: dict[int, list[int]] = {}
        for idx, (r, h, _reg, _vis) in enumerate(pair_meta):
            per_read_pairs.setdefault(r, []).append(idx)

        for r, read in enumerate(reads):
            min_score = int(self.min_score_frac * read.length)
            read_pairs = per_read_pairs.get(r, [])
            # ref-hap NM baseline
            ref_idx = idx_of.get((r, REF_HAP_IDX))
            if ref_idx is not None and outs["score"][ref_idx] >= min_score and                     outs["t_end"][ref_idx] > outs["t_start"][ref_idx]:
                baseline_ref_nm = int(outs["nm"][ref_idx])
            else:
                baseline_ref_nm = read.length

            assignments: dict[int, ReadAlleleAssignment] = {}
            for idx in read_pairs:
                _r, h, regions, vis = pair_meta[idx]
                score = int(outs["score"][idx])
                t_start = int(outs["t_start"][idx])
                t_end = int(outs["t_end"][idx])
                if score < min_score or t_end <= t_start:
                    continue
                for slot, (vi, allele_idx) in enumerate(vis):
                    vs, ve = int(regions[slot, 0]), int(regions[slot, 1])
                    if not (ve > t_start and vs < t_end):
                        continue
                    aligned = int(outs["aligned"][idx, slot])
                    matches = float(outs["matches"][idx, slot])
                    identity = matches / aligned if aligned > 0 else 0.0
                    raw = float(outs["raw"][idx, slot])
                    pbq = float(outs["pbq"][idx, slot])
                    min_bq = int(outs["min_bq"][idx, slot])
                    qv = max(0, int(outs["qv"][idx, slot]))
                    scored = ReadAlleleAssignment()
                    scored.allele = allele_idx
                    scored.global_score = int(float(score) - raw)
                    scored.local_score = pbq
                    scored.local_identity = identity
                    scored.base_qual_at_var = 0 if min_bq == 255 else min_bq
                    scored.assigned_haplotype_id = h
                    scored.own_hap_nm = int(outs["nm"][idx])
                    scored.ref_nm = baseline_ref_nm
                    rel = qv / read.length if read.length > 0 else 0.5
                    scored.folded_read_pos = min(rel, 1.0 - rel)
                    prev = assignments.get(vi)
                    if prev is None or scored.combined_score > prev.combined_score:
                        assignments[vi] = scored

            strand = STRAND_REV if read.is_reverse else STRAND_FWD
            for vi, scored in assignments.items():
                supports = result.setdefault(vi, {})
                support = supports.setdefault(read.sample_name, VariantSupport())
                support.add_evidence(
                    ReadEvidence(
                        insert_size=read.insert_size,
                        alignment_start=read.start0,
                        aln_score=scored.combined_score,
                        folded_read_pos=scored.folded_read_pos,
                        rname_hash=read.qname_hash & 0xFFFFFFFF,
                        ref_nm=scored.ref_nm,
                        own_hap_nm=scored.own_hap_nm,
                        assigned_haplotype_id=scored.assigned_haplotype_id,
                        allele=scored.allele,
                        strand=strand,
                        base_qual=scored.base_qual_at_var,
                        map_qual=read.mapq,
                        is_soft_clipped=read.is_soft_clipped,
                        is_proper_pair=read.is_proper_pair,
                    )
                )
        return result

    def _genotype_evidence(self, hap_codes, hap_seqs, reads, variants, quals_list):
        pair_q, pair_qu, pair_t, pair_meta = self.build_evidence_pairs(
            hap_codes, reads, variants
        )
        outs = self.run_evidence_pairs(pair_q, pair_qu, pair_t, pair_meta)
        return self.assemble_evidence(reads, variants, pair_meta, outs)

    def _align_all(self, hap_codes: list[np.ndarray], reads: list[Read],
                   variants: list[RawVariant] | None = None):
        """Batched alignment of every (read, hap) pair; returns nested dict
        alns[read_idx][hap_idx] = {score, t_start, t_end, cigar, hap_idx}
        for pairs that need CIGARs (None entries are gated/non-candidates)."""
        n_reads, n_haps = len(reads), len(hap_codes)
        pair_q = []
        pair_t = []
        for read in reads:
            for h in range(n_haps):
                pair_q.append(read.codes)
                pair_t.append(hap_codes[h])

        # min-score gate applied after alignment; all pairs get CIGARs
        pair_of = {i: i for i in range(len(pair_q))}
        results: list[dict] = []
        for lo in range(0, len(pair_q), _PAIR_CHUNK):
            hi = min(lo + _PAIR_CHUNK, len(pair_q))
            if self.backend == "jax":
                # bucket every dimension so the jitted executable is reused
                # across windows (pair count, read length, haplotype length)
                n_pairs = hi - lo
                bq = _bucket(max(len(s) for s in pair_q[lo:hi]), (160, 320, 640, 1280))
                bt = _bucket(max(len(s) for s in pair_t[lo:hi]), _TARGET_BUCKETS)
                bb = _bucket(n_pairs, (64, 128, 256, 512))
                qs, qlens = _pad(pair_q[lo:hi] + [pair_q[lo]] * (bb - n_pairs), bq)
                ts, tlens = _pad(pair_t[lo:hi] + [pair_t[lo]] * (bb - n_pairs), bt)
                from lancet2_tpu.ops.affine_dp_jax import align_dirs_jax

                score, t_end, dirs = align_dirs_jax(qs, qlens, ts, tlens, READ_TO_HAP)
                out = {"score": score[:n_pairs], "t_end": t_end[:n_pairs],
                       "dirs": dirs[:n_pairs]}
                qlens = qlens[:n_pairs]
            else:
                qs, qlens = _pad(pair_q[lo:hi])
                ts, tlens = _pad(pair_t[lo:hi])
                out = align_batch_numpy(qs, qlens, ts, tlens, READ_TO_HAP)
            cigars = traceback_batch(
                np.asarray(out["dirs"]), qlens, np.asarray(out["t_end"], dtype=np.int64), READ_TO_HAP
            )
            for b in range(hi - lo):
                cigar = cigars[b]
                t_span = sum(l for op, l in cigar if op in (0, 2))
                t_end = int(out["t_end"][b])
                results.append(
                    {
                        "score": int(out["score"][b]),
                        "t_end": t_end,
                        "t_start": t_end - t_span,
                        "cigar": cigar,
                    }
                )

        alns = []
        for r in range(n_reads):
            per_hap = []
            for h in range(n_haps):
                idx = r * n_haps + h
                res = dict(results[pair_of[idx]])
                res["hap_idx"] = h
                # apply the min-score mapability gate here so downstream
                # sees None for unalignable pairs
                min_score = int(self.min_score_frac * reads[r].length)
                if res["score"] < min_score:
                    per_hap.append(None)
                else:
                    per_hap.append(res)
            alns.append(per_hap)
        return alns

    @staticmethod
    def _extract_hap_bounds(variant: RawVariant, hap_idx: int):
        """(var_start, var_len, allele_idx) of this variant on haplotype hap_idx,
        or None when the haplotype doesn't carry it."""
        if hap_idx == REF_HAP_IDX:
            return variant.local_ref_start0, len(variant.ref_allele), 0
        for alt_pos, alt in enumerate(variant.alts):
            start = alt.local_hap_starts.get(hap_idx)
            if start is not None:
                return start, len(alt.sequence), alt_pos + 1
        return None

    def genotype(
        self, hap_seqs: list[str], reads: list[Read], variants: list[RawVariant]
    ) -> dict[int, dict[str, VariantSupport]]:
        """Returns {variant_index: {sample_name: VariantSupport}}."""
        if not variants or not reads:
            return {}
        hap_codes = [encode(h) for h in hap_seqs]
        if self.backend == "evidence":
            return self._genotype_evidence(
                hap_codes, hap_seqs, reads, variants, [r.qual for r in reads]
            )
        alns = self._align_all(hap_codes, reads, variants)

        result: dict[int, dict[str, VariantSupport]] = {}
        for read, per_hap in zip(reads, alns):
            valid = [a for a in per_hap
                     if a is not None and a["t_end"] > a["t_start"]]
            if not valid:
                continue

            # O(1)-per-read NM baseline against the REF haplotype
            ref_aln = per_hap[REF_HAP_IDX]
            if ref_aln is not None and ref_aln in valid:
                ref_slice = hap_codes[REF_HAP_IDX][ref_aln["t_start"] : ref_aln["t_end"]]
                baseline_ref_nm = compute_edit_distance_cigar(
                    ref_aln["cigar"], read.codes, ref_slice
                )
            else:
                baseline_ref_nm = read.length

            assignments: dict[int, ReadAlleleAssignment] = {}
            for aln in valid:
                hap_idx = aln["hap_idx"]
                for vi, variant in enumerate(variants):
                    bounds = self._extract_hap_bounds(variant, hap_idx)
                    if bounds is None:
                        continue
                    var_start, var_len, allele_idx = bounds
                    if not (var_start + var_len > aln["t_start"] and var_start < aln["t_end"]):
                        continue
                    scored = score_read_at_variant(
                        aln, hap_codes[hap_idx], read.codes, read.qual,
                        read.length, var_start, var_len, allele_idx,
                    )
                    scored.ref_nm = baseline_ref_nm
                    prev = assignments.get(vi)
                    if prev is None or scored.combined_score > prev.combined_score:
                        assignments[vi] = scored

            strand = STRAND_REV if read.is_reverse else STRAND_FWD
            for vi, scored in assignments.items():
                supports = result.setdefault(vi, {})
                support = supports.setdefault(read.sample_name, VariantSupport())
                support.add_evidence(
                    ReadEvidence(
                        insert_size=read.insert_size,
                        alignment_start=read.start0,
                        aln_score=scored.combined_score,
                        folded_read_pos=scored.folded_read_pos,
                        rname_hash=read.qname_hash & 0xFFFFFFFF,
                        ref_nm=scored.ref_nm,
                        own_hap_nm=scored.own_hap_nm,
                        assigned_haplotype_id=scored.assigned_haplotype_id,
                        allele=scored.allele,
                        strand=strand,
                        base_qual=scored.base_qual_at_var,
                        map_qual=read.mapq,
                        is_soft_clipped=read.is_soft_clipped,
                        is_proper_pair=read.is_proper_pair,
                    )
                )
        return result

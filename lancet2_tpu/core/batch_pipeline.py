"""Batch executor: host prepare threads + fused cross-window evidence DP.

The threads executor genotypes inside each worker, one window at a time —
fine on a CPU, but device dispatch wants large fused batches. This executor
splits the pipeline (SURVEY.md §7 architecture sketch):

  phase A (worker threads) window gating, read collection, assembly,
                           variant extraction/annotation (host-bound)
  phase B (single stream)  ALL (read x haplotype x region-chunk) pairs of a
                           window batch concatenated into one evidence-DP
                           stream — few large bucketed dispatches instead of
                           per-window small ones (ops/evidence_dp.py)
  phase C (host)           per-window allele assignment, evidence features,
                           VariantCall assembly, ordered store/flush

Windows remain embarrassingly parallel; the fused phase B only changes the
dispatch granularity, not the results — output is record-identical to the
threads executor (tested).
"""

from __future__ import annotations

import queue
import threading
import time
import traceback

from lancet2_tpu.caller.genotyper import Genotyper
from lancet2_tpu.caller.variant_call import VariantCall
from lancet2_tpu.core.variant_builder import (
    BuilderParams,
    PreparedWindow,
    StatusCode,
    VariantBuilder,
)
from lancet2_tpu.core.variant_store import VariantStore
from lancet2_tpu.utils.logging import get_logger
from lancet2_tpu.utils.profiling import StageTimer

LOG = get_logger("batch_pipeline")

DEFAULT_WINDOW_BATCH = 64


class BatchPipelineExecutor:
    def __init__(
        self,
        params: BuilderParams,
        ref,
        samples,
        windows,
        num_workers: int = 2,
        window_batch: int = DEFAULT_WINDOW_BATCH,
        pair_chunk: int = 2048,
        checkpoint=None,
        min_emit_pos=None,
        band_margin: int | None = 96,
        total_hint: int | None = None,
        devices: list | None = None,
    ):
        self.params = params
        self.ref = ref
        self.samples = samples
        self.streaming = not isinstance(windows, (list, tuple))
        self.windows = windows if not self.streaming else None
        self._window_iter = iter(windows) if self.streaming else None
        self.total_hint = total_hint if total_hint is not None else (
            len(windows) if not self.streaming else None
        )
        self.num_workers = max(1, num_workers)
        self.window_batch = window_batch
        self.pair_chunk = pair_chunk
        self.checkpoint = checkpoint
        self.band_margin = band_margin
        self.store = VariantStore(
            windows if not self.streaming else [], min_emit_pos=min_emit_pos
        )
        self.status_counts: dict[StatusCode, int] = {}
        self.stage_timer = StageTimer()
        self._timer_lock = threading.Lock()
        # explicit device list for evidence-chunk round-robin (multi-chip);
        # None = auto (all devices when the default backend is an accelerator)
        self.devices = devices
        # persistent per-worker builders over ONE shared reader pool:
        # whole-file decode + the active-region event index happen once per
        # input file for the whole run, not once per (batch, worker)
        self._reader_pool: dict = {}
        self._builders: list[VariantBuilder | None] = [None] * self.num_workers

    def _device_pl_tables(self, pending_rows, devices):
        """Batched device DM PLs for every (call, sample) of a window batch.

        Rows group by allele count K (one jitted dispatch each, typically
        K=2) and run in scoped-x64 float64 on the device — bit-equal to the
        host engine (float32 is not: see batched_genotype_pls_exact).
        Returns {row_index: {sample_name: pls}}; empty when not on an
        accelerator (host math is faster than a tunnel round-trip).
        """
        if devices is None or not pending_rows:
            return {}
        import numpy as np

        from lancet2_tpu.ops.genotype_tpu import batched_genotype_pls_exact

        by_k: dict[int, list[tuple[int, str, list[int]]]] = {}
        for row_idx, (_bi, _prepared, variant, supports) in enumerate(pending_rows):
            k = len(variant.alts) + 1
            for sample_name, sup in supports.items():
                counts = [sup.total_allele_cov(i) for i in range(k)]
                by_k.setdefault(k, []).append((row_idx, sample_name, counts))

        tables: dict[int, dict[str, object]] = {}
        with self.stage_timer.stage("genotype_pls_device"):
            for k, rows in by_k.items():
                counts = np.array([r[2] for r in rows], np.int64)
                pls = batched_genotype_pls_exact(counts, k)
                for (row_idx, sample_name, _c), pl_row in zip(rows, pls):
                    tables.setdefault(row_idx, {})[sample_name] = pl_row
        return tables

    def _batches(self):
        """Yield window batches from the list or the streaming iterator."""
        if self.streaming:
            batch: list = []
            for w in self._window_iter:
                batch.append(w)
                if len(batch) >= self.window_batch:
                    yield batch
                    batch = []
            if batch:
                yield batch
        else:
            for lo in range(0, len(self.windows), self.window_batch):
                yield self.windows[lo : lo + self.window_batch]

    def execute(self, out) -> dict:
        import copy

        if not self.streaming and len(self.windows) == 0:
            return {"windows": 0, "flushed": 0}
        t_start = time.monotonic()

        import jax

        from lancet2_tpu.caller import genotyper as genotyper_mod

        devices = self.devices if self.devices is not None else (
            list(jax.devices())
            if jax.default_backend() in ("tpu", "axon")
            else None
        )
        genotyper = Genotyper(backend="evidence", devices=devices)

        # sequential builder construction: the first one decodes each input
        # file into the shared pool; the rest attach to it
        for wid in range(self.num_workers):
            if self._builders[wid] is None:
                samples = [copy.copy(s) for s in self.samples]
                self._builders[wid] = VariantBuilder(
                    self.params, self.ref, samples,
                    reader_pool=self._reader_pool,
                )

        flushed = 0
        num_done = 0
        failures: list = []

        def prepare_batch(batch) -> list:
            """Phase A for one batch: gate/collect/assemble/extract in
            worker threads. Runs concurrently with the previous batch's
            device phase (B) — host prep hides under device compute."""
            prepared_items: list[PreparedWindow | None] = [None] * len(batch)
            work_q: queue.Queue = queue.Queue()
            for bi, w in enumerate(batch):
                work_q.put((bi, w))

            def prep_worker(worker_id: int) -> None:
                builder = self._builders[worker_id]
                while True:
                    try:
                        bi, window = work_q.get_nowait()
                    except queue.Empty:
                        with self._timer_lock:
                            self.stage_timer.merge(builder.timer)
                        builder.timer = StageTimer()  # builders persist
                        return
                    try:
                        prepared = builder.prepare_window(window)
                    except Exception as exc:
                        failures.append((window, exc, traceback.format_exc()))
                        with self._timer_lock:
                            self.stage_timer.merge(builder.timer)
                        builder.timer = StageTimer()  # builders persist
                        return
                    prepared_items[bi] = (prepared, builder.current_code)

            threads = [
                threading.Thread(target=prep_worker, args=(wid,), daemon=True)
                for wid in range(self.num_workers)
            ]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            return prepared_items

        batch_iter = self._batches()
        next_result: dict = {}
        # main-thread WALL attribution: the per-thread stage timer sums
        # thread-seconds (inflated by oversubscription), so it cannot say
        # where the run's wall clock went; these timers can.
        wall = StageTimer()

        def prefetch(bidx: int, batch: list) -> threading.Thread:
            def run():
                next_result[bidx] = prepare_batch(batch)

            t = threading.Thread(target=run, daemon=True)
            t.start()
            return t

        cur_batch = next(batch_iter, None)
        if cur_batch is None:
            return {"windows": 0, "flushed": 0}
        bidx = 0
        pending = prefetch(0, cur_batch)
        next_batch = next(batch_iter, None)
        while cur_batch is not None:
            batch = cur_batch
            lo = batch[0].genome_index
            with wall.stage("prep_wait"):
                pending.join()
            prepared_items = next_result.pop(bidx)
            if failures:
                window, exc, tb = failures[0]
                raise RuntimeError(
                    f"prepare failed on window {window.to_samtools()}: {exc}\n{tb}"
                )
            # overlap: next batch's host prep runs while this batch is on device
            if next_batch is not None:
                pending = prefetch(bidx + 1, next_batch)

            # ---- phase B: fused evidence DP over the whole batch ---------
            from lancet2_tpu.base.dna import encode

            all_q, all_qu, all_t, all_meta = [], [], [], []
            spans = []  # (bi, ci, start, stop) pair-index spans per component
            comp_data = []  # (bi, ci, reads, variants, pair_meta_local)
            with wall.stage("build_pairs"):
                for bi, item in enumerate(prepared_items):
                    if item is None:
                        continue
                    prepared, _code = item
                    if not isinstance(prepared, PreparedWindow):
                        continue
                    for ci, pc in enumerate(prepared.components):
                        hap_codes = [encode(h) for h in pc.hap_seqs]
                        pq, pqu, pt, pm = genotyper.build_evidence_pairs(
                            hap_codes, prepared.reads, pc.variants,
                            anchor_pos1=pc.anchor_pos1,
                            band_margin=self.band_margin,
                        )
                        spans.append((bi, ci, len(all_q), len(all_q) + len(pq)))
                        comp_data.append((bi, ci, prepared, pc, pm))
                        all_q.extend(pq)
                        all_qu.extend(pqu)
                        all_t.extend(pt)
                        all_meta.extend(pm)

            outs = None
            if all_q:
                old_chunk = genotyper_mod._PAIR_CHUNK
                genotyper_mod._PAIR_CHUNK = self.pair_chunk
                try:
                    with self.stage_timer.stage("genotype_device"), \
                            wall.stage("device"):
                        outs = genotyper.run_evidence_pairs(
                            all_q, all_qu, all_t, all_meta
                        )
                finally:
                    genotyper_mod._PAIR_CHUNK = old_chunk

            # ---- phase C: assemble + store -------------------------------
            # collect (variant, supports) rows first so the DM PL math of the
            # WHOLE window batch goes to the device as one dispatch per
            # allele-count K (reference budget: genotype_likelihood.cpp,
            # 0.2% CPU — on TPU it rides the already-open device stream).
            pending_rows: list[tuple[int, object, object, dict]] = []
            with wall.stage("phase_c"):
                for (bi, ci, prepared, pc, pm), (_sbi, _sci, start, stop) in zip(
                    comp_data, spans
                ):
                    comp_outs = {k: v[start:stop] for k, v in (outs or {}).items()}
                    with self.stage_timer.stage("assemble_evidence"):
                        geno = genotyper.assemble_evidence(
                            prepared.reads, pc.variants, pm, comp_outs
                        )
                    for vi, variant in enumerate(pc.variants):
                        supports = geno.get(vi)
                        if not supports:
                            continue
                        if not any(
                            s.total_alt_cov() > 0 for s in supports.values()
                        ):
                            continue
                        pending_rows.append((bi, prepared, variant, supports))

                pls_tables = self._device_pl_tables(pending_rows, devices)

                per_window_calls: dict[int, list[VariantCall]] = {}
                for row_idx, (bi, prepared, variant, supports) in enumerate(
                    pending_rows
                ):
                    per_window_calls.setdefault(bi, []).append(
                        VariantCall(
                            variant, supports, prepared.sample_summaries,
                            prepared.window.length,
                            window_index=prepared.window.genome_index,
                            pls_lookup=pls_tables.get(row_idx),
                        )
                    )

                for bi, item in enumerate(prepared_items):
                    if item is None:
                        continue
                    prepared, code = item
                    calls = per_window_calls.get(bi, [])
                    if isinstance(prepared, PreparedWindow):
                        code = (
                            StatusCode.FOUND_GENOTYPED_VARIANT
                            if calls
                            else StatusCode.MISSING_NO_MSA_VARIANTS
                        )
                    self.status_counts[code] = self.status_counts.get(code, 0) + 1
                    if calls:
                        self.store.add_variants(calls)
                    num_done += 1

            # windows are processed in genomic batch order: everything before
            # the next batch's first window is final
            if next_batch is not None:
                w = next_batch[0]
                with wall.stage("flush"):
                    flushed += self.store.flush_before_pos(
                        w.chrom_index, w.start1, out
                    )
                if self.checkpoint is not None:
                    self.checkpoint.save(w.chrom_index, w.start1, num_done)
            rate = num_done / (time.monotonic() - t_start)
            LOG.info("batch %d-%d done (%.2f win/s)", lo, lo + len(batch) - 1, rate)
            cur_batch = next_batch
            bidx += 1
            next_batch = next(batch_iter, None) if cur_batch is not None else None

        flushed += self.store.flush_all(out)
        runtime = time.monotonic() - t_start
        stage_report = self.stage_timer.report()
        if stage_report:
            LOG.info("stage profile: %s",
                     ", ".join(f"{k}={v['pct']}%" for k, v in stage_report.items()))
        wall_report = wall.report()
        accounted = sum(v["seconds"] for v in wall_report.values())
        other_s = max(runtime - accounted, 0.0)
        # rescale pcts against total wall runtime so entries + 'other' sum
        # to ~100% (StageTimer computed them against accounted time only)
        if runtime > 0:
            for v in wall_report.values():
                v["pct"] = round(100.0 * v["seconds"] / runtime, 1)
        wall_report["other"] = {
            "seconds": round(other_s, 3),
            "pct": round(100.0 * other_s / runtime, 1) if runtime > 0 else 0.0,
            "count": 1,
        }
        return {
            "windows": num_done,
            "flushed": flushed,
            "runtime_s": runtime,
            "windows_per_s": num_done / runtime if runtime > 0 else 0.0,
            "status_counts": {k.name: v for k, v in self.status_counts.items()},
            "stage_profile": stage_report,
            "wall_profile": wall_report,
        }

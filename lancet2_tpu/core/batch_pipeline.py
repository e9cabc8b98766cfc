"""Batch executor: parallel phase-A prep + fused cross-window evidence DP.

The threads executor genotypes inside each worker, one window at a time —
fine on a CPU, but device dispatch wants large fused batches. This executor
splits the pipeline (SURVEY.md §7 architecture sketch):

  phase A (prep workers)   window gating, read collection, assembly, variant
                           extraction/annotation, pair building + padding —
                           host-bound, runs in fork PROCESSES by default
                           (COW-shared decoded BAM pools, no GIL; the
                           reference's jthread scaling model,
                           core/pipeline_executor.cpp:174) with a threads
                           fallback producing byte-identical payloads
  phase B (single stream)  ALL (read x haplotype x region-chunk) pairs of a
                           window batch concatenated into one evidence-DP
                           stream — few large bucketed device dispatches
                           (caller/genotyper.run_evidence_arrays)
  phase C (host)           per-window allele assignment, evidence features,
                           VariantCall assembly, ordered store/flush

Windows remain embarrassingly parallel; the fused phase B only changes the
dispatch granularity, not the results — output is record-identical to the
threads executor (tests/test_executor_identity.py).
"""

from __future__ import annotations

import os
import queue
import threading
import time

import numpy as np

from lancet2_tpu.caller.variant_call import VariantCall
from lancet2_tpu.core.prep_worker import (
    PackedWindow,
    coordinator_main,
    map_pair_arrays,
    prepare_and_pack,
)
from lancet2_tpu.core.variant_builder import (
    BuilderParams,
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
        prep_mode: str = "auto",
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
        # explicit device list for evidence-chunk round-robin (multi-chip);
        # None = auto (all devices when the default backend is an accelerator)
        self.devices = devices
        # prep backend: 'processes' (fork, default on posix), 'threads'
        self.prep_mode = prep_mode
        self._reader_pool: dict = {}
        self._procs: list = []
        self._threads: list = []
        self._work_q = None
        self._result_q = None
        # results land here via a dedicated drain thread: worker->parent
        # payloads are ~MB-scale and the mp.Queue pipe holds only ~64 KB,
        # so if the parent read results only while waiting, workers would
        # block on the pipe during the parent's whole device phase and
        # prep/device overlap would collapse (measured: zero overlap at
        # chr scale before the drain thread)
        self._results: dict[int, PackedWindow] = {}
        self._results_cv = threading.Condition()
        self._drain_thread = None
        self._drain_error = None

    # ------------------------------------------------------------------
    # prep backends
    # ------------------------------------------------------------------
    def _use_processes(self) -> bool:
        # streaming readers are fork-safe: their block caches reopen the
        # file per PID (hts/bai.py _LruBlockCache._file), so forked workers
        # never share a seek offset
        if self.prep_mode == "threads":
            return False
        if self.prep_mode == "processes":
            return True
        return hasattr(os, "fork") and os.name == "posix"

    def _start_prep_workers(self, max_regions, lq_buckets, lt_buckets):
        n = max(1, min(self.num_workers, os.cpu_count() or self.num_workers))
        self._n_prep_workers = n
        if self._use_processes():
            import multiprocessing as mp

            # SPAWN one clean jax-free coordinator (forking this process
            # directly corrupts the inherited TPU tunnel transport —
            # prep_worker.coordinator_main documents the failure); the
            # coordinator decodes inputs once, then forks the N workers,
            # which inherit the pools copy-on-write and talk to us through
            # these spawn-context queues directly.
            ctx = mp.get_context("spawn")
            self._work_q = ctx.Queue()
            self._result_q = ctx.Queue()
            p = ctx.Process(
                target=coordinator_main,
                args=(self._work_q, self._result_q, self.params,
                      self.ref.path, self.samples, self.band_margin,
                      max_regions, lt_buckets, lq_buckets, n),
                daemon=False,  # daemons may not fork the workers
            )
            p.start()
            self._procs.append(p)
            self._start_drain_thread()
            LOG.info("prep: spawned coordinator + %d fork worker(s)", n)
            return

        # threads fallback: same protocol, same packed payloads
        import copy

        from lancet2_tpu.caller.genotyper import Genotyper

        self._work_q = queue.Queue()
        self._result_q = queue.Queue()

        def thread_main():
            samples = [copy.copy(s) for s in self.samples]
            builder = VariantBuilder(self.params, self.ref, samples,
                                     reader_pool=self._reader_pool)
            genotyper = Genotyper(backend="evidence")
            while True:
                item = self._work_q.get()
                if item is None:
                    return
                seq, window = item
                try:
                    payload = prepare_and_pack(
                        builder, genotyper, window, self.band_margin,
                        max_regions, lt_buckets, lq_buckets,
                    )
                    self._result_q.put((seq, "ok", payload))
                except Exception as exc:
                    import traceback

                    self._result_q.put(
                        (seq, "error", (repr(exc), traceback.format_exc()))
                    )

        for _ in range(n):
            t = threading.Thread(target=thread_main, daemon=True)
            t.start()
            self._threads.append(t)
        self._start_drain_thread()
        LOG.info("prep: %d worker thread(s)", n)

    def _stop_prep_workers(self):
        if self._work_q is None:
            return
        # one sentinel per worker (the coordinator exits when its forked
        # workers do; threads consume their own)
        for _ in range(max(len(self._threads), getattr(self, "_n_prep_workers", 1))):
            self._work_q.put(None)
        for t in self._threads:
            t.join(timeout=30)
        for p in self._procs:
            p.join(timeout=30)
            if p.is_alive():
                p.terminate()
        self._procs = []
        self._threads = []
        if self._drain_thread is not None:
            self._result_q.put(self._DRAIN_STOP)
            self._drain_thread.join(timeout=30)
            self._drain_thread = None
        # error/abort paths can leave unconsumed shm payloads (workers
        # unregister from their resource tracker — the executor owns the
        # unlink); reclaim anything still parked in the results dict
        for payload in self._results.values():
            pairs = getattr(payload, "pairs", None)
            if pairs and "shm" in pairs:
                try:
                    from multiprocessing import shared_memory

                    seg = shared_memory.SharedMemory(name=pairs["shm"])
                    seg.close()
                    seg.unlink()
                except Exception:
                    pass
        self._results.clear()

    _DRAIN_STOP = ("__drain_stop__", None, None)

    def _start_drain_thread(self):
        def drain():
            while True:
                item = self._result_q.get()
                if item[0] == "__drain_stop__":
                    return
                seq, kind, payload = item
                with self._results_cv:
                    if kind in ("error", "fatal"):
                        self._drain_error = payload
                    else:
                        self._results[seq] = payload
                    self._results_cv.notify_all()

        self._drain_thread = threading.Thread(target=drain, daemon=True)
        self._drain_thread.start()

    def _wait_for(self, seqs: list[int]) -> list[PackedWindow]:
        """Block until every seq in `seqs` has a payload; returns in order.

        Fail-fast: raises on (a) a worker-reported error, (b) a coordinator
        fatal (e.g. a killed worker, with the window seq it was processing),
        or (c) silent coordinator death — never hangs on lost work."""
        with self._results_cv:
            while True:
                if self._drain_error is not None:
                    msg, tb = self._drain_error
                    raise RuntimeError(f"prepare failed: {msg}\n{tb}")
                if all(s in self._results for s in seqs):
                    return [self._results.pop(s) for s in seqs]
                self._results_cv.wait(timeout=1.0)
                if self._procs and not any(p.is_alive()
                                           for p in self._procs):
                    # give the drain thread one beat to surface a queued
                    # fatal before declaring silent death
                    self._results_cv.wait(timeout=1.0)
                    if self._drain_error is not None:
                        continue
                    if all(s in self._results for s in seqs):
                        continue
                    missing = [s for s in seqs if s not in self._results]
                    raise RuntimeError(
                        "prep coordinator died without reporting; "
                        f"windows (seq) never prepared: {missing[:8]}"
                    )

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

    # ------------------------------------------------------------------
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
        from lancet2_tpu.ops.genotype_tpu import batched_genotype_pls_exact

        by_k: dict[int, list[tuple[int, str, list[int]]]] = {}
        for row_idx, (_bi, _payload, variant, supports) in enumerate(pending_rows):
            k = len(variant.alts) + 1
            for sample_name, sup in supports.items():
                counts = [sup.total_allele_cov(i) for i in range(k)]
                by_k.setdefault(k, []).append((row_idx, sample_name, counts))

        tables: dict[int, dict[str, object]] = {}
        with self.stage_timer.stage("genotype_pls_device"):
            for k, rows in by_k.items():
                counts = np.array([r[2] for r in rows], np.int64)
                # mesh set => PL rows shard over the devices (SPMD, no
                # host round-robin); byte-identical either way
                pls = batched_genotype_pls_exact(
                    counts, k, mesh=getattr(self, "_mesh", None)
                )
                for (row_idx, sample_name, _c), pl_row in zip(rows, pls):
                    tables.setdefault(row_idx, {})[sample_name] = pl_row
        return tables

    # ------------------------------------------------------------------
    def execute(self, out) -> dict:
        if not self.streaming and len(self.windows) == 0:
            return {"windows": 0, "flushed": 0}
        t_start = time.monotonic()

        from lancet2_tpu.caller.genotyper import (
            _DEVICE_TARGET_BUCKETS,
            _QUERY_BUCKETS,
            _TARGET_BUCKETS,
            Genotyper,
            _on_device,
        )
        from lancet2_tpu.ops.evidence_dp import R_MAX

        on_device = _on_device()
        if on_device:
            from lancet2_tpu.ops.evidence_pallas import R_KERNEL_MAX

            max_regions = R_KERNEL_MAX
            lt_buckets = _DEVICE_TARGET_BUCKETS
        else:
            max_regions = R_MAX
            lt_buckets = _TARGET_BUCKETS

        # fork prep workers BEFORE touching jax device state in this frame
        self._start_prep_workers(max_regions, _QUERY_BUCKETS, lt_buckets)

        import jax

        devices = self.devices if self.devices is not None else (
            list(jax.devices()) if on_device else None
        )
        # multi-chip: the pass-1 span stream goes out as ONE shard_map
        # dispatch per super-chunk over a 1-D windows mesh (SPMD over ICI)
        # instead of per-device Python round-robin; single chip keeps the
        # plain dispatch path
        mesh = None
        if devices is not None and len(devices) > 1:
            from lancet2_tpu.parallel.mesh import make_mesh

            mesh = make_mesh(devices)
        self._mesh = mesh
        genotyper = Genotyper(backend="evidence", devices=devices, mesh=mesh)

        flushed = 0
        num_done = 0
        seq_counter = 0
        wall = StageTimer()

        def enqueue(batch) -> list[int]:
            nonlocal seq_counter
            seqs = []
            for w in batch:
                self._work_q.put((seq_counter, w))
                seqs.append(seq_counter)
                seq_counter += 1
            return seqs

        try:
            from collections import deque

            batch_iter = self._batches()
            pending: deque = deque()
            LOOKAHEAD = 3  # batches in flight so workers never starve

            def top_up():
                while len(pending) < LOOKAHEAD:
                    b = next(batch_iter, None)
                    if b is None:
                        return
                    pending.append((b, enqueue(b)))

            top_up()
            if not pending:
                return {"windows": 0, "flushed": 0}

            def submit_phase_b(payloads):
                """Group windows by padded shape, concatenate pools with
                index offsets, and SUBMIT pass 1 for every group (device
                dispatches in flight on return). Result-neutral grouping:
                pair outputs are independent of chunk composition."""
                groups: dict[tuple[int, int], list[int]] = {}
                for bi, p in enumerate(payloads):
                    if p.pairs is not None:
                        key = (p.pairs["lq_bucket"], p.pairs["lt_bucket"])
                        groups.setdefault(key, []).append(bi)
                subs = []
                for key in sorted(groups):
                    members = groups[key]
                    pool_parts = {k: [] for k in (
                        "reads_q", "reads_qu", "read_lens",
                        "haps", "hap_lens")}
                    ix_parts = {k: [] for k in (
                        "read_ix", "hap_ix", "band_start", "tlens")}
                    regs, closers = [], []
                    r_off = h_off = 0
                    hap_w = max(payloads[bi].pairs["hap_w"]
                                for bi in members)
                    for bi in members:
                        arrays, closer = map_pair_arrays(
                            payloads[bi].pairs
                        )
                        closers.append(closer)
                        for k in ("reads_q", "reads_qu", "read_lens",
                                  "hap_lens"):
                            pool_parts[k].append(arrays[k])
                        h = arrays["haps"]
                        if h.shape[1] < hap_w:
                            h = np.pad(
                                h, ((0, 0), (0, hap_w - h.shape[1])),
                                constant_values=5,
                            )
                        pool_parts["haps"].append(h)
                        ix_parts["read_ix"].append(
                            arrays["read_ix"] + r_off)
                        ix_parts["hap_ix"].append(
                            arrays["hap_ix"] + h_off)
                        ix_parts["band_start"].append(
                            arrays["band_start"])
                        ix_parts["tlens"].append(arrays["tlens"])
                        r_off += payloads[bi].pairs["n_reads"]
                        h_off += payloads[bi].pairs["n_haps"]
                        regs.append(np.concatenate(
                            [c.regions for c in payloads[bi].components]
                        ))
                    pools = {k: np.concatenate(v)
                             for k, v in pool_parts.items()}
                    pairs = {k: np.concatenate(v)
                             for k, v in ix_parts.items()}
                    pairs["regions"] = np.concatenate(regs)
                    pairs["lt_bucket"] = key[1]
                    for closer in closers:
                        closer()  # shm consumed by the concatenation
                    st = genotyper.begin_evidence_indexed(
                        pools, pairs, pair_chunk=self.pair_chunk,
                    )
                    subs.append((members, st))
                return subs

            def finish_phase_b(payloads, subs):
                outs_by_bi: dict[int, dict] = {}
                for members, st in subs:
                    outs = genotyper.finish_evidence_indexed(st)
                    off = 0
                    for bi in members:
                        n = payloads[bi].pairs["n_pairs"]
                        outs_by_bi[bi] = {
                            k: v[off : off + n] for k, v in outs.items()
                        }
                        off += n
                return outs_by_bi

            def complete_batch(prev, next_first_window):
                nonlocal flushed, num_done
                batch, payloads, subs, lo = prev
                with wall.stage("device"), \
                        self.stage_timer.stage("genotype_device"):
                    outs_by_bi = finish_phase_b(payloads, subs)

                # ---- phase C: assemble + store ---------------------------
                pending_rows: list = []
                with wall.stage("phase_c"):
                    for bi, payload in enumerate(payloads):
                        if payload.components is None:
                            continue
                        wouts = outs_by_bi.get(bi)
                        for comp in payload.components:
                            comp_outs = {
                                k: v[comp.pair_start : comp.pair_stop]
                                for k, v in (wouts or {}).items()
                            }
                            with self.stage_timer.stage("assemble_evidence"):
                                geno = genotyper.assemble_evidence_packed(
                                    payload.reads, comp.variants, comp,
                                    comp_outs,
                                )
                            for vi, variant in enumerate(comp.variants):
                                supports = geno.get(vi)
                                if not supports:
                                    continue
                                if not any(
                                    s.total_alt_cov() > 0
                                    for s in supports.values()
                                ):
                                    continue
                                pending_rows.append(
                                    (bi, payload, variant, supports)
                                )

                    pls_tables = self._device_pl_tables(pending_rows, devices)

                    per_window_calls: dict[int, list[VariantCall]] = {}
                    for row_idx, (bi, payload, variant, supports) in enumerate(
                        pending_rows
                    ):
                        per_window_calls.setdefault(bi, []).append(
                            VariantCall(
                                variant, supports, payload.sample_summaries,
                                payload.window.length,
                                window_index=payload.window.genome_index,
                                pls_lookup=pls_tables.get(row_idx),
                            )
                        )

                    for bi, payload in enumerate(payloads):
                        code = payload.status
                        calls = per_window_calls.get(bi, [])
                        if payload.components is not None:
                            code = (
                                StatusCode.FOUND_GENOTYPED_VARIANT
                                if calls
                                else StatusCode.MISSING_NO_MSA_VARIANTS
                            )
                        self.status_counts[code] = (
                            self.status_counts.get(code, 0) + 1
                        )
                        if calls:
                            self.store.add_variants(calls)
                        num_done += 1

                # windows complete in genomic batch order: everything
                # before the next in-flight batch's first window is final
                if next_first_window is not None:
                    w = next_first_window
                    with wall.stage("flush"):
                        flushed += self.store.flush_before_pos(
                            w.chrom_index, w.start1, out
                        )
                    if self.checkpoint is not None:
                        self.checkpoint.save(w.chrom_index, w.start1,
                                             num_done)
                rate = num_done / (time.monotonic() - t_start)
                LOG.info("batch %d-%d done (%.2f win/s)",
                         lo, lo + len(batch) - 1, rate)

            # software pipeline: batch N's host phase C runs while batch
            # N+1's pass-1 span dispatches execute on the device (the
            # device previously idled through phase C + the next prep wait)
            prev = None
            while pending:
                batch, cur_seqs = pending.popleft()
                top_up()  # keep the prep pipeline full before waiting
                lo = batch[0].genome_index
                with wall.stage("prep_wait"):
                    payloads = self._wait_for(cur_seqs)
                for p in payloads:
                    for k, v in p.timer_totals.items():
                        self.stage_timer.totals[k] += v
                    for k, v in p.timer_counts.items():
                        self.stage_timer.counts[k] += v
                with wall.stage("device"), \
                        self.stage_timer.stage("genotype_device"):
                    subs = submit_phase_b(payloads)
                if prev is not None:
                    complete_batch(prev, next_first_window=batch[0])
                prev = (batch, payloads, subs, lo)
            if prev is not None:
                complete_batch(prev, next_first_window=None)
        finally:
            self._stop_prep_workers()

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

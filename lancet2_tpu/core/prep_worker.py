"""Phase-A prep workers for the batch executor: threads or fork processes.

The reference gets linear phase-A scaling from N independent jthread workers
(reference: core/pipeline_executor.cpp:174); CPython threads cannot give that
— the GIL serializes the Python parts of gate/collect/assemble/extract, and
at -T 8 on a 2-core host the measured executor ran at 40% of single-thread
phase-A speed. Process workers restore the reference's scaling model:

  * the parent decodes every input BAM/CRAM into the shared columnar pools
    and builds the active-region event index ONCE, then forks — workers
    inherit the pools copy-on-write (no per-worker decode, no extra RSS)
  * each worker owns a full VariantBuilder (zero shared mutable state,
    mirroring the reference's per-thread builders) and returns a compact
    PACKED payload: device-ready padded pair arrays + per-component variant
    metadata + lightweight read views — numpy buffers, so IPC is a few
    large pickles rather than thousands of small objects
  * workers never touch JAX: device handling stays in the parent (a forked
    child must not re-enter the inherited TPU client)

The threads backend runs the same prepare+pack function in threads (the
fallback when fork is unavailable) — both produce byte-identical payloads,
so executor results are scheduling-invariant (tests/test_executor_identity).
"""

from __future__ import annotations

import os
import traceback
from typing import NamedTuple

import numpy as np

from lancet2_tpu.utils.profiling import StageTimer


class ReadLite(NamedTuple):
    """The read fields evidence assembly consumes (caller/genotyper.py
    assemble_evidence) — everything else (codes/quals/qname) stays in the
    worker, so a prepared window pickles in ~100 us instead of ~5 ms."""

    length: int
    sample_name: str
    insert_size: int
    start0: int
    qname_hash: int
    mapq: int
    is_soft_clipped: bool
    is_proper_pair: bool
    is_reverse: bool


class PackedComponent(NamedTuple):
    variants: list
    anchor_pos1: int
    pair_start: int   # window-local pair index span [start, stop)
    pair_stop: int
    meta_r: np.ndarray      # i32 [n] read index per pair
    meta_h: np.ndarray      # i32 [n] haplotype index per pair
    meta_vis: np.ndarray    # i32 [n] index into vis_table
    regions: np.ndarray     # i32 [n, R_MAX, 2] per-pair region slots
    vis_table: list         # unique vis lists [(vi, allele_idx), ...]


class PackedWindow(NamedTuple):
    window: object
    status: object          # StatusCode
    timer_totals: dict
    timer_counts: dict
    reads: list | None      # list[ReadLite]
    components: list | None  # list[PackedComponent]
    sample_summaries: list | None
    pairs: dict | None      # {qs,qus,qlens,ts,tlens,lq_bucket,lt_bucket}


def _bucket(n: int, buckets) -> int:
    for b in buckets:
        if n <= b:
            return b
    return n


def _pair_array_layout(n: int, lq: int, lt: int):
    """(offset, shape, dtype) table for one window's padded pair arrays
    packed back-to-back in a shared-memory segment."""
    specs = [
        ("qs", (n, lq), np.uint8),
        ("qus", (n, lq), np.uint8),
        ("ts", (n, lt), np.uint8),
        ("qlens", (n,), np.int64),
        ("tlens", (n,), np.int64),
    ]
    out, off = [], 0
    for name, shape, dt in specs:
        size = int(np.prod(shape)) * np.dtype(dt).itemsize
        out.append((name, off, shape, dt))
        off += size
    return out, off


def _alloc_pair_arrays(n: int, lq: int, lt: int, use_shm: bool):
    layout, total = _pair_array_layout(n, lq, lt)
    if not use_shm:
        arrays = tuple(np.empty(shape, dt) for _nm, _off, shape, dt in layout)
        return arrays, None
    from multiprocessing import shared_memory

    shm = shared_memory.SharedMemory(create=True, size=max(total, 1))
    try:
        # ownership transfers to the executor (it unlinks after consuming);
        # unregister from THIS process's resource tracker so worker exit
        # doesn't spew "leaked shared_memory" warnings for segments the
        # parent already reclaimed
        from multiprocessing import resource_tracker

        resource_tracker.unregister(shm._name, "shared_memory")
    except Exception:
        pass
    arrays = tuple(
        np.ndarray(shape, dt, buffer=shm.buf, offset=off)
        for _nm, off, shape, dt in layout
    )
    return arrays, shm


def map_pair_arrays(pairs: dict):
    """Parent-side view of one window's pair arrays.

    Returns (qs, qus, ts, qlens, tlens, closer) — `closer()` must run after
    the arrays' contents have been consumed (the group concatenation
    copies them), closing AND unlinking the shm segment."""
    if "shm" not in pairs:
        return (pairs["qs"], pairs["qus"], pairs["ts"], pairs["qlens"],
                pairs["tlens"], lambda: None)
    from multiprocessing import shared_memory

    layout, _total = _pair_array_layout(
        pairs["n_pairs"], pairs["lq_bucket"], pairs["lt_bucket"])
    shm = shared_memory.SharedMemory(name=pairs["shm"])
    arrays = tuple(
        np.ndarray(shape, dt, buffer=shm.buf, offset=off)
        for _nm, off, shape, dt in layout
    )

    def closer():
        shm.close()
        try:
            shm.unlink()
        except FileNotFoundError:
            pass

    return (*arrays, closer)


def prepare_and_pack(builder, genotyper, window, band_margin,
                     max_regions: int, lt_buckets, lq_buckets,
                     use_shm: bool = False) -> PackedWindow:
    """Run phase A (gate/collect/assemble/extract/annotate) + pair building
    + padding for one window; returns the packed payload."""
    from lancet2_tpu.base.dna import encode
    from lancet2_tpu.core.variant_builder import PreparedWindow
    from lancet2_tpu.ops.evidence_dp import R_MAX

    prepared = builder.prepare_window(window)
    code = builder.current_code
    timer = builder.timer
    builder.timer = StageTimer()
    if not isinstance(prepared, PreparedWindow):
        return PackedWindow(window, code, dict(timer.totals),
                            dict(timer.counts), None, None, None, None)

    with timer.stage("build_pairs"):
        all_q, all_qu, all_t = [], [], []
        components = []
        for pc in prepared.components:
            hap_codes = [encode(h) for h in pc.hap_seqs]
            pq, pqu, pt, pm = genotyper.build_evidence_pairs(
                hap_codes, prepared.reads, pc.variants,
                anchor_pos1=pc.anchor_pos1, band_margin=band_margin,
                max_regions=max_regions,
            )
            n = len(pq)
            start = len(all_q)
            meta_r = np.empty(n, np.int32)
            meta_h = np.empty(n, np.int32)
            meta_vis = np.empty(n, np.int32)
            regions = np.zeros((n, R_MAX, 2), np.int32)
            vis_table: list = []
            vis_ids: dict[int, int] = {}
            if n:
                regions = np.stack([m[2] for m in pm]).astype(np.int32)
                for i, (r, h, _reg, vis) in enumerate(pm):
                    meta_r[i] = r
                    meta_h[i] = h
                    key = id(vis)
                    vid = vis_ids.get(key)
                    if vid is None:
                        vid = len(vis_table)
                        vis_ids[key] = vid
                        vis_table.append(vis)
                    meta_vis[i] = vid
            components.append(PackedComponent(
                pc.variants, pc.anchor_pos1, start, start + n,
                meta_r, meta_h, meta_vis, regions, vis_table,
            ))
            all_q.extend(pq)
            all_qu.extend(pqu)
            all_t.extend(pt)

        n_pairs = len(all_q)
        pairs = None
        if n_pairs:
            lq_b = _bucket(max(len(s) for s in all_q), lq_buckets)
            lt_b = _bucket(max(len(s) for s in all_t), lt_buckets)
            arrays, shm = _alloc_pair_arrays(n_pairs, lq_b, lt_b, use_shm)
            qs, qus, ts, qlens, tlens = arrays
            qs[:] = 5
            qus[:] = 0
            ts[:] = 5
            for i in range(n_pairs):
                q = all_q[i]
                qs[i, : len(q)] = q
                qus[i, : len(q)] = all_qu[i]
                t = all_t[i]
                ts[i, : len(t)] = t
                qlens[i] = len(q)
                tlens[i] = len(t)
            pairs = {
                "n_pairs": n_pairs,
                "lq_bucket": lq_b, "lt_bucket": lt_b,
            }
            if shm is not None:
                # zero-copy to the parent: only the segment name crosses the
                # queue (a padded pair block is ~MB-scale; pickling it would
                # burn a core-second per ~700 windows on each side)
                pairs["shm"] = shm.name
                shm.close()
            else:
                pairs.update(qs=qs, qus=qus, qlens=qlens, ts=ts, tlens=tlens)

        reads_lite = [
            ReadLite(
                length=r.length, sample_name=r.sample_name,
                insert_size=r.insert_size, start0=r.start0,
                qname_hash=r.qname_hash, mapq=r.mapq,
                is_soft_clipped=r.is_soft_clipped,
                is_proper_pair=r.is_proper_pair, is_reverse=r.is_reverse,
            )
            for r in prepared.reads
        ]

    return PackedWindow(
        window, code, dict(timer.totals), dict(timer.counts),
        reads_lite, components, prepared.sample_summaries, pairs,
    )


def warm_readers(samples, params, reader_pool: dict,
                 need_event_index: bool) -> None:
    """Decode every input file + build indexes in the PARENT before forking
    so child processes inherit the columnar pools copy-on-write."""
    from lancet2_tpu.core.read_collector import CollectorParams, ReadCollector

    collector = ReadCollector(params.collector, samples,
                              reader_pool=reader_pool)
    for reader in collector.readers.values():
        if reader.__class__.__name__ == "StreamingBamReader" or \
                getattr(reader, "_cols", None) is None:
            continue
        if getattr(reader, "_by_contig", None) is None:
            reader._build_index()
        reader.codes_pool()
        reader.softclip_csum()
        if need_event_index:
            from lancet2_tpu.core.active_region import _event_index

            _event_index(reader)


def process_worker_main(work_q, result_q, params, ref, samples, reader_pool,
                        band_margin, max_regions, lt_buckets, lq_buckets):
    """Entry point of a prep worker process (forked from the coordinator).

    Never touches JAX (device work stays in the executor process). Exits
    via os._exit so no inherited atexit hooks run here.
    """
    import copy

    try:
        # diagnosability: SIGUSR1 dumps every thread's Python stack to
        # stderr (inherited), so a wedged worker can be inspected from
        # outside without killing the run
        import faulthandler
        import signal

        faulthandler.register(signal.SIGUSR1, all_threads=True)
    except Exception:
        pass

    # if the coordinator dies (its own watchdog, a crash), exit rather than
    # block on the work queue forever as an orphan
    def _watchdog(parent_pid):
        import time

        while True:
            if os.getppid() != parent_pid:
                os._exit(1)
            time.sleep(2.0)

    import threading

    threading.Thread(
        target=_watchdog, args=(os.getppid(),), daemon=True
    ).start()

    try:
        from lancet2_tpu.caller.genotyper import Genotyper
        from lancet2_tpu.core.variant_builder import VariantBuilder

        worker_samples = [copy.copy(s) for s in samples]
        builder = VariantBuilder(params, ref, worker_samples,
                                 reader_pool=reader_pool)
        genotyper = Genotyper(backend="evidence")
        while True:
            item = work_q.get()
            if item is None:
                break
            seq, window = item
            try:
                payload = prepare_and_pack(
                    builder, genotyper, window, band_margin,
                    max_regions, lt_buckets, lq_buckets, use_shm=True,
                )
                result_q.put((seq, "ok", payload))
            except Exception as exc:  # report, then keep serving
                result_q.put(
                    (seq, "error", (repr(exc), traceback.format_exc()))
                )
    except KeyboardInterrupt:
        pass
    finally:
        result_q.close()
        result_q.join_thread()
        os._exit(0)


def coordinator_main(work_q, result_q, params, ref_path, samples,
                     band_margin, max_regions, lt_buckets, lq_buckets,
                     n_workers):
    """Entry point of the SPAWNED prep coordinator.

    Why a coordinator at all: forking directly from the executor process
    corrupts the inherited TPU client transport — the forked children share
    the parent's live tunnel sockets, and the next device op in the PARENT
    hangs forever (observed on the axon relay; JAX itself warns on fork).
    The executor therefore SPAWNS this clean jax-free process (fresh
    interpreter, no device client), which decodes every input file once and
    then FORKS the actual workers — fork from a single-threaded jax-free
    process is safe, and the workers inherit the decoded columnar pools
    copy-on-write. The spawn-context queues are inherited straight through
    to the forked workers, so results flow worker -> executor with one
    pickle hop.
    """
    import multiprocessing as mp

    try:
        import faulthandler
        import signal

        faulthandler.register(signal.SIGUSR1, all_threads=True)
    except Exception:
        pass

    # the coordinator is non-daemonic (daemons may not fork workers): a
    # watchdog exits it if the executor process dies without sending the
    # shutdown sentinels, so no orphan tree survives a crashed parent
    def _watchdog(parent_pid):
        import time

        while True:
            if os.getppid() != parent_pid:
                os._exit(1)
            time.sleep(2.0)

    import threading

    threading.Thread(
        target=_watchdog, args=(os.getppid(),), daemon=True
    ).start()

    try:
        from lancet2_tpu.hts.fasta import Reference

        ref = Reference(ref_path)
        reader_pool: dict = {}
        warm_readers(samples, params, reader_pool,
                     need_event_index=not params.skip_active_region)

        ctx = mp.get_context("fork")
        workers = [
            ctx.Process(
                target=process_worker_main,
                args=(work_q, result_q, params, ref, samples, reader_pool,
                      band_margin, max_regions, lt_buckets, lq_buckets),
                daemon=True,
            )
            for _ in range(n_workers)
        ]
        for w in workers:
            w.start()
        for w in workers:
            w.join()
    except Exception as exc:
        result_q.put((-1, "fatal", (repr(exc), traceback.format_exc())))
    finally:
        result_q.close()
        result_q.join_thread()
        os._exit(0)

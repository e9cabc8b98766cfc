"""Fault injection for the prep-process machinery (round-4 verdict #9).

The reference routes exactly this kind of code (worker pools, shared
segments, teardown) through its 4-sanitizer matrix and enforces a
fail-fast-with-crash-context contract (reference:
src/lancet/core/async_worker.cpp:76-97, base/crash_handler.h:53-67).
These tests inject the failures directly:

  * SIGKILL a fork prep worker mid-batch -> the coordinator's supervision
    loop reports a fatal naming the window seq the worker was processing,
    the executor raises (never hangs), and every shared-memory segment is
    reclaimed at teardown
  * SIGKILL the coordinator itself -> the executor detects silent death
    and raises with the missing window seqs
  * a worker exception (malformed prepare) -> surfaced with traceback
"""

from __future__ import annotations

import os
import signal
import threading
import time

import pytest

from lancet2_tpu.cbdg.graph import GraphParams
from lancet2_tpu.core.batch_pipeline import BatchPipelineExecutor
from lancet2_tpu.core.read_collector import CollectorParams
from lancet2_tpu.core.sample_info import make_sample_list
from lancet2_tpu.core.variant_builder import BuilderParams
from lancet2_tpu.core.window_builder import WindowBuilder, WindowParams
from lancet2_tpu.hts.fasta import Reference
from lancet2_tpu.utils.simulate import Variant, make_tumor_normal_fixture

pytestmark = pytest.mark.skipif(
    not hasattr(os, "fork"), reason="fork prep workers need posix"
)


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("fault")
    fx = make_tumor_normal_fixture(
        str(tmp), ref_len=30000, normal_cov=20, tumor_cov=28, seed=11
    )
    ref_seq = fx["ref_seq"]
    somatic = [
        Variant(pos0=p, ref=ref_seq[p],
                alt="G" if ref_seq[p] != "G" else "T", vaf=0.4)
        for p in range(2000, 28000, 2500)
    ]
    fx = make_tumor_normal_fixture(
        str(tmp), ref_len=30000, somatic=somatic,
        normal_cov=20, tumor_cov=28, seed=11,
    )
    ref = Reference(fx["fasta"])
    samples = make_sample_list([fx["normal"]], [fx["tumor"]], [])
    wb = WindowBuilder(ref, WindowParams())
    wb.add_whole_reference()
    wb.sort_input_regions()
    windows = list(wb.build_windows())
    params = BuilderParams(
        graph=GraphParams(num_samples=len(samples), min_anchor_cov=3),
        collector=CollectorParams(),
        aligner_backend="evidence",
    )
    return ref, samples, windows, params


def _make_executor(setup, **kw):
    ref, samples, windows, params = setup
    kw.setdefault("num_workers", 2)
    kw.setdefault("window_batch", 4)
    kw.setdefault("pair_chunk", 256)
    kw.setdefault("prep_mode", "processes")
    return BatchPipelineExecutor(params, ref, samples, list(windows), **kw)


def _coordinator_children(coord_pid: int) -> list[int]:
    try:
        path = f"/proc/{coord_pid}/task/{coord_pid}/children"
        with open(path) as fh:
            return [int(p) for p in fh.read().split()]
    except OSError:
        return []


def _shm_entries() -> set:
    try:
        return set(os.listdir("/dev/shm"))
    except OSError:
        return set()


def _run_and_kill(setup, kill_target: str):
    """Run the executor while a background thread kills a worker (or the
    coordinator); returns the raised exception (or None)."""
    shm_before = _shm_entries()
    ex = _make_executor(setup)
    err: list = [None]
    killed: list = [None]

    def killer():
        deadline = time.monotonic() + 30
        while time.monotonic() < deadline:
            procs = list(ex._procs)
            if procs and procs[0].is_alive():
                coord = procs[0].pid
                kids = _coordinator_children(coord)
                with ex._results_cv:
                    busy = len(ex._results) > 0
                if kill_target == "coordinator":
                    os.kill(coord, signal.SIGKILL)
                    killed[0] = coord
                    return
                if kids and busy:
                    os.kill(kids[0], signal.SIGKILL)
                    killed[0] = kids[0]
                    return
            time.sleep(0.02)

    t = threading.Thread(target=killer)
    t.start()
    import io

    try:
        ex.execute(io.StringIO())
    except Exception as exc:  # expected
        err[0] = exc
    t.join()
    # teardown reclaim ran (executor.execute's finally); orphaned workers
    # reclaim their own in-flight segments within their 2s watchdog beat
    deadline = time.monotonic() + 8
    while time.monotonic() < deadline:
        leaked = {e for e in (_shm_entries() - shm_before)
                  if e.startswith("psm_")}
        if not leaked:
            break
        time.sleep(0.25)
    return err[0], killed[0], leaked


def test_worker_killed_mid_batch_fails_fast(setup):
    err, killed_pid, leaked = _run_and_kill(setup, "worker")
    assert killed_pid is not None, "killer never found a busy worker"
    assert err is not None, "executor completed despite a killed worker"
    msg = str(err)
    assert "died with exitcode" in msg and "window seq" in msg, msg
    assert leaked == set(), f"leaked shm segments: {leaked}"


def test_coordinator_killed_detected(setup):
    err, killed_pid, leaked = _run_and_kill(setup, "coordinator")
    assert killed_pid is not None
    assert err is not None, "executor completed despite a dead coordinator"
    msg = str(err)
    assert ("coordinator died" in msg) or ("died with exitcode" in msg), msg
    assert leaked == set(), f"leaked shm segments: {leaked}"


def test_worker_exception_surfaces_with_traceback(setup, monkeypatch):
    """A malformed prepare (exception in the worker loop) must surface as a
    fail-fast error carrying the original traceback — threads prep so the
    monkeypatch reaches the worker."""
    import lancet2_tpu.core.batch_pipeline as bp

    real = bp.prepare_and_pack
    calls = {"n": 0}

    def poisoned(builder, genotyper, window, *a, **kw):
        calls["n"] += 1
        if calls["n"] == 3:
            raise ValueError(f"injected fault at window {window.genome_index}")
        return real(builder, genotyper, window, *a, **kw)

    monkeypatch.setattr(bp, "prepare_and_pack", poisoned)
    ex = _make_executor(setup, prep_mode="threads")
    import io

    with pytest.raises(RuntimeError) as ei:
        ex.execute(io.StringIO())
    msg = str(ei.value)
    assert "injected fault at window" in msg
    assert "ValueError" in msg  # traceback carried through

"""Auxiliary subsystem tests: native decoder, DOT snapshots, tar.gz shards,
probe forensics, profiling history, Pallas kernel (interpret mode)."""

import os
import tarfile

import numpy as np
import pytest

from lancet2_tpu.utils.simulate import Variant, make_tumor_normal_fixture, random_reference


class TestNativeDecoder:
    def test_parity_with_python(self, tmp_path):
        from lancet2_tpu.hts import native
        from lancet2_tpu.hts.bam import BamReader

        if not native.available():
            pytest.skip("native toolchain unavailable")
        fx = make_tumor_normal_fixture(str(tmp_path), ref_len=2000, seed=61)
        r_nat = BamReader(fx["tumor"], use_native=True)
        r_py = BamReader(fx["tumor"], use_native=False)
        assert r_nat._cols is not None
        a, b = r_nat.fetch("chrS", 800, 1200), r_py.fetch("chrS", 800, 1200)
        assert len(a) == len(b) > 0
        for x, y in zip(a, b):
            assert (x.qname, x.flag, x.pos0, x.seq, x.cigar, list(x.qual), x.tags) == (
                y.qname, y.flag, y.pos0, y.seq, y.cigar, list(y.qual), y.tags,
            )

    def test_bgzf_inflate_parity(self, tmp_path):
        from lancet2_tpu.hts import bgzf, native

        if not native.available():
            pytest.skip("native toolchain unavailable")
        payload = os.urandom(300_000)
        path = str(tmp_path / "x.gz")
        with open(path, "wb") as fh:
            fh.write(bgzf.compress_bytes(payload))
        raw = open(path, "rb").read()
        assert native.bgzf_inflate(raw) == payload


class TestDotSnapshots:
    def test_dot_render_and_shards(self, tmp_path):
        from lancet2_tpu.base import dna
        from lancet2_tpu.cbdg import Graph, GraphParams, LABEL_CTRL
        from lancet2_tpu.utils.targz import TarGzWriter, merge_shards
        from tests.test_cbdg import _reads_from_seq

        ref = random_reference(500, seed=62)
        alt = ref[:250] + ("C" if ref[250] != "C" else "G") + ref[251:]
        reads = _reads_from_seq(ref, 100, 10, 0, LABEL_CTRL, "r") + _reads_from_seq(
            alt, 100, 10, 0, LABEL_CTRL, "a"
        )
        shard_path = str(tmp_path / "worker_0.tar.gz")
        writer = TarGzWriter(shard_path)
        graph = Graph(GraphParams(num_samples=1), shard_writer=writer)
        results = graph.build_component_results(dna.encode(ref), reads, "chrT_1_500")
        writer.close()
        assert results

        merged = str(tmp_path / "graphs.tar.gz")
        n = merge_shards([shard_path], merged)
        assert n >= 1
        with tarfile.open(merged) as tf:
            names = tf.getnames()
            assert any("enumerated_walks" in n for n in names)
            content = tf.extractfile(names[0]).read().decode()
            assert content.startswith("digraph")
            assert "SOURCE" in content and "SINK" in content
        assert not os.path.exists(shard_path)  # shards removed after merge


class TestProbeForensics:
    def test_stage_tracing(self, tmp_path):
        from lancet2_tpu.cbdg.graph import GraphParams
        from lancet2_tpu.core.sample_info import make_sample_list
        from lancet2_tpu.core.variant_builder import BuilderParams, VariantBuilder
        from lancet2_tpu.core.window_builder import Window
        from lancet2_tpu.hts.fasta import Reference
        from lancet2_tpu.utils.probe import ProbeIndex, ProbeResultsWriter, ProbeTracker

        fx = make_tumor_normal_fixture(str(tmp_path), ref_len=3000, seed=63)
        ref_seq = fx["ref_seq"]
        alt = "C" if ref_seq[1500] != "C" else "G"
        fx = make_tumor_normal_fixture(
            str(tmp_path), ref_len=3000,
            somatic=[Variant(pos0=1500, ref=ref_seq[1500], alt=alt, vaf=0.5)],
            seed=63,
        )
        probes = str(tmp_path / "probes.tsv")
        with open(probes, "w") as fh:
            fh.write(f"chrS\t1501\t{ref_seq[1500]}\t{alt}\n")
            fh.write("chrS\t500\tA\tT\n")  # fake probe, never simulated

        ref = Reference(fx["fasta"])
        gp = GraphParams(num_samples=2)
        index = ProbeIndex.from_file(probes, gp, ref)
        out_tsv = str(tmp_path / "probe_out.tsv")
        writer = ProbeResultsWriter(out_tsv)
        tracker = ProbeTracker(index, writer)
        samples = make_sample_list([fx["normal"]], [fx["tumor"]], [])
        vb = VariantBuilder(BuilderParams(graph=gp), ref, samples, probe_tracker=tracker)
        win = Window("chrS", 0, 1001, 2001, 0)
        calls = vb.process_window(win)
        writer.close()
        assert any(c.pos1 == 1501 for c in calls)

        rows = [l.split("\t") for l in open(out_tsv).read().splitlines()]
        header, data = rows[0], rows[1:]
        by_probe = {}
        for row in data:
            by_probe.setdefault(row[0], []).append(dict(zip(header, row)))
        real = by_probe[f"chrS:1501:{ref_seq[1500]}>{alt}"]
        assert any(r["build"] == "1" and r["genotyped"] == "1" for r in real)
        fake = by_probe.get("chrS:500:A>T", [])
        assert not any(r["genotyped"] == "1" for r in fake)


class TestProfiling:
    def test_stage_timer(self):
        from lancet2_tpu.utils.profiling import StageTimer

        t = StageTimer()
        with t.stage("align"):
            pass
        with t.stage("align"):
            pass
        with t.stage("graph"):
            pass
        rep = t.report()
        assert rep["align"]["count"] == 2
        assert set(rep) == {"align", "graph"}

    def test_history_append(self, tmp_path):
        import json

        from lancet2_tpu.utils.profiling import append_history

        path = str(tmp_path / "history.jsonl")
        append_history({"metric": "x", "value": 1}, path=path)
        append_history({"metric": "y", "value": 2}, path=path)
        lines = [json.loads(l) for l in open(path)]
        assert len(lines) == 2 and lines[1]["metric"] == "y"
        assert "ts" in lines[0]


class TestPallasInterpret:
    def test_kernel_matches_numpy_baseline(self):
        import jax
        from jax.experimental import pallas as pl

        import lancet2_tpu.ops.sw_pallas as swp
        from lancet2_tpu.ops.affine_dp import READ_TO_HAP, align_batch_numpy

        orig = pl.pallas_call
        swp.pl.pallas_call = lambda *a, **k: orig(*a, **{**k, "interpret": True})
        try:
            rng = np.random.default_rng(64)
            B, Lq, Lt = swp.B_TILE, 32, 128
            q = rng.integers(0, 4, (B, Lq)).astype(np.uint8)
            t = rng.integers(0, 4, (B, Lt)).astype(np.uint8)
            ql = rng.integers(8, Lq + 1, B).astype(np.int32)
            tl = rng.integers(30, Lt + 1, B).astype(np.int32)
            for b in range(B):
                q[b, ql[b]:] = 5
                t[b, tl[b]:] = 5
            ref = align_batch_numpy(q, ql.astype(np.int64), t, tl.astype(np.int64), READ_TO_HAP)
            s, e = swp.sw_fitting_scores_pallas(q, ql, t, tl)
            np.testing.assert_array_equal(ref["score"], s.astype(np.int64))
            np.testing.assert_array_equal(ref["t_end"], e.astype(np.int64))
        finally:
            swp.pl.pallas_call = orig

"""EBM-style scorer training (scripts/train_scorer.py).

Reference workflow: python/score_variants.py + the offline EBM training in
docs/guides/scoring_somatic_variants.md. Verifies the additive-bin model
fits labeled calls, exports the JSON format score_variants.py consumes, and
that scores rank TPs above FPs through the scoring CLI itself.
"""

import gzip
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from train_scorer import auc, bin_index, fit, quantile_edges  # noqa: E402

FORMAT = "GT:AD:DP:SB:CMLOD:FSSE:PL:GQ"


def _write_vcf(path, rows):
    from lancet2_tpu.hts.bgzf import BgzfWriter

    out = BgzfWriter(path)
    out.write(b"##fileformat=VCFv4.5\n")
    out.write(b"#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tTUMOR\n")
    for chrom, pos, ref, alt, qual, sample in rows:
        out.write(
            f"{chrom}\t{pos}\t.\t{ref}\t{alt}\t{qual}\t.\tTYPE=SNV\t{FORMAT}\t{sample}\n".encode()
        )
    out.close()


@pytest.fixture(scope="module")
def labeled_set(tmp_path_factory):
    """Synthetic calls: TPs have high QUAL/CMLOD + low SB; FPs inverted."""
    d = tmp_path_factory.mktemp("scorer")
    rng = np.random.default_rng(3)
    rows, truth_lines = [], []
    for i in range(60):
        pos = 1000 + i * 50
        is_tp = i % 2 == 0
        qual = rng.normal(40, 8) if is_tp else rng.normal(4, 2)
        cmlod = rng.normal(30, 6) if is_tp else rng.normal(1, 1)
        sb = abs(rng.normal(0.1, 0.1)) if is_tp else abs(rng.normal(2.2, 0.5))
        sample = f"0/1:10,8:18:{sb:.3f}:{max(cmlod,0):.2f}:0.95:50,0,80:50"
        rows.append(("chrT", pos, "A", "G", f"{max(qual,0):.1f}", sample))
        if is_tp:
            truth_lines.append(f"chrT\t{pos}\tA\tG\n")
    calls = str(d / "calls.vcf.gz")
    _write_vcf(calls, rows)
    truth = str(d / "truth.tsv")
    with open(truth, "w") as fh:
        fh.writelines(truth_lines)
    return {"dir": d, "calls": calls, "truth": truth}


class TestFitMechanics:
    def test_quantile_edges_dedup_constant(self):
        assert len(quantile_edges(np.zeros(100))) == 0
        edges = quantile_edges(np.arange(100.0))
        assert 0 < len(edges) <= 7
        assert np.all(np.diff(edges) > 0)

    def test_bin_index_matches_model_score_rule(self):
        # score_variants advances idx while val > edges[idx]
        edges = np.array([1.0, 5.0])
        assert list(bin_index(np.array([0.5, 1.0, 3.0, 5.0, 9.0]), edges)) == [0, 0, 1, 1, 2]

    def test_fit_separates_and_auc(self):
        rng = np.random.default_rng(0)
        n = 400
        y = (np.arange(n) % 2).astype(float)
        X = np.column_stack([
            np.where(y == 1, rng.normal(5, 1, n), rng.normal(0, 1, n)),
            rng.normal(0, 1, n),  # noise feature
        ])
        model, margin = fit(X, y, ["sig", "noise"], epochs=20)
        assert auc(y, margin) > 0.95
        sig = np.ptp(model["features"]["sig"]["scores"])
        noise = np.ptp(model["features"].get("noise", {"scores": [0]})["scores"])
        assert sig > 2.5 * max(noise, 0.1)


class TestTrainScoreRoundTrip:
    def test_cli_train_then_score(self, labeled_set):
        d = labeled_set["dir"]
        model_path = str(d / "model.json")
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "train_scorer.py"),
             "--calls", labeled_set["calls"], "--truth", labeled_set["truth"],
             "-o", model_path],
            capture_output=True, text=True, cwd=REPO,
        )
        assert r.returncode == 0, r.stderr
        report = json.loads(r.stderr)
        assert report["n_tp"] == 30
        assert report["train_auc"] > 0.99
        model = json.load(open(model_path))
        assert "intercept" in model and "QUAL" in model["features"]

        scored = str(d / "scored.vcf.gz")
        r2 = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "score_variants.py"),
             labeled_set["calls"], scored, "--model", model_path],
            capture_output=True, text=True, cwd=REPO,
        )
        assert r2.returncode == 0, r2.stderr
        tp_scores, fp_scores = [], []
        with gzip.open(scored, "rt") as fh:
            for line in fh:
                if line.startswith("#"):
                    continue
                cols = line.rstrip("\n").split("\t")
                score = float(cols[7].split("SOMATIC_SCORE=")[1].split(";")[0])
                (tp_scores if (int(cols[1]) - 1000) // 50 % 2 == 0 else fp_scores).append(score)
        assert min(tp_scores) > max(fp_scores)

    def test_single_class_errors_cleanly(self, labeled_set, tmp_path):
        truth_all = str(tmp_path / "all.tsv")
        with open(truth_all, "w") as fh:
            for i in range(60):
                fh.write(f"chrT\t{1000 + i * 50}\tA\tG\n")
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "train_scorer.py"),
             "--calls", labeled_set["calls"], "--truth", truth_all,
             "-o", str(tmp_path / "m.json")],
            capture_output=True, text=True, cwd=REPO,
        )
        assert r.returncode == 1
        assert "one class" in r.stderr

#!/usr/bin/env python3
"""Train the EBM-style additive bin model consumed by score_variants.py.

Reference workflow: python/score_variants.py + docs/guides/
scoring_somatic_variants.md — the reference trains an Explainable Boosting
Machine (interpret-core) offline on labeled call sets and ships a
version-locked model. interpret-core is not in this image, so this trains
the same *shape* of model directly: an additive logistic model over
quantile-binned per-feature score vectors, fitted by cyclic Newton
backfitting (which is exactly the EBM function class: sum of per-feature
piecewise-constant terms + intercept).

Input: one or more (--calls VCF, --truth VCF/TSV) pairs; records are
labeled TP (in truth) / FP (not in truth), optionally via left-aligned
shift-equivalent matching (--ref). Output: JSON
{intercept, features: {name: {edges, scores}}} — the exact format
score_variants.py --model loads.

Usage: train_scorer.py --calls a.vcf.gz --truth a_truth.tsv
       [--calls b.vcf.gz --truth b_truth.tsv] [--ref ref.fa]
       [--features QUAL,SB,...] -o model.json
"""

from __future__ import annotations

import argparse
import gzip
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from score_variants import _f, parse_sample  # noqa: E402
from truth_concordance import left_align, load_variants  # noqa: E402

DEFAULT_FEATURES = (
    "QUAL,SB,SCA,FLD,RPCD,BQCD,MQCD,ASMD,CMLOD,FSSE,AHDD,HSE,NPBQ,PRAD,PANG"
)
MAX_BINS = 8


def _first_or_max(value: str) -> float:
    """FORMAT fields may be per-allele comma lists; use the max component."""
    if value in (".", ""):
        return 0.0
    try:
        return max(float(x) for x in value.split(",") if x not in (".", ""))
    except ValueError:
        return 0.0


def extract_rows(calls_path: str, truth_path: str, features: list[str],
                 reference=None):
    """(X [n, F], y [n]) from one labeled call set."""
    truth = load_variants(truth_path)
    if reference is not None:
        truth_keys = {left_align(*v, reference) for v in truth}
    else:
        truth_keys = truth

    X, y = [], []
    with gzip.open(calls_path, "rt") as fh:
        for line in fh:
            if line.startswith("#"):
                continue
            cols = line.rstrip("\n").split("\t")
            qual = float(cols[5]) if cols[5] not in (".", "") else 0.0
            case = parse_sample(cols[8], cols[-1])
            row = []
            for name in features:
                if name == "QUAL":
                    row.append(qual)
                else:
                    row.append(_first_or_max(case.get(name, ".")))
            X.append(row)
            matched = False
            for alt in cols[4].split(","):
                key = (cols[0], int(cols[1]), cols[3], alt)
                if reference is not None:
                    key = left_align(*key, reference)
                if key in truth_keys:
                    matched = True
            y.append(1.0 if matched else 0.0)
    return np.array(X, dtype=np.float64), np.array(y, dtype=np.float64)


def quantile_edges(col: np.ndarray, max_bins: int = MAX_BINS) -> np.ndarray:
    """Interior bin edges at quantiles; deduplicated (constant cols -> none)."""
    qs = np.linspace(0, 1, max_bins + 1)[1:-1]
    edges = np.unique(np.quantile(col, qs))
    edges = edges[np.isfinite(edges)]
    # an edge >= max(col) splits nothing (lookup advances only on val > edge)
    return edges[edges < col.max()] if col.size else edges


def bin_index(col: np.ndarray, edges: np.ndarray) -> np.ndarray:
    """Same lookup rule as score_variants.model_score (val > edge advances)."""
    return np.searchsorted(edges, col, side="left")


def fit(X: np.ndarray, y: np.ndarray, features: list[str],
        epochs: int = 30, lr: float = 0.5, l2: float = 1.0) -> dict:
    """Cyclic Newton backfitting of per-bin scores on the logit scale."""
    n, F = X.shape
    base = np.clip(y.mean(), 1e-3, 1 - 1e-3)
    intercept = float(np.log(base / (1 - base)))
    all_edges = [quantile_edges(X[:, j]) for j in range(F)]
    all_bins = [bin_index(X[:, j], all_edges[j]) for j in range(F)]
    scores = [np.zeros(len(all_edges[j]) + 1) for j in range(F)]

    margin = np.full(n, intercept)
    for _ in range(epochs):
        for j in range(F):
            p = 1.0 / (1.0 + np.exp(-margin))
            g = y - p                      # gradient of log-lik wrt margin
            h = p * (1 - p)                # hessian
            nb = len(scores[j])
            gs = np.bincount(all_bins[j], weights=g, minlength=nb)
            hs = np.bincount(all_bins[j], weights=h, minlength=nb)
            step = lr * gs / (hs + l2)     # ridge-damped Newton per bin
            margin += step[all_bins[j]]
            scores[j] += step
    # center each feature's contribution; fold the means into the intercept
    for j in range(F):
        counts = np.bincount(all_bins[j], minlength=len(scores[j]))
        mean = float(np.average(scores[j], weights=np.maximum(counts, 1e-9)))
        scores[j] -= mean
        intercept += mean

    model = {"intercept": intercept, "features": {}}
    for j, name in enumerate(features):
        if len(all_edges[j]) == 0:
            continue  # constant feature carries no signal
        model["features"][name] = {
            "edges": [float(e) for e in all_edges[j]],
            "scores": [float(s) for s in scores[j]],
        }
    return model, margin


def auc(y: np.ndarray, s: np.ndarray) -> float:
    order = np.argsort(s)
    ranks = np.empty_like(order, dtype=np.float64)
    ranks[order] = np.arange(1, len(s) + 1)
    n1, n0 = y.sum(), (1 - y).sum()
    if n1 == 0 or n0 == 0:
        return float("nan")
    return float((ranks[y == 1].sum() - n1 * (n1 + 1) / 2) / (n1 * n0))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--calls", action="append", required=True)
    ap.add_argument("--truth", action="append", required=True)
    ap.add_argument("--ref", default=None,
                    help="reference FASTA for shift-equivalent truth matching")
    ap.add_argument("--features", default=DEFAULT_FEATURES)
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("-o", "--output", required=True)
    args = ap.parse_args()
    if len(args.calls) != len(args.truth):
        print("error: need one --truth per --calls", file=sys.stderr)
        return 1

    reference = None
    if args.ref:
        from lancet2_tpu.hts.fasta import Reference

        reference = Reference(args.ref)

    features = args.features.split(",")
    Xs, ys = [], []
    for calls, truth in zip(args.calls, args.truth):
        X, y = extract_rows(calls, truth, features, reference)
        Xs.append(X)
        ys.append(y)
    X, y = np.concatenate(Xs), np.concatenate(ys)
    if len(np.unique(y)) < 2:
        print("error: training set has only one class", file=sys.stderr)
        return 1

    model, margin = fit(X, y, features, epochs=args.epochs)
    with open(args.output, "w") as fh:
        json.dump(model, fh, indent=2)
    importance = {
        name: float(np.ptp(spec["scores"]))
        for name, spec in model["features"].items()
    }
    top = sorted(importance.items(), key=lambda kv: -kv[1])[:8]
    print(json.dumps({
        "n_records": int(len(y)), "n_tp": int(y.sum()),
        "train_auc": auc(y, margin),
        "top_features": dict(top),
        "model": args.output,
    }, indent=2), file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

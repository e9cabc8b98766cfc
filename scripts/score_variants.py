#!/usr/bin/env python3
"""Post-hoc somatic variant scoring over the coverage-invariant features.

Reference: python/score_variants.py — the reference scores its VCF with a
model-version-locked EBM (interpret-core, not present in this image). This
tool reproduces the workflow shape: parse the 24 FORMAT features per record,
compute a somatic confidence score, and write it back as an INFO field.

Two scoring modes:
  * --model <json>: additive per-feature piecewise model (EBM-style bins
    exported as JSON: {feature: {"edges": [...], "scores": [...]}, ...});
    the contribution of each feature is looked up by bin and summed.
  * default heuristic: calibrated additive score over SOLOR QUAL, strand
    bias, Mann-Whitney effect sizes, entropy and homopolymer-context
    features — a model-free baseline with the same feature surface.

Usage: score_variants.py <in.vcf.gz> <out.vcf.gz> [--model model.json]
"""

from __future__ import annotations

import argparse
import gzip
import json
import math
import sys

FORMAT_KEYS = (
    "GT AD ADF ADR DP RMQ NPBQ SB SCA FLD RPCD BQCD MQCD ASMD SDFC PRAD PANG "
    "CMLOD FSSE AHDD HSE PDCV PL GQ"
).split()


def parse_sample(fmt: str, sample: str) -> dict:
    keys = fmt.split(":")
    vals = sample.split(":")
    return dict(zip(keys, vals))


def _f(d: dict, key: str, default=0.0):
    v = d.get(key, ".")
    try:
        return float(v)
    except ValueError:
        return default


def heuristic_score(qual: float, case_sample: dict, info: str) -> float:
    """Model-free additive somatic confidence score (logit scale)."""
    score = 0.0
    score += min(qual, 10.0)  # SOLOR drives the base signal
    score += min(_f(case_sample, "CMLOD", 0.0) if "," not in case_sample.get("CMLOD", "") else
                 max(float(x) for x in case_sample["CMLOD"].split(",")), 10.0) * 0.5
    score -= abs(_f(case_sample, "SB")) * 0.8  # strand bias penalty
    score -= max(0.0, -_f(case_sample, "BQCD")) * 4.0  # low-qual ALT bases
    score -= max(0.0, -_f(case_sample, "MQCD")) * 4.0  # low-MAPQ ALT reads
    score -= max(0.0, -_f(case_sample, "RPCD")) * 3.0  # read-edge clustering
    score -= _f(case_sample, "SCA") * 2.0
    score -= max(0.0, _f(case_sample, "ASMD")) * 0.5  # excess ALT mismatches
    fsse = case_sample.get("FSSE", ".")
    if fsse not in (".", ""):
        score -= (1.0 - float(fsse)) * 2.0  # PCR jackpot artifact signal
    # sequence context (SEQ_CX INFO): long homopolymer/TR contexts are suspect
    for field in info.split(";"):
        if field.startswith("SEQ_CX="):
            vals = field[7:].split(",")
            if len(vals) == 11:
                hrun = float(vals[0])
                stutter = float(vals[10])
                score -= max(0.0, hrun - 6) * 0.4
                score -= stutter * 1.5
    return score


def model_score(model: dict, case_sample: dict, qual: float, info: str) -> float:
    total = model.get("intercept", 0.0)
    feats = dict(case_sample)
    feats["QUAL"] = qual
    for name, spec in model.get("features", {}).items():
        val = _f(feats, name)
        edges, scores = spec["edges"], spec["scores"]
        idx = 0
        while idx < len(edges) and val > edges[idx]:
            idx += 1
        total += scores[min(idx, len(scores) - 1)]
    return total


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("in_vcf")
    ap.add_argument("out_vcf")
    ap.add_argument("--model", default=None)
    ap.add_argument("--info-tag", default="SOMATIC_SCORE")
    args = ap.parse_args()

    model = json.load(open(args.model)) if args.model else None

    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from lancet2_tpu.hts.bgzf import BgzfWriter

    out = BgzfWriter(args.out_vcf)
    tag = args.info_tag
    header_line = (
        f'##INFO=<ID={tag},Number=1,Type=Float,'
        f'Description="Post-hoc somatic confidence score ('
        f'{"model" if model else "heuristic"})">\n'
    )
    n = 0
    try:
        with gzip.open(args.in_vcf, "rt") as fh:
            for line in fh:
                if line.startswith("##"):
                    out.write(line.encode())
                    continue
                if line.startswith("#CHROM"):
                    out.write(header_line.encode())
                    out.write(line.encode())
                    continue
                cols = line.rstrip("\n").split("\t")
                qual = float(cols[5]) if cols[5] not in (".", "") else 0.0
                # last sample column is the highest-index case sample by the
                # deterministic (role, SM) ordering
                case = parse_sample(cols[8], cols[-1])
                if model:
                    score = model_score(model, case, qual, cols[7])
                else:
                    score = heuristic_score(qual, case, cols[7])
                cols[7] = f"{cols[7]};{tag}={score:.3f}"
                out.write(("\t".join(cols) + "\n").encode())
                n += 1
    finally:
        out.close()
    print(f"scored {n} records -> {args.out_vcf}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

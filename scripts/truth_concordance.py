#!/usr/bin/env python3
"""VCF-vs-truth-set concordance: recall / precision / per-type breakdown.

Reference: scripts/truth_concordance.py (the paper workflow's evaluation
tool). Compares a called VCF(.gz) against a truth VCF/TSV by normalized
(CHROM, POS, REF, ALT) identity, with optional QUAL and STATE filters.

With --ref, indels are compared by applied-haplotype equivalence: two
records match when applying their edits to the reference produces the same
local sequence (catches left/right-shifted representations of the same
indel in repeat contexts).

Usage: truth_concordance.py <calls.vcf.gz> <truth.(vcf|tsv)> [--min-qual Q]
       [--state CASE] [--ref ref.fa]
"""

from __future__ import annotations

import argparse
import gzip
import json
import sys


def _open(path):
    return gzip.open(path, "rt") if path.endswith(".gz") else open(path)


def _normalize(pos: int, ref: str, alt: str) -> tuple[int, str, str]:
    """VCF parsimony: right-trim then left-trim shared bases."""
    while len(ref) > 1 and len(alt) > 1 and ref[-1] == alt[-1]:
        ref, alt = ref[:-1], alt[:-1]
    while len(ref) > 1 and len(alt) > 1 and ref[0] == alt[0]:
        ref, alt = ref[1:], alt[1:]
        pos += 1
    return pos, ref, alt


def load_variants(path: str, min_qual: float | None = None, state: str | None = None):
    out = set()
    with _open(path) as fh:
        for line in fh:
            if line.startswith("#") or not line.strip():
                continue
            cols = line.rstrip("\n").split("\t")
            if len(cols) >= 5 and not cols[2].replace(".", "").isdigit():
                chrom, pos, ref, alts = cols[0], int(cols[1]), cols[3], cols[4]
                qual = float(cols[5]) if len(cols) > 5 and cols[5] not in (".", "") else None
                info = cols[7] if len(cols) > 7 else ""
            else:  # TSV chrom pos ref alt
                chrom, pos, ref, alts = cols[0], int(cols[1]), cols[2], cols[3]
                qual, info = None, ""
            if min_qual is not None and qual is not None and qual < min_qual:
                continue
            if state is not None and state not in info.split(";"):
                continue
            for alt in alts.split(","):
                out.add((chrom,) + _normalize(pos, ref, alt))
    return out


def variant_type(ref: str, alt: str) -> str:
    if len(ref) == 1 and len(alt) == 1:
        return "SNV"
    if len(alt) > len(ref):
        return "INS"
    if len(alt) < len(ref):
        return "DEL"
    return "MNP"


def left_align(chrom, pos, ref_allele, alt, reference):
    """Canonical left-aligned + parsimony-trimmed representation (vt-style).

    Shifts pure indels leftward through repeat context using the reference,
    so all equivalent representations map to one key.
    """
    ref_a, alt_a = ref_allele, alt
    # parsimony right/left trim first
    while len(ref_a) > 1 and len(alt_a) > 1 and ref_a[-1] == alt_a[-1]:
        ref_a, alt_a = ref_a[:-1], alt_a[:-1]
    while len(ref_a) > 1 and len(alt_a) > 1 and ref_a[0] == alt_a[0]:
        ref_a, alt_a = ref_a[1:], alt_a[1:]
        pos += 1
    # left shift while both alleles end with the same base
    guard = 0
    while (
        len(ref_a) != len(alt_a)
        and ref_a[-1] == alt_a[-1]
        and pos > 1
        and guard < 10_000
    ):
        prev = reference.fetch(chrom, pos - 1, pos - 1)
        if not prev:
            break
        ref_a = prev + ref_a[:-1]
        alt_a = prev + alt_a[:-1]
        pos -= 1
        guard += 1
        # re-trim any newly shared suffix base
        while len(ref_a) > 1 and len(alt_a) > 1 and ref_a[-1] == alt_a[-1]:
            ref_a, alt_a = ref_a[:-1], alt_a[:-1]
    return (chrom, pos, ref_a, alt_a)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("calls")
    ap.add_argument("truth")
    ap.add_argument("--min-qual", type=float, default=None)
    ap.add_argument("--state", default=None, help="require INFO state flag (e.g. CASE)")
    ap.add_argument("--ref", default=None, help="reference FASTA for shift-equivalent indel matching")
    args = ap.parse_args()

    calls = load_variants(args.calls, args.min_qual, args.state)
    truth = load_variants(args.truth)

    if args.ref is not None:
        import sys as _sys, os as _os

        _sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
        from lancet2_tpu.hts.fasta import Reference

        reference = Reference(args.ref)
        call_la = {left_align(*v, reference): v for v in calls}
        truth_la = {left_align(*v, reference): v for v in truth}
        tp_keys = set(call_la) & set(truth_la)
        tp = {truth_la[k] for k in tp_keys}
        fn = {truth_la[k] for k in set(truth_la) - tp_keys}
        fp = {call_la[k] for k in set(call_la) - tp_keys}
    else:
        tp = calls & truth
        fn = truth - calls
        fp = calls - truth

    def by_type(vs):
        out = {}
        for chrom, pos, ref, alt in vs:
            out.setdefault(variant_type(ref, alt), 0)
            out[variant_type(ref, alt)] += 1
        return out

    recall = len(tp) / len(truth) if truth else None
    precision = len(tp) / len(calls) if calls else None
    print(
        json.dumps(
            {
                "tp": len(tp), "fn": len(fn), "fp": len(fp),
                "recall": recall, "precision": precision,
                "fn_by_type": by_type(fn), "fp_by_type": by_type(fp),
                "missed": sorted(f"{c}:{p}:{r}>{a}" for c, p, r, a in fn)[:50],
            },
            indent=2,
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

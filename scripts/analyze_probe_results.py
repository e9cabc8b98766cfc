#!/usr/bin/env python3
"""Probe-forensics attribution over probe results TSVs.

Reference: scripts/analyze_probe_results.py (1,375 LoC) +
docs_dev/subsystems/probe_tracking.md — for each probed truth variant,
find its best window attempt (deepest pipeline stage with surviving
signal) and attribute where the signal died, then render the analyses the
reference provides: scorecard, stage funnel, type/size breakdown, k-value
forensics, and inspection targets, plus machine-readable exports.

Usage:
  analyze_probe_results.py <probe_results.tsv> [--view VIEW]
      [--survival-tsv out.tsv] [--json]

Views: scorecard funnel types kvalues targets all (default: all)
"""

from __future__ import annotations

import argparse
import collections
import json
import sys

STAGE_ORDER = [
    "build", "lowcov1", "compress1", "lowcov2", "compress2", "tips",
    "path", "extracted", "genotyped",
]
EVENTS = ["no_anchor", "short_anchor", "cycle", "complex", "traversal_limit"]


def _bar(fraction: float, width: int = 24) -> str:
    n = int(round(max(0.0, min(1.0, fraction)) * width))
    return "#" * n + "." * (width - n)


def _table(rows, header, title=""):
    cols = list(zip(*([header] + rows))) if rows else [header]
    widths = [max(len(str(c)) for c in col) for col in cols]
    out = []
    if title:
        out.append(f"== {title} ==")
    fmt = "  ".join(f"{{:<{w}}}" for w in widths)
    out.append(fmt.format(*header))
    out.append(fmt.format(*["-" * w for w in widths]))
    out += [fmt.format(*[str(c) for c in r]) for r in rows]
    return "\n".join(out) + "\n"


def classify_probe(key: str) -> tuple[str, int]:
    """(vtype, size) from a 'chrom:pos:REF>ALT' probe key."""
    try:
        allele = key.split(":", 2)[2]
        ref, alt = allele.split(">", 1)
    except (IndexError, ValueError):
        return "UNKNOWN", 0
    if len(ref) == 1 and len(alt) == 1:
        return "SNV", 1
    if len(alt) > len(ref):
        return "INS", len(alt) - len(ref)
    if len(ref) > len(alt):
        return "DEL", len(ref) - len(alt)
    return "MNP", len(ref)


def depth_of(row: dict) -> int:
    depth = -1
    for i, stage in enumerate(STAGE_ORDER):
        if row.get(stage) == "1":
            depth = i
    return depth


def attribute(rows: list[dict]) -> tuple[str, dict | None, int]:
    """(lost_at, best_row, best_depth) for one probe's window attempts."""
    best_depth, best_row = -1, None
    for row in rows:
        d = depth_of(row)
        if d > best_depth:
            best_depth, best_row = d, row
    if best_depth == len(STAGE_ORDER) - 1:
        return "called", best_row, best_depth
    if best_row is None or best_depth < 0:
        return "lost_at_build", best_row, best_depth
    for event in EVENTS:
        if best_row.get(event) == "1":
            return f"lost_to_{event}", best_row, best_depth
    return f"lost_at_{STAGE_ORDER[best_depth + 1]}", best_row, best_depth


def load(path: str):
    with open(path) as fh:
        lines = [l for l in fh.read().splitlines() if l and not l.startswith("#")]
    header = lines[0].split("\t")
    by_probe: dict[str, list[dict]] = collections.defaultdict(list)
    for line in lines[1:]:
        row = dict(zip(header, line.split("\t")))
        by_probe[row["probe"]].append(row)
    return by_probe


# ---------------------------------------------------------------------------
# views
# ---------------------------------------------------------------------------

def render_scorecard(attrib: dict) -> None:
    total = len(attrib)
    called = sum(1 for a, _r, _d in attrib.values() if a == "called")
    print(f"probes: {total}; called: {called} "
          f"({100*called/max(total,1):.1f}%)\n")
    counts = collections.Counter(a for a, _r, _d in attrib.values())
    rows = [[k, v, f"{100*v/total:.1f}%", _bar(v / total)]
            for k, v in counts.most_common()]
    print(_table(rows, ["outcome", "count", "pct", ""], "Scorecard"))


def render_funnel(attrib: dict) -> None:
    total = len(attrib)
    rows = []
    for i, stage in enumerate(STAGE_ORDER):
        surv = sum(1 for _a, _r, d in attrib.values() if d >= i)
        rows.append([stage, surv, f"{100*surv/max(total,1):.1f}%",
                     _bar(surv / max(total, 1))])
    print(_table(rows, ["stage", "survivors", "pct", ""],
                 "Stage funnel (best attempt per probe)"))


def render_types(attrib: dict) -> None:
    by_type: dict[str, collections.Counter] = collections.defaultdict(collections.Counter)
    size_bins: dict[tuple, collections.Counter] = collections.defaultdict(collections.Counter)
    for probe, (a, _r, _d) in attrib.items():
        vtype, size = classify_probe(probe)
        by_type[vtype][a] += 1
        if vtype in ("INS", "DEL"):
            b = "1" if size == 1 else ("2-5" if size <= 5 else ("6-20" if size <= 20 else "21+"))
            size_bins[(vtype, b)][a] += 1
    rows = []
    for vtype, cnt in sorted(by_type.items()):
        tot = sum(cnt.values())
        called = cnt.get("called", 0)
        worst = max((c for c in cnt.items() if c[0] != "called"),
                    key=lambda kv: kv[1], default=("-", 0))
        rows.append([vtype, tot, f"{100*called/tot:.1f}%",
                     f"{worst[0]} ({worst[1]})" if worst[1] else "-"])
    print(_table(rows, ["type", "probes", "called", "top loss"],
                 "Type breakdown"))
    rows = []
    for (vtype, b), cnt in sorted(size_bins.items()):
        tot = sum(cnt.values())
        rows.append([vtype, b, tot, f"{100*cnt.get('called',0)/tot:.1f}%"])
    if rows:
        print(_table(rows, ["type", "size", "probes", "called"],
                     "Indel size breakdown"))


def render_kvalues(attrib: dict) -> None:
    k_called = collections.Counter()
    k_lost = collections.Counter()
    for _probe, (a, r, _d) in attrib.items():
        if r is None:
            continue
        k = r.get("k", "?")
        (k_called if a == "called" else k_lost)[k] += 1
    rows = []
    for k in sorted(set(k_called) | set(k_lost), key=lambda x: int(x) if str(x).isdigit() else 0):
        c, l = k_called.get(k, 0), k_lost.get(k, 0)
        rows.append([k, c, l, f"{100*c/max(c+l,1):.0f}%"])
    print(_table(rows, ["k (best attempt)", "called", "lost", "call rate"],
                 "k-value forensics"))


def render_targets(attrib: dict, limit: int = 15) -> None:
    """Late-stage losses: deepest-surviving probes that still died —
    the highest-value debugging targets (reference render_inspection_targets)."""
    lost = [(p, a, r, d) for p, (a, r, d) in attrib.items() if a != "called"]
    lost.sort(key=lambda t: -t[3])
    rows = []
    for p, a, r, d in lost[:limit]:
        rows.append([p, a, STAGE_ORDER[d] if d >= 0 else "-",
                     (r or {}).get("window", "-"), (r or {}).get("k", "-")])
    if rows:
        print(_table(rows, ["probe", "lost_at", "deepest stage", "window", "k"],
                     "Inspection targets (deepest losses first)"))
    else:
        print("no losses — every probe was called\n")


def write_survival_tsv(by_probe: dict, attrib: dict, path: str) -> None:
    with open(path, "w") as fh:
        fh.write("probe\tvtype\tsize\tlost_at\tbest_depth\tbest_window\tbest_k\t"
                 + "\t".join(STAGE_ORDER) + "\n")
        for probe, (a, r, d) in sorted(attrib.items()):
            vtype, size = classify_probe(probe)
            flags = [(r or {}).get(s, "0") for s in STAGE_ORDER]
            fh.write("\t".join([
                probe, vtype, str(size), a, str(d),
                (r or {}).get("window", "-"), (r or {}).get("k", "-"),
                *flags,
            ]) + "\n")


def main() -> int:
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    ap.add_argument("tsv")
    ap.add_argument("--view", default="all",
                    choices=["scorecard", "funnel", "types", "kvalues",
                             "targets", "all"])
    ap.add_argument("--survival-tsv", default=None,
                    help="write the per-probe survival matrix TSV")
    ap.add_argument("--json", action="store_true",
                    help="machine-readable summary only (legacy output)")
    args = ap.parse_args()

    by_probe = load(args.tsv)
    attrib = {p: attribute(rows) for p, rows in sorted(by_probe.items())}

    if args.json:
        summary = collections.Counter(a for a, _r, _d in attrib.values())
        print(json.dumps({
            "summary": dict(summary),
            "per_probe": {p: a for p, (a, _r, _d) in attrib.items()},
        }, indent=2))
    else:
        if args.view in ("scorecard", "all"):
            render_scorecard(attrib)
        if args.view in ("funnel", "all"):
            render_funnel(attrib)
        if args.view in ("types", "all"):
            render_types(attrib)
        if args.view in ("kvalues", "all"):
            render_kvalues(attrib)
        if args.view in ("targets", "all"):
            render_targets(attrib)
    if args.survival_tsv:
        write_survival_tsv(by_probe, attrib, args.survival_tsv)
        print(f"# survival matrix written to {args.survival_tsv}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

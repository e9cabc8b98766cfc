#!/usr/bin/env python3
"""Profile attribution + trend reports (reference: scripts/analyze_profile.py).

The reference postprocesses gperftools/pprof captures into per-component
attribution, function tables, run-over-run diffs, and a committed history
trend. This tool does the same over this framework's two profile sources:

  1. cProfile .pstats captures (function-level; capture one with
     `python -m cProfile -o run.pstats scripts/profile_e2e.py ...`):
       --pstats FILE [--view components|top|hotpaths] [--top N]
       --pstats FILE --diff-base OLD.pstats     function/component deltas
       --pstats FILE --save-summary TAG         append summary to history
  2. profiling/history.jsonl entries (`bench` lines from bench.py,
     `pipeline` lines from --append-history): trend + stage attribution
     (the default report when no --pstats is given).

Component attribution maps function file paths onto the layer map
(SURVEY.md §1): hts / cbdg / caller / core / cli / base / ops / native /
jax+xla / numpy / system — the counterpart of the reference's
module->component classifier (analyze_profile.py classify_component).
"""

from __future__ import annotations

import argparse
import json
import os
import pstats
import sys


def load(path: str) -> list[dict]:
    entries = []
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if line:
                entries.append(json.loads(line))
    return entries


def fmt_delta(new: float, old: float) -> str:
    if old == 0:
        return "n/a"
    pct = 100.0 * (new - old) / abs(old)
    return f"{pct:+.1f}%"


def report_bench(entries: list[dict], last: int) -> dict:
    out = {"runs": len(entries)}
    if not entries:
        return out
    latest = entries[-1]
    out["latest"] = {
        "metric": latest.get("metric"),
        "value": latest.get("value"),
        "unit": latest.get("unit"),
        "vs_baseline": latest.get("vs_baseline"),
    }
    extra = latest.get("extra") or {}
    out["latest"]["kernels"] = {
        k: v for k, v in extra.items() if k.endswith("_gcups")
    }
    if len(entries) >= 2:
        prev = entries[-2]
        if prev.get("metric") == latest.get("metric"):
            out["delta_vs_previous"] = fmt_delta(
                float(latest.get("value", 0)), float(prev.get("value", 0))
            )
    out["trend"] = [
        {"value": e.get("value"), "vs_baseline": e.get("vs_baseline")}
        for e in entries[-last:]
    ]
    return out


def report_pipeline(entries: list[dict], last: int) -> dict:
    out = {"runs": len(entries)}
    if not entries:
        return out
    latest = entries[-1]
    out["latest"] = {
        "executor": latest.get("executor"),
        "backend": latest.get("backend"),
        "device": latest.get("device"),
        "windows": latest.get("windows"),
        "windows_per_s": round(float(latest.get("windows_per_s", 0)), 3),
        "peak_rss_mb": latest.get("peak_rss_mb"),
    }
    profile = latest.get("stage_profile") or {}
    out["latest"]["stage_attribution"] = {
        name: f"{spec['pct']}% ({spec['seconds']}s / {spec['count']}x)"
        for name, spec in profile.items()
    }
    # compare against the most recent prior run with the same configuration
    cfg = (latest.get("executor"), latest.get("backend"), latest.get("device"))
    for prev in reversed(entries[:-1]):
        if (prev.get("executor"), prev.get("backend"), prev.get("device")) == cfg:
            out["delta_vs_previous_same_config"] = {
                "windows_per_s": fmt_delta(
                    float(latest.get("windows_per_s", 0)),
                    float(prev.get("windows_per_s", 0)),
                ),
                "peak_rss_mb": fmt_delta(
                    float(latest.get("peak_rss_mb", 0)),
                    float(prev.get("peak_rss_mb", 0)),
                ),
            }
            break
    out["recent"] = [
        {
            "executor": e.get("executor"),
            "backend": e.get("backend"),
            "device": e.get("device"),
            "windows_per_s": round(float(e.get("windows_per_s", 0)), 3),
        }
        for e in entries[-last:]
    ]
    return out


# ---------------------------------------------------------------------------
# cProfile (.pstats) attribution — reference classify_component analog
# ---------------------------------------------------------------------------

_LAYERS = ("hts", "cbdg", "caller", "core", "cli", "base", "ops",
           "parallel", "utils")


def classify_component(filename: str, funcname: str) -> str:
    """Map a profiled function onto the SURVEY §1 layer map."""
    fn = filename.replace("\\", "/")
    if fn == "~":  # C builtins carry no filename
        low = funcname.lower()
        if "numpy" in low:
            return "numpy"
        if "jax" in low or "xla" in low:
            return "jax+xla"
        return "builtins"
    if "lancet2_tpu/" in fn:
        sub = fn.split("lancet2_tpu/")[-1].split("/")[0]
        if sub.endswith(".py"):
            return "package"
        return sub if sub in _LAYERS else "package"
    if "native_core" in fn:
        return "native"
    if "/jax/" in fn or "jaxlib" in fn:
        return "jax+xla"
    if "/numpy/" in fn:
        return "numpy"
    if fn.startswith("<") or "/lib/python" in fn or "importlib" in fn:
        return "system"
    if "/scripts/" in fn or fn.endswith("profile_e2e.py"):
        return "driver"
    return "other"


def load_pstats(path: str):
    """[(component, file, func, ncalls, tottime, cumtime)] rows."""
    st = pstats.Stats(path)
    rows = []
    for (fname, lineno, func), (cc, nc, tt, ct, _callers) in st.stats.items():
        rows.append({
            "component": classify_component(fname, func),
            "file": os.path.basename(fname),
            "func": func,
            "line": lineno,
            "ncalls": nc,
            "tottime": tt,
            "cumtime": ct,
        })
    total = sum(r["tottime"] for r in rows) or 1.0
    return rows, total


def report_components(rows, total) -> list[dict]:
    by_comp: dict[str, dict] = {}
    for r in rows:
        d = by_comp.setdefault(r["component"], {"tottime": 0.0, "n_funcs": 0,
                                                "top": None})
        d["tottime"] += r["tottime"]
        d["n_funcs"] += 1
        if d["top"] is None or r["tottime"] > d["top"]["tottime"]:
            d["top"] = r
    out = []
    for comp, d in sorted(by_comp.items(), key=lambda kv: -kv[1]["tottime"]):
        out.append({
            "component": comp,
            "flat_s": round(d["tottime"], 3),
            "flat_pct": round(100 * d["tottime"] / total, 1),
            "n_funcs": d["n_funcs"],
            "top_function": f"{d['top']['file']}:{d['top']['func']}",
        })
    return out


def report_top(rows, total, n: int) -> list[dict]:
    rows = sorted(rows, key=lambda r: -r["tottime"])[:n]
    return [
        {
            "function": f"{r['file']}:{r['line']}:{r['func']}",
            "component": r["component"],
            "ncalls": r["ncalls"],
            "flat_s": round(r["tottime"], 3),
            "flat_pct": round(100 * r["tottime"] / total, 1),
            "cum_s": round(r["cumtime"], 3),
        }
        for r in rows
    ]


def report_hotpaths(path: str, n: int) -> list[dict]:
    """Top functions with their heaviest callers (pprof tree analog)."""
    st = pstats.Stats(path)
    flat = sorted(st.stats.items(), key=lambda kv: -kv[1][2])[:n]
    out = []
    for key, (cc, nc, tt, ct, callers) in flat:
        heavy = sorted(callers.items(), key=lambda kv: -kv[1][3])[:3]
        out.append({
            "function": f"{os.path.basename(key[0])}:{key[2]}",
            "flat_s": round(tt, 3),
            "callers": [
                f"{os.path.basename(k[0])}:{k[2]} ({round(v[3], 3)}s cum)"
                for k, v in heavy
            ],
        })
    return out


def report_pstats_diff(new_path: str, base_path: str, n: int) -> dict:
    """Function + component deltas between two captures (reference
    render_diff / _compute_function_deltas)."""
    new_rows, new_total = load_pstats(new_path)
    base_rows, base_total = load_pstats(base_path)

    def keyed(rows):
        return {f"{r['file']}:{r['func']}": r for r in rows}

    nk, bk = keyed(new_rows), keyed(base_rows)
    deltas = []
    for key in set(nk) | set(bk):
        nt = nk.get(key, {}).get("tottime", 0.0)
        bt = bk.get(key, {}).get("tottime", 0.0)
        if abs(nt - bt) < 1e-4:
            continue
        deltas.append({"function": key, "base_s": round(bt, 3),
                       "new_s": round(nt, 3), "delta_s": round(nt - bt, 3)})
    deltas.sort(key=lambda d: -abs(d["delta_s"]))

    def comp_tot(rows):
        out: dict[str, float] = {}
        for r in rows:
            out[r["component"]] = out.get(r["component"], 0.0) + r["tottime"]
        return out

    ncomp, bcomp = comp_tot(new_rows), comp_tot(base_rows)
    comp_deltas = [
        {"component": c, "base_s": round(bcomp.get(c, 0.0), 3),
         "new_s": round(ncomp.get(c, 0.0), 3),
         "delta_s": round(ncomp.get(c, 0.0) - bcomp.get(c, 0.0), 3)}
        for c in sorted(set(ncomp) | set(bcomp),
                        key=lambda c: -(abs(ncomp.get(c, 0.0) - bcomp.get(c, 0.0))))
    ]
    return {
        "total_base_s": round(base_total, 2),
        "total_new_s": round(new_total, 2),
        "components": comp_deltas,
        "functions": deltas[:n],
    }


def save_summary(tag: str, pstats_path: str, history_path: str) -> dict:
    """Append a tagged component/function summary to the committed trend
    file (reference save_history_entry)."""
    rows, total = load_pstats(pstats_path)
    entry = {
        "kind": "cprofile",
        "tag": tag,
        "total_flat_s": round(total, 2),
        "components": report_components(rows, total),
        "top_10": report_top(rows, total, 10),
    }
    os.makedirs(os.path.dirname(history_path), exist_ok=True)
    with open(history_path, "a") as fh:
        fh.write(json.dumps(entry) + "\n")
    return entry


def main() -> int:
    default_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "profiling", "history.jsonl",
    )
    ap = argparse.ArgumentParser()
    ap.add_argument("history", nargs="?", default=default_path)
    ap.add_argument("--last", type=int, default=5, help="trend window size")
    ap.add_argument("--pstats", default=None,
                    help="cProfile capture to attribute (function level)")
    ap.add_argument("--view", choices=["components", "top", "hotpaths", "all"],
                    default="all")
    ap.add_argument("--top", type=int, default=20)
    ap.add_argument("--diff-base", default=None,
                    help="older .pstats to diff --pstats against")
    ap.add_argument("--save-summary", default=None, metavar="TAG",
                    help="append the --pstats component summary to history")
    args = ap.parse_args()

    try:
        if args.pstats:
            if args.diff_base:
                print(json.dumps(
                    report_pstats_diff(args.pstats, args.diff_base, args.top),
                    indent=2))
                return 0
            rows, total = load_pstats(args.pstats)
            out = {"pstats": args.pstats, "total_flat_s": round(total, 2)}
            if args.view in ("components", "all"):
                out["components"] = report_components(rows, total)
            if args.view in ("top", "all"):
                out["top_functions"] = report_top(rows, total, args.top)
            if args.view in ("hotpaths", "all"):
                out["hotpaths"] = report_hotpaths(args.pstats, min(args.top, 10))
            print(json.dumps(out, indent=2))
            if args.save_summary:
                save_summary(args.save_summary, args.pstats, args.history)
                print(f"# summary saved to {args.history} (tag {args.save_summary})",
                      file=sys.stderr)
            return 0

        if not os.path.exists(args.history):
            print(f"error: no history file at {args.history}", file=sys.stderr)
            return 1
        entries = load(args.history)
        by_kind: dict[str, list[dict]] = {}
        for e in entries:
            by_kind.setdefault(e.get("kind", "unknown"), []).append(e)

        print(json.dumps({
            "history": args.history,
            "entries": len(entries),
            "bench": report_bench(by_kind.get("bench", []), args.last),
            "pipeline": report_pipeline(by_kind.get("pipeline", []), args.last),
        }, indent=2))
    except BrokenPipeError:
        pass  # output piped into head/less that closed early
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

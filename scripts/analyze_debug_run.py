#!/usr/bin/env python3
"""Analyze a lancet2-tpu debug run (--verbose log + --out-graphs-tgz + VCF).

Counterpart of the reference's scripts/analyze_debug_run.py (790 LoC,
rich-TUI): same five views over this framework's debug artifacts, stdlib
only (no rich/tqdm/bcftools in this environment).

    python scripts/analyze_debug_run.py --log run.log \\
        --graphs out_graphs.tgz --vcf out.vcf.gz [--view all]

Views:
  overview   window status counts, stage profile, k-value distribution
  coverage   node coverage by label class, SAMPLE/BACKBONE ratios
  msa        haplotype counts, lengths, pseudo-MSA gap fractions
  variants   VCF TYPE/LENGTH/STATE/QUAL distributions
  suspects   components with low SAMPLE/BACKBONE coverage ratio
             (error bubbles that survived pruning, low-frequency somatic
             candidates, repeat artifacts — reference render_suspects)
"""

from __future__ import annotations

import argparse
import gzip
import io
import re
import statistics
import sys
import tarfile
from collections import Counter, defaultdict
from dataclasses import dataclass, field

VIEWS = ("overview", "coverage", "msa", "variants", "suspects", "all")

_DOT_NAME = re.compile(
    r"dbg__(?P<win>.+?)__(?P<stage>[a-z_0-9]+)__k(?P<k>\d+)__comp(?P<comp>\d+)\.dot$"
)
_DOT_NODE = re.compile(
    r'fillcolor="(?P<color>\w+)" label="(?P<bp>\d+)bp\\ncov=(?P<cov>\d+)"'
)
_COLOR_CLASS = {
    "lightblue": "BACKBONE",   # carries the reference label
    "khaki": "SAMPLE_BOTH",    # ctrl+case reads, no ref
    "salmon": "SAMPLE_CASE",
    "palegreen": "SAMPLE_CTRL",
    "white": "OTHER",
}


@dataclass
class ComponentStats:
    window: str
    k: int
    comp: int
    stage: str
    backbone_covs: list = field(default_factory=list)
    sample_covs: list = field(default_factory=list)

    @property
    def med_backbone(self) -> float:
        return statistics.median(self.backbone_covs) if self.backbone_covs else 0.0

    @property
    def med_sample(self) -> float:
        return statistics.median(self.sample_covs) if self.sample_covs else 0.0

    @property
    def ratio(self) -> float:
        return self.med_sample / self.med_backbone if self.med_backbone > 0 else 0.0


def _bar(fraction: float, width: int = 24) -> str:
    n = int(round(max(0.0, min(1.0, fraction)) * width))
    return "#" * n + "." * (width - n)


def _table(rows: list[list[str]], header: list[str], title: str = "") -> str:
    cols = list(zip(*([header] + rows))) if rows else [header]
    widths = [max(len(str(c)) for c in col) for col in cols]
    out = []
    if title:
        out.append(f"== {title} ==")
    fmt = "  ".join(f"{{:<{w}}}" for w in widths)
    out.append(fmt.format(*header))
    out.append(fmt.format(*["-" * w for w in widths]))
    for r in rows:
        out.append(fmt.format(*[str(c) for c in r]))
    return "\n".join(out) + "\n"


# ---------------------------------------------------------------------------
# loaders
# ---------------------------------------------------------------------------

def parse_log(path: str) -> dict:
    """Final status counts + stage profile + throughput from a --verbose log."""
    info = {"status_counts": {}, "stage_profile": {}, "win_per_s": None,
            "runtime_s": None, "peak_rss_mb": None}
    status_re = re.compile(r"windows=\{(?P<body>[^}]*)\}")
    stage_re = re.compile(r"stage profile: (?P<body>.+)$")
    done_re = re.compile(r"processed (\d+) windows in ([0-9.]+)s \(([0-9.]+) win/s")
    rss_re = re.compile(r"done in ([0-9.]+)s \| peak RSS ([0-9.]+) MB")
    with open(path, errors="replace") as fh:
        for line in fh:
            m = status_re.search(line)
            if m:
                for part in m.group("body").split(","):
                    if ":" in part:
                        k, v = part.rsplit(":", 1)
                        info["status_counts"][k.strip().strip("'\"")] = int(v)
            m = stage_re.search(line)
            if m:
                for part in m.group("body").split(","):
                    if "=" in part:
                        k, v = part.strip().split("=")
                        info["stage_profile"][k] = v
            m = done_re.search(line)
            if m:
                info["windows"] = int(m.group(1))
                info["runtime_s"] = float(m.group(2))
                info["win_per_s"] = float(m.group(3))
            m = rss_re.search(line)
            if m:
                info["peak_rss_mb"] = float(m.group(2))
    return info


def load_graphs(path: str):
    """Parse the merged --out-graphs-tgz: DOT snapshots + MSA/hap FASTAs."""
    comps: list[ComponentStats] = []
    msa_rows: list[tuple[str, int, int, float]] = []  # win, n_haps, width, gap_frac
    hap_lens: list[int] = []
    with tarfile.open(path, "r:gz") as tar:
        for member in tar:
            if not member.isfile():
                continue
            name = member.name
            m = _DOT_NAME.search(name)
            if m:
                cs = ComponentStats(m.group("win"), int(m.group("k")),
                                    int(m.group("comp")), m.group("stage"))
                body = tar.extractfile(member).read().decode(errors="replace")
                for nm in _DOT_NODE.finditer(body):
                    cls = _COLOR_CLASS.get(nm.group("color"), "OTHER")
                    cov = int(nm.group("cov"))
                    if cls == "BACKBONE":
                        cs.backbone_covs.append(cov)
                    elif cls.startswith("SAMPLE"):
                        cs.sample_covs.append(cov)
                comps.append(cs)
            elif "/msa__" in name and name.endswith(".fasta"):
                body = tar.extractfile(member).read().decode(errors="replace")
                rows = [l for l in body.splitlines() if l and not l.startswith(">")]
                if rows:
                    width = len(rows[0])
                    gaps = sum(r.count("-") for r in rows)
                    msa_rows.append((name.split("/")[1], len(rows), width,
                                     gaps / max(width * len(rows), 1)))
            elif "/haps__" in name and name.endswith(".fasta"):
                body = tar.extractfile(member).read().decode(errors="replace")
                hap_lens.extend(
                    len(l) for l in body.splitlines() if l and not l.startswith(">")
                )
    return comps, msa_rows, hap_lens


def parse_vcf(path: str) -> list[dict]:
    opener = gzip.open if path.endswith(".gz") else open
    out = []
    with opener(path, "rt") as fh:
        for line in fh:
            if line.startswith("#"):
                continue
            cols = line.rstrip("\n").split("\t")
            info = dict(
                kv.split("=", 1) if "=" in kv else (kv, True)
                for kv in cols[7].split(";")
            )
            state = next((s for s in ("SHARED", "CTRL", "CASE", "NONE")
                          if s in info), ".")
            for vtype, vlen in zip(str(info.get("TYPE", ".")).split(","),
                                   str(info.get("LENGTH", "0")).split(",")):
                out.append({
                    "pos": int(cols[1]), "qual": float(cols[5]),
                    "type": vtype, "length": int(vlen), "state": state,
                    "gts": [s.split(":")[0] for s in cols[9:]],
                })
    return out


# ---------------------------------------------------------------------------
# views
# ---------------------------------------------------------------------------

def render_overview(log_info: dict, comps) -> None:
    if log_info.get("status_counts"):
        total = sum(log_info["status_counts"].values())
        rows = [
            [k, v, f"{100*v/total:.1f}%", _bar(v / total)]
            for k, v in sorted(log_info["status_counts"].items(),
                               key=lambda kv: -kv[1])
        ]
        print(_table(rows, ["status", "count", "pct", ""], "Window outcomes"))
    if log_info.get("win_per_s") is not None:
        print(f"throughput: {log_info['win_per_s']:.2f} windows/s over "
              f"{log_info.get('windows', '?')} windows in "
              f"{log_info.get('runtime_s', 0):.1f}s; "
              f"peak RSS {log_info.get('peak_rss_mb') or 0:.0f} MB\n")
    if log_info.get("stage_profile"):
        rows = [[k, v] for k, v in log_info["stage_profile"].items()]
        print(_table(rows, ["stage", "share"], "Stage profile"))
    if comps:
        k_counts = Counter(c.k for c in comps)
        rows = [[k, n, _bar(n / len(comps))] for k, n in sorted(k_counts.items())]
        print(_table(rows, ["k", "components", ""], "Successful k distribution"))


def render_coverage(comps) -> None:
    if not comps:
        print("no graph snapshots (--out-graphs-tgz missing?)\n")
        return
    backbone = [c for cs in comps for c in cs.backbone_covs]
    sample = [c for cs in comps for c in cs.sample_covs]
    rows = []
    for name, vals in (("BACKBONE (ref-labeled)", backbone),
                       ("SAMPLE (read-only)", sample)):
        if vals:
            rows.append([name, len(vals), f"{statistics.median(vals):.0f}",
                         f"{min(vals)}..{max(vals)}"])
    print(_table(rows, ["node class", "nodes", "median cov", "range"],
                 "Node coverage by class"))
    ratios = [cs.ratio for cs in comps if cs.med_backbone > 0 and cs.sample_covs]
    if ratios:
        print(f"SAMPLE/BACKBONE coverage ratio: median "
              f"{statistics.median(ratios):.3f}, "
              f"p10 {sorted(ratios)[len(ratios)//10]:.3f}, "
              f"n={len(ratios)} components\n")


def render_msa(msa_rows, hap_lens) -> None:
    if not msa_rows:
        print("no MSA snapshots\n")
        return
    n_haps = [r[1] - 1 for r in msa_rows]  # minus REF row
    widths = [r[2] for r in msa_rows]
    gap_fracs = [r[3] for r in msa_rows]
    rows = [
        ["ALT haplotypes/component", f"{statistics.median(n_haps):.0f}",
         f"{min(n_haps)}..{max(n_haps)}"],
        ["MSA width (cols)", f"{statistics.median(widths):.0f}",
         f"{min(widths)}..{max(widths)}"],
        ["gap fraction", f"{statistics.median(gap_fracs):.3f}",
         f"{min(gap_fracs):.3f}..{max(gap_fracs):.3f}"],
    ]
    if hap_lens:
        rows.append(["haplotype length (bp)", f"{statistics.median(hap_lens):.0f}",
                     f"{min(hap_lens)}..{max(hap_lens)}"])
    print(_table(rows, ["metric", "median", "range"], "Pseudo-MSA"))


def render_variants(variants) -> None:
    if not variants:
        print("no VCF records (pass --vcf)\n")
        return
    types = Counter(v["type"] for v in variants)
    rows = [[t, n, f"{100*n/len(variants):.1f}%", _bar(n / len(variants))]
            for t, n in types.most_common()]
    print(_table(rows, ["type", "count", "pct", ""], "Variant types"))
    states = Counter(v["state"] for v in variants)
    rows = [[s, n] for s, n in states.most_common()]
    print(_table(rows, ["state", "count"], "STATE classification"))
    quals = [v["qual"] for v in variants]
    genod = sum(1 for v in variants
                if any(g not in ("0/0", "./.", ".") for g in v["gts"]))
    print(f"QUAL: median {statistics.median(quals):.2f}, "
          f"max {max(quals):.2f}; genotyped non-ref somewhere: "
          f"{genod}/{len(variants)}\n")
    indel_lens = [abs(v["length"]) for v in variants if v["type"] in ("INS", "DEL")]
    if indel_lens:
        lens = Counter(min(l, 10) for l in indel_lens)
        rows = [[("10+" if l == 10 else l), n] for l, n in sorted(lens.items())]
        print(_table(rows, ["indel len", "count"], "Indel length distribution"))


def render_suspects(comps, ratio_threshold: float) -> None:
    eligible = [c for c in comps if c.med_backbone > 0 and c.sample_covs]
    suspects = [c for c in eligible if c.ratio < ratio_threshold]
    if not eligible:
        print("no components with both backbone and sample nodes\n")
        return
    print(f"{len(suspects)}/{len(eligible)} components "
          f"({100*len(suspects)/len(eligible):.1f}%) below "
          f"SAMPLE/BACKBONE ratio {ratio_threshold}\n")
    if not suspects:
        return
    sus_k = Counter(c.k for c in suspects)
    all_k = Counter(c.k for c in eligible)
    rows = []
    for k in sorted(set(sus_k) | set(all_k)):
        sp = 100 * sus_k.get(k, 0) / len(suspects)
        ap = 100 * all_k.get(k, 0) / len(eligible)
        rows.append([k, f"{sus_k.get(k, 0)} ({sp:.0f}%)",
                     f"{all_k.get(k, 0)} ({ap:.0f}%)",
                     f"{sp/ap:.2f}x" if ap else "-"])
    print(_table(rows, ["k", "suspects", "all", "enrichment"],
                 "k-value enrichment among suspects"))
    worst = sorted(suspects, key=lambda c: c.ratio)[:15]
    rows = [[c.window, c.k, c.comp, f"{c.med_sample:.0f}",
             f"{c.med_backbone:.0f}", f"{c.ratio:.3f}"] for c in worst]
    print(_table(rows, ["window", "k", "comp", "med sample", "med backbone",
                        "ratio"], "Worst suspect components"))


def main() -> int:
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    ap.add_argument("--log", help="pipeline --verbose log file")
    ap.add_argument("--graphs", help="merged --out-graphs-tgz archive")
    ap.add_argument("--vcf", help="output VCF (.gz ok)")
    ap.add_argument("--view", choices=VIEWS, default="all")
    ap.add_argument("--ratio-threshold", type=float, default=0.2,
                    help="suspects view: SAMPLE/BACKBONE cutoff (default 0.2)")
    args = ap.parse_args()

    log_info = parse_log(args.log) if args.log else {}
    comps, msa_rows, hap_lens = (
        load_graphs(args.graphs) if args.graphs else ([], [], [])
    )
    variants = parse_vcf(args.vcf) if args.vcf else []

    if args.view in ("overview", "all"):
        render_overview(log_info, comps)
    if args.view in ("coverage", "all"):
        render_coverage(comps)
    if args.view in ("msa", "all"):
        render_msa(msa_rows, hap_lens)
    if args.view in ("variants", "all"):
        render_variants(variants)
    if args.view in ("suspects", "all"):
        render_suspects(comps, args.ratio_threshold)
    return 0


if __name__ == "__main__":
    sys.exit(main())

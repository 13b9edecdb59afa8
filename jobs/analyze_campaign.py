"""Pool campaign JSON-lines logs into per-config minima + efficiencies.

Usage: python jobs/analyze_campaign.py /tmp/campaign_r6.log [more.log ...]
(multiple logs are pooled into one sample set — same-protocol runs only)

Groups samples by (tag, files, stage, want-executors), reports n/min/all
walls and throughput-at-min, then derives the pairwise scaling
efficiencies for the 1-2-4-executor curve: eff(a->b) = (tps_b / tps_a) /
(b / a), computed from per-config minima (quiet-window min-of-k protocol,
BENCH.md)."""
from __future__ import annotations

import json
import sys
from collections import defaultdict


def main(*paths: str) -> None:
    groups: dict[tuple, list[dict]] = defaultdict(list)
    for path in paths:
        for ln in open(path):
            ln = ln.strip()
            if not ln.startswith("{"):
                continue
            r = json.loads(ln)
            if "sec" not in r:
                continue
            key = (r.get("tag", ""), r["files"], r["stage"],
                   r.get("want", r["executors"]))
            groups[key].append(r)

    best: dict[tuple, dict] = {}
    for key in sorted(groups):
        rs = groups[key]
        b = min(rs, key=lambda r: r["sec"])
        best[key] = b
        walls = ", ".join(f"{r['sec']:.1f}" for r in sorted(rs, key=lambda r: r["sec"]))
        las = ", ".join(str(r.get("loadavg_at_start", "?")) for r in rs)
        print(f"{key}: n={len(rs)} min={b['sec']}s tps_at_min={b['tps']} "
              f"walls=[{walls}] la_start=[{las}]")

    # 1-2-4 curve efficiencies per (tag, files, stage)
    by_cfg: dict[tuple, dict[int, dict]] = defaultdict(dict)
    for (tag, files, stage, want), b in best.items():
        by_cfg[(tag, files, stage)][want] = b
    for cfg in sorted(by_cfg):
        execs = by_cfg[cfg]
        pairs = [(a, b) for a in sorted(execs) for b in sorted(execs) if b > a]
        for a, b in pairs:
            eff = (execs[b]["tps"] / execs[a]["tps"]) / (b / a)
            print(f"{cfg}: eff({a}->{b}) = {eff:.3f} "
                  f"({execs[a]['tps']} -> {execs[b]['tps']} tps)")


if __name__ == "__main__":
    main(*(sys.argv[1:] or ["/tmp/campaign_r6.log"]))

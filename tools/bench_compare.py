"""Compare two bench JSON files (BENCH_r{N}.json or raw bench.py output).

Reports RAW and calibration-NORMALIZED numbers side-by-side (round-10
rework — VERDICT r9 "what's missing" #3: the old normalized-only view
imposed the calibration job's own drift uniformly on every entry,
manufacturing a fake ~1.35x on untouched map-only scans). A query is
flagged as a mover only when BOTH its raw and its normalized delta
exceed the threshold — a uniform normalized-only shift is calibration
noise by construction, and a raw-only shift inside a matching
calibration move is machine drift. ``calibration_runs`` (bench.py
round 10+) prints as a noise band when present.

    python tools/bench_compare.py BENCH_r02.json BENCH_r03.json [threshold]
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    with open(path) as fh:
        d = json.load(fh)
    if "parsed" in d:                       # driver BENCH_r{N}.json wrapper
        d = d["parsed"]
    return d


def main() -> None:
    a, b = load(sys.argv[1]), load(sys.argv[2])
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 0.3
    ca, cb = a.get("calibration_sec"), b.get("calibration_sec")
    scale = (ca / cb) if (ca and cb) else 1.0
    if scale != 1.0:
        print(f"calibration: {ca:.3f}s -> {cb:.3f}s "
              f"(normalized column scales new run by x{scale:.3f})")
    for tag, d in (("old", a), ("new", b)):
        runs = d.get("calibration_runs")
        if runs:
            lo, hi = min(runs), max(runs)
            mid = sorted(runs)[len(runs) // 2]
            spread = (hi - lo) / mid if mid else 0.0
            print(f"  {tag} calibration runs: {runs} "
                  f"(median {mid:.3f}s, spread {spread:.0%})")
    qa, qb = a["queries"], b["queries"]
    shared = sorted(set(qa) & set(qb))
    ta = sum(qa[k] for k in shared)
    tb_raw = sum(qb[k] for k in shared)
    tb_norm = tb_raw * scale
    if ta:
        print(f"{len(shared)} shared entries: {ta:.1f}s -> "
              f"raw {tb_raw:.1f}s (x{tb_raw / ta:.2f} of old), "
              f"normalized {tb_norm:.1f}s (x{tb_norm / ta:.2f})")
    else:
        print("no shared entries")
    for k in shared:
        old, new_raw = qa[k], qb[k]
        new_norm = new_raw * scale
        if old <= 0.2:
            continue
        raw_mover = abs(new_raw - old) / old >= thresh
        norm_mover = abs(new_norm - old) / old >= thresh
        if raw_mover and norm_mover:
            print(f"  {'^' if new_raw > old else 'v'} {k}: "
                  f"{old:.2f} -> raw {new_raw:.2f} ({new_raw / old:.2f}x), "
                  f"norm {new_norm:.2f} ({new_norm / old:.2f}x)")
        elif raw_mover or norm_mover:
            which = "raw-only" if raw_mover else "normalized-only"
            print(f"  ~ {k}: {which} move "
                  f"{old:.2f} -> raw {new_raw:.2f} / norm {new_norm:.2f} "
                  "(calibration/machine drift, not flagged)")
    for k in sorted(set(qb) - set(qa)):
        print(f"  + {k}: {qb[k]:.2f} (new)")
    for k in sorted(set(qa) - set(qb)):
        print(f"  - {k}: was {qa[k]:.2f} (removed/renamed)")


if __name__ == "__main__":
    main()

"""Compare two bench JSON files (BENCH_r{N}.json or raw bench.py output).

Normalizes by ``calibration_sec`` when both files carry it (bench.py
emits a fixed pure-JVM aggregate for exactly this — machine drift of
~18% between rounds was observed on identical plans), else compares raw
seconds. Usage:

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
        print(f"calibration: {ca:.3f}s -> {cb:.3f}s; "
              f"normalizing new run by x{scale:.3f}")
    qa, qb = a["queries"], b["queries"]
    shared = sorted(set(qa) & set(qb))
    ta = sum(qa[k] for k in shared)
    tb = sum(qb[k] * scale for k in shared)
    print(f"{len(shared)} shared entries: {ta:.1f}s -> {tb:.1f}s "
          f"({tb / ta:+.0%} of old)" if ta else "no shared entries")
    for k in shared:
        old, new = qa[k], qb[k] * scale
        if old > 0.2 and abs(new - old) / old >= thresh:
            print(f"  {'^' if new > old else 'v'} {k}: "
                  f"{old:.2f} -> {new:.2f} ({new / old:.2f}x)")
    for k in sorted(set(qb) - set(qa)):
        print(f"  + {k}: {qb[k]:.2f} (new)")
    for k in sorted(set(qa) - set(qb)):
        print(f"  - {k}: was {qa[k]:.2f} (removed/renamed)")


if __name__ == "__main__":
    main()

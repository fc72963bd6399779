"""Per-query regression gate (BASELINE.md round-12, replacing the
ratcheting extra_total aggregate): no gated query may exceed
RATIO_BAR x its committed per-query baseline, min-of-N across the
bench shots given.

The aggregate gate weakened every time the list grew (each re-baseline
added headroom a multi-second regression could hide inside); a
per-query bar is growth-invariant — adding query #44 cannot loosen the
bar on queries 1..43.

Usage:
    python tools/check_regression.py BENCH_OUT.json [BENCH_OUT2.json ...]

Each argument is a bench.py full-record line (`headline_queries_full`:
per-query `queries` + `extra_queries` maps). With several shots the
min per query is compared (the committed protocol is min-of-3).
Queries present in the run but absent from BASELINE_PERQ.json are
reported as UNBASELINED (informational — they join the map at the
next baseline commit); queries in the map but absent from the run are
reported MISSING and fail.

Exit 0 = every baselined query within the bar; 1 = any regression or
missing query.
"""

from __future__ import annotations

import json
import os
import sys

RATIO_BAR = 1.5

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASELINE_PATH = os.path.join(HERE, "BASELINE_PERQ.json")


def load_run(path: str) -> dict[str, float]:
    with open(path) as f:
        txt = f.read()
    # accept either a bare JSON object or a file of JSON lines —
    # pick the line carrying per-query maps
    rec = None
    for line in txt.strip().splitlines():
        line = line.strip()
        if not line.startswith("{"):
            continue
        d = json.loads(line)
        if "queries" in d:
            rec = d if rec is None or "extra_queries" in d else rec
            if "extra_queries" in d:
                rec = d
    if rec is None:
        raise SystemExit(f"{path}: no bench record with a queries map")
    out = dict(rec.get("queries", {}))
    out.update(rec.get("extra_queries", {}))
    return {k: float(v) for k, v in out.items()}


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    with open(BASELINE_PATH) as f:
        base = json.load(f)
    baseline: dict[str, float] = {}
    baseline.update(base.get("headline", {}))
    baseline.update(base.get("extra", {}))

    runs = [load_run(p) for p in sys.argv[1:]]
    merged: dict[str, float] = {}
    for r in runs:
        for k, v in r.items():
            merged[k] = min(v, merged.get(k, float("inf")))

    regressions, unbaselined, missing = [], [], []
    for q, t in sorted(merged.items()):
        b = baseline.get(q)
        if b is None:
            unbaselined.append(q)
            continue
        ratio = t / b if b > 0 else float("inf")
        status = "FAIL" if ratio > RATIO_BAR else "ok"
        if ratio > RATIO_BAR:
            regressions.append((q, t, b, ratio))
        print(f"{status:4} {q}: {t:.3f}s vs baseline {b:.3f}s ({ratio:.2f}x)")
    for q in sorted(baseline):
        if q not in merged:
            missing.append(q)
            print(f"MISS {q}: baselined but absent from the run")
    for q in unbaselined:
        print(f"NEW  {q}: no committed baseline yet")

    print(
        f"\n{len(merged)} queries checked over {len(runs)} shot(s): "
        f"{len(regressions)} regression(s) > {RATIO_BAR}x, "
        f"{len(missing)} missing, {len(unbaselined)} unbaselined"
    )
    return 1 if (regressions or missing) else 0


if __name__ == "__main__":
    sys.exit(main())

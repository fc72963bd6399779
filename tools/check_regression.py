"""Per-query regression gate (BASELINE.md round-12, replacing the
ratcheting extra_total aggregate): no gated query may exceed
RATIO_BAR x its committed per-query baseline, min-of-N across the
bench shots given.

The aggregate gate weakened every time the list grew (each re-baseline
added headroom a multi-second regression could hide inside); a
per-query bar is growth-invariant — adding query #44 cannot loosen the
bar on queries 1..43.

Box-weather normalization: the per-query floors were measured on
specific box-days, and identical bits have been observed ±25% across
sessions (BENCH_NOTES round-12 drift attribution — DuckDB on frozen
SQL+data drifted 3.60 -> 4.25 s between sessions). Run the DuckDB
oracle headline in the SAME session (tools/bench_duckdb.py
/root/testdata/sf0.1 <headline list>, min-of-3) and pass
``--calib <duckdb_total>``; the bar becomes
RATIO_BAR x max(1, duckdb_total / DUCKDB_COMMITTED). A faster box
never loosens the bar; a slower box loosens it exactly as much as the
frozen-bits control slowed down.

Usage:
    python tools/check_regression.py [--calib D] BENCH_OUT.json [BENCH_OUT2.json ...]

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
# the committed DuckDB oracle headline-22 total at sf0.1 (min-of-3),
# the frozen-bits control the --calib measurement is divided by
DUCKDB_COMMITTED = 3.60

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
    args = sys.argv[1:]
    calib = 1.0
    if args and args[0] == "--calib":
        calib = max(1.0, float(args[1]) / DUCKDB_COMMITTED)
        args = args[2:]
    if not args:
        print(__doc__)
        return 2
    bar = RATIO_BAR * calib
    print(
        f"bar = {RATIO_BAR} x calib {calib:.3f} = {bar:.3f} "
        f"(DuckDB committed {DUCKDB_COMMITTED}s)"
    )
    with open(BASELINE_PATH) as f:
        base = json.load(f)
    baseline: dict[str, float] = {}
    baseline.update(base.get("headline", {}))
    baseline.update(base.get("extra", {}))

    runs = [load_run(p) for p in args]
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
        status = "FAIL" if ratio > bar else "ok"
        if ratio > bar:
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
        f"{len(regressions)} regression(s) > {bar:.2f}x, "
        f"{len(missing)} missing, {len(unbaselined)} unbaselined"
    )
    return 1 if (regressions or missing) else 0


if __name__ == "__main__":
    sys.exit(main())

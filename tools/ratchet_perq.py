"""Ratchet BASELINE_PERQ.json floors down to the fastest measurement
ever recorded (VERDICT r14 next-round #1: un-ratcheted floors let a
5x regression in an improved query pass the 1.5x bar silently).

Usage:
    python tools/ratchet_perq.py [--note TEXT] [--round N] RUN.json/log ...

Each argument is a bench.py output file (full-record line with
`queries` + `extra_queries`, same format check_regression.py reads).
Floors only ever move DOWN: new_floor[q] = min(old_floor[q], every
measurement of q across the given runs). Queries not yet in the map
join it at their measured minimum (in whichever of headline/extra the
run record places them). Prints a diff and rewrites BASELINE_PERQ.json
in place.
"""

from __future__ import annotations

import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASELINE_PATH = os.path.join(HERE, "BASELINE_PERQ.json")

sys.path.insert(0, os.path.join(HERE, "tools"))
from check_regression import load_run  # noqa: E402


def load_run_split(path: str) -> tuple[dict[str, float], dict[str, float]]:
    """(headline map, extra map) from a bench full-record file."""
    with open(path) as f:
        txt = f.read()
    rec = None
    for line in txt.strip().splitlines():
        line = line.strip()
        if not line.startswith("{"):
            continue
        d = json.loads(line)
        if "queries" in d and "extra_queries" in d:
            rec = d
    if rec is None:
        raise SystemExit(f"{path}: no full bench record")
    return (
        {k: float(v) for k, v in rec["queries"].items()},
        {k: float(v) for k, v in rec["extra_queries"].items()},
    )


def main() -> int:
    args = sys.argv[1:]
    note = None
    rnd = None
    while args and args[0].startswith("--"):
        if args[0] == "--note":
            note = args[1]
        elif args[0] == "--round":
            rnd = int(args[1])
        args = args[2:]
    if not args:
        raise SystemExit(__doc__)
    with open(BASELINE_PATH) as f:
        base = json.load(f)
    n_changed = 0
    for path in args:
        hq, eq = load_run_split(path)
        for section, run in (("headline", hq), ("extra", eq)):
            floors = base.setdefault(section, {})
            for q, v in run.items():
                old = floors.get(q)
                if old is None or v < old:
                    floors[q] = round(v, 3)
                    print(
                        f"{section}/{q}: "
                        f"{'NEW' if old is None else old} -> {v:.3f}"
                        f"  ({os.path.basename(path)})"
                    )
                    n_changed += 1
    if rnd is not None:
        base["committed_round"] = rnd
    if note is not None:
        base["box_note"] = note
    with open(BASELINE_PATH, "w") as f:
        json.dump(base, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"{n_changed} floors ratcheted; committed_round="
          f"{base.get('committed_round')}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Propose the next round's driver window (_DRIVER_PRIORITY).

The round driver hash-checks queries()[:50] in registry order, so each
round the 50 slots should go to (in priority order):

  1. queries with NO CORRECTNESS row in any round (never checked),
  2. queries whose newest row is red (err or any *_match false),
  3. queries explicitly deferred by a previous round's window comments
     (pass via --must-lead),
  4. the rest, oldest-evidence-first (stalest green rows rotate in).

Prints the proposed 50-name list plus the evidence age of everything left
out — paste into catalog.py's _DRIVER_PRIORITY at round start. Purely
advisory: it reads CORRECTNESS_r*.json and the registry, writes nothing.

Usage: python scripts/window_rotate.py [--slots 50]
       [--must-lead name1,name2]   (the prior round's deferral IOUs)
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def newest_rows() -> dict[str, tuple[int, bool]]:
    """name -> (newest round with a row, that row was green)."""
    out: dict[str, tuple[int, bool]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(path.rsplit("_r", 1)[1].split(".")[0])
        for name, row in json.load(open(path)).items():
            green = row.get("err") in (None, "") and all(
                row.get(k, True) is not False
                for k in ("rows_match", "schema_match", "hash_match")
            )
            out[name] = (rnd, green)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=50)
    ap.add_argument("--must-lead", default="")
    args = ap.parse_args()

    from pandemic_knowledge_spark.plans import REGISTRY

    rows = newest_rows()
    must = [n for n in args.must_lead.split(",") if n]
    if not must:
        # default to the catalog's declared deferral debt — the constant
        # the previous round's rotation left behind (one source of truth,
        # no hand-copied list at round start)
        from pandemic_knowledge_spark.plans import catalog as _cat

        must = list(getattr(_cat, "_NEXT_WINDOW_IOUS", []))
    unknown = [n for n in must if n not in REGISTRY]
    if unknown:
        raise SystemExit(f"--must-lead: unknown queries {unknown}")

    never = [n for n in REGISTRY if n not in rows]
    red = [n for n, (_, g) in rows.items() if not g and n in REGISTRY]
    rest = sorted(
        (n for n in REGISTRY if n in rows and n not in red and n not in must),
        key=lambda n: (rows[n][0], n),  # oldest evidence first
    )
    ordered: list[str] = []
    for tier in (never, red, [m for m in must if m not in never and m not in red], rest):
        for n in tier:
            if n not in ordered:
                ordered.append(n)
    window, left_out = ordered[: args.slots], ordered[args.slots :]

    print(f"# proposed window ({len(window)} slots):")
    for n in window:
        tag = (
            "NEVER" if n in never
            else "RED" if n in red
            else "IOU" if n in must
            else f"r{rows[n][0]}"
        )
        print(f'    "{n}",  # {tag}')
    ages: dict[str, int] = {}
    for n in left_out:
        ages[f"r{rows[n][0]}"] = ages.get(f"r{rows[n][0]}", 0) + 1
    print(f"# left out ({len(left_out)}), newest-evidence histogram: "
          + json.dumps(dict(sorted(ages.items()))))


if __name__ == "__main__":
    main()

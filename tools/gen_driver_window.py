"""Regenerate ``DRIVER_WINDOW_FIRST`` from the recorded correctness history.

The driver hash-checks only the first ~50 entries of ``queries()`` per
round, so registration order decides which catalog entries get a hard
correctness row.  Rather than hand-maintaining the rotation (the comment
block in ``plans/catalog.py`` admits going stale twice), this tool
computes it from the actual ``CORRECTNESS_r*.json`` files at the repo
root and rewrites the tuple in place between the BEGIN/END markers.

Rotation policy (pinned by ``tests/test_driver_window.py``):

1. Oracle-gated entries with NO green driver row in any recorded round
   come first, in catalog registration order.  New entries registered
   mid-round are automatically "never checked" and therefore slot in
   right after the standing backlog — they get a driver row the same
   round they land instead of silently falling past slot 50.
2. Then rows-only entries that have NEVER had ANY driver row
   (``spark_rows`` non-null in some CORRECTNESS file) — a one-time
   cohort (round-10 verdict item 2): ten rows-only entries had sorted
   last forever and carried zero driver-side evidence of even running
   under the harness.  After their first recorded row they drop out of
   the tuple again (tier 3 below never includes rows-only names).
3. Then every other oracle-gated entry, stalest first: ascending by the
   last round that recorded a green (rows+schema+hash) row, ties broken
   by registration order.

Rows-only entries WITH a recorded driver row are never listed —
``_driver_order`` already sorts them last, and a rows-only check must
not displace a hash-checked one from the window.

Usage: ``python tools/gen_driver_window.py [--check]``
``--check`` exits non-zero if the committed tuple differs from the
computed rotation (used by the unit test).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CATALOG_PY = os.path.join(
    REPO, "usgs_earthquake_data_pipeline_spark", "plans", "catalog.py"
)
BEGIN = "    # -- BEGIN GENERATED (tools/gen_driver_window.py) --"
END = "    # -- END GENERATED --"
ROUNDS_BEGIN = "DRIVER_WINDOW_ROUNDS: tuple[int, ...] = ("
ROUNDS_END = ")  # -- GENERATED: correctness rounds the rotation was computed from --"


def recorded_rounds(repo: str = REPO) -> list[int]:
    """Rounds with a CORRECTNESS file on disk, ascending."""
    out = []
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"r(\d+)", os.path.basename(path))
        if m:
            out.append(int(m.group(1)))
    return sorted(set(out))


def last_green_rounds(
    repo: str = REPO, only_rounds: set[int] | None = None
) -> dict[str, int]:
    """name -> latest round with a fully-green driver row.

    ``only_rounds`` restricts to the rounds the committed tuple was
    generated from (pinned next to it as DRIVER_WINDOW_ROUNDS): the
    driver records a NEW correctness file at round end, after the
    tuple was committed — an unrestricted recompute would then call
    the committed tuple stale and fail the pinning test in the same
    round that generated it."""
    rounds: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"r(\d+)", os.path.basename(path))
        if not m:
            continue
        rnd = int(m.group(1))
        if only_rounds is not None and rnd not in only_rounds:
            continue
        with open(path) as f:
            data = json.load(f)
        for name, v in data.items():
            if (
                isinstance(v, dict)
                and v.get("rows_match")
                and v.get("schema_match")
                and v.get("hash_match")
            ):
                rounds[name] = max(rounds.get(name, 0), rnd)
    return rounds


def ever_ran(
    repo: str = REPO, only_rounds: set[int] | None = None
) -> set[str]:
    """Names with ANY recorded driver row — ``spark_rows`` non-null —
    regardless of hash outcome (rows-only rows qualify)."""
    ran: set[str] = set()
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"r(\d+)", os.path.basename(path))
        if not m:
            continue
        if only_rounds is not None and int(m.group(1)) not in only_rounds:
            continue
        with open(path) as f:
            data = json.load(f)
        for name, v in data.items():
            if isinstance(v, dict) and v.get("spark_rows") is not None:
                ran.add(name)
    return ran


def compute_rotation(only_rounds: set[int] | None = None) -> list[str]:
    from usgs_earthquake_data_pipeline_spark.plans.catalog import CATALOG

    rounds = last_green_rounds(only_rounds=only_rounds)
    ran = ever_ran(only_rounds=only_rounds)
    reg = {n: i for i, n in enumerate(CATALOG)}
    gated = [n for n in CATALOG if CATALOG[n].oracle is not None]
    never = [n for n in gated if n not in rounds]
    rows_only_cohort = [
        n for n in CATALOG if CATALOG[n].oracle is None and n not in ran
    ]
    stale = sorted(
        (n for n in gated if n in rounds), key=lambda n: (rounds[n], reg[n])
    )
    return never + rows_only_cohort + stale


def rewrite(rotation: list[str], rounds_used: list[int]) -> None:
    with open(CATALOG_PY) as f:
        src = f.read()
    rb = src.index(ROUNDS_BEGIN)
    re_ = src.index(ROUNDS_END)
    src = (
        src[: rb + len(ROUNDS_BEGIN)]
        + ", ".join(str(r) for r in rounds_used)
        + ("," if len(rounds_used) == 1 else "")
        + src[re_:]
    )
    begin_i = src.index(BEGIN)
    end_i = src.index(END)
    body = "\n".join(f'    "{n}",' for n in rotation)
    new = src[: begin_i + len(BEGIN)] + "\n" + body + "\n" + src[end_i:]
    with open(CATALOG_PY, "w") as f:
        f.write(new)


def committed_rounds() -> list[int]:
    from usgs_earthquake_data_pipeline_spark.plans import catalog

    return list(catalog.DRIVER_WINDOW_ROUNDS)


def committed() -> list[str]:
    from usgs_earthquake_data_pipeline_spark.plans import catalog

    return list(catalog.DRIVER_WINDOW_FIRST)


def main() -> int:
    sys.path.insert(0, REPO)
    if "--check" in sys.argv:
        rotation = compute_rotation(only_rounds=set(committed_rounds()))
        got = committed()
        if got != rotation:
            sys.stderr.write(
                "DRIVER_WINDOW_FIRST is stale: run tools/gen_driver_window.py\n"
            )
            for i, (a, b) in enumerate(zip(got, rotation)):
                if a != b:
                    sys.stderr.write(f"  first diff at {i}: {a!r} != {b!r}\n")
                    break
            if len(got) != len(rotation):
                sys.stderr.write(f"  lengths {len(got)} != {len(rotation)}\n")
            return 1
        print(f"window OK ({len(rotation)} gated entries; first 50 are the round's rows)")
        return 0
    rounds_used = recorded_rounds()
    rotation = compute_rotation(only_rounds=set(rounds_used))
    rewrite(rotation, rounds_used)
    print(f"rewrote DRIVER_WINDOW_FIRST with {len(rotation)} entries")
    for n in rotation[:50]:
        print("  ", n)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

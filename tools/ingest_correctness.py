#!/usr/bin/env python
"""Append a round's CORRECTNESS_r{N}.json sample to the registry rotation.

The external correctness gate hash-checks only the FIRST 50 keys of
``registry.queries()``; ``registry._DRIVER_SAMPLED_BY_ROUND`` records which
keys each round's gate actually sampled so ``_ordered_specs()`` can rotate
the window onto never-sampled keys (and refresh the stalest old ones).
Rounds 5 and 6 both forgot to append the new sample by hand — this tool
makes it a mechanical end-of-round step (VERDICT r6 item #1):

    python tools/ingest_correctness.py CORRECTNESS_r06.json

Idempotent: re-running for an already-ingested round is a no-op. The keys
are inserted as a new ``frozenset({...})`` entry before the closing ``]`` of
``_DRIVER_SAMPLED_BY_ROUND``, tagged with the round number parsed from the
filename so ``_ordered_specs()``'s stalest-first refresh ordering stays
correct.
"""
from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
REGISTRY = REPO / "calidad_del_aire_etl_spark" / "registry.py"


def ingest(correctness_path: str, check: bool = False) -> bool:
    """Returns True if registry.py was (or, with ``check=True``, would be)
    modified, False if the round is already ingested.

    ``check=True`` is the hermetic dry-run mode used by the pytest
    meta-test: it computes the answer without ever writing registry.py,
    so a test run can never mutate source (VERDICT r7/r8 gate #1b).
    """
    p = Path(correctness_path)
    m = re.search(r"CORRECTNESS_r(\d+)\.json$", p.name)
    if not m:
        raise SystemExit(f"filename must match CORRECTNESS_r<N>.json: {p.name}")
    rnd = int(m.group(1))
    keys = sorted(json.loads(p.read_text()))
    if not keys:
        raise SystemExit(f"{p}: no keys")

    src = REGISTRY.read_text()
    tag = f"from CORRECTNESS_r{rnd:02d}.json"

    # locate the closing bracket of the _DRIVER_SAMPLED_BY_ROUND list: the
    # first line that is exactly "]" after the assignment line.
    lines = src.splitlines(keepends=True)
    start = next(
        i for i, ln in enumerate(lines)
        if ln.startswith("_DRIVER_SAMPLED_BY_ROUND")
    )
    end = next(i for i in range(start + 1, len(lines)) if lines[i].rstrip() == "]")

    block = "".join(lines[start:end])
    # Idempotence: the round's own tag, or membership in the rounds-1..4
    # union entry (ingested by hand before this tool existed, so no
    # per-round tag). The all-keys fallback is scoped to rnd <= 4 on
    # purpose: once the rotation covers all queries, every later round's
    # keys are necessarily "all present" somewhere, yet the round still
    # needs its own frozenset so stalest-first refresh ordering is right.
    if tag in block or (rnd <= 4 and all(f'"{k}"' in block for k in keys)):
        print(f"round {rnd} already ingested — no-op")
        return False
    if check:
        print(f"round {rnd} NOT ingested ({len(keys)} keys) — dry-run, "
              f"registry.py untouched")
        return True

    body_lines = [f"    # round {rnd} ({len(keys)} keys, {tag})\n", "    frozenset({\n"]
    row = "       "
    for k in keys:
        piece = f' "{k}",'
        if len(row) + len(piece) > 79:
            body_lines.append(row + "\n")
            row = "       "
        row += piece
    body_lines.append(row + "\n")
    body_lines.append("    }),\n")

    lines[end:end] = body_lines
    REGISTRY.write_text("".join(lines))
    try:
        shown = REGISTRY.relative_to(REPO)
    except ValueError:  # e.g. the meta-test's tempdir copy
        shown = REGISTRY
    print(f"ingested round {rnd}: {len(keys)} keys appended to "
          f"_DRIVER_SAMPLED_BY_ROUND in {shown}")
    return True


if __name__ == "__main__":
    argv = [a for a in sys.argv[1:] if a != "--check"]
    if len(argv) != 1:
        raise SystemExit(__doc__)
    ingest(argv[0], check="--check" in sys.argv[1:])

#!/usr/bin/env python
"""Final-boundary invariant: no query-path commit newer than the last
committed sweep covering it.

The round ritual ends with a full oracle sweep whose log is committed as
evidence (``sweep_r*_*.log``). Round 9 shipped one commit (af1e051, the
IDN host-normalization wiring) that landed AFTER the close-out sweep, so
the "re-verified green" claim for the affected queries lived only in a
commit message — an evidence-discipline slip the r9 verdict flagged
(What's wrong #1). This script makes the rule mechanical:

    the newest commit touching any query code path
    (databatchprotectionservice_spark/, __spark_entry__.py)
    must be NO NEWER than the newest committed sweep log
    (sweep_*.log at the repo root, or a CORRECTNESS-format
    CHECK_ORACLE artifact *.json named sweep_*).

Run it as the LAST step of the boundary ritual (after committing the
final sweep log); exit 1 means a code commit outran the committed
evidence — re-run the affected sweep and commit its log.

    python scripts/check_boundary.py

Commit TIMESTAMPS (committer time) are compared, not working-tree
mtimes, so the check is deterministic on any clone. Uncommitted
working-tree changes under the query paths also fail the check: they
are by definition newer than any committed evidence.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: paths whose commits must be covered by committed sweep evidence
QUERY_PATHS = ["databatchprotectionservice_spark", "__spark_entry__.py"]

#: committed artifacts that count as sweep evidence
SWEEP_GLOBS = ["sweep_*.log", "sweep_*.json"]


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", "-C", REPO, *args],
        check=True,
        capture_output=True,
        text=True,
    ).stdout.strip()


def _last_commit(paths: list[str]) -> tuple[int, str] | None:
    out = _git("log", "-1", "--format=%ct %h %s", "--", *paths)
    if not out:
        return None
    ts, rest = out.split(" ", 1)
    return int(ts), rest


def main() -> int:
    code = _last_commit(QUERY_PATHS)
    sweep = _last_commit(SWEEP_GLOBS)
    if code is None:
        print("boundary: no query-path commits — trivially green")
        return 0
    if sweep is None:
        print("boundary: RED — query code committed but no sweep log ever "
              "committed")
        return 1

    dirty = _git("status", "--porcelain", "--", *QUERY_PATHS)
    if dirty:
        print("boundary: RED — uncommitted query-path changes newer than "
              "any committed sweep evidence:")
        for line in dirty.splitlines()[:20]:
            print(f"  {line}")
        return 1

    code_ts, code_desc = code
    sweep_ts, sweep_desc = sweep
    if code_ts > sweep_ts:
        print("boundary: RED — the last query-path commit is NEWER than "
              "the last committed sweep evidence:")
        print(f"  code : {code_desc}")
        print(f"  sweep: {sweep_desc}")
        print("re-run the affected registered queries "
              "(scripts/check_oracle.py) and commit the log.")
        return 1
    print("boundary: green — last sweep evidence is at or after the last "
          "query-path commit")
    print(f"  code : {code_desc}")
    print(f"  sweep: {sweep_desc}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

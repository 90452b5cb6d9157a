"""Standing gate-window policy state (VERDICT r4 next-round #1).

The driver's correctness gate caps at 50 rows per round, walking
``__spark_entry__.queries()`` in dict order.  The entry point computes
that order from ``tools/gate_state.json``, which records — per query —
the round of its most recent driver-green row and the implementation
FINGERPRINT (own operator module + imported operator modules + the
non-operator core, see ``__spark_entry__._query_fingerprints``) the
code had when that row was produced.  A query whose current fingerprint
differs from the recorded one is "changed since its last hard signal"
and jumps into the next window, after sentinels and brand-new queries.

Commands:

  python tools/gate_policy.py sync
      Run at ROUND START, BEFORE any code changes: for every query green
      in the newest CORRECTNESS_r*.json, record that round number and
      the CURRENT fingerprint (valid precisely because the working tree
      still matches the code the driver ran).  Queries absent from the
      newest file keep their existing entry; queries with no entry at
      all are backfilled from older CORRECTNESS files at the current
      fingerprint (correct for the r4→r5 bootstrap: the r4 judge
      re-oracled every post-window edit against this exact tree).

  python tools/gate_policy.py window
      Print the window the entry point will serve, one query per line
      with its slot reason (sentinel / new / changed / rotation:rN).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, "/root/repo")

STATE_PATH = "/root/repo/tools/gate_state.json"
GATE_CAP = 50  # driver-side hard cap, for display only


def _green(rec: dict) -> bool:
    return bool(
        rec.get("rows_match")
        and rec.get("schema_match")
        # rows-only checks (no oracle) record hash_match null — count
        # them as a (weaker) driver row all the same
        and rec.get("hash_match") is not False
        and not rec.get("err")
    )


def _correctness_rounds() -> list[tuple[int, dict]]:
    out = []
    for path in glob.glob("/root/repo/CORRECTNESS_r*.json"):
        m = re.search(r"_r(\d+)\.json$", path)
        if not m:
            continue
        with open(path) as f:
            out.append((int(m.group(1)), json.load(f)))
    return sorted(out)


def sync() -> None:
    import __spark_entry__ as entry

    fps = entry._query_fingerprints()
    state: dict[str, dict] = {}
    if os.path.exists(STATE_PATH):
        with open(STATE_PATH) as f:
            state = json.load(f)
    rounds = _correctness_rounds()
    if not rounds:
        print("no CORRECTNESS_r*.json found; nothing to sync")
        return
    newest_round, newest = rounds[-1]
    n_new = n_back = 0
    for q, rec in newest.items():
        if q in fps and _green(rec):
            state[q] = {"fp": fps[q], "round": newest_round}
            n_new += 1
    # backfill never-synced queries from older rounds (bootstrap only)
    for rnd, data in rounds[:-1]:
        for q, rec in data.items():
            if q in fps and q not in state and _green(rec):
                state[q] = {"fp": fps[q], "round": rnd}
                n_back += 1
    # re-run older-round backfill picking the LATEST old round per query
    for rnd, data in rounds[:-1]:
        for q, rec in data.items():
            if (
                q in fps
                and q in state
                and state[q]["round"] < rnd < newest_round
                and _green(rec)
            ):
                state[q]["round"] = rnd
    with open(STATE_PATH, "w") as f:
        json.dump(dict(sorted(state.items())), f, indent=1, sort_keys=True)
        f.write("\n")
    print(
        f"synced {n_new} queries at round {newest_round}"
        + (f", backfilled {n_back} from older rounds" if n_back else "")
        + f"; state has {len(state)} entries"
    )


def window() -> None:
    import __spark_entry__ as entry

    fps = entry._query_fingerprints()
    state: dict[str, dict] = {}
    if os.path.exists(STATE_PATH):
        with open(STATE_PATH) as f:
            state = json.load(f)
    order = list(entry.queries())
    for i, q in enumerate(order):
        if q in entry._SENTINELS:
            reason = "sentinel"
        elif q not in state:
            reason = "NEW"
        elif state[q].get("fp") != fps.get(q):
            reason = f"CHANGED (last row r{state[q].get('round')})"
        else:
            reason = f"rotation r{state[q].get('round')}"
        marker = " " if i < GATE_CAP else "|past-cap "
        print(f"{i + 1:3d} {marker}{q:42s} {reason}")


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "window"
    if cmd == "sync":
        sync()
    elif cmd == "window":
        window()
    else:
        print(__doc__)
        sys.exit(2)

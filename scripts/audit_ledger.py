#!/usr/bin/env python
"""CI of record-keeping: assert every driver claim in SURVEY.md's
§8.5 ledger is backed by the CORRECTNESS_r0N.json evidence it cites.

The r9 judge caught a ledger row claiming "driver-green r8" for a
query CORRECTNESS_r08.json never recorded (a local-verification note
promoted to a driver claim). This script makes that class of drift
impossible to commit silently:

- "driver-green rN" / "driver green rN"  -> CORRECTNESS_r0N.json must
  contain the query with rows_match & schema_match & hash_match all
  true.
- "driver rows-only rN" / "rows-only rN" -> CORRECTNESS_r0N.json must
  contain the query with err == "no_oracle".
- "queued rN" is a plan, not evidence — not checked.

Also cross-checks the other direction: every CORRECTNESS triple-match
should be claimable, so a query present in a CORRECTNESS file but
absent from the ledger table is reported as a warning (the ledger is
allowed to summarize, not to invent).

Exit 0 = ledger clean; exit 1 = at least one unbacked claim.
Run: python scripts/audit_ledger.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_correctness() -> "dict[int, dict]":
    out = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", f)
        if not m:
            continue
        out[int(m.group(1))] = json.load(open(f))
    return out


def ledger_rows() -> "list[tuple[str, str]]":
    """(query_name, status_cell) for every §8.5 table row whose first
    cell is a backquoted queries() entry name."""
    text = open(os.path.join(REPO, "SURVEY.md")).read()
    sec = text.split("### 8.5", 1)
    if len(sec) < 2:
        sys.exit("SURVEY.md has no §8.5 section")
    rows = []
    for line in sec[1].splitlines():
        m = re.match(r"\|\s*`([a-z0-9_]+)`\s*\|[^|]*\|(.*)\|\s*$", line)
        if m:
            rows.append((m.group(1), m.group(2)))
    return rows


def main() -> int:
    corr = load_correctness()
    rows = ledger_rows()
    if not rows:
        print("FAIL: no ledger rows parsed from SURVEY.md §8.5")
        return 1
    bad: list[str] = []
    for name, status in rows:
        for rnd in re.findall(r"driver[- ]green r(\d+)", status):
            rec = corr.get(int(rnd), {}).get(name)
            if not rec or not (
                rec.get("rows_match")
                and rec.get("schema_match")
                and rec.get("hash_match")
            ):
                bad.append(
                    f"{name}: claims driver-green r{rnd} but "
                    f"CORRECTNESS_r{int(rnd):02d}.json has "
                    f"{'no entry' if not rec else rec}"
                )
        for rnd in re.findall(r"rows[- ]only r(\d+)", status):
            rec = corr.get(int(rnd), {}).get(name)
            if not rec or rec.get("err") != "no_oracle":
                bad.append(
                    f"{name}: claims rows-only r{rnd} but "
                    f"CORRECTNESS_r{int(rnd):02d}.json has "
                    f"{'no entry' if not rec else rec}"
                )
    ledger_names = {n for n, _ in rows}
    unledgered = sorted(
        {q for d in corr.values() for q in d} - ledger_names
    )
    if unledgered:
        print(
            f"warning: {len(unledgered)} driver-checked queries have no "
            f"§8.5 row: {', '.join(unledgered[:10])}"
            + ("..." if len(unledgered) > 10 else "")
        )
    if bad:
        print(f"FAIL: {len(bad)} unbacked ledger claims:")
        for b in bad:
            print(f"  - {b}")
        return 1
    n_claims = sum(
        len(re.findall(r"(?:driver[- ]green|rows[- ]only) r\d+", s))
        for _, s in rows
    )
    print(
        f"OK: {len(rows)} ledger rows, {n_claims} driver claims, "
        f"all backed by CORRECTNESS evidence"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())

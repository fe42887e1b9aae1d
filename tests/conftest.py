"""Shared pytest fixtures: one local SparkSession per test session."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from lingo_db_spark.session import build_session  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"   # smoke scale for unit tests
SF_DIR_MID = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = build_session("pytest", master="local[4]", shuffle_partitions=4)
    yield s


def explain_str(df, mode: str = "formatted") -> str:
    """Capture df.explain() output (Spark 4: no public explainString)."""
    import contextlib
    import io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()

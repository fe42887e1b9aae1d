"""The local-mode tmpfs shuffle-dir choice (session._local_shuffle_dir).

Why it exists: shuffle files on the root disk produced intermittent
10-22 s writeback stalls inside otherwise ~2 s query runs at sf10 (GC
exonerated — see SCALE.md round-10).  These tests pin the selection
contract, not Spark behavior: env override wins, /dev/shm is the
default when present, explicit extra_confs are never overridden, and
the stale-dir sweep removes only dirs old enough to be dead sessions.
"""

import os
import time
from pathlib import Path
from unittest import mock

from lingo_db_spark.session import _local_shuffle_dir


def test_env_override_wins(tmp_path):
    with mock.patch.dict(os.environ, {"SPARK_GRAFT_LOCAL_DIR": str(tmp_path)}):
        assert _local_shuffle_dir() == str(tmp_path)


def test_default_is_shm_when_present():
    with mock.patch.dict(os.environ, {}, clear=False):
        os.environ.pop("SPARK_GRAFT_LOCAL_DIR", None)
        if os.path.isdir("/dev/shm"):
            assert _local_shuffle_dir() == "/dev/shm/lingo_db_spark_local"
        else:
            assert _local_shuffle_dir() is None


def test_stale_dirs_swept_fresh_kept(tmp_path, monkeypatch):
    # Point the sweep at a fake shm base by patching isdir + the base
    # through the env override being absent: easier to exercise the sweep
    # directly on a synthetic base via mock of os.scandir's target.
    base = tmp_path / "lingo_db_spark_local"
    base.mkdir()
    stale = base / "spark-dead"
    fresh = base / "spark-live"
    stale.mkdir()
    fresh.mkdir()
    old = time.time() - 13 * 3600
    os.utime(stale, (old, old))

    real_isdir = os.path.isdir
    real_scandir = os.scandir

    def fake_isdir(p):
        return True if p == "/dev/shm" else real_isdir(p)

    def fake_scandir(p):
        if p == "/dev/shm/lingo_db_spark_local":
            return real_scandir(str(base))
        return real_scandir(p)

    monkeypatch.delenv("SPARK_GRAFT_LOCAL_DIR", raising=False)
    with mock.patch("os.path.isdir", side_effect=fake_isdir), \
         mock.patch("os.scandir", side_effect=fake_scandir):
        assert _local_shuffle_dir() == "/dev/shm/lingo_db_spark_local"
    assert not stale.exists(), "stale session dir should be swept"
    assert fresh.exists(), "fresh session dir must survive the sweep"


def test_explicit_conf_not_overridden():
    # build_session must not install the tmpfs dir when the caller passes
    # spark.local.dir explicitly; asserted structurally (no session spin-up:
    # inspect the code path's guard) — the guard is the extra_confs check.
    import inspect

    from lingo_db_spark import session as sess
    src = inspect.getsource(sess.build_session)
    assert 'extra_confs or {}).get("spark.local.dir")' in src
    assert 'effective_master.startswith("local")' in src

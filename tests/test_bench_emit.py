"""bench.py stdout-emission contract: the single JSON line must survive
the driver's 2000-char TAIL capture no matter how many headline queries
exist (BENCH_r08 was lost to head-truncation; the shed ladder is the
guard)."""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import shed_to_budget  # noqa: E402


def _payload(n_queries: int) -> dict:
    qs = {f"suite_query_with_a_long_name_{i:04d}": round(0.1 * i, 3)
          for i in range(n_queries)}
    return {
        "metric": "sum_of_per_query_median_wall_sec",
        "value": 38.97,
        "unit": "sec",
        "queries": qs,
        "duckdb_ref": dict(qs),
        "spark_over_duckdb_ratio": {k: 9.9 for k in qs},
        "sf": 0.1, "warmup": 1, "runs": 3, "cpus": 32, "host_quiet": True,
    }


def test_small_payload_keeps_everything():
    line = shed_to_budget(_payload(5), "/tmp/ev.json")
    got = json.loads(line)
    assert "duckdb_ref" in got and "queries" in got
    assert len(line) <= 1900


def test_medium_payload_sheds_side_dicts_first():
    line = shed_to_budget(_payload(30), "/tmp/ev.json")
    got = json.loads(line)
    assert "queries" in got              # queries survive as long as possible
    assert "duckdb_ref" not in got
    assert len(line) <= 1900


def test_oversized_queries_dict_falls_back_to_pointer():
    # ~50 chars per entry -> 60 queries alone exceed the budget
    line = shed_to_budget(_payload(60), "/tmp/ev.json")
    got = json.loads(line)
    assert len(line) <= 1900
    # headline number always parses; the per-query map rides the file
    assert got["value"] == 38.97
    assert got["host_quiet"] is True
    assert got.get("queries_in") == "/tmp/ev.json"
    assert "queries" not in got


def test_monster_payload_still_fits():
    line = shed_to_budget(_payload(500), "/tmp/ev.json")
    assert len(line) <= 1900
    assert json.loads(line)["metric"] == "sum_of_per_query_median_wall_sec"


def test_contaminated_run_never_clobbers_quiet_evidence(tmp_path):
    """VERDICT r11 missing #2: a host_quiet=false run silently replaced
    the committed quiet-host bench_evidence.json.  The guard diverts
    non-quiet runs to a .contaminated.json side file whenever the
    canonical file holds a quiet record, and lets quiet runs (or runs
    over non-quiet/unreadable priors) write through."""
    import json
    from bench import _evidence_path

    ev = tmp_path / "bench_evidence.json"
    side = str(tmp_path / "bench_evidence.contaminated.json")
    # no prior file: anyone writes through
    assert _evidence_path(str(ev), host_quiet=False) == str(ev)
    # quiet prior + contaminated run: divert
    ev.write_text(json.dumps({"host_quiet": True, "value": 45.4}))
    assert _evidence_path(str(ev), host_quiet=False) == side
    # quiet prior + quiet run: write through
    assert _evidence_path(str(ev), host_quiet=True) == str(ev)
    # non-quiet prior: replace freely
    ev.write_text(json.dumps({"host_quiet": False}))
    assert _evidence_path(str(ev), host_quiet=False) == str(ev)
    # unreadable prior: replace
    ev.write_text("{not json")
    assert _evidence_path(str(ev), host_quiet=False) == str(ev)


def test_quiet_rerun_diverts_from_committed_record(tmp_path, monkeypatch):
    """VERDICT r12 item 8: a quiet re-run over a git-COMMITTED quiet
    record diverts to .fresh.json (the committed record only changes by
    explicit BENCH_EVIDENCE_CANONICAL=1 refresh + commit); outside a
    git repo, or with the file untracked/dirty, quiet runs still write
    through."""
    import json
    import subprocess as sp

    from bench import _evidence_path

    ev = tmp_path / "bench_evidence.json"
    ev.write_text(json.dumps({"host_quiet": True, "value": 1.0}))
    # tmp_path is not a git repo: write through (back-compat)
    assert _evidence_path(str(ev), host_quiet=True) == str(ev)
    # make it a repo with the file committed: divert
    sp.run(["git", "init", "-q"], cwd=tmp_path, check=True)
    sp.run(["git", "add", "bench_evidence.json"], cwd=tmp_path, check=True)
    sp.run(["git", "-c", "user.email=t@t", "-c", "user.name=t",
            "commit", "-qm", "x"], cwd=tmp_path, check=True)
    assert _evidence_path(str(ev), host_quiet=True) == \
        str(tmp_path / "bench_evidence.fresh.json")
    # explicit refresh env: write through
    monkeypatch.setenv("BENCH_EVIDENCE_CANONICAL", "1")
    assert _evidence_path(str(ev), host_quiet=True) == str(ev)
    monkeypatch.delenv("BENCH_EVIDENCE_CANONICAL")
    # dirty working copy: write through (it's already uncommitted)
    ev.write_text(json.dumps({"host_quiet": True, "value": 2.0}))
    assert _evidence_path(str(ev), host_quiet=True) == str(ev)

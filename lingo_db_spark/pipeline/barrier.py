"""Expression barriers: recompute-safe materialization points.

Why this exists: Catalyst inlines any upstream alias referenced inside a
higher-order-function lambda BODY straight through projection boundaries
and exchanges, and the inlined expression then re-evaluates PER ARRAY
ELEMENT (no CSE through lambda references).  For the pipeline operators
that tokenize once and then slice the token array per window/chunk/bigram
position, that turns an O(n) pass into O(n * k) re-tokenizations —
measured 7x on shingling and 30x on winnowing at sf0.1.  Only a
materialization the optimizer cannot see through blocks the inlining; a
plain projection or repartition does not.

Two materializations qualify, with different cluster-failure semantics:

- ``persist(MEMORY_AND_DISK)`` (the DEFAULT): the downstream plan reads
  an InMemoryRelation, so the lambda slices cached column values — and
  the full LINEAGE IS KEPT, so losing an executor (spot kill,
  dynamic-allocation downscale) just recomputes the lost partitions.
  This is the strategy that survives a 1000-executor run on
  preemptible nodes.  Lazy: no job runs until the caller's first
  action, so the pipeline functions stay composable plan builders.
- ``localCheckpoint()`` (opt-in via conf): cuts lineage and stores
  blocks NON-REPLICATED on executors — slightly cheaper locally (no
  CacheManager plan matching, blocks reclaimed by the ContextCleaner
  when the RDD is GC'd), but an executor loss makes the RDD
  unrecoverable and FAILS THE JOB, and it runs a job eagerly at
  plan-construction time.  Single-host profile only.

Select with ``spark.conf.set("spark.lingo_db_spark.barrier",
"localCheckpoint")``; anything else (including unset) means persist.

NOT a substitute for the eager localCheckpoints in ``sources``/
``sqlfront``: those cut a read-from-files dependency BEFORE the same
files are overwritten (INSERT ... SELECT FROM self).  A persisted frame
would recompute from the already-overwritten files on cache eviction —
semantically wrong, not just slow.  Lineage truncation is the point
there; use ``truncate_lineage`` for those shapes.

Cache hygiene: persisted barrier frames are plan-keyed CacheManager
entries that outlive the query unless released.  Barriers are tracked
in a bounded FIFO; past the cap the oldest is unpersisted (by then it
has been consumed — and unpersisting a live one is a recompute, never
a wrong answer).  ``release_barriers()`` drops them all eagerly.
"""

from __future__ import annotations

import collections

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

BARRIER_CONF = "spark.lingo_db_spark.barrier"

# Bounded FIFO of persisted barrier frames (cache-entry hygiene — see
# module docstring).  48 >> the barrier count of any single query (the
# deepest composition, the training-mix journey, creates ~8).
_MAX_TRACKED = 48
_TRACKED: collections.deque[DataFrame] = collections.deque()


def _strategy(df: DataFrame) -> str:
    try:
        return df.sparkSession.conf.get(BARRIER_CONF, "persist")
    except Exception:  # noqa: BLE001 — conf access must never kill a plan
        return "persist"


def barrier(df: DataFrame, *, eager: bool = False) -> DataFrame:
    """Materialization point that blocks Catalyst's lambda-body alias
    inlining (see module docstring for why projections don't).

    Default strategy keeps lineage (persist MEMORY_AND_DISK) so the
    result is recomputable after executor loss; ``localCheckpoint`` is
    an opt-in local fast path via the ``spark.lingo_db_spark.barrier``
    conf.  ``eager=True`` materializes now — callers that unpersist
    UPSTREAM frames right after (exact_substring_spans releases its
    corpus-sized gram cache once the candidate-sized frame is built)
    need the blocks populated before the release."""
    if _strategy(df) == "localCheckpoint":
        # always eager: non-replicated blocks + truncated lineage mean a
        # lazy variant would silently depend on upstream frames the
        # caller is about to unpersist.
        return df.localCheckpoint(eager=True)
    out = df.persist(StorageLevel.MEMORY_AND_DISK)
    _TRACKED.append(out)
    while len(_TRACKED) > _MAX_TRACKED:
        old = _TRACKED.popleft()
        try:
            old.unpersist(blocking=False)
        except Exception:  # noqa: BLE001 — session may be gone
            pass
    if eager:
        out.count()
    return out


def release_barriers() -> int:
    """Unpersist every tracked barrier frame (bench/test hygiene between
    measured runs).  Returns the number released."""
    n = 0
    while _TRACKED:
        try:
            _TRACKED.popleft().unpersist(blocking=False)
            n += 1
        except Exception:  # noqa: BLE001
            pass
    return n


def truncate_lineage(df: DataFrame, *, eager: bool = True) -> DataFrame:
    """Lineage CUT for iterative loops (label propagation, BFS, k-means):
    plan depth must stay O(1) across rounds, which persist alone
    guarantees only while the cache entry lives.  Reliable
    ``checkpoint()`` when the session has a checkpoint dir (the
    cluster-grade path: blocks on HDFS survive executor loss);
    ``localCheckpoint`` otherwise (single-host profile, where executor
    loss == driver loss anyway)."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)

"""The expression barrier (pipeline.barrier): pins that BOTH strategies
block Catalyst's lambda-body alias inlining, that the default strategy
keeps lineage (recompute-safe), and that winnowing's tail-slice guard
holds in xxhash64 mode (where null-propagation does NOT drop partial
grams — ADVICE r9)."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import explain_str
from lingo_db_spark.pipeline import BARRIER_CONF, barrier
from lingo_db_spark.pipeline.text import tokens


def _downstream(toked):
    """A per-window lambda that slices the upstream token alias — the
    exact shape that triggers per-element re-evaluation when the alias
    is inlined."""
    n = F.size("__t")
    return toked.select(
        F.explode(F.transform(
            F.sequence(F.lit(1), F.greatest(n - 2, F.lit(0))),
            lambda i: F.array_join(F.slice("__t", i, 3), " "))).alias("g"))


def _docs(spark):
    rows = [(i, f"alpha beta gamma delta epsilon zeta token{i}")
            for i in range(20)]
    return spark.createDataFrame(rows, "id int, text string")


def test_no_barrier_inlines_tokenization(spark):
    """Control: without a barrier the optimizer inlines the regexp
    tokenization into the downstream plan (the trap is real and still
    exists in this Spark version — if this ever starts passing with a
    plain projection, the barriers can be retired)."""
    toked = _docs(spark).select("id", tokens("text").alias("__t"))
    plan = explain_str(_downstream(toked), "extended")
    assert "regexp_replace" in plan


def test_barrier_blocks_inlining_both_strategies(spark):
    df = _docs(spark)
    expected = _downstream(
        df.select("id", tokens("text").alias("__t"))).collect()
    for strategy in ("persist", "localCheckpoint"):
        spark.conf.set(BARRIER_CONF, strategy)
        try:
            toked = barrier(df.select("id", tokens("text").alias("__t")))
            out = _downstream(toked)
            # The plan DOWNSTREAM of the barrier must not contain the
            # tokenization expression: it reads the materialized array
            # (InMemoryTableScan / ExistingRDD scan).  explain prints
            # the cached child INSIDE the InMemoryRelation node, so
            # split at the boundary and inspect only what's above it.
            plan = explain_str(out, "extended")
            opt = plan.split("== Optimized Logical Plan ==")[-1] \
                      .split("== Physical Plan ==")[0]
            boundary = ("InMemoryRelation" if strategy == "persist"
                        else "LogicalRDD")
            assert boundary in opt, (strategy, plan)
            downstream = opt.split(boundary)[0]
            assert "regexp_replace" not in downstream, (strategy, plan)
            assert sorted(map(tuple, out.collect())) == \
                sorted(map(tuple, expected)), strategy
            toked.unpersist()
        finally:
            spark.conf.unset(BARRIER_CONF)


def test_barrier_survives_block_loss_via_recompute(spark):
    """The recompute-safety claim, BEHAVIORALLY: materialize a barriered
    frame, then drop its cached blocks (unpersist == every executor's
    copy lost — the local-mode stand-in for a spot kill), then consume
    the downstream plan.  The default strategy must produce the same,
    correct result by recomputing from lineage — not fail, not go
    silently wrong.  (localCheckpoint cannot pass this by construction:
    its lineage is cut, which is exactly why it is the opt-in local
    fast path and not the default.)

    Also pins end-to-end on a real operator: winnow_fingerprints'
    internal barriers are released mid-flight (release_barriers) and a
    fresh collect must match the pre-loss result."""
    from lingo_db_spark.pipeline import release_barriers
    from lingo_db_spark.pipeline.dedup import winnow_fingerprints

    df = _docs(spark)
    toked = barrier(df.select("id", tokens("text").alias("__t")))
    out = _downstream(toked)
    before = sorted(map(tuple, out.collect()))     # blocks populated
    toked.unpersist(blocking=True)                 # ...and lost
    after = sorted(map(tuple, out.collect()))      # must recompute
    assert after == before

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta eta theta " * 3
          + f"tail{i}") for i in range(10)], "id int, text string")
    fps = winnow_fingerprints(docs, "id", "text")
    before = sorted((r.id, r.fp) for r in fps.collect())
    release_barriers()                             # every barrier dropped
    after = sorted((r.id, r.fp) for r in fps.collect())
    assert after == before


def test_default_barrier_keeps_lineage_and_is_lazy(spark):
    """Recompute-safety proxy: the default strategy persists WITHOUT
    cutting lineage — the analyzed plan still carries the file/LocalRelation
    source (an executor loss recomputes from it), unlike localCheckpoint
    whose plan bottoms out at an ExistingRDD with no lineage."""
    df = _docs(spark).select("id", tokens("text").alias("__t"))
    b = barrier(df)
    plan = explain_str(b, "extended")
    analyzed = plan.split("== Analyzed Logical Plan ==")[-1] \
                   .split("== Optimized")[0]
    # lineage intact: the tokenization expression is still in the plan
    # (an executor loss recomputes the lost partitions from it)
    assert "regexp_replace" in analyzed
    b.unpersist()
    lc = df.localCheckpoint()
    lc_plan = explain_str(lc, "extended")
    lc_analyzed = lc_plan.split("== Analyzed Logical Plan ==")[-1] \
                         .split("== Optimized")[0]
    assert "regexp_replace" not in lc_analyzed  # lineage gone — contrast


def test_winnow_tail_guard_fingerprint_counts(spark):
    """xxhash64 ignores NULL arguments, so winnowing's gram chain holds
    PARTIAL-gram hashes past position n-k+1 in xxhash64 mode; only the
    explicit slice drops them.  Pin that both hash modes select
    fingerprints from the same number of gram positions by checking the
    DISTINCT-position invariant: every doc with n tokens and window w,
    k=3 has fingerprints drawn from exactly n-k+1 grams, so a doc with
    n < k + w - 1 tokens yields NO fingerprints in either mode."""
    from lingo_db_spark.pipeline.dedup import winnow_fingerprints
    rows = [
        (1, "a b c d e f g h i j"),          # 10 tokens — plenty
        (2, "a b c d e"),                    # 5 tokens: grams=3 < w=4 -> none
        (3, "one two three"),                # 3 tokens: grams=1 -> none
    ]
    df = spark.createDataFrame(rows, "id int, text string")
    for mode in ("md5", "xxhash64"):
        fps = winnow_fingerprints(df, "id", "text", shingle_k=3, window=4,
                                  hash_fn=mode)
        per_doc = dict(fps.groupBy("id").count().collect())
        assert set(per_doc) == {1}, mode     # docs 2 and 3 drop entirely
        # 10 tokens -> 8 grams -> 5 windows -> <= 5 distinct fingerprints,
        # >= 1; a tail of partial grams would add windows beyond 5.
        assert 1 <= per_doc[1] <= 5, (mode, per_doc)

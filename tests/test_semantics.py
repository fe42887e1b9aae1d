"""Operator-semantics corner cases, ported from the reference's
sqllogictest fixtures (test/sqlite-small/{groupby,join,setops}.test and
the three-valued-logic corners listed in SURVEY.md §7 / FIXTURES.md §C).

Small literal DataFrames, exact expected outputs — the pytest analogue of
the reference's `query ... rowsort` blocks.
"""

from __future__ import annotations

from pyspark.sql import Row, Window
from pyspark.sql import functions as F


def _key(t):
    return tuple((v is None, repr(v)) for v in t)


def srt(tuples):
    return sorted(tuples, key=_key)


def rows(df, *cols):
    """Collect to a sorted list of tuples for order-insensitive compare
    (None-safe sort key)."""
    picked = df.select(*cols) if cols else df
    return srt(tuple(r) for r in picked.collect())


# ---------------------------------------------------------------------------
# NULL group keys from outer joins (reference groupby.test:1-5)
# ---------------------------------------------------------------------------

def test_outer_join_null_group_keys(spark):
    # (values(1),(2)) s(x) LEFT JOIN (values(1)) t(y) ON x=y, GROUP BY y:
    # the unmatched row contributes a NULL group.
    s = spark.createDataFrame([(1,), (2,)], "x INT")
    t = spark.createDataFrame([(1,)], "y INT")
    g = (s.join(t, s.x == t.y, "left")
         .groupBy("y").agg(F.count(F.lit(1)).alias("n")))
    assert rows(g) == srt([(None, 1), (1, 1)])


def test_outer_join_count_col_vs_count_star(spark):
    # COUNT(col) skips NULLs from the null-extension; COUNT(*) does not
    # (reference sql_analyzer.cpp:2669-2672).
    cust = spark.createDataFrame([(1, "a"), (2, "b")], "ck INT, name STRING")
    orders = spark.createDataFrame([(10, 1)], "ok INT, ck INT")
    j = cust.join(orders, cust.ck == orders.ck, "left")
    agg = j.groupBy(cust.ck).agg(
        F.count("ok").alias("n_col"), F.count(F.lit(1)).alias("n_star"))
    assert rows(agg) == [(1, 1, 1), (2, 0, 1)]


def test_groupby_all_rows_on_empty_input(spark):
    # Scalar aggregate over empty input: COUNT -> 0, SUM -> NULL.
    e = spark.createDataFrame([], "x INT")
    out = e.agg(F.count("x").alias("c"), F.sum("x").alias("s")).collect()[0]
    assert (out.c, out.s) == (0, None)
    # ...but a grouped aggregate over empty input produces zero groups.
    assert e.groupBy("x").count().count() == 0


# ---------------------------------------------------------------------------
# Three-valued logic / NOT IN with NULLs (markjoin, RelAlgOps.td:380-391)
# ---------------------------------------------------------------------------

def test_null_equals_null_is_null(spark):
    df = spark.createDataFrame([Row(a=None, b=None)], "a INT, b INT")
    out = df.select(
        (F.col("a") == F.col("b")).alias("eq"),
        F.col("a").eqNullSafe(F.col("b")).alias("nseq")).collect()[0]
    assert out.eq is None          # NULL = NULL -> NULL
    assert out.nseq is True        # NULL <=> NULL -> TRUE (db.compare isa)


def test_three_valued_and_or(spark):
    df = spark.createDataFrame([Row(x=None)], "x BOOLEAN")
    out = df.select(
        (F.col("x") & F.lit(False)).alias("and_false"),
        (F.col("x") & F.lit(True)).alias("and_true"),
        (F.col("x") | F.lit(True)).alias("or_true"),
        (F.col("x") | F.lit(False)).alias("or_false")).collect()[0]
    # Kleene logic: NULL AND FALSE = FALSE, NULL OR TRUE = TRUE,
    # the other two stay NULL.
    assert out.and_false is False
    assert out.and_true is None
    assert out.or_true is True
    assert out.or_false is None


def test_not_in_with_null_is_empty(spark, tmp_path):
    # x NOT IN (subquery containing NULL) never evaluates TRUE -> 0 rows.
    spark.createDataFrame([(1,), (2,), (3,)], "x INT") \
        .createOrReplaceTempView("probe_t")
    spark.createDataFrame([(1, None), (2, 99)], "k INT, v INT") \
        .createOrReplaceTempView("sub_t")
    out = spark.sql("SELECT x FROM probe_t WHERE x NOT IN (SELECT v FROM sub_t)")
    assert out.count() == 0
    # Without the NULL the anti-join behaves normally.
    out2 = spark.sql(
        "SELECT x FROM probe_t WHERE x NOT IN (SELECT v FROM sub_t WHERE v IS NOT NULL)")
    assert rows(out2) == [(1,), (2,), (3,)]


def test_in_with_null_probe(spark):
    # NULL IN (...) -> NULL, filtered out; NULL NOT IN (...) also NULL.
    spark.createDataFrame([(None,), (2,)], "x INT") \
        .createOrReplaceTempView("probe_n")
    spark.createDataFrame([(2,), (3,)], "v INT").createOrReplaceTempView("sub_n")
    assert rows(spark.sql(
        "SELECT x FROM probe_n WHERE x IN (SELECT v FROM sub_n)")) == [(2,)]
    assert rows(spark.sql(
        "SELECT x FROM probe_n WHERE x NOT IN (SELECT v FROM sub_n)")) == []


def test_nullsafe_join_keys(spark):
    # <=> join keys: NULLs pair up (exactly one NULL key each side).
    a = spark.createDataFrame([(1, 10), (None, 11)], "k INT, av INT")
    b = spark.createDataFrame([(1, 20), (None, 21)], "k INT, bv INT")
    j = a.join(b, a.k.eqNullSafe(b.k)).select("av", "bv")
    assert rows(j) == [(10, 20), (11, 21)]


# ---------------------------------------------------------------------------
# Set-operation duplicate semantics (reference setops.test)
# ---------------------------------------------------------------------------

def _dups(spark):
    # dups: (1),(1),(2),(2),(3),(3)  — reference groupby.test:14-17
    left = spark.createDataFrame([(1,), (1,), (2,), (2,), (3,), (3,)], "i INT")
    right = spark.createDataFrame([(1,), (2,), (4,)], "i INT")
    return left, right


def test_union_all_keeps_duplicates(spark):
    left, right = _dups(spark)
    assert left.unionAll(right).count() == 9


def test_union_distinct_collapses(spark):
    left, right = _dups(spark)
    assert rows(left.union(right).distinct()) == [(1,), (2,), (3,), (4,)]


def test_intersect_all_multiset_min(spark):
    left, right = _dups(spark)
    # min(count_l, count_r): 1->min(2,1)=1, 2->1, 3->0, 4->0
    assert rows(left.intersectAll(right)) == [(1,), (2,)]


def test_intersect_distinct(spark):
    left, right = _dups(spark)
    assert rows(left.intersect(right)) == [(1,), (2,)]


def test_except_all_multiset_difference(spark):
    left, right = _dups(spark)
    # count_l - count_r: 1->1, 2->1, 3->2
    assert rows(left.exceptAll(right)) == [(1,), (2,), (3,), (3,)]


def test_except_distinct(spark):
    left, right = _dups(spark)
    assert rows(left.subtract(right)) == [(3,)]


# ---------------------------------------------------------------------------
# Distinct aggregates (RelAlgToSubOp.cpp:2561-2676)
# ---------------------------------------------------------------------------

def test_distinct_aggregate_vs_plain(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("a", 2), ("b", 5)], "g STRING, v INT")
    out = df.groupBy("g").agg(
        F.countDistinct("v").alias("nd"),
        F.count("v").alias("n"),
        F.sum_distinct(F.col("v")).alias("sd"),
        F.sum("v").alias("s"))
    assert rows(out) == [("a", 2, 3, 3, 4), ("b", 1, 1, 5, 5)]


def test_count_distinct_ignores_nulls(spark):
    df = spark.createDataFrame([(1,), (1,), (None,)], "v INT")
    out = df.agg(F.countDistinct("v").alias("nd"),
                 F.count("v").alias("n"),
                 F.count(F.lit(1)).alias("star")).collect()[0]
    assert (out.nd, out.n, out.star) == (1, 2, 3)


# ---------------------------------------------------------------------------
# Window defaults (sql_analyzer.cpp:2426-2435) on literal frames
# ---------------------------------------------------------------------------

def test_window_default_frame_includes_peers(spark):
    # ORDER BY with ties: default RANGE frame sums all peers.
    df = spark.createDataFrame(
        [("g", 1, 10), ("g", 1, 20), ("g", 2, 5)], "g STRING, o INT, v INT")
    w = Window.partitionBy("g").orderBy("o")
    out = {(r.o, r.v): r.s for r in
           df.select("o", "v", F.sum("v").over(w).alias("s")).collect()}
    assert out[(1, 10)] == 30 and out[(1, 20)] == 30 and out[(2, 5)] == 35


def test_window_whole_partition_without_order(spark):
    df = spark.createDataFrame([("g", 1), ("g", 2), ("h", 9)], "g STRING, v INT")
    w = Window.partitionBy("g")
    out = {(r.g, r.v): r.s for r in
           df.select("g", "v", F.sum("v").over(w).alias("s")).collect()}
    assert out[("g", 1)] == 3 and out[("g", 2)] == 3 and out[("h", 9)] == 9


def test_rank_vs_row_number_on_ties(spark):
    df = spark.createDataFrame(
        [("g", 10), ("g", 10), ("g", 5)], "g STRING, v INT")
    w = Window.partitionBy("g").orderBy(F.desc("v"))
    out = df.select("v", F.rank().over(w).alias("rk"),
                    F.row_number().over(w).alias("rn"))
    got = sorted((r.v, r.rk) for r in out.collect())
    assert got == [(5, 3), (10, 1), (10, 1)]           # rank has a gap
    assert sorted(r.rn for r in out.collect()) == [1, 2, 3]  # row_number doesn't


# ---------------------------------------------------------------------------
# Rollup null-vs-subtotal disambiguation
# ---------------------------------------------------------------------------

def test_rollup_grouping_flags(spark):
    df = spark.createDataFrame([(None, 1), ("x", 2)], "k STRING, v INT")
    out = (df.rollup("k")
           .agg(F.sum("v").alias("s"), F.grouping("k").alias("g")))
    got = rows(out)
    # (NULL data group, s=1, g=0), (x, 2, 0), (subtotal NULL, 3, 1):
    # GROUPING() is what tells the NULL key from the subtotal row.
    assert got == srt([(None, 1, 0), (None, 3, 1), ("x", 2, 0)])


def test_reduce_groupby_keys_equals_full_grouping(spark):
    """grouped_by_key (ReduceGroupByKeys rewrite) returns exactly what
    grouping on pk+dependents would — dependents are single-valued per
    pk, re-attached via first/any."""
    import pyspark.sql.functions as F
    from conftest import SF_DIR
    from lingo_db_spark.catalog import load_table
    from lingo_db_spark.operators.groupby_reduce import grouped_by_key
    cust = load_table(spark, SF_DIR, "customer")
    reduced = {tuple(r) for r in grouped_by_key(
        cust, pk=["c_custkey"], dependents=["c_name", "c_mktsegment"],
        aggs={"bal": F.round(F.sum("c_acctbal"), 4)}).collect()}
    full = {tuple(r) for r in cust
            .groupBy("c_custkey", "c_name", "c_mktsegment")
            .agg(F.round(F.sum("c_acctbal"), 4).alias("bal")).collect()}
    assert reduced == full

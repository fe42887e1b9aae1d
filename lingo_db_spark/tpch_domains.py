"""Deterministic mappings from the synthetic testdata key space onto the
real TPC-H value domains (dbgen's word lists), as PORTABLE SQL — the
same CASE/concat text runs on Spark and DuckDB.

Purpose: the reference ships its benchmark queries verbatim
(resources/sql/tpch/1.sql..22.sql, cited per query in tests/test_ddl.py)
and those queries filter on dbgen literals ('GERMANY', 'PROMO%',
'MED BOX', phone country codes...).  The synthetic parquet uses
placeholder domains (NATION_7, single-word p_type), so a verbatim run
would compare empty results.  Mapping each key deterministically onto
the dbgen domain makes the verbatim queries row-bearing while both
engines still see byte-identical inputs — the mapping cancels out of
any Spark-vs-DuckDB comparison.

Lists follow dbgen's dists.dss (public TPC-H specification appendix):
nations/regions in nationkey order, type/container segments, and a
color subset for p_name that includes the literals q9 ('%green%') and
q20 ('forest%') grep for.
"""

from __future__ import annotations

NATIONS = [
    "ALGERIA", "ARGENTINA", "BRAZIL", "CANADA", "EGYPT",
    "ETHIOPIA", "FRANCE", "GERMANY", "INDIA", "INDONESIA",
    "IRAN", "IRAQ", "JAPAN", "JORDAN", "KENYA",
    "MOROCCO", "MOZAMBIQUE", "PERU", "CHINA", "ROMANIA",
    "SAUDI ARABIA", "VIETNAM", "RUSSIA", "UNITED KINGDOM",
    "UNITED STATES",
]

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]

# dbgen's real nation -> region assignment (nationkey order), so the
# region-literal queries (q5 ASIA, q2 EUROPE, q8 AMERICA) select the
# geography the benchmark intends.
NATION_REGION = [0, 1, 1, 1, 4, 0, 3, 3, 2, 2, 4, 4, 2, 4, 0,
                 0, 0, 1, 2, 3, 4, 2, 3, 3, 1]

# the synthetic supplier table covers only 10 of the 25 nations and
# misses every nation the verbatim queries name; exports remap
# s_nationkey onto a fixed 10-nation set that covers all 5 regions and
# every supplier-side literal: FRANCE+GERMANY (tpch q7), GERMANY (q11),
# BRAZIL (q8), CANADA (q20), SAUDI ARABIA (q21), UNITED KINGDOM (ssb
# q3.3/q3.4 city filters), UNITED STATES (ssb q3.2/q4.3), plus IRAN,
# MOROCCO, CHINA for spread.
SUPPLIER_NATIONS = [6, 7, 2, 3, 20, 10, 15, 23, 24, 18]

TYPE_2 = ["ANODIZED", "BURNISHED", "PLATED", "POLISHED", "BRUSHED"]
TYPE_3 = ["TIN", "NICKEL", "BRASS", "STEEL", "COPPER"]

CONTAINER_1 = ["SM", "LG", "MED", "JUMBO", "WRAP"]
CONTAINER_2 = ["CASE", "BOX", "BAG", "JAR", "PKG", "PACK", "CAN", "DRUM"]

COLORS = ["almond", "antique", "azure", "blush", "chiffon", "forest",
          "green", "honeydew", "ivory", "lavender", "metallic", "navy"]

SHIP_MODES = ["REG AIR", "AIR", "RAIL", "SHIP", "TRUCK", "MAIL", "FOB"]
SHIP_INSTRUCT = ["DELIVER IN PERSON", "COLLECT COD", "NONE",
                 "TAKE BACK RETURN"]


def case_map(key_expr: str, values: list[str]) -> str:
    """`CASE (key) % N WHEN 0 THEN v0 ... END` — runs unchanged on both
    Spark and DuckDB (no array/element_at dialect divergence)."""
    arms = " ".join(f"WHEN {i} THEN '{v}'" for i, v in enumerate(values))
    return f"CASE ({key_expr}) % {len(values)} {arms} END"


def nation_name_sql(key_expr: str = "n_nationkey") -> str:
    return case_map(key_expr, NATIONS)


def nation_region_sql(key_expr: str = "n_nationkey") -> str:
    arms = " ".join(f"WHEN {i} THEN {r}"
                    for i, r in enumerate(NATION_REGION))
    return f"CASE ({key_expr}) % 25 {arms} END"


def supplier_nation_sql(key_expr: str = "s_suppkey") -> str:
    arms = " ".join(f"WHEN {i} THEN {n}"
                    for i, n in enumerate(SUPPLIER_NATIONS))
    return f"CASE ({key_expr}) % {len(SUPPLIER_NATIONS)} {arms} END"


def region_name_sql(key_expr: str = "r_regionkey") -> str:
    return case_map(key_expr, REGIONS)


def part_type_sql(first_word_expr: str = "p_type",
                  key_expr: str = "p_partkey") -> str:
    """dbgen p_type is `<size> <finish> <metal>`; the synthetic p_type
    already holds the size word, the finish/metal words derive from the
    key."""
    t2 = case_map(f"{key_expr} * 3 + 1", TYPE_2)
    # multiplier must be coprime with len(TYPE_3)=5 — `* 5` would pin
    # every part to the same metal word
    t3 = case_map(f"{key_expr} * 7 + 2", TYPE_3)
    return f"({first_word_expr} || ' ' || {t2} || ' ' || {t3})"


def part_container_sql(key_expr: str = "p_partkey") -> str:
    c1 = case_map(f"{key_expr} * 2 + 1", CONTAINER_1)
    c2 = case_map(f"{key_expr} * 3 + 2", CONTAINER_2)
    return f"({c1} || ' ' || {c2})"


def part_name_sql(key_expr: str = "p_partkey") -> str:
    c1 = case_map(key_expr, COLORS)
    c2 = case_map(f"{key_expr} + 5", COLORS)
    return f"({c1} || ' ' || {c2})"


def phone_sql(nation_key_expr: str, seq_expr: str) -> str:
    """dbgen phone: `<10+nationkey>-xxx-xxx-xxxx` — q22's country-code
    substring comes out of the first segment."""
    return (f"(CAST(10 + (({nation_key_expr}) % 25) AS STRING) || '-' || "
            f"LPAD(CAST(({seq_expr}) % 900 + 100 AS STRING), 3, '0') "
            f"|| '-' || "
            f"LPAD(CAST(({seq_expr}) % 871 + 100 AS STRING), 3, '0') "
            f"|| '-' || "
            f"LPAD(CAST(({seq_expr}) % 8933 + 1000 AS STRING), 4, '0'))")


def ship_mode_sql(key_expr: str) -> str:
    return case_map(key_expr, SHIP_MODES)


def ship_instruct_sql(key_expr: str) -> str:
    return case_map(key_expr, SHIP_INSTRUCT)


def lineitem_suppkey_sql(part_expr: str = "l_partkey",
                         pick_expr: str = "l_orderkey") -> str:
    """The dbgen referential invariant (TPC-H spec 4.2.3: every lineitem
    (l_partkey, l_suppkey) pair is one of the part's partsupp rows):
    pick one of the TWO partsupp_sql suppliers of `part_expr` per row,
    alternating on `pick_expr`.  Without this alignment the correlated
    sum in verbatim q20 (sum of the pair's shipped quantity) is NULL for
    nearly every partsupp row and the query dries up at sf >= 0.01."""
    n = "(SELECT COUNT(*) FROM supplier)"
    return (f"(CASE WHEN ({pick_expr}) % 2 = 0 "
            f"THEN ({part_expr}) % {n} "
            f"ELSE (({part_expr}) * 7 + 3) % {n} END)")


def partsupp_sql(part_rel: str = "part") -> str:
    """Derive a 2-suppliers-per-part partsupp relation from `part` —
    portable SQL (works as a Spark temp view and a DuckDB CTE body).
    Two rows per part with distinct costs give q2's min(ps_supplycost)
    correlation something real to choose between; ps_suppkey lands in
    the supplier key range via a scalar-subquery modulus."""
    return f"""
SELECT p_partkey AS ps_partkey,
       p_partkey % (SELECT COUNT(*) FROM supplier) AS ps_suppkey,
       p_size * 10 AS ps_availqty,
       CAST(ROUND(p_retailprice / 2, 2) AS DECIMAL(12,2)) AS ps_supplycost,
       'psc' || CAST(p_partkey AS STRING) AS ps_comment
FROM {part_rel}
UNION ALL
SELECT p_partkey,
       (p_partkey * 7 + 3) % (SELECT COUNT(*) FROM supplier),
       p_size * 5,
       CAST(ROUND(p_retailprice / 3, 2) AS DECIMAL(12,2)),
       'psd' || CAST(p_partkey AS STRING)
FROM {part_rel}
"""


# ---------------------------------------------------------------------------
# SSB (star-schema benchmark) domains — the reference ships the suite in
# resources/sql/ssb/ (13 queries + initialize.sql over a lineorder star)
# ---------------------------------------------------------------------------

def ssb_city_digit_sql(key_expr: str) -> str:
    """City digit mixes in key/10 so nations whose members share a key
    residue class (suppliers get their nation FROM key % 10) still
    spread across all ten cities."""
    return (f"(({key_expr} + CAST(floor(({key_expr}) / 10) AS INTEGER))"
            f" % 10)")


def ssb_city_sql(nation_name_expr: str, key_expr: str) -> str:
    """SSB city = first 9 chars of the nation name + one digit
    ('UNITED KI1')."""
    return (f"(SUBSTR({nation_name_expr} || '         ', 1, 9) || "
            f"CAST({ssb_city_digit_sql(key_expr)} AS STRING))")


def ssb_city_int_sql(nation_int_expr: str, key_expr: str) -> str:
    """ssb_simplified city code = nation * 10 + digit (235 = UNITED
    KINGDOM city 5)."""
    return f"(({nation_int_expr}) * 10 + {ssb_city_digit_sql(key_expr)})"


def ssb_mfgr_sql(key_expr: str = "p_partkey") -> str:
    return f"('MFGR#' || CAST(({key_expr}) % 5 + 1 AS STRING))"


def ssb_category_sql(key_expr: str = "p_partkey") -> str:
    """category digit comes from key/5 so it varies independently of
    the mfgr digit (key%5) — an affine map of the same key would pin
    each mfgr to a single category and 'MFGR#22' would never exist."""
    return (f"({ssb_mfgr_sql(key_expr)} || "
            f"CAST(CAST(({key_expr}) / 5 AS INTEGER) % 5 + 1 AS STRING))")


def ssb_brand1_sql(key_expr: str = "p_partkey") -> str:
    """brand = category + a fixed-width 2-digit 10..49 suffix so the
    string BETWEEN 'MFGR#2221' AND 'MFGR#2228' range behaves.  The
    suffix must cycle ALL 40 values within each category class: with
    the class fixed (key = 25m + r) the suffix is ((s + 25)m + r) % 40,
    so s + 25 must be coprime with 40 — s = 16 gives stride 41 ≡ 1
    (the earlier s = 7 gave stride 32, hitting only 5 of 40 suffixes
    per class and leaving needle brands like q23's 'MFGR#2239'
    unpopulated at small scale factors)."""
    return (f"({ssb_category_sql(key_expr)} || "
            f"CAST((CAST(({key_expr}) / 25 AS INTEGER) * 16 + {key_expr}) "
            f"% 40 + 10 AS STRING))")

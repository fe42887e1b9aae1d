"""Derive a full 24-table TPC-DS star from the driver's synthetic
testdata parquet, for running the reference's verbatim TPC-DS suite
(resources/sql/tpcds/initialize.sql + 103 query variants) through the
engine with DuckDB as the oracle on identical files.

Approach: parse the reference's OWN initialize.sql (ddl.parse_create_table)
so the exported column order/types always match what COPY will load; map
each column by NAME through dbgen-domain rules (TPC-DS specification
appendix word lists — categories, states, demographics strata), falling
back to deterministic type-based synthesis for columns no query filters
on.  Fact tables derive from lineitem x orders (testdata), pure
dimensions (calendar, time-of-day, demographic strata) are generated —
the same split the SSB journey uses.

Both engines read the byte-identical exported files, so these mappings
cancel out of any Spark-vs-DuckDB comparison; their only job is making
the benchmark literals (d_year = 2000, i_category = 'Music',
s_state = 'SD', hd_dep_count = 1 ...) select real rows.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import types as T

REF_DS = Path("/root/reference/resources/sql/tpcds")

# ---------------------------------------------------------------------------
# dbgen-domain word lists (TPC-DS spec appendix / dists.dss)
# ---------------------------------------------------------------------------

CATEGORIES = ["Books", "Children", "Electronics", "Home", "Jewelry",
              "Men", "Music", "Shoes", "Sports", "Women"]
CLASSES = ["accessories", "classical", "fragrances", "pants", "personal",
           "portable", "reference", "self-help", "shirts", "rock",
           "jewelry boxes", "school-uniforms", "decor", "athletic",
           "dresses", "consignment"]
BRANDS = ["amalgimporto #1", "edu packscholar #1", "exportiimporto #1",
          "importoamalg #1", "scholaramalgamalg #14",
          "scholaramalgamalg #7", "scholaramalgamalg #9",
          "exportiunivamalg #9", "amalgamalg #2", "univbrand #6"]
SIZES = ["N/A", "small", "medium", "large", "extra large", "economy",
         "petite"]
UNITS = ["Box", "Bunch", "Carton", "Case", "Dozen", "Dram", "Gram", "Lb",
         "N/A", "Ounce", "Oz", "Pallet", "Pound", "Tbl", "Tsp", "Unknown"]
COLORS = ["almond", "bisque", "blue", "chocolate", "deep", "dim",
          "dodger", "khaki", "lawn", "light", "lime", "metallic",
          "navy", "olive", "rosy", "royal", "smoke", "tan", "white"]
STATES = ["TN", "AL", "SD", "GA", "IN", "WI", "WA", "NE", "NC", "MN",
          "IL", "OK", "OH", "MO", "ME", "KY", "KS", "ID", "FL", "CA",
          "CO", "NM"]
COUNTIES = ["Ziebach County", "Walker County", "Williamson County",
            "Dorchester County", "Hayes County", "Park County",
            "Republic County", "Vermilion County", "Salem County",
            "Union County"]
CITIES = ["Edgewood", "Pleasant Hill", "Five Points", "Midway",
          "Fairview", "Hamilton", "Centerville", "Riverside",
          "Glendale", "Bethel"]
EDUCATION = ["Primary", "Secondary", "College", "2 yr Degree",
             "4 yr Degree", "Advanced Degree", "Unknown"]
MARITAL = ["M", "S", "D", "W", "U"]
CREDIT = ["Low Risk", "High Risk", "Good", "Unknown"]
BUY_POTENTIAL = [">10000", "unknown", "1001-5000", "0-500", "501-1000",
                 "5001-10000"]
STORE_NAMES = ["ought", "able", "ese", "anti", "cally", "ation", "eing",
               "bar", "pri", "see"]
SM_TYPES = ["EXPRESS", "NEXT DAY", "OVERNIGHT", "REGULAR", "TWO DAY",
            "LIBRARY"]
SM_CARRIERS = ["UPS", "FEDEX", "AIRBORNE", "USPS", "DHL", "TBS", "MSC",
               "LATVIAN", "ZHOU", "ALLIANCE"]
MEALS = ["breakfast", "lunch", "dinner", ""]
FIRST_NAMES = ["James", "Mary", "John", "Linda", "Robert", "Susan",
               "Michael", "Karen", "William", "Lisa"]
LAST_NAMES = ["Smith", "Johnson", "Williams", "Brown", "Jones", "Miller",
              "Davis", "Garcia", "Wilson", "Moore"]
SALUTATIONS = ["Mr.", "Mrs.", "Ms.", "Dr.", "Sir", "Miss"]
# a slice of the zip literals q8 enumerates; store + customer_address
# draw from the same pool so zip-prefix joins (q8/q19/q24) intersect
ZIPS = ["47602", "16704", "35863", "28577", "83910", "36201", "58412",
        "48162", "28055", "41419", "80332", "38607", "77817", "24891",
        "16226", "18410", "21231", "59345", "13918", "51089", "20317",
        "17167", "54585", "67881", "78366", "47770", "18360", "51717",
        "73108", "14440", "21800", "89338", "45859", "65501", "34948",
        "25973", "73219", "25333", "17291", "10374"]
COUNTRIES = ["UNITED STATES", "GERMANY", "CHINA", "FRANCE", "CANADA",
             "BRAZIL", "JAPAN", "INDIA", "MEXICO", "ITALY"]

# demographic strata sizes (household_demographics mirrors dbgen's exact
# 20 x 6 x 10 x 6 mixed-radix structure; customer_demographics keeps the
# gender x marital x education core complete)
N_CD = 2 * 5 * 7 * 10 * 4          # 2800
N_HD = 20 * 6 * 10 * 6             # 7200
N_TIME = 86400
N_STORE = 36      # q44 hard-codes ss_store_sk = 29
N_WAREHOUSE = 5
N_PROMO = 300
N_SM = 20
N_REASON = 55
N_IB = 20
N_CC = 6
N_CP = 1000
N_WEB_SITE = 12
N_WP = 60


def _case(key: str, values: list[str]) -> str:
    arms = " ".join(f"WHEN {i} THEN '{v}'" for i, v in enumerate(values))
    return f"CASE ({key}) % {len(values)} {arms} END"


def _sk(date_expr: str) -> str:
    """date -> surrogate key, dbgen-style julian-ish (any consistent
    monotone int works — no query hard-codes sk literals)."""
    return f"(datediff('day', DATE '1900-01-01', {date_expr}) + 2415021)"


# per-row deterministic hash basis for fact rows
_RK = "(l_orderkey * 37 + l_partkey * 11 + l_suppkey * 5)"

# the q41 needle slice of `item` (see specs["item"])
_Q41 = "(p_partkey % 1009 = 41)"

# the q85 needle slice of the web channel facts: q85 demands
# wr_refunded_cdemo = wr_returning_cdemo with a SPECIFIC
# (marital, education) pair, the matching ws_sales_price band on the
# SAME (item, order), a US address in a named state set, and a
# ws_net_profit band — a 5-column conjunction across two fact tables
# that independent residue derivations never align on.  The slice is
# keyed on the row key both channels share, so the ws and wr overrides
# land on the same logical sale.  cd 128 = ('U', 'Advanced Degree')
# [floor(128/2)%5=4, floor(128/10)%7=5]; address 6 = ('GA',
# 'United States') [STATES[floor(6/2)%22]]; 120.50 sits in the
# 100-150 price band and 175.00 inside all three profit bands.
_Q85 = f"(({_RK}) % 211 = 85)"
# +1 year: the synthetic range is 1995-2001 but the DS variants filter
# d_year up to 2002 (q11 year-over-year shapes)
_ODATE = "CAST(o_orderdate + INTERVAL 16 MONTH AS DATE)"
_SDATE = "CAST(l_shipdate + INTERVAL 16 MONTH AS DATE)"
_CUST = "(o_custkey + CASE WHEN o_custkey % 3 = 0 THEN 1 ELSE 0 END)"

# one row per (order, part): the fact PKs are (item_sk, order/ticket
# number), and the synthetic orders can repeat a part within an order
_FACT_SRC = """(
  SELECT l.*, o.*,
         ROW_NUMBER() OVER (PARTITION BY l_orderkey
             ORDER BY l_linenumber, l_partkey, l_suppkey) AS _ln,
         (o_custkey + CASE WHEN o_custkey % 3 = 0 THEN 1 ELSE 0 END) * 4
             + l_orderkey % 3 AS _ticket
  FROM lineitem l JOIN orders o ON l_orderkey = o_orderkey
  WHERE 1 = 1{filter}
  QUALIFY ROW_NUMBER() OVER (PARTITION BY _ticket, l_partkey
      ORDER BY l_orderkey, l_linenumber, l_suppkey) = 1)"""


def _sales_rules(pfx: str) -> dict[str, str]:
    """Measure/dimension-key rules shared by the three sales channels
    (column names differ only in prefix)."""
    return {
        f"{pfx}_sold_date_sk": _sk(_ODATE),
        f"{pfx}_sold_time_sk": f"{_RK} % {N_TIME}",
        f"{pfx}_ship_date_sk":
            f"{_sk(_SDATE)} + ({_RK}) % 30",
        f"{pfx}_item_sk": "l_partkey",
        f"{pfx}_quantity": "CAST(l_quantity AS INTEGER)",
        f"{pfx}_wholesale_cost":
            f"ROUND(({_RK}) % 100 + 1 + (({_RK}) % 2) * 0.5, 2)",
        f"{pfx}_list_price": f"ROUND(({_RK}) % 290 + 1.5, 2)",
        f"{pfx}_sales_price":
            f"ROUND(({_RK}) % 200 + (({_RK}) % 3) * 0.5, 2)",
        f"{pfx}_ext_discount_amt":
            "CAST(ROUND(l_extendedprice * l_discount, 2) % 10000 "
            "AS DECIMAL(7,2))",
        f"{pfx}_ext_sales_price":
            "CAST(ROUND(l_extendedprice * (1 - l_discount), 2) % 10000 "
            "AS DECIMAL(7,2))",
        f"{pfx}_ext_wholesale_cost":
            f"ROUND((({_RK}) % 100 + 1) * l_quantity, 2) % 10000",
        f"{pfx}_ext_list_price":
            f"ROUND((({_RK}) % 290 + 1.5) * l_quantity, 2) % 10000",
        f"{pfx}_ext_tax": "CAST(ROUND(l_extendedprice * l_tax, 2) % 1000 "
                          "AS DECIMAL(7,2))",
        f"{pfx}_coupon_amt":
            f"CASE WHEN ({_RK}) % 5 = 0 THEN ({_RK}) % 300 ELSE 0 END",
        f"{pfx}_net_paid":
            f"ROUND(({_RK}) % 10000 * 0.9 + 1, 2)",
        f"{pfx}_net_paid_inc_tax": f"ROUND(({_RK}) % 10000 + 2, 2)",
        f"{pfx}_net_paid_inc_ship": f"ROUND(({_RK}) % 11000 + 3, 2)",
        f"{pfx}_net_paid_inc_ship_tax":
            f"ROUND(({_RK}) % 12000 + 4, 2)",
        f"{pfx}_net_profit":
            f"ROUND(({_RK}) % 600 - 100 + (({_RK}) % 2) * 0.5, 2)",
        f"{pfx}_promo_sk": f"{_RK} % {N_PROMO}",
    }


def _returns_rules(pfx: str) -> dict[str, str]:
    return {
        f"{pfx}_returned_date_sk":
            f"{_sk(_SDATE)} + ({_RK}) % 60",
        # store_returns spells it sr_return_time_sk; cr/wr use
        # *_returned_time_sk — supply both, prune per actual schema
        f"{pfx}_returned_time_sk": f"{_RK} % {N_TIME}",
        f"{pfx}_return_time_sk": f"{_RK} % {N_TIME}",
        f"{pfx}_item_sk": "l_partkey",
        f"{pfx}_return_quantity":
            "CAST(floor((CAST(l_quantity AS INTEGER)) / 2) AS INTEGER) + 1",
        f"{pfx}_return_amt":
            "CAST(ROUND(l_extendedprice / 2, 2) % 90000 AS DECIMAL(7,2))",
        # catalog_returns spells it cr_return_amount
        f"{pfx}_return_amount":
            "CAST(ROUND(l_extendedprice / 2, 2) % 90000 AS DECIMAL(7,2))",
        # web_returns has wr_account_credit instead of store_credit
        f"{pfx}_account_credit": f"ROUND(({_RK}) % 1000 + 0.3, 2)",
        f"{pfx}_return_tax":
            "CAST(ROUND(l_extendedprice * l_tax / 2, 2) % 1000 "
            "AS DECIMAL(7,2))",
        f"{pfx}_return_amt_inc_tax":
            "CAST(ROUND(l_extendedprice * (1 + l_tax) / 2, 2) % 10000 "
            "AS DECIMAL(7,2))",
        f"{pfx}_fee": f"ROUND(({_RK}) % 100 + 0.5, 2)",
        f"{pfx}_return_ship_cost": f"ROUND(({_RK}) % 500 + 0.25, 2)",
        f"{pfx}_refunded_cash": f"ROUND(({_RK}) % 2000 + 0.1, 2)",
        f"{pfx}_reversed_charge": f"ROUND(({_RK}) % 1500 + 0.2, 2)",
        f"{pfx}_store_credit": f"ROUND(({_RK}) % 1000 + 0.3, 2)",
        f"{pfx}_net_loss": f"ROUND(({_RK}) % 800 + 1.0, 2)",
        f"{pfx}_reason_sk": f"{_RK} % {N_REASON}",
    }


def _table_specs() -> dict[str, tuple[str, str, dict[str, str]]]:
    """name -> (FROM clause, default key expr, column rules)."""
    # through 2004: tpcxbb q7 filters d_year = 2004 (its +34-month fact
    # window reaches October 2004)
    cal = ("(SELECT CAST(g AS DATE) AS d FROM generate_series("
           "DATE '1990-01-01', DATE '2004-12-31', INTERVAL 1 DAY) t(g))")
    specs: dict[str, tuple[str, str, dict[str, str]]] = {}

    specs["date_dim"] = (cal, _sk("d"), {
        "d_date_sk": _sk("d"),
        "d_date_id": "'D' || CAST(" + _sk("d") + " AS STRING)",
        "d_date": "d",
        "d_month_seq": "(EXTRACT(year FROM d) - 1900) * 12 + "
                       "EXTRACT(month FROM d) - 1",
        "d_week_seq": f"CAST(floor(({_sk('d')}) / 7) AS INTEGER)",
        "d_quarter_seq": "(EXTRACT(year FROM d) - 1900) * 4 + "
                         "EXTRACT(quarter FROM d) - 1",
        "d_year": "EXTRACT(year FROM d)",
        "d_dow": "EXTRACT(dow FROM d)",
        "d_moy": "EXTRACT(month FROM d)",
        "d_dom": "EXTRACT(day FROM d)",
        "d_qoy": "EXTRACT(quarter FROM d)",
        "d_fy_year": "EXTRACT(year FROM d)",
        "d_fy_quarter_seq": "(EXTRACT(year FROM d) - 1900) * 4 + "
                            "EXTRACT(quarter FROM d) - 1",
        "d_fy_week_seq": f"CAST(floor(({_sk('d')}) / 7) AS INTEGER)",
        "d_day_name": "dayname(d)",
        "d_quarter_name": "CAST(EXTRACT(year FROM d) AS STRING) || 'Q' "
                          "|| CAST(EXTRACT(quarter FROM d) AS STRING)",
        "d_holiday": "CASE WHEN EXTRACT(doy FROM d) = 1 "
                     "THEN 'Y' ELSE 'N' END",
        "d_weekend": "CASE WHEN EXTRACT(dow FROM d) IN (0, 6) "
                     "THEN 'Y' ELSE 'N' END",
        "d_following_holiday": "CASE WHEN EXTRACT(doy FROM d) = 2 "
                               "THEN 'Y' ELSE 'N' END",
        "d_first_dom": _sk("d") + " - EXTRACT(day FROM d) + 1",
        "d_last_dom": _sk("last_day(d)"),
        "d_same_day_ly": _sk("d") + " - 365",
        "d_same_day_lq": _sk("d") + " - 91",
        "d_current_day": "'N'", "d_current_week": "'N'",
        "d_current_month": "'N'", "d_current_quarter": "'N'",
        "d_current_year": "'N'",
    })

    specs["time_dim"] = (f"range({N_TIME}) t(i)", "i", {
        "t_time_sk": "i",
        "t_time_id": "'T' || CAST(i AS STRING)",
        "t_time": "i",
        "t_hour": "CAST(floor((i) / 3600) AS INTEGER)",
        "t_minute": "CAST(floor((i) / 60) AS INTEGER) % 60",
        "t_second": "i % 60",
        "t_am_pm": "CASE WHEN i < 43200 THEN 'AM' ELSE 'PM' END",
        "t_shift": _case("CAST(floor((i) / 28800) AS INTEGER)",
                         ["third", "first", "second"]),
        "t_sub_shift": _case("CAST(floor((i) / 21600) AS INTEGER)",
                             ["night", "morning", "afternoon", "evening"]),
        "t_meal_time":
            "CASE WHEN i BETWEEN 21600 AND 32399 THEN 'breakfast' "
            "WHEN i BETWEEN 39600 AND 50399 THEN 'lunch' "
            "WHEN i BETWEEN 61200 AND 75599 THEN 'dinner' ELSE '' END",
    })

    specs["item"] = ("part", "p_partkey", {
        "i_item_sk": "p_partkey",
        "i_item_id": "'I' || LPAD(CAST(p_partkey AS STRING), 8, '0')",
        "i_rec_start_date": "DATE '1997-01-01'",
        "i_rec_end_date": "NULL",
        "i_item_desc": "'desc ' || CAST(p_partkey AS STRING)",
        # q64 slice (p % 149 = 64): price inside its 30-39 band and a
        # color from its 6-color IN list (see the q64 needle at the
        # store_sales spec)
        "i_current_price":
            "CASE WHEN p_partkey % 149 = 64 THEN 35.00 ELSE "
            "ROUND(CASE p_partkey % 3 WHEN 0 THEN (p_partkey * 7) % 99 + 1 "
            "WHEN 1 THEN (p_partkey * 7) % 99 + 1.49 "
            "ELSE (p_partkey * 7) % 99 + 0.99 END, 2) END",
        "i_wholesale_cost": "ROUND(p_retailprice / 2, 2)",
        "i_brand_id": "p_partkey % 10 + 1",
        "i_brand": _case("p_partkey", BRANDS),
        "i_class_id": "CAST(floor((p_partkey) / 3) AS INTEGER) % 16 + 1",
        "i_class": _case("CAST(floor((p_partkey) / 3) AS INTEGER)", CLASSES),
        "i_category_id": "CAST(floor((p_partkey) / 7) AS INTEGER) % 10 + 1",
        "i_category": f"CASE WHEN {_Q41} THEN 'Women' ELSE "
                      + _case("CAST(floor((p_partkey) / 7) AS INTEGER)",
                              CATEGORIES) + " END",
        # q41 needle: its correlated EXISTS needs one manufact group in
        # [739, 779] containing a (Women, mint, Dozen, large) item — a
        # 4-column conjunction the independent residue derivations never
        # align on.  A narrow slice (p_partkey % 1009 = 41, ~0.1% of
        # parts) pins all five columns together; `_q41` guards each rule.
        "i_manufact_id": f"CASE WHEN {_Q41} THEN 750 "
                         "ELSE (p_partkey * 13 + 7) % 1000 + 1 END",
        "i_manufact": f"'mfct' || CAST(CASE WHEN {_Q41} THEN 750 "
                      "ELSE (p_partkey * 13 + 7) % 1000 + 1 END "
                      "AS STRING)",
        "i_size": f"CASE WHEN {_Q41} THEN 'large' ELSE "
                  + _case("CAST(floor((p_partkey) / 11) AS INTEGER)", SIZES)
                  + " END",
        "i_formulation": "'form' || CAST(p_partkey % 100 AS STRING)",
        "i_color": f"CASE WHEN {_Q41} THEN 'mint' "
                   "WHEN p_partkey % 149 = 64 THEN 'navy' ELSE "
                   + _case("p_partkey * 5 + 1", COLORS) + " END",
        "i_units": f"CASE WHEN {_Q41} THEN 'Dozen' ELSE "
                   + _case("CAST(floor((p_partkey) / 5) AS INTEGER)", UNITS)
                   + " END",
        "i_container": "'Unknown'",
        "i_manager_id": "(p_partkey * 7 + 3) % 100 + 1",
        "i_product_name": "'prod' || CAST(p_partkey AS STRING)",
    })

    # q91 needle: its Dec-2000 catalog-returns population is ~80 rows at
    # sf0.01, and the query demands the RETURNING CUSTOMER's current
    # cdemo ('M','Unknown' = cd 60), hdemo ('501-1000' = hd 80) and
    # address (gmt -7 = custkey % 4 = 2) simultaneously — a 3-way CRT
    # conjunction those ~80 rows never hit.  A 1/13 customer slice pins
    # all three fks together; every other query sees the same slight
    # redistribution on both engines.
    _q91 = "(c_custkey % 13 = 4)"
    specs["customer"] = ("customer", "c_custkey", {
        "c_customer_sk": "c_custkey",
        "c_customer_id": "'C' || LPAD(CAST(c_custkey AS STRING), 8, '0')",
        "c_current_cdemo_sk": f"CASE WHEN {_q91} THEN 60 "
                              f"ELSE (c_custkey * 7 + 1) % {N_CD} END",
        "c_current_hdemo_sk": f"CASE WHEN {_q91} THEN 80 "
                              f"ELSE (c_custkey * 11 + 3) % {N_HD} END",
        "c_current_addr_sk": f"CASE WHEN {_q91} THEN "
                             "c_custkey - ((c_custkey - 2) % 4) "
                             "ELSE c_custkey END",
        "c_first_shipto_date_sk":
            _sk("DATE '1995-01-01' + CAST(c_custkey % 2000 AS INTEGER)"),
        "c_first_sales_date_sk":
            _sk("DATE '1994-01-01' + CAST(c_custkey % 2000 AS INTEGER)"),
        "c_salutation": _case("c_custkey", SALUTATIONS),
        "c_first_name": _case("c_custkey", FIRST_NAMES),
        "c_last_name": _case("c_custkey + 3", LAST_NAMES),
        "c_preferred_cust_flag":
            "CASE WHEN c_custkey % 3 = 0 THEN 'Y' ELSE 'N' END",
        "c_birth_day": "c_custkey % 28 + 1",
        "c_birth_month": "c_custkey % 12 + 1",
        "c_birth_year": "1930 + c_custkey % 60",
        "c_birth_country": _case("c_custkey * 3 + 1", COUNTRIES),
        "c_login": "'login' || CAST(c_custkey AS STRING)",
        "c_email_address": "'u' || CAST(c_custkey AS STRING) "
                           "|| '@example.com'",
        "c_last_review_date_sk":
            _sk("DATE '1999-01-01' + CAST(c_custkey % 1000 AS INTEGER)"),
    })

    specs["customer_address"] = ("customer", "c_custkey", {
        "ca_address_sk": "c_custkey",
        "ca_address_id": "'A' || LPAD(CAST(c_custkey AS STRING), 8, '0')",
        "ca_street_number": "CAST(c_custkey % 999 + 1 AS STRING)",
        "ca_street_name": "'Main ' || CAST(c_custkey % 50 AS STRING)",
        "ca_street_type": _case("c_custkey",
                                ["Street", "Ave", "Blvd", "Way", "Ct"]),
        "ca_suite_number": "'Suite ' || CAST(c_custkey % 100 AS STRING)",
        "ca_city": _case("CAST(floor((c_custkey) / 3) AS INTEGER)", CITIES),
        # county driven by the SAME value as ca_state (floor(c/2)) so
        # address (county, state) pairs live on a k%10 x k%22 lattice —
        # the store derivation draws its pairs from the same lattice,
        # making q54's ca_county = s_county AND ca_state = s_state join
        # satisfiable instead of a 1/220 coincidence
        "ca_county": _case("CAST(floor((c_custkey) / 2) AS INTEGER)", COUNTIES),
        "ca_state": _case("CAST(floor((c_custkey) / 2) AS INTEGER)", STATES),
        # q24 counterpart of s_zip: a 1/9 slice shares the market-8/9
        # stores' pool zip
        "ca_zip": f"CASE WHEN c_custkey % 9 = 0 THEN '{ZIPS[0]}' "
                  f"ELSE {_case('c_custkey * 17 + 3', ZIPS)} END",
        "ca_country": "'United States'",
        "ca_gmt_offset": "CAST(-5 - (c_custkey % 4) AS DECIMAL(5,2))",
        "ca_location_type": _case("c_custkey", ["apartment", "condo",
                                                "single family"]),
    })

    specs["customer_demographics"] = (f"range({N_CD}) t(i)", "i", {
        "cd_demo_sk": "i",
        "cd_gender": _case("i", ["M", "F"]),
        "cd_marital_status": _case("CAST(floor((i) / 2) AS INTEGER)", MARITAL),
        "cd_education_status": _case("CAST(floor((i) / 10) AS INTEGER)", EDUCATION),
        "cd_purchase_estimate": "(CAST(floor((i) / 70) AS INTEGER) % 10) "
                                "* 500 + 500",
        "cd_credit_rating": _case("CAST(floor((i) / 700) AS INTEGER)", CREDIT),
        "cd_dep_count": "i % 7",
        "cd_dep_employed_count": "CAST(floor((i) / 3) AS INTEGER) % 7",
        "cd_dep_college_count": "CAST(floor((i) / 9) AS INTEGER) % 7",
    })

    specs["household_demographics"] = (f"range({N_HD}) t(i)", "i", {
        "hd_demo_sk": "i",
        "hd_income_band_sk": f"i % {N_IB}",
        "hd_buy_potential": _case(f"CAST(i / {N_IB} AS INTEGER)",
                                  BUY_POTENTIAL),
        "hd_dep_count": f"CAST(i / {N_IB * 6} AS INTEGER) % 10 - 1",
        "hd_vehicle_count": f"CAST(i / {N_IB * 60} AS INTEGER) % 6 - 1",
    })

    specs["store"] = (f"range({N_STORE}) t(i)", "i", {
        "s_store_sk": "i",
        "s_store_id": "'S' || LPAD(CAST(i AS STRING), 4, '0')",
        "s_rec_start_date": "DATE '1997-01-01'",
        "s_rec_end_date": "NULL",
        "s_closed_date_sk": "NULL",
        "s_store_name": _case("i", STORE_NAMES),
        "s_number_employees": "200 + (i * 13) % 100",
        "s_floor_space": "5000000 + i * 100000",
        "s_hours": _case("i", ["8AM-4PM", "8AM-12AM", "8AM-8AM"]),
        "s_manager": _case("i + 2", FIRST_NAMES),
        "s_market_id": "i % 10 + 1",
        "s_geography_class": "'Unknown'",
        "s_market_desc": "'market ' || CAST(i AS STRING)",
        "s_market_manager": _case("i + 4", FIRST_NAMES),
        "s_division_id": "1", "s_division_name": "'Unknown'",
        "s_company_id": "1", "s_company_name": "'Unknown'",
        "s_street_number": "CAST(i * 7 + 1 AS STRING)",
        "s_street_name": "'Park ' || CAST(i AS STRING)",
        "s_street_type": "'Street'",
        "s_suite_number": "'Suite ' || CAST(i AS STRING)",
        "s_city": _case("CAST(floor((i) / 2) AS INTEGER)", CITIES),
        # same driver as s_state (floor(i/4)): store pairs are a subset
        # of the address (county, state) lattice — see ca_county
        "s_county": _case("CAST(floor((i) / 4) AS INTEGER)", COUNTIES),
        "s_state": _case("CAST(floor((i) / 4) AS INTEGER)", STATES),
        # q24 needle: its ssales CTE joins s_zip = ca_zip under
        # s_market_id 8/9 — pin those two market groups' stores to one
        # pool zip that a 1/9 address slice shares (see ca_zip), so the
        # returns-joined zip-match population is ~100 rows instead of a
        # 1/40 coincidence
        "s_zip": f"CASE WHEN i % 10 IN (7, 8) THEN '{ZIPS[0]}' "
                 f"ELSE {_case('i * 31 + 1', ZIPS)} END",
        "s_country": "'United States'",
        # the suite filters s_gmt_offset = -5, -6 AND -7 (q61/q90-class
        # queries went structurally empty when the domain stopped at -6)
        "s_gmt_offset": "CAST(-5 - (i % 3) AS DECIMAL(5,2))",
        "s_tax_precentage": "CAST(0.01 * (i % 10) AS DECIMAL(5,2))",
    })

    specs["warehouse"] = (f"range({N_WAREHOUSE}) t(i)", "i", {
        "w_warehouse_sk": "i",
        "w_warehouse_id": "'W' || LPAD(CAST(i AS STRING), 4, '0')",
        "w_warehouse_name": "'Warehouse ' || CAST(i AS STRING)",
        "w_warehouse_sq_ft": "100000 + i * 50000",
        "w_city": _case("i", CITIES),
        "w_county": _case("i", COUNTIES),
        "w_state": _case("i", STATES),
        "w_zip": "LPAD(CAST((i * 53) % 100000 AS STRING), 5, '0')",
        "w_country": "'United States'",
        "w_gmt_offset": "CAST(-5 - (i % 4) AS DECIMAL(5,2))",
    })

    specs["ship_mode"] = (f"range({N_SM}) t(i)", "i", {
        "sm_ship_mode_sk": "i",
        "sm_ship_mode_id": "'SM' || LPAD(CAST(i AS STRING), 4, '0')",
        "sm_type": _case("i", SM_TYPES),
        "sm_code": _case("i", ["AIR", "SURFACE", "SEA"]),
        "sm_carrier": _case("i", SM_CARRIERS),
        "sm_contract": "'c' || CAST(i AS STRING)",
    })

    specs["reason"] = (f"range({N_REASON}) t(i)", "i", {
        "r_reason_sk": "i",
        "r_reason_id": "'R' || LPAD(CAST(i AS STRING), 4, '0')",
        "r_reason_desc": "'reason ' || CAST(i AS STRING)",
    })

    specs["income_band"] = (f"range({N_IB}) t(i)", "i", {
        "ib_income_band_sk": "i",
        "ib_lower_bound": "i * 10000",
        "ib_upper_bound": "(i + 1) * 10000 - 1",
    })

    specs["promotion"] = (f"range({N_PROMO}) t(i)", "i", {
        "p_promo_sk": "i",
        "p_promo_id": "'P' || LPAD(CAST(i AS STRING), 6, '0')",
        "p_start_date_sk": _sk("DATE '1997-01-01' + "
                               "CAST(i * 5 % 1500 AS INTEGER)"),
        "p_end_date_sk": _sk("DATE '1997-02-01' + "
                             "CAST(i * 5 % 1500 AS INTEGER)"),
        "p_item_sk": "i * 7",
        "p_cost": "1000.00",
        "p_response_target": "1",
        "p_promo_name": _case("i", ["ought", "able", "ese", "anti",
                                    "cally"]),
        "p_channel_dmail": _case("i", ["Y", "N"]),
        "p_channel_email": "CASE WHEN i % 10 = 0 THEN 'Y' ELSE 'N' END",
        "p_channel_catalog": "CASE WHEN i % 9 = 0 THEN 'Y' ELSE 'N' END",
        "p_channel_tv": "CASE WHEN i % 8 = 0 THEN 'Y' ELSE 'N' END",
        "p_channel_radio": "CASE WHEN i % 7 = 0 THEN 'Y' ELSE 'N' END",
        "p_channel_press": "CASE WHEN i % 6 = 0 THEN 'Y' ELSE 'N' END",
        "p_channel_event": "CASE WHEN i % 5 = 0 THEN 'Y' ELSE 'N' END",
        "p_channel_demo": "CASE WHEN i % 4 = 0 THEN 'Y' ELSE 'N' END",
        "p_channel_details": "'details ' || CAST(i AS STRING)",
        "p_purpose": "'Unknown'",
        "p_discount_active": _case("i + 1", ["Y", "N"]),
    })

    specs["call_center"] = (f"range({N_CC}) t(i)", "i", {
        "cc_call_center_sk": "i",
        "cc_call_center_id": "'CC' || LPAD(CAST(i AS STRING), 4, '0')",
        "cc_rec_start_date": "DATE '1997-01-01'",
        "cc_rec_end_date": "NULL",
        "cc_closed_date_sk": "NULL",
        "cc_open_date_sk": _sk("DATE '1996-01-01'"),
        "cc_name": "'call center ' || CAST(i AS STRING)",
        "cc_class": _case("i", ["small", "medium", "large"]),
        "cc_employees": "100 + i * 50",
        "cc_sq_ft": "10000 + i * 1000",
        "cc_hours": "'8AM-4PM'",
        "cc_manager": _case("i", FIRST_NAMES),
        "cc_mkt_id": "i % 6 + 1",
        "cc_mkt_class": "'mkt class ' || CAST(i AS STRING)",
        "cc_mkt_desc": "'mkt desc ' || CAST(i AS STRING)",
        "cc_market_manager": _case("i + 1", FIRST_NAMES),
        "cc_division": "1", "cc_division_name": "'Unknown'",
        "cc_company": "1", "cc_company_name": "'Unknown'",
        "cc_street_number": "CAST(i + 1 AS STRING)",
        "cc_street_name": "'Center ' || CAST(i AS STRING)",
        "cc_street_type": "'Blvd'",
        "cc_suite_number": "'Suite ' || CAST(i AS STRING)",
        "cc_city": _case("i", CITIES),
        "cc_county": _case("i", COUNTIES),
        "cc_state": _case("i", STATES),
        "cc_zip": "LPAD(CAST((i * 71) % 100000 AS STRING), 5, '0')",
        "cc_country": "'United States'",
        "cc_gmt_offset": "CAST(-5 AS DECIMAL(5,2))",
        "cc_tax_percentage": "CAST(0.01 AS DECIMAL(5,2))",
    })

    specs["catalog_page"] = (f"range({N_CP}) t(i)", "i", {
        "cp_catalog_page_sk": "i",
        "cp_catalog_page_id": "'CP' || LPAD(CAST(i AS STRING), 6, '0')",
        "cp_start_date_sk": _sk("DATE '1997-01-01' + "
                                "CAST(i % 1500 AS INTEGER)"),
        "cp_end_date_sk": _sk("DATE '1997-03-01' + "
                              "CAST(i % 1500 AS INTEGER)"),
        "cp_department": "'DEPARTMENT'",
        "cp_catalog_number": "i % 100 + 1",
        "cp_catalog_page_number": "i % 200 + 1",
        "cp_description": "'page ' || CAST(i AS STRING)",
        "cp_type": _case("i", ["bi-annual", "quarterly", "monthly"]),
    })

    specs["web_site"] = (f"range({N_WEB_SITE}) t(i)", "i", {
        "web_site_sk": "i",
        "web_site_id": "'WS' || LPAD(CAST(i AS STRING), 4, '0')",
        "web_rec_start_date": "DATE '1997-01-01'",
        "web_rec_end_date": "NULL",
        "web_name": "'site_' || CAST(i % 4 AS STRING)",
        "web_open_date_sk": _sk("DATE '1996-06-01'"),
        "web_close_date_sk": "NULL",
        "web_class": "'Unknown'",
        "web_manager": _case("i", FIRST_NAMES),
        "web_mkt_id": "i % 6 + 1",
        "web_mkt_class": "'mkt class ' || CAST(i AS STRING)",
        "web_mkt_desc": "'mkt desc ' || CAST(i AS STRING)",
        "web_market_manager": _case("i + 2", FIRST_NAMES),
        "web_company_id": "1", "web_company_name": "'Unknown'",
        "web_street_number": "CAST(i + 1 AS STRING)",
        "web_street_name": "'Web ' || CAST(i AS STRING)",
        "web_street_type": "'Way'",
        "web_suite_number": "'Suite ' || CAST(i AS STRING)",
        "web_city": _case("i", CITIES),
        "web_county": _case("i", COUNTIES),
        "web_state": _case("i", STATES),
        "web_zip": "LPAD(CAST((i * 83) % 100000 AS STRING), 5, '0')",
        "web_country": "'United States'",
        "web_gmt_offset": "CAST(-5 AS DECIMAL(5,2))",
        "web_tax_percentage": "CAST(0.02 AS DECIMAL(5,2))",
    })

    specs["web_page"] = (f"range({N_WP}) t(i)", "i", {
        "wp_web_page_sk": "i",
        "wp_web_page_id": "'WP' || LPAD(CAST(i AS STRING), 4, '0')",
        "wp_rec_start_date": "DATE '1997-01-01'",
        "wp_rec_end_date": "NULL",
        "wp_creation_date_sk": _sk("DATE '1996-06-01'"),
        "wp_access_date_sk": _sk("DATE '1999-06-01'"),
        "wp_autogen_flag": _case("i", ["Y", "N"]),
        "wp_customer_sk": "i * 11",
        "wp_url": "'http://www.example.com/'",
        "wp_type": _case("i", ["general", "order", "welcome", "ad",
                               "feedback", "dynamic", "protected"]),
        # q90/q? filter wp_char_count BETWEEN 5000 AND 5200/6000 — the
        # stride must actually reach that window (i*52 topped out at
        # 3172 over the 60 pages; i*173 puts pages 29 and 59 inside it)
        "wp_char_count": "100 + (i * 173) % 5200",
        "wp_link_count": "i % 25 + 2",
        "wp_image_count": "i % 7 + 1",
        "wp_max_ad_count": "i % 5",
    })

    specs["inventory"] = (
        "part, (SELECT CAST(g AS DATE) AS d FROM generate_series("
        "DATE '1998-01-01', DATE '2002-12-31', INTERVAL 7 DAY) t(g)), "
        "range(2) w(wk)",
        "p_partkey", {
            "inv_date_sk": _sk("d"),
            "inv_item_sk": "p_partkey",
            "inv_warehouse_sk": "wk",
            "inv_quantity_on_hand":
                f"CASE WHEN (p_partkey * 31 + {_sk('d')} * 7 + wk) % 11 = 0 "
                f"THEN 1000 + (p_partkey * 31 + {_sk('d')} * 7 + wk) % 5000 "
                f"ELSE (p_partkey * 31 + {_sk('d')} * 7 + wk) % 400 END",
        })

    # --- fact tables from lineitem x orders --------------------------------
    ss = _sales_rules("ss")
    # q34 needle: its HAVING needs 15-20 rows per (ticket, customer)
    # where EVERY counted row also passes the store-county, hd and
    # day-of-month filters — per-row independent fks never align a
    # whole ticket.  Pin a 1/17 ticket slice's rows together: store 0
    # (Ziebach County), hd 2760 ('>10000', dep 2 / vehicle 1 > 1.2),
    # sold dates on dom 1-3 spread across 2000-2002; slice tickets
    # whose size lands in the 15-20 band then qualify wholesale.
    _q34 = "(_ticket % 17 = 5)"
    _q34_date = ("make_date(2000 + CAST((" + _RK + ") % 30 // 12 AS INT), "
                 "CAST((" + _RK + ") % 30 % 12 AS INT) + 1, "
                 "CAST((" + _RK + ") % 3 AS INT) + 1)")
    ss["ss_sold_date_sk"] = (f"CASE WHEN {_q34} THEN {_sk(_q34_date)} "
                             f"ELSE {ss['ss_sold_date_sk']} END")
    ss.update({
        "ss_customer_sk": "CASE WHEN " + _RK + " % 29 = 28 THEN NULL ELSE "
                          + _CUST + " END",
        "ss_cdemo_sk": f"CASE WHEN ({_RK}) % 17 = 16 THEN NULL "
                       f"ELSE ({_RK}) % {N_CD} END",
        "ss_hdemo_sk": f"CASE WHEN {_q34} THEN 2760 "
                       f"WHEN ({_RK}) % 20 = 19 THEN NULL "
                       f"ELSE ({_RK}) % {N_HD} END",
        "ss_addr_sk": "CASE WHEN " + _RK + " % 3 = 0 THEN "
            "(o_custkey * 13 + 7) % (SELECT COUNT(*) FROM customer) "
            "ELSE " + _CUST + " END",
        "ss_store_sk": f"CASE WHEN {_q34} THEN 0 "
                       "WHEN l_partkey % 149 = 64 "
                       "AND l_returnflag = 'R' THEN 1 "
                       f"WHEN ({_RK}) % 23 = 22 THEN NULL "
                       f"ELSE l_suppkey % {N_STORE} END",
        "ss_ticket_number": "_ticket",
    })
    # q23a/b needle: its final sum needs a July-1999 CATALOG purchase
    # of a "frequent item" (>4 store sales of one item on one date) by a
    # "best customer" (store spend > 0.95 x the windowed max) — three
    # fact populations that never coincide under uniform derivations.
    # P = items in a 1/101 slice with >= 7 raw store-channel rows: pin
    # each one's store sales onto a single 2000 date (making it
    # frequent).  C = a 1/31 customer slice that catalog-bought a P item
    # (so the best-customer set, boosted below, always owns a
    # qualifying July-1999 catalog row): a quantity boost makes C the top
    # spenders, and their P-item catalog rows move to July 1999.
    _q23_cnt = ("(SELECT COUNT(*) FROM lineitem l9 JOIN orders o9 "
                "ON l9.l_orderkey = o9.o_orderkey "
                "WHERE l9.l_partkey = {pk} AND o9.o_orderkey % 8 < 6)")
    _q23_p = ("({pk} % 101 = 2 AND "
              + _q23_cnt + " >= 7)")
    _q23_c = ("((" + _CUST + ") % 31 = 3 AND EXISTS ("
              "SELECT 1 FROM lineitem l8 JOIN orders o8 "
              "ON l8.l_orderkey = o8.o_orderkey "
              "WHERE (o8.o_custkey + CASE WHEN o8.o_custkey % 3 = 0 "
              "THEN 1 ELSE 0 END) = (" + _CUST + ") "
              "AND o8.o_orderkey % 8 IN (4, 5, 6) "
              "AND " + _q23_p.format(pk="l8.l_partkey") + "))")
    # q64 needle: its final self-join needs the SAME item sold AND
    # returned at the SAME store in both 2001 and 2002, with the item
    # in a price band + color list and its catalog sale > 2x refunds.
    # Returnflag-R store rows of the 1/149 item slice alternate between
    # the two years at store 1; the catalog list price boost below
    # makes cs_ui's HAVING hold for the slice.
    _q64 = "(l_partkey % 149 = 64 AND l_returnflag = 'R')"
    ss["ss_sold_date_sk"] = (
        f"CASE WHEN {_q64} THEN "
        + _sk("make_date(2001 + CAST((" + _RK + ") % 2 AS INT), 3, "
              "CAST((" + _RK + ") % 25 AS INT) + 1)")
        + f" ELSE {ss['ss_sold_date_sk']} END")
    ss["ss_sold_date_sk"] = (
        "CASE WHEN " + _q23_p.format(pk="l_partkey") + " THEN "
        + _sk("make_date(2000, 1, CAST(l_partkey % 28 AS INT) + 1)")
        + f" ELSE {ss['ss_sold_date_sk']} END")
    # 500, not higher: the boost must dominate the best-customer max
    # (~75k spend -> ~1.5M) WITHOUT inflating q14's global
    # average-sales HAVING threshold past its own populations
    ss["ss_quantity"] = (f"CASE WHEN {_q23_c} THEN 500 "
                         f"ELSE {ss.get('ss_quantity', 'CAST(l_quantity AS INTEGER)')} END")
    specs["store_sales"] = (
        _FACT_SRC.format(filter=" AND l_orderkey % 8 < 6"), _RK, ss)

    cs = _sales_rules("cs")
    # q54 needle: its my_customers CTE needs July-2000 catalog/web
    # buyers of ('Men','shirts') items who ALSO shop in stores whose
    # (county, state) equals their address's.  Move the catalog sales
    # of the men/shirts items themselves (category floor(k/7)%10=5,
    # class floor(k/3)%16=8 — ~10 items) into July 2000; their ~30
    # buyers' later store purchases and the county/state lattice (see
    # ca_county) do the rest.  Item keys stay untouched, so the
    # (cs_item_sk, cs_order_number) primary key is unaffected.
    _q54 = ("(CAST(floor(l_partkey / 7) AS INTEGER) % 10 = 5 AND "
            "CAST(floor(l_partkey / 3) AS INTEGER) % 16 = 8)")
    cs["cs_sold_date_sk"] = (
        f"CASE WHEN {_q54} THEN "
        + _sk("DATE '2000-07-01'") + f" + ({_RK}) % 28 "
        f"ELSE {cs['cs_sold_date_sk']} END")
    # q32 needle: its correlated HAVING needs >= 2 catalog sales of the
    # SAME i_manufact_id=994 item inside one 90-day window with enough
    # discount spread that a row exceeds 1.3 x the window average.
    # Items with manufact 994 are exactly p_partkey % 1000 = 922; pin
    # that slice's sold dates into the 2001-03-14 +90d window and
    # alternate the discount between 1.00 and 500.00 (500 > 1.3 x any
    # mix that includes both).
    _q32 = "(l_partkey % 1000 = 922)"
    cs["cs_sold_date_sk"] = (
        f"CASE WHEN {_q32} THEN "
        + _sk("DATE '2001-03-20'") + f" + ({_RK}) % 80 "
        f"ELSE {cs['cs_sold_date_sk']} END")
    cs["cs_ext_discount_amt"] = (
        f"CASE WHEN {_q32} THEN "
        f"CASE WHEN ({_RK}) % 2 = 0 THEN CAST(1.00 AS DECIMAL(7,2)) "
        f"ELSE CAST(500.00 AS DECIMAL(7,2)) END "
        f"ELSE {cs['cs_ext_discount_amt']} END")
    cs.update({
        "cs_bill_customer_sk": _CUST,
        "cs_bill_cdemo_sk": f"{_RK} % {N_CD}",
        "cs_bill_hdemo_sk": f"CASE WHEN ({_RK}) % 25 = 24 THEN NULL "
                            f"ELSE ({_RK}) % {N_HD} END",
        "cs_bill_addr_sk": _CUST,
        "cs_ship_customer_sk": _CUST,
        "cs_ship_cdemo_sk": f"({_RK} + 13) % {N_CD}",
        "cs_ship_hdemo_sk": f"({_RK} + 17) % {N_HD}",
        "cs_ship_addr_sk": "CASE WHEN " + _RK + " % 19 = 18 THEN NULL ELSE " + _CUST + " END",
        "cs_call_center_sk": f"{_RK} % {N_CC}",
        "cs_catalog_page_sk": f"{_RK} % {N_CP}",
        "cs_ship_mode_sk": f"{_RK} % {N_SM}",
        "cs_warehouse_sk": f"{_RK} % {N_WAREHOUSE}",
        "cs_order_number": "_ticket",
    })
    # q64 needle, catalog side: slice items' catalog list price
    # dominates 2x their refunds in cs_ui
    cs["cs_ext_list_price"] = (
        "CASE WHEN l_partkey % 149 = 64 THEN CAST(20000.00 AS "
        f"DECIMAL(7,2)) ELSE {cs['cs_ext_list_price']} END")
    # q23 needle, catalog side: C customers' P-item purchases land in
    # July 1999 (takes precedence over the q54/q32 date arms)
    cs["cs_sold_date_sk"] = (
        "CASE WHEN " + _q23_c + " AND "
        + _q23_p.format(pk="l_partkey") + " THEN "
        + _sk("DATE '1999-07-01'") + f" + ({_RK}) % 28 "
        f"ELSE {cs['cs_sold_date_sk']} END")
    specs["catalog_sales"] = (
        _FACT_SRC.format(filter=" AND (l_orderkey % 8) IN (4, 5, 6)"), _RK, cs)

    ws = _sales_rules("ws")
    ws.update({
        "ws_bill_customer_sk": _CUST,
        "ws_bill_cdemo_sk": f"{_RK} % {N_CD}",
        "ws_bill_hdemo_sk": f"{_RK} % {N_HD}",
        "ws_bill_addr_sk": _CUST,
        "ws_ship_customer_sk": "CASE WHEN " + _RK + " % 21 = 20 THEN NULL ELSE " + _CUST + " END",
        "ws_ship_cdemo_sk": f"({_RK} + 13) % {N_CD}",
        "ws_ship_hdemo_sk": f"({_RK} + 17) % {N_HD}",
        "ws_ship_addr_sk": _CUST,
        "ws_web_page_sk": f"{_RK} % {N_WP}",
        "ws_web_site_sk": f"{_RK} % {N_WEB_SITE}",
        "ws_ship_mode_sk": f"{_RK} % {N_SM}",
        "ws_warehouse_sk": f"CASE WHEN ({_RK}) % 27 = 26 THEN NULL "
                           f"ELSE ({_RK}) % {N_WAREHOUSE} END",
        "ws_order_number": "_ticket",
    })
    # q85 needle (see _Q85): pin the slice's price/profit into the
    # bands its cd/address overrides on web_returns pair with
    ws["ws_sales_price"] = (f"CASE WHEN {_Q85} THEN 120.50 "
                            f"ELSE {ws['ws_sales_price']} END")
    ws["ws_net_profit"] = (f"CASE WHEN {_Q85} THEN 175.00 "
                           f"ELSE {ws['ws_net_profit']} END")
    specs["web_sales"] = (
        _FACT_SRC.format(filter=" AND (l_orderkey % 8) IN (6, 7, 0)"), _RK, ws)

    sr = _returns_rules("sr")
    sr.update({
        "sr_customer_sk": _CUST,
        "sr_cdemo_sk": f"{_RK} % {N_CD}",
        "sr_hdemo_sk": f"{_RK} % {N_HD}",
        "sr_addr_sk": _CUST,
        "sr_store_sk": f"l_suppkey % {N_STORE}",
        "sr_ticket_number": "_ticket",
    })
    specs["store_returns"] = (
        _FACT_SRC.format(
            filter=" AND l_orderkey % 8 < 6 AND l_returnflag = 'R'"),
        _RK, sr)

    cr = _returns_rules("cr")
    cr.update({
        "cr_refunded_customer_sk": _CUST,
        "cr_refunded_cdemo_sk": f"{_RK} % {N_CD}",
        "cr_refunded_hdemo_sk": f"{_RK} % {N_HD}",
        "cr_refunded_addr_sk": _CUST,
        "cr_returning_customer_sk": _CUST,
        "cr_returning_cdemo_sk": f"({_RK} + 13) % {N_CD}",
        "cr_returning_hdemo_sk": f"({_RK} + 17) % {N_HD}",
        "cr_returning_addr_sk": _CUST,
        "cr_call_center_sk": f"{_RK} % {N_CC}",
        "cr_catalog_page_sk": f"{_RK} % {N_CP}",
        "cr_ship_mode_sk": f"{_RK} % {N_SM}",
        "cr_warehouse_sk": f"{_RK} % {N_WAREHOUSE}",
        "cr_order_number": "_ticket",
    })
    specs["catalog_returns"] = (
        _FACT_SRC.format(
            filter=" AND (l_orderkey % 8) IN (4, 5, 6) AND l_returnflag = 'R'"),
        _RK, cr)

    wr = _returns_rules("wr")
    wr.update({
        "wr_refunded_customer_sk": _CUST,
        "wr_refunded_cdemo_sk": f"{_RK} % {N_CD}",
        "wr_refunded_hdemo_sk": f"{_RK} % {N_HD}",
        "wr_refunded_addr_sk": _CUST,
        "wr_returning_customer_sk": _CUST,
        "wr_returning_cdemo_sk": f"({_RK} + 13) % {N_CD}",
        "wr_returning_hdemo_sk": f"({_RK} + 17) % {N_HD}",
        "wr_returning_addr_sk": _CUST,
        "wr_web_page_sk": f"{_RK} % {N_WP}",
        "wr_order_number": "_ticket",
    })
    # q85 needle: same-slice refunded/returning demographics equal and
    # pinned to cd 128 = ('U', 'Advanced Degree'); refunded address 6
    # = ('GA', 'United States')
    wr["wr_refunded_cdemo_sk"] = (f"CASE WHEN {_Q85} THEN 128 "
                                  f"ELSE {wr['wr_refunded_cdemo_sk']} END")
    wr["wr_returning_cdemo_sk"] = (f"CASE WHEN {_Q85} THEN 128 "
                                   f"ELSE {wr['wr_returning_cdemo_sk']} END")
    wr["wr_refunded_addr_sk"] = (f"CASE WHEN {_Q85} THEN 6 "
                                 f"ELSE {wr['wr_refunded_addr_sk']} END")
    specs["web_returns"] = (
        _FACT_SRC.format(
            filter=" AND (l_orderkey % 8) IN (6, 7, 0) AND l_returnflag = 'R'"),
        _RK, wr)

    return specs


def _fallback(field: T.StructField, key: str, ci: int) -> str:
    """Deterministic synthesis for columns no rule (and no query filter)
    touches — only needs to load identically on both engines."""
    dt = field.dataType
    if isinstance(dt, (T.IntegerType, T.LongType)):
        return f"(({key}) * 17 + {ci * 7 + 1}) % 1000"
    if isinstance(dt, T.DecimalType):
        return (f"CAST((({key}) * 13 + {ci * 3 + 1}) % 10000 / 100.0 "
                f"AS DECIMAL({dt.precision},{dt.scale}))")
    if isinstance(dt, T.DateType):
        return (f"DATE '1998-01-01' + CAST((({key}) + {ci}) % 365 "
                f"AS INTEGER)")
    return f"'v{ci}_' || CAST(({key}) % 1000 AS STRING)"


def table_selects() -> dict[str, str]:
    """The derivation SELECT for every table of the suite, keyed by
    table name.  The selects reference the base parquet tables by their
    bare names (`customer part orders lineitem`), so they run anywhere
    those are registered — the export connection below, or an oracle's
    WITH-clause over the driver's pre-registered DuckDB views."""
    from lingo_db_spark import ddl

    specs = _table_specs()
    init = (REF_DS / "initialize.sql").read_text()
    sels: dict[str, str] = {}
    for stmt in ddl.split_script(init):
        parsed = ddl.parse_create_table(stmt)
        if parsed is None:
            continue
        name, schema, _pk = parsed
        frm, key, rules = specs[name]
        cols = []
        used = set()
        for ci, f in enumerate(schema.fields):
            expr = rules.get(f.name)
            if expr is None:
                expr = _fallback(f, key, ci)
            else:
                used.add(f.name)
            cols.append(f"{expr} AS {f.name}")
        _aliases = ("_time_sk", "_return_amt", "_return_amount",
                    "_store_credit", "_account_credit",
                    # store_sales has no ship columns
                    "_ship_date_sk", "_net_paid_inc_ship",
                    "_net_paid_inc_ship_tax")
        unknown = {u for u in set(rules) - used
                   if not u.endswith(_aliases)}
        if unknown:
            raise ValueError(f"{name}: rules for unknown columns "
                             f"{sorted(unknown)}")
        sels[name] = f"SELECT {', '.join(cols)} FROM {frm}"
    return sels


def export_tpcds(sf_dir: str, dest: Path) -> dict[str, int]:
    """Write all 24 .dat files; returns per-table row counts."""
    import duckdb

    con = duckdb.connect()
    for t in ("customer", "part", "orders", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    counts: dict[str, int] = {}
    for name, sel in table_selects().items():
        con.execute(f"COPY ({sel}) TO '{dest}/{name}.dat' "
                    f"(DELIMITER '|', HEADER false)")
        counts[name] = con.execute(
            f"SELECT COUNT(*) FROM read_csv('{dest}/{name}.dat', "
            f"delim='|', header=false)").fetchone()[0]
    return counts

"""Pins the Spark side of every literal bisector probe
(lingo_db_spark/queries/probes.py) to its hard-coded expected value, and
the table probes to closed-form recomputations — so a driver-gate red row
on a probe can only mean the driver DuckDB diverged, never Spark drift."""

from __future__ import annotations

from decimal import Decimal as D

import pytest

from lingo_db_spark.queries import load_all

_EXPECTED = {
    # r7: string-rendered (the r5 diagnosis showed the driver channel
    # float-roundtrips decimal-typed values; the probes now exercise the
    # same decimal casts but compare via VARCHAR)
    "probe_dec17_6_transport": "12345678901.234567",
    "probe_dec5_2_transport": "123.45",
    "probe_dec31_21_transport": "1234567890.123456789012345678901",
    "probe_dec38_19_transport": "1234567890123456789.1234567890123456789",
    "probe_dec26_14_transport": "-2.33333333333333",
    "probe_dec18_2_transport": "173665.47",
    "probe_dec_trailing_zero": "2.50",
    "probe_hugeint_pow10": "1000000000000000000000",
    "probe_hugeint_floordiv_1e25": "12345678901234567890",
    "probe_hugeint_mod_1e25": "123456",
    "probe_lpad_digits": "000007",
    "probe_truncdiv_sign": -233333333333333,
    "probe_rescale_narrow": "2.333333",
    "probe_rescale_negative": "-2.333333",
    "probe_rescale_wide": "38123456.789012345678901234567",
    "probe_dec_unscale_mul": 12345,
}


@pytest.mark.parametrize("name", sorted(_EXPECTED))
def test_literal_probe_value(spark, name):
    row = load_all()[name].spark_fn(spark, "unused").collect()
    assert len(row) == 1
    got = row[0]["v"]
    exp = _EXPECTED[name]
    assert got == exp and str(got) == str(exp), (name, got)


def test_table_probes_closed_form(spark):
    """The four table probes recomputed row-by-row in Python Decimal —
    mirrors Spark's double->string shortest repr via repr(float)."""
    from tests.conftest import SF_DIR as sf_dir
    reg = load_all()
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").collect()

    def srepr(x: float) -> str:
        return repr(x)

    exp_len = sum(len(srepr(r["o_totalprice"])) for r in orders)
    exp_min = min(srepr(r["o_totalprice"]) for r in orders)
    got = reg["probe_dbl_varchar_repr"].spark_fn(spark, sf_dir).collect()[0]
    assert got["len_sum"] == exp_len and got["lex_min"] == exp_min

    exp_trunc = sum(int(r["o_totalprice"]) for r in orders)
    got = reg["probe_trunc_money_sum"].spark_fn(spark, sf_dir).collect()[0]
    assert got["trunc_sum"] == exp_trunc

    dates = sorted(str(r["o_orderdate"].date()) for r in orders)
    got = reg["probe_ts_date_render"].spark_fn(spark, sf_dir).collect()[0]
    assert (got["date_lo"], got["date_hi"]) == (dates[0], dates[-1])

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect()
    exp_cents = sum(
        int(D(srepr(r["l_extendedprice"]))
            .quantize(D("0.01"), rounding="ROUND_HALF_UP") * 100)
        for r in li)
    got = reg["probe_cast_dec_total_cents"].spark_fn(spark, sf_dir).collect()[0]
    assert got["total_cents"] == exp_cents


# ---------------------------------------------------------------------------
# Attestation-ledger hygiene (r10): `registered - attested - flagged -
# scheduled` must be provably empty, machine-checked — not explained in
# prose each round.
# ---------------------------------------------------------------------------

def test_driver_attestable_flags_are_exactly_the_typed_twins():
    reg = load_all()
    flagged = {n for n, s in reg.items() if not s.driver_attestable}
    assert flagged == {
        "decimal_div_mod_typed", "decimal_avg_promote_typed",
        "decimal_literal_arith_typed", "scalars_cast_typed",
    }


def test_attestation_ledger_closed():
    """Every driver-attestable registered query is either already green
    in some CORRECTNESS_r*.json or scheduled in the driver's 50-slot
    window (the first 50 entries of load_all())."""
    import glob
    import json
    from pathlib import Path
    root = Path(__file__).resolve().parent.parent
    attested: set[str] = set()
    for p in glob.glob(str(root / "CORRECTNESS_r*.json")):
        for k, v in json.load(open(p)).items():
            if v.get("rows_match") and v.get("schema_match") and \
                    v.get("hash_match") in (True, None):
                attested.add(k)
    reg = load_all()
    window = set(list(reg)[:50])
    missing = {n for n, s in reg.items()
               if s.driver_attestable and n not in attested
               and n not in window}
    assert missing == set(), (
        f"{len(missing)} attestable queries neither attested nor "
        f"scheduled: {sorted(missing)}")


def test_changed_code_outranks_stale_rotation():
    """The r10 gap: rewritten queries missed the attestation window
    because stale rotation consumed every slot.  The rule is now
    structural — changed-code rows precede every stale-rotation row in
    the driver's 50-slot window — and this test machine-checks it."""
    from lingo_db_spark.queries import (
        ATTEST_PRIORITY, CHANGED_SINCE_LAST_ATTEST, NEW_THIS_ROUND,
        STALE_ROTATION,
    )
    # Structural assembly: canary, then changed, then new, then stale.
    assert ATTEST_PRIORITY == ["semantics_canary",
                               *CHANGED_SINCE_LAST_ATTEST,
                               *NEW_THIS_ROUND,
                               *STALE_ROTATION]
    reg = load_all()
    order = list(reg)
    window = set(order[:50])
    # Every changed/new row that is registered must actually be inside
    # the 50-slot window the driver attests...
    for name in [*CHANGED_SINCE_LAST_ATTEST, *NEW_THIS_ROUND]:
        if name in reg:
            assert name in window, f"{name} changed/new but not scheduled"
    # ...and no stale row may precede any changed row in the final
    # load_all() ordering.
    idx = {n: i for i, n in enumerate(order)}
    last_changed = max(idx[n] for n in CHANGED_SINCE_LAST_ATTEST
                       if n in idx)
    first_stale = min(idx[n] for n in STALE_ROTATION if n in idx)
    assert last_changed < first_stale


def test_no_degraded_verbatim_anchors():
    """Every verbatim anchor's value-checked oracle constructed cleanly
    (a construction failure silently weakens the gate to rows-only —
    ADVICE r9 wants that loud)."""
    load_all()
    from lingo_db_spark.queries.verbatim_anchors import DEGRADED_ANCHORS
    assert DEGRADED_ANCHORS == []

"""C-language UDF door (functions/cudf.py) — reference
UDFImplementer.cpp:132-254 / test/sqlite-small/udf.test: scalar-C
bodies translated to Python, registered as pandas UDFs."""

from __future__ import annotations

import pytest

from lingo_db_spark.functions import cudf


def _compile(body: str, params: str = "x int", ret: str = "int"):
    stmt = (f"create or replace function f({params}) returns {ret} "
            f"language c as $$ {body} $$")
    name, fn, spark_t, n = cudf.compile_c_function(stmt)
    return fn


def test_simple_return():
    fn = _compile("return x+1;")
    assert fn(2) == 3 and fn(-2) == -1


def test_null_in_null_out():
    assert _compile("return x+1;")(None) is None


def test_declaration_and_braceless_if():
    fn = _compile("size_t mod = x%2;\nif(mod == 0)\n  return true;\n"
                  "return false;", ret="bool")
    assert fn(4) is True and fn(3) is False


def test_two_args_and_coercion():
    # DECIMAL inputs (how Spark passes fractional literals) must behave
    # like the declared C float type
    from decimal import Decimal
    stmt = ("create function addFloats(x float4, y float4) returns "
            "float4 language c as $$ return x+y; $$")
    _, fn, t, n = cudf.compile_c_function(stmt)
    assert t == "float" and n == 2
    assert fn(Decimal("1.2"), Decimal("1.33")) == pytest.approx(2.53)


def test_comparison_body():
    stmt = ("create function equal(x int, y bigint) returns bool "
            "language c as $$ return x==y; $$")
    _, fn, _, _ = cudf.compile_c_function(stmt)
    assert fn(3, 3) is True and fn(3, 4) is False


def test_unsupported_constructs_refused():
    with pytest.raises(ValueError):
        _compile("for(int i=0;i<10;i++) x+=i; return x;")
    with pytest.raises(ValueError):
        _compile("return system('rm -rf /');")
    with pytest.raises(ValueError):
        _compile("{ return 1; }")


def test_registered_udf_in_sql(spark):
    cudf.register_c_function(
        spark, "create or replace function triple(x int) returns int "
               "language c as $$ return x+x+x; $$")
    rows = spark.sql("SELECT triple(id) AS t FROM range(3)").collect()
    assert [r.t for r in rows] == [0, 3, 6]
    # create-or-replace rebinds
    cudf.register_c_function(
        spark, "create or replace function triple(x int) returns int "
               "language c as $$ return x; $$")
    rows = spark.sql("SELECT triple(id) AS t FROM range(3)").collect()
    assert [r.t for r in rows] == [0, 1, 2]

"""Local replica of the driver's correctness gate: run every registered
query on Spark and its oracle on DuckDB at a given sf dir, compare
row count, column names/types, and an order-insensitive value hash.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time
from pathlib import Path

# Spark's collect() renders TimestampType in the OS timezone while DuckDB
# returns naive UTC — pin the process TZ so the compare is host-invariant
# (must happen before the JVM starts).
os.environ["TZ"] = "UTC"
time.tzset()

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

from lingo_db_spark.catalog import TABLE_NAMES
from lingo_db_spark.queries import load_all
from lingo_db_spark.session import build_session


# Canonical cross-engine type tokens: Spark simpleString / duckdb arrow
# type str -> one comparable name.  Anything unmapped compares as itself.
_CANON = {
    # spark simpleString
    "bigint": "i64", "int": "i32", "smallint": "i16", "tinyint": "i8",
    "double": "f64", "float": "f32", "string": "str", "boolean": "bool",
    "timestamp_ntz": "ts", "timestamp": "ts", "date": "date",
    "array<float>": "list<f32>", "array<double>": "list<f64>",
    "array<string>": "list<str>",
    # pyarrow str(type)
    "int64": "i64", "int32": "i32", "int16": "i16", "int8": "i8",
    "uint64": "i64", "hugeint": "i128",
    "float": "f32", "halffloat": "f16",
    "large_string": "str", "bool": "bool",
    "timestamp[us]": "ts", "timestamp[ns]": "ts", "timestamp[s]": "ts",
    "date32[day]": "date", "date64[ms]": "date",
    "list<item: float>": "list<f32>", "list<item: double>": "list<f64>",
    "list<item: string>": "list<str>", "list<item: large_string>": "list<str>",
}


def canon_type(t: str) -> str:
    t = t.strip()
    if t.startswith("decimal128"):       # pyarrow decimal128(p, s)
        return "decimal" + t[len("decimal128"):].replace(" ", "")
    if t.startswith("decimal"):          # spark decimal(p,s)
        return "decimal" + t[len("decimal"):].replace(" ", "")
    return _CANON.get(t, t)


def normalize(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # defensive: collapse ±0 and format with full precision
        return repr(v + 0.0)
    return repr(v)


def table_hash(rows) -> tuple[int, int]:
    hashes = sorted(hash(tuple(normalize(v) for v in row)) for row in rows)
    return len(hashes), hash(tuple(hashes))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    registry = load_all()
    spark = build_session("check_oracle")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        # Driver data is one file per table; scaled copies
        # (tools/make_scaled_data.py) are directories of part files.
        p = f"{sf_dir}/{t}.parquet"
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet({src})")
    failed = []
    for name, spec in sorted(registry.items()):
        if only and name not in only:
            continue
        try:
            sdf = spec.spark_fn(spark, sf_dir)
            spark_cols = sorted(sdf.columns)
            srows = [tuple(row[c] for c in spark_cols) for row in sdf.collect()]
            if spec.oracle is None:
                print(f"  {name}: rows-only ({len(srows)} rows) OK")
                continue
            ddf = con.execute(spec.oracle).fetch_arrow_table()
            duck_cols = sorted(ddf.column_names)
            drows = [tuple(r[c] for c in duck_cols) for r in ddf.to_pylist()]
            if spark_cols != duck_cols:
                failed.append(name)
                print(f"✗ {name}: columns differ spark={spark_cols} duck={duck_cols}")
                continue
            stypes = {f.name: canon_type(f.dataType.simpleString())
                      for f in sdf.schema.fields}
            dtypes = {f.name: canon_type(str(f.type)) for f in ddf.schema}
            tdiff = {c: (stypes[c], dtypes[c]) for c in spark_cols
                     if stypes[c] != dtypes[c]}
            if tdiff:
                failed.append(name)
                print(f"✗ {name}: dtypes differ {tdiff}")
                continue
            sh, dh = table_hash(srows), table_hash(drows)
            if sh != dh:
                failed.append(name)
                print(f"✗ {name}: hash mismatch rows spark={sh[0]} duck={dh[0]}")
                for a, b in list(zip(sorted(map(str, srows)), sorted(map(str, drows))))[:5]:
                    if a != b:
                        print(f"    spark: {a}\n    duck : {b}")
            else:
                print(f"✓ {name}: {sh[0]} rows match")
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"✗ {name}: EXC {type(e).__name__}: {str(e)[:300]}")
    from lingo_db_spark.queries.verbatim_anchors import DEGRADED_ANCHORS
    if DEGRADED_ANCHORS:
        print(f"\nWARNING {len(DEGRADED_ANCHORS)} verbatim anchor(s) "
              f"DEGRADED to rows-only checks: {DEGRADED_ANCHORS}")
    print(f"\n{len(failed)} failures" + (f": {failed}" if failed else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())

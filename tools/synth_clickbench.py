"""Derive the ClickBench `hits` table (105 columns) from the synthetic
`events` testdata, for running the reference's verbatim clickbench
suite (resources/sql/clickbench/create.sql + 43 queries).

Schema parsed from the reference's OWN create.sql; ~30 columns the 43
queries filter/group on get domain rules (the 2013-07 event window,
CounterID 62, the pinned UserID/URLHash/RefererHash literals, google
LIKE satisfiers, empty-vs-populated SearchPhrase/MobilePhoneModel
splits); the rest fall back to deterministic type synthesis.  Both
engines read the identical exported file."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import types as T

REF_CB = Path("/root/reference/resources/sql/clickbench")

URLS = ["", "http://google.com/search?q=spark",
        "https://www.google.ru/maps/place",
        "http://example.com/page1", "http://news.site/article/77",
        "http://shop.site/item/12", "http://forum.site/thread/9",
        "http://video.site/watch/31", "http://mail.site/inbox",
        "http://blog.site/post/5"]
REFERERS = ["", "http://www.google.com/search",
            "http://yandex.ru/yandsearch", "http://example.com/start",
            "http://social.site/feed", "https://news.site/top"]
TITLES = ["Google Search Results", "Weather Today", "News - Main",
          "Shop - Cart", "Video Player", "Mail Inbox", "Forum Index",
          "Blog Post", "Maps", "Start Page"]
PHRASES = ["", "", "", "weather today", "spark sql", "cheap flights",
           "news", "translate", "maps", "movie times", "recipes pasta",
           "football scores"]
PHONES = ["", "", "", "iPhone 5", "Galaxy S4", "Nokia 3310", "Pixel"]

_E = "(event_id * 17 + user_id * 5)"


def _case(key: str, values: list[str]) -> str:
    arms = " ".join(f"WHEN {i} THEN '{v}'" for i, v in enumerate(values))
    return f"CASE ({key}) % {len(values)} {arms} END"


def _ramp(key: str, n: int) -> str:
    """0..n-1 with a linear frequency ramp (value i ~ 2i+1 rows) so
    ORDER BY COUNT(*) DESC has distinct counts instead of ties — the
    43 queries are nearly all top-k-by-count shapes."""
    return f"CAST(floor(sqrt(({key}) % {n * n})) AS INTEGER)"


def _ramp_case(key: str, values: list[str]) -> str:
    arms = " ".join(f"WHEN {i} THEN '{v}'" for i, v in enumerate(values))
    return f"CASE {_ramp(key, len(values))} {arms} END"


_RULES: dict[str, str] = {
    "WatchID": "event_id",
    "JavaEnable": f"{_E} % 2",
    "Title": _ramp_case(f"CAST(floor(({_E}) / 3) AS INTEGER)", TITLES),
    "GoodEvent": "1",
    # the 43 queries window on 2013-07-01..31; spread events over
    # July-August 2013 so the boundary filters both select and cut
    "EventTime": "TIMESTAMP '2013-07-01 00:00:00' + "
                 f"to_seconds(CAST(epoch(ts) AS BIGINT) % 5356800)",
    "EventDate": "CAST(TIMESTAMP '2013-07-01 00:00:00' + "
                 f"to_seconds(CAST(epoch(ts) AS BIGINT) % 5356800) "
                 "AS DATE)",
    "CounterID": _ramp("event_id", 100),  # 62 reachable on the ramp
    "ClientIP": f"CAST(({_E} * 2654435761) % 2147483647 AS INTEGER)",
    "RegionID": _ramp(_E, 300),
    "UserID": "CASE WHEN event_id % 997 = 0 THEN 435090932899640449 "
              "ELSE user_id END",
    "CounterClass": f"{_E} % 3",
    "OS": _ramp(_E, 30),
    "UserAgent": _ramp(_E, 10),
    "URL": _ramp_case(f"CAST(floor(({_E}) / 7) AS INTEGER) * 3 + 1", URLS),
    "Referer": _ramp_case(f"CAST(floor(({_E}) / 11) AS INTEGER)", REFERERS),
    "IsRefresh": f"CASE WHEN ({_E}) % 10 = 0 THEN 1 ELSE 0 END",
    "ResolutionWidth": f"800 + ({_E}) % 1200",
    "ResolutionHeight": f"600 + ({_E}) % 900",
    "MobilePhone": _ramp(f"{_E} + 3", 10),
    "MobilePhoneModel": _ramp_case(f"CAST(floor(({_E}) / 13) AS INTEGER)",
                              PHONES),
    "SearchPhrase": _ramp_case(f"CAST(floor(({_E}) / 5) AS INTEGER)", PHRASES),
    "SearchEngineID": _ramp(_E, 6),
    "AdvEngineID": f"CASE WHEN ({_E}) % 7 = 0 THEN ({_E}) % 10 + 1 "
                   "ELSE 0 END",
    "TraficSourceID": f"({_E}) % 10 - 1",     # IN (-1, 6) reachable
    "IsLink": f"CASE WHEN ({_E}) % 7 = 1 THEN 1 ELSE 0 END",
    "IsDownload": f"CASE WHEN ({_E}) % 11 = 0 THEN 1 ELSE 0 END",
    "DontCountHits": f"CASE WHEN ({_E}) % 9 = 0 THEN 1 ELSE 0 END",
    "IsNotBounce": f"{_E} % 2",
    "URLHash": "CASE WHEN event_id % 31 = 0 THEN 2868770270353813622 "
               f"ELSE ({_E}) * 7919 END",
    "RefererHash": "CASE WHEN event_id % 29 = 0 THEN "
                   f"3594120000172545465 ELSE ({_E}) * 6271 END",
    "WindowClientWidth": f"900 + ({_E}) % 1100",
    "WindowClientHeight": f"500 + ({_E}) % 800",
    "Age": f"{_E} % 80",
    "Sex": f"{_E} % 2",
    "Income": f"{_E} % 10",
    "Interests": f"{_E} % 10000",
    "Robotness": f"{_E} % 2",
}


def _fallback(field: T.StructField, ci: int) -> str:
    dt = field.dataType
    if isinstance(dt, (T.IntegerType, T.LongType, T.ShortType)):
        return f"(({_E}) * 13 + {ci * 7 + 1}) % 1000"
    if isinstance(dt, T.TimestampType):
        return "ts"
    if isinstance(dt, T.DateType):
        return "CAST(ts AS DATE)"
    return f"'v{ci}_' || CAST(({_E}) % 100 AS STRING)"


def table_selects() -> dict[str, str]:
    """The `hits` derivation SELECT, keyed by name — references the
    base `events` table by bare name, so it runs in the export
    connection or as an oracle CTE over the pre-registered view."""
    from lingo_db_spark import ddl

    create = (REF_CB / "create.sql").read_text()
    parsed = ddl.parse_create_table(ddl.split_script(create)[0])
    assert parsed is not None and parsed[0] == "hits"
    _name, schema, _pk = parsed
    cols = [f"{_RULES.get(f.name, _fallback(f, ci))} AS {f.name}"
            for ci, f in enumerate(schema.fields)]
    unknown = set(_RULES) - {f.name for f in schema.fields}
    if unknown:
        raise ValueError(f"rules for unknown columns {sorted(unknown)}")
    return {"hits": f"SELECT {', '.join(cols)} FROM events"}


def export_clickbench(sf_dir: str, dest: Path) -> int:
    import duckdb

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS FROM "
                f"read_parquet('{sf_dir}/events.parquet')")
    sel = table_selects()["hits"]
    # NULLSTR sentinel: ClickBench's NOT NULL string columns carry ''
    # values, which the default empty-string null representation would
    # turn into NULLs on load
    con.execute(f"COPY ({sel}) TO "
                f"'{dest}/hits.tsv' (DELIMITER '\t', HEADER false, "
                f"NULLSTR '\\N', FORCE_QUOTE *)")
    return con.execute(
        f"SELECT COUNT(*) FROM read_csv('{dest}/hits.tsv', delim='\t', "
        f"header=false)").fetchone()[0]

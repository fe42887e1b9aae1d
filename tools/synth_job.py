"""Derive the 21-table IMDB/JOB schema from the driver's synthetic
testdata, for running the reference's verbatim join-order-benchmark
suite (resources/sql/job/initialize.sql + 113 queries; the reference's
CI gate is test/sqlite-datasets/job.test over the same files).

Same architecture as synth_tpcds.py: schemas parsed from the
reference's OWN initialize.sql, per-column name rules over hand-curated
literal pools (every `=`/`IN` literal and a satisfier for every LIKE
pattern the 113 queries use — harvested by grep), type-based fallbacks
elsewhere.  Facts (cast_info, movie_info, movie_keyword,
movie_companies) derive from lineitem; movies from orders; people from
customers; companies from parts; typed dimensions are generated.

Both engines read byte-identical exported files — the pools only make
the benchmark's selective literals ('marvel-cinematic-universe',
'[de]', 'Volker Boehm', LIKE '%Downey%Robert%') select real rows.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import types as T

REF_JOB = Path("/root/reference/resources/sql/job")

# ---------------------------------------------------------------------------
# literal pools (harvested from the 113 query files)
# ---------------------------------------------------------------------------

KEYWORDS = ["10,000-mile-club", "alienation", "based-on-comic",
            "based-on-novel", "blood", "character-name-in-title", "claw",
            "computer-animated-movie", "computer-animation", "death",
            "dignity", "female-nudity", "fight", "gore",
            "hand-to-hand-combat", "hero", "hospital", "laser", "loner",
            "magnet", "martial-arts", "marvel-cinematic-universe",
            "marvel-comics", "murder", "murder-in-title", "nerd",
            "revenge", "second-part", "second-part-sequel", "sequel",
            "superhero", "tv-special", "violence", "web"]

TITLES = ["Shrek 2", "Kung Fu Panda 2", "Saw IV", "Vampire Diaries",
          "One Piece Movie", "Dragon Ball Z: Battle", "Birdemic: Shock",
          "Champion of the Ring", "Loser Takes All", "Freddy vs Jason",
          "Money Train", "Mord in Berlin", "Murder She Wrote",
          "the murder case", "Scary Movie", "Iron Man Returns",
          "The Dark Tower", "Spring Days", "Night Watch", "Golden Hour"]

NAMES = ["Downey, Robert Jr.", "Burton, Tim", "Angeli, Bert",
         "Anderson, Neo", "Brown, Dan", "Xavier, Charles",
         "Zeta, Catherine", "Young, Sean", "Manning, Peyton",
         "Freeman, Morgan", "Tony Stark", "Queen", "Smith, Will",
         "Jones, Amy", "Miller, Ann", "Davis, Kate",
         # repeats = skew: the LIKE-satisfiers carry several joins
         "Angeli, Bert", "Young, Sean", "Angeli, Bert", "Burton, Tim"]

CHAR_NAMES = ["Tony Stark", "Iron Man", "Queen", "Angel",
              "Sherlock Holmes", "James Bond", "Hero One",
              "Dark Knight", "Agent X", "Captain"]

COMPANIES = ["DreamWorks Animation", "YouTube", "Warner Bros. Pictures",
             "20th Century Fox Home Entertainment",
             "Twentieth Century Fox Film Corporation",
             "Lionsgate Films", "Best Film Company", "Studio Canal",
             "Polygram Pictures", "Mosfilm"]

COUNTRY_CODES = ["[us]", "[de]", "[jp]", "[nl]", "[ru]", "[sm]", "[pl]",
                 "[gb]", "[fr]", "[it]"]

CAST_NOTES = ["(voice)", "(voice: English version)",
              "(voice: Japanese version)", "(uncredited)", "(producer)",
              "(executive producer)", "(as himself)", "",
              # the q25/q30/q31 writer-note family
              "(writer)", "(head writer)", "(written by)", "(story)",
              "(story editor)", "(voice) (uncredited)"]

MC_NOTES = ["(co-production)", "(presents)",
            "(1994) (USA) (VHS)", "(2006) (Japan) (TV)",
            "(2007) (France) (theatrical)",
            "(2005) (worldwide) (theatrical)", "(2008) (USA) (Blu-ray)",
            "(2010) (internet)", "(2009) (USA) (theatrical)", ""]

GENRES = ["Drama", "Horror", "Action", "Crime", "Family", "Sci-Fi",
          "Thriller", "War", "Western", "Comedy"]
COUNTRIES = ["USA", "Germany", "Sweden", "Denmark", "Norway", "Bulgaria",
             "America", "Finland"]
LANGUAGES = ["English", "German", "Swedish", "Danish", "Denish",
             "Norwegian", "American", "French"]
RELEASES = ["USA: May 2005", "USA: June 199", "USA: April 2008",
            "USA: March 2010", "Japan: May 2007", "Japan: June 2010",
            "Japan: April 1999", "USA: May 2012"]

INFO_TYPES = ["rating", "votes", "genres", "countries", "release dates",
              "budget", "top 250 rank", "bottom 10 rank", "languages",
              "trivia", "height", "mini biography"] + \
             [f"info type {i}" for i in range(12, 113)]

KIND_TYPES = ["movie", "tv movie", "video movie", "video game",
              "episode", "tv series", "series"]
ROLE_TYPES = ["actor", "actress", "writer", "producer", "director",
              "costume designer", "cinematographer", "composer",
              "editor", "miscellaneous crew", "production designer",
              "guest"]
COMPANY_TYPES = ["production companies", "distributors",
                 "special effects companies", "miscellaneous companies"]
COMP_CAST_TYPES = ["cast", "crew", "complete", "complete+verified"]
LINK_TYPES = ["sequel", "follows", "followed by", "references",
              "referenced in", "features", "featured in", "remake of",
              "spin off", "version of"]


def _case(key: str, values: list[str]) -> str:
    arms = " ".join(f"WHEN {i} THEN '{v}'" for i, v in enumerate(values))
    return f"CASE ({key}) % {len(values)} {arms} END"


def _it(name: str) -> int:
    """1-based info_type id for a named info type."""
    return INFO_TYPES.index(name) + 1


_RK = "(l_orderkey * 37 + l_partkey * 11 + l_suppkey * 5)"
_FACT = ("(SELECT l.*, ROW_NUMBER() OVER (ORDER BY l_orderkey, "
         "l_linenumber, l_partkey, l_suppkey) AS _rid FROM lineitem l)")

# movie_info value depends on its info_type (queries pin the pair:
# it.info = 'genres' AND mi.info = 'Drama')
_MI_TYPES = ["genres", "countries", "languages", "release dates",
             "budget", "trivia"]


def _mi_info(key: str, type_pick: str) -> str:
    arms = {
        "genres": _case(key, GENRES),
        "countries": _case(key, COUNTRIES),
        "languages": _case(key, LANGUAGES),
        "release dates": _case(key, RELEASES),
        "budget": f"'$' || CAST(({key}) % 90000000 + 100000 AS STRING)",
        "trivia": f"'trivia ' || CAST(({key}) % 1000 AS STRING)",
    }
    w = " ".join(f"WHEN {_it(t)} THEN {arms[t]}" for t in _MI_TYPES)
    return f"CASE {type_pick} {w} END"


def _table_specs() -> dict[str, tuple[str, str, dict[str, str]]]:
    specs: dict[str, tuple[str, str, dict[str, str]]] = {}

    specs["title"] = ("orders", "o_orderkey", {
        "id": "o_orderkey",
        "title": _case("o_orderkey", TITLES),
        "imdb_index": "NULL",
        "kind_id": "o_orderkey % 7 + 1",
        # gcd(7, 66) = 1 so every year 1950..2015 is hit, covering
        # =1998 / =2007 / >2014 / between 1950 and 1980.  The 1/571
        # family is q7b's needle: person 105 is a natural 'Volker
        # Boehm' mini-biography 'D%'-pcode male (105 = lcm(7,3,5)); his
        # movies just need the 1980-84 year and a 'features' link
        # (see cast_info / movie_link)
        "production_year": "CASE WHEN o_orderkey % 571 = 7 THEN 1982 "
                           "WHEN o_orderkey % 7212 = 12 THEN 1998 "
                           "ELSE 1950 + (o_orderkey * 7) % 66 END",
        "imdb_id": "NULL",
        "phonetic_code": "'T' || CAST(o_orderkey % 100 AS STRING)",
        "episode_of_id":
            "CASE WHEN o_orderkey % 5 = 0 THEN CAST(o_orderkey / 5 AS INTEGER) "
            "ELSE NULL END",
        "season_nr": "o_orderkey % 10 + 1",
        # covers episode_nr >= 5 / >= 50 / < 100
        "episode_nr": "o_orderkey % 120",
        "series_years": "'1998-2004'",
        "md5sum": "NULL",
    })

    specs["name"] = ("customer", "c_custkey", {
        "id": "c_custkey",
        "name": _case("c_custkey", NAMES),
        "imdb_index": "NULL",
        "imdb_id": "NULL",
        "gender": "CASE c_custkey % 3 WHEN 0 THEN 'm' WHEN 1 THEN 'f' "
                  "ELSE NULL END",
        "name_pcode_cf": _case("c_custkey", ["D123", "A512", "B651",
                                             "X145", "Z313"]),
        "name_pcode_nf": "'N' || CAST(c_custkey % 99 AS STRING)",
        "surname_pcode": "'S' || CAST(c_custkey % 99 AS STRING)",
        "md5sum": "NULL",
    })

    specs["aka_name"] = ("customer", "c_custkey", {
        "id": "c_custkey",
        "person_id": "c_custkey",
        "name": _case("c_custkey + 3", NAMES),
        "imdb_index": "NULL",
        "name_pcode_cf": _case("c_custkey + 1", ["D123", "A512", "B651"]),
        "name_pcode_nf": "'N' || CAST(c_custkey % 99 AS STRING)",
        "surname_pcode": "'S' || CAST(c_custkey % 99 AS STRING)",
        "md5sum": "NULL",
    })

    specs["char_name"] = ("customer", "c_custkey", {
        "id": "c_custkey",
        "name": _case("c_custkey", CHAR_NAMES),
        "imdb_index": "NULL",
        "imdb_id": "NULL",
        "name_pcode_nf": "'C' || CAST(c_custkey % 99 AS STRING)",
        "surname_pcode": "NULL",
        "md5sum": "NULL",
    })

    specs["company_name"] = ("part", "p_partkey", {
        "id": "p_partkey",
        "name": _case("p_partkey", COMPANIES),
        "country_code": "CASE WHEN p_partkey % 2 = 0 THEN '[us]' ELSE "
        + _case("CAST(floor((p_partkey) / 2) AS INTEGER) * 3 + 1", COUNTRY_CODES)
        + " END",
        "imdb_id": "NULL",
        "name_pcode_nf": _case("p_partkey", ["D123", "W163", "L523"]),
        "name_pcode_sf": "NULL",
        "md5sum": "NULL",
    })

    for nm, pool in [("info_type", INFO_TYPES), ("kind_type", KIND_TYPES),
                     ("role_type", ROLE_TYPES),
                     ("company_type", COMPANY_TYPES),
                     ("comp_cast_type", COMP_CAST_TYPES),
                     ("link_type", LINK_TYPES)]:
        col = {"info_type": "info", "kind_type": "kind",
               "role_type": "role", "company_type": "kind",
               "comp_cast_type": "kind", "link_type": "link"}[nm]
        specs[nm] = (f"range({len(pool)}) t(i)", "i", {
            "id": "i + 1",
            col: _case("i", pool),
        })

    specs["keyword"] = ("range(200) t(i)", "i", {
        "id": "i + 1",
        "keyword": _case("i", KEYWORDS + [f"kw-{j}" for j in range(34)]),
        "phonetic_code": "'K' || CAST(i % 99 AS STRING)",
    })

    # q8a/b/d needle: those queries demand one movie carrying a
    # 5-table conjunction (English-dub voice note + actress role + a
    # 'Yo' name with an aka row + a [jp] company with a Japan/2006
    # note + a 2006 'One Piece' title).  Movies with id = 404 mod 660
    # NATURALLY have title 'One Piece Movie' and production_year 2006
    # (TITLES index 4, year residue 8 mod 66); their cast and company
    # rows are pinned to the remaining literals (person 7 is
    # 'Young, Sean' with an aka row; company 15 is '[jp]'; role 2 is
    # 'actress').
    _q8m = "(l_orderkey % 660 = 404)"
    specs["cast_info"] = (_FACT, _RK, {
        "id": "_rid",
        "person_id": f"CASE WHEN {_q8m} THEN 7 "
                     "WHEN l_orderkey % 571 = 7 THEN 105 ELSE "
                     f"({_RK} * 13 + 1) % (SELECT COUNT(*) FROM customer) "
                     "END",
        "movie_id": "l_orderkey",
        "person_role_id":
            f"CASE WHEN CAST(floor((({_RK})) / 48) AS INTEGER) % 4 = 0 THEN NULL "
            f"ELSE ({_RK}) % (SELECT COUNT(*) FROM customer) END",
        "note": f"CASE WHEN {_q8m} THEN '(voice: English version)' "
                f"WHEN CAST(floor((({_RK})) / 12) AS INTEGER) % 3 = 0 "
                f"THEN '(voice)' ELSE "
                + _case(f"CAST(floor((({_RK})) / 36) AS INTEGER) * 5 + 2",
                        CAST_NOTES) + " END",
        "nr_order": f"({_RK}) % 10 + 1",
        # the ELSE stratum must be DISJOINT from the %4 gate: with
        # `RK % 12 + 1`, role 6 needs RK%12=5 which forces RK%4=1 —
        # routed to the actor/actress branch, so half the role types
        # (costume designer among them, q8d) were unassignable
        "role_id": f"CASE WHEN {_q8m} THEN 2 "
                   f"WHEN ({_RK}) % 4 < 2 THEN ({_RK}) % 2 + 1 "
                   f"ELSE CAST(floor(({_RK}) / 4) AS INTEGER) "
                   f"% {len(ROLE_TYPES)} + 1 END",
    })

    # q27a/b needle: movies = 12 mod 7212 NATURALLY carry a 'cast'
    # subject + 'complete' status complete_cast row, a movie_link
    # source row, and a 1950-2000 production year — the remaining legs
    # (Warner production company with a NULL note, 'sequel' keyword,
    # 'Sweden' movie_info, 'follows' link) are pinned below.
    _q27m = "(l_orderkey % 7212 = 12)"
    specs["movie_companies"] = (_FACT, _RK, {
        "id": "_rid",
        "movie_id": "l_orderkey",
        "company_id": f"CASE WHEN {_q8m} THEN 15 "
                      f"WHEN {_q27m} THEN 2 ELSE "
                      f"({_RK} * 3 + 2) % (SELECT COUNT(*) FROM part) END",
        "company_type_id": f"CASE WHEN {_q27m} THEN 1 "
                           f"WHEN ({_RK}) % 10 < 5 THEN 1 "
                           f"WHEN ({_RK}) % 10 < 8 THEN 2 "
                           f"ELSE ({_RK}) % 2 + 3 END",
        # stratum /40 sits ABOVE company_type_id's rk%10 window — a /4
        # stratum is 4-wide inside rk%40 and CRT-locks note x type
        # (q21's "note IS NULL AND production companies" was
        # unsatisfiable)
        "note": f"CASE WHEN {_q8m} THEN '(2006) (Japan) (TV)' "
                f"WHEN {_q27m} THEN NULL ELSE "
                + _case(f"CAST(floor((({_RK})) / 40) AS INTEGER) * 7 + 1",
                        MC_NOTES) + " END",
    })

    specs["movie_keyword"] = (_FACT, _RK, {
        "id": "_rid",
        "movie_id": "l_orderkey",
        # 30 = 'sequel' (q27 family)
        "keyword_id": f"CASE WHEN {_q27m} THEN 30 ELSE "
                      f"({_RK} * 7 + 3) % 200 + 1 END",
    })

    mi_type = f"(({_RK}) % {len(_MI_TYPES)})"
    mi_type_id = (f"CASE {mi_type} " + " ".join(
        f"WHEN {i} THEN {_it(t)}" for i, t in enumerate(_MI_TYPES))
        + " END")
    specs["movie_info"] = (_FACT, _RK, {
        "id": "_rid",
        "movie_id": "l_orderkey",
        "info_type_id": mi_type_id,
        "info": f"CASE WHEN {_q27m} THEN 'Sweden' ELSE "
                + _mi_info(f"CAST(floor((({_RK})) / 6) AS INTEGER) * 3 + 1",
                           mi_type_id) + " END",
        # q15/q23 grep mi.note for '%internet%'
        "note": f"CASE CAST(floor((({_RK})) / 7) AS INTEGER) % 3 "
                f"WHEN 0 THEN 'internet release' "
                f"WHEN 1 THEN 'tv broadcast' ELSE NULL END",
    })

    # every movie gets all four idx rows so rating-AND-votes joins on
    # the same movie are satisfiable; ratings are one-decimal strings
    # ('2.0'..'9.9') so the corpus's lexicographic > '8.0' works
    idx_src = ("(SELECT o_orderkey, it.id AS _itid, "
               "o_orderkey * 4 + it.rn AS _rid FROM orders, "
               f"(SELECT 1 AS rn, {_it('rating')} AS id UNION ALL "
               f" SELECT 2, {_it('votes')} UNION ALL "
               f" SELECT 3, {_it('top 250 rank')} UNION ALL "
               f" SELECT 4, {_it('bottom 10 rank')}) it)")
    rating = ("CAST((o_orderkey * 13 + 20) % 80 / 10 AS STRING) || '.' "
              "|| CAST((o_orderkey * 7) % 10 AS STRING)")
    specs["movie_info_idx"] = (idx_src, "o_orderkey", {
        "id": "_rid",
        "movie_id": "o_orderkey",
        "info_type_id": "_itid",
        "info": (f"CASE _itid WHEN {_it('rating')} THEN "
                 f"CAST((o_orderkey * 13) % 8 + 2 AS STRING) || '.' || "
                 f"CAST((o_orderkey * 7) % 10 AS STRING) "
                 f"WHEN {_it('votes')} THEN "
                 f"CAST((o_orderkey * 31) % 100000 + 5 AS STRING) "
                 f"ELSE CAST((o_orderkey) % 250 + 1 AS STRING) END"),
        "note": "NULL",
    })
    del rating

    specs["person_info"] = ("customer", "c_custkey", {
        "id": "c_custkey",
        "person_id": "c_custkey",
        "info_type_id": (f"CASE c_custkey % 3 WHEN 0 THEN "
                         f"{_it('mini biography')} WHEN 1 THEN "
                         f"{_it('trivia')} ELSE {_it('height')} END"),
        "info": "'info ' || CAST(c_custkey AS STRING)",
        # q's producer-pin: pi.note = 'Volker Boehm'
        "note": "CASE WHEN c_custkey % 7 = 0 THEN 'Volker Boehm' "
                "ELSE 'note ' || CAST(c_custkey % 50 AS STRING) END",
    })

    specs["aka_title"] = ("orders", "o_orderkey", {
        "id": "o_orderkey",
        "movie_id": "o_orderkey",
        "title": _case("o_orderkey + 7", TITLES),
        "imdb_index": "NULL",
        "kind_id": "o_orderkey % 7 + 1",
        "production_year": "1950 + (o_orderkey * 11) % 66",
        "phonetic_code": "NULL",
        "episode_of_id": "NULL",
        "season_nr": "NULL",
        "episode_nr": "NULL",
        "note": "NULL",
        "md5sum": "NULL",
    })

    specs["movie_link"] = (
        "(SELECT o_orderkey FROM orders WHERE o_orderkey % 3 = 0) t",
        "o_orderkey", {
            "id": "CAST(floor(o_orderkey / 3) AS INTEGER) + 1",
            "movie_id": "o_orderkey",
            "linked_movie_id":
                "CASE WHEN o_orderkey % 571 = 10 THEN o_orderkey - 3 "
                "ELSE (o_orderkey * 7 + 3) % (SELECT MAX(o_orderkey) + 1 "
                "FROM orders) END",
            "link_type_id": ("CASE WHEN o_orderkey % 571 = 10 THEN 6 "
                             "WHEN o_orderkey % 7212 = 12 THEN 2 "
                             f"ELSE o_orderkey % {len(LINK_TYPES)} + 1 "
                             "END"),
        })

    specs["complete_cast"] = (
        "(SELECT o_orderkey FROM orders WHERE o_orderkey % 2 = 0) t",
        "o_orderkey", {
            "id": "CAST(floor(o_orderkey / 2) AS INTEGER) + 1",
            "movie_id": "o_orderkey",
            "subject_id": "o_orderkey % 2 + 1",       # cast / crew
            "status_id": "CAST(floor(o_orderkey / 2) AS INTEGER) % 2 + 3",  # complete / +verified
        })

    return specs


def _fallback(field: T.StructField, key: str, ci: int) -> str:
    dt = field.dataType
    if isinstance(dt, (T.IntegerType, T.LongType)):
        return f"(({key}) * 17 + {ci * 7 + 1}) % 1000"
    return f"'v{ci}_' || CAST(({key}) % 1000 AS STRING)"


def table_selects() -> dict[str, str]:
    """The derivation SELECT for every table, keyed by name — selects
    reference the base parquet tables by bare name, so they run in the
    export connection or as oracle CTEs over pre-registered views."""
    from lingo_db_spark import ddl

    specs = _table_specs()
    init = (REF_JOB / "initialize.sql").read_text()
    sels: dict[str, str] = {}
    for stmt in ddl.split_script(init):
        parsed = ddl.parse_create_table(stmt)
        if parsed is None:
            continue
        name, schema, _pk = parsed
        frm, key, rules = specs[name]
        cols = []
        for ci, f in enumerate(schema.fields):
            expr = rules.get(f.name, _fallback(f, key, ci))
            cols.append(f"{expr} AS {f.name}")
        unknown = set(rules) - {f.name for f in schema.fields}
        if unknown:
            raise ValueError(f"{name}: rules for unknown columns "
                             f"{sorted(unknown)}")
        sels[name] = f"SELECT {', '.join(cols)} FROM {frm}"
    return sels


def export_job(sf_dir: str, dest: Path) -> dict[str, int]:
    """Write all 21 .csv files; returns per-table row counts."""
    import duckdb

    con = duckdb.connect()
    for t in ("customer", "part", "orders", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    counts: dict[str, int] = {}
    for name, sel in table_selects().items():
        con.execute(f"COPY ({sel}) TO '{dest}/{name}.csv' "
                    f"(DELIMITER ',', HEADER false)")
        counts[name] = con.execute(
            f"SELECT COUNT(*) FROM read_csv('{dest}/{name}.csv', "
            f"delim=',', header=false, quote='\"')").fetchone()[0]
    return counts

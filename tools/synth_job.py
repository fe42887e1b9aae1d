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


# ---------------------------------------------------------------------------
# Round-9 'b'-variant needle families.  Pattern (established by the
# q8/q7b/q27 families): pick a movie-id residue class whose NATURAL
# legs (title pool index = id % 20, production_year = 1950 + id*7 % 66,
# kind_id = id % 7 + 1, complete_cast strata on id mod 8) already
# satisfy the query, then pin only the missing satellite attributes in
# the fact tables.  Residues are chosen by CRT so families are pairwise
# disjoint (checked mod gcd of any two moduli).  Each comment lists the
# queries served and the legs that come free.
# ---------------------------------------------------------------------------

# 23b + 15b: id%924=574 -> kind 'movie' (574%7=0), year 2008, even+2mod4
# so complete_cast status = 'complete+verified'.  Pins: mi (release
# dates, 'USA: May 2005', note internet), mk nerd, mc YouTube-[us] with
# a '(worldwide)' 200x note.
_FAM_C = 574, 924
# 19b: id%660=621 -> title 'Kung Fu Panda 2' (621%20=1), year 2007.
# Pins: ci voice-actress 'Angeli, Bert' (f, %Angel%), mi 'USA: April
# 2008', mc [us] company with worldwide-200x note.
_FAM_E = 621, 660
# 24b: id%660=301 -> title 'Kung Fu Panda 2', year 2011 (>2010).  Pins:
# ci voice-actress 16, mi 'USA: March 2010', mc DreamWorks, mk hero.
_FAM_F = 301, 660
# 20b + 26a/b/c: id%1848=1442 -> kind 'movie', year 2012, cc (cast,
# complete+verified) (1442%8=2).  Pins: ci person 20 'Downey, Robert
# Jr.' as char 11 'Iron Man' (matches both 20b's Tony/Iron and 26's
# %Man%), mk superhero, rating '8.1' (q26's > '8.0' leg: under the cc
# strata 'cast' movies are 0/2 mod 8 whose natural ratings are 2.x/4.x
# — CRT-exclusive with > '7.0', so the family pins it).
_FAM_G = 1442, 1848
# 25b: id%660=103 -> title 'Vampire Diaries', year 2011.  Pins: ci
# (writer) by male person 21, mi genres 'Horror', mk murder.
_FAM_H = 103, 660
# 28a/28b: id%9240=28 -> kind 'movie', year 2014, cc (crew, complete),
# natural rating '6.6' (in ('6.5','8.5')).  Pins: mi countries
# 'Germany', mk murder, mc non-us company 1 with Japan-2006 note.
_FAM_I = 28, 9240
# 29a/29b: id%264=234 -> cc (cast, complete+verified) (234%8=2).  Pins:
# title 'Shrek 2' + year 2004 (the %20 title leg is CRT-blocked by the
# mod-8 cc leg, so both are pinned), ci voice-actresses 16 (trivia
# person-info) and 76 (height-pinned), char 2 'Queen', mi 'USA: May
# 2005', mc [us], mk computer-animation.
_FAM_J = 234, 264
# 31b: id%660=602 -> title 'Saw IV', year 2006.  Pins: ci (writer) by
# male 21, mi genres 'Horror', mk murder, mc Lionsgate with Blu-ray
# note.
_FAM_K = 602, 660
# 33a/33b: t1 id%462=180 links (lt 'follows') to t2 = id-21 (%462=159),
# both kind 'tv series' (%7=5); t2 year 2007 natural, t2 rating pinned
# '2.0' (< '3.0'; year-2007 and rating-2.x residues are CRT-exclusive),
# t1 companies alternate [us]/[nl].
_FAM_L1 = 180, 462
_FAM_L2 = 159, 462


def _fam(key: str, fam: tuple[int, int]) -> str:
    r, m = fam
    return f"({key} % {m} = {r})"


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
        # q11b: half the q27 family (the 7224-class mod 14424) gets the
        # '%Money%' title its 1998-year movie-link chain needs; q29's
        # family needs 'Shrek 2' on a mod-8 cc residue the %20 title
        # leg can't reach
        "title": f"CASE WHEN o_orderkey % 14424 = 7224 THEN 'Money Train' "
                 f"WHEN {_fam('o_orderkey', _FAM_J)} THEN 'Shrek 2' ELSE "
                 + _case("o_orderkey", TITLES) + " END",
        "imdb_index": "NULL",
        "kind_id": "o_orderkey % 7 + 1",
        # gcd(7, 66) = 1 so every year 1950..2015 is hit, covering
        # =1998 / =2007 / >2014 / between 1950 and 1980.  The 1/571
        # family is q7b's needle: person 105 is a natural 'Volker
        # Boehm' mini-biography 'D%'-pcode male (105 = lcm(7,3,5)); his
        # movies just need the 1980-84 year and a 'features' link
        # (see cast_info / movie_link).  The 14436-class mod 21636 is
        # q21b's needle (a 2000-2010 'Germany' member of the q27
        # family); q29's family needs the 2000-2005 window.
        "production_year": "CASE WHEN o_orderkey % 571 = 7 THEN 1982 "
                           "WHEN o_orderkey % 21636 = 14436 THEN 2005 "
                           "WHEN o_orderkey % 7212 = 12 THEN 1998 "
                           f"WHEN {_fam('o_orderkey', _FAM_J)} THEN 2004 "
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
        # q15b pins a '[us]' YouTube: the name leg (p%10=1) and the
        # odd-branch '[us]' residue are CRT-incompatible, so company 11
        # (natural name 'YouTube') gets its country pinned
        "country_code": "CASE WHEN p_partkey = 11 THEN '[us]' "
        "WHEN p_partkey % 2 = 0 THEN '[us]' ELSE "
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
    # r9 family cast pins: person 16/76 = 'Angeli, Bert' (f, matches
    # %Angel% and %An%; 76's person_info is height-pinned for q29b),
    # person 20 = 'Downey, Robert Jr.', person 21 = male writer; chars
    # 10 = 'Tony Stark', 2 = 'Queen', 16 = any (non-null for q19b/q24b)
    _mv = "l_orderkey"
    _voice_fams = (f"{_fam(_mv, _FAM_E)} OR {_fam(_mv, _FAM_F)} "
                   f"OR {_fam(_mv, _FAM_J)}")
    _writer_fams = f"{_fam(_mv, _FAM_H)} OR {_fam(_mv, _FAM_K)}"
    specs["cast_info"] = (_FACT, _RK, {
        "id": "_rid",
        "person_id": f"CASE WHEN {_q8m} THEN 7 "
                     "WHEN l_orderkey % 571 = 7 THEN 105 "
                     f"WHEN {_fam(_mv, _FAM_J)} THEN 16 + 60 * (_rid % 2) "
                     f"WHEN {_fam(_mv, _FAM_E)} OR {_fam(_mv, _FAM_F)} "
                     f"THEN 16 "
                     f"WHEN {_fam(_mv, _FAM_G)} THEN 20 "
                     f"WHEN {_writer_fams} THEN 21 ELSE "
                     f"({_RK} * 13 + 1) % (SELECT COUNT(*) FROM customer) "
                     "END",
        "movie_id": "l_orderkey",
        "person_role_id":
            f"CASE WHEN {_fam(_mv, _FAM_J)} THEN 2 "
            f"WHEN {_fam(_mv, _FAM_E)} OR {_fam(_mv, _FAM_F)} THEN 16 "
            f"WHEN {_fam(_mv, _FAM_G)} THEN 11 "
            f"WHEN CAST(floor((({_RK})) / 48) AS INTEGER) % 4 = 0 THEN NULL "
            f"ELSE ({_RK}) % (SELECT COUNT(*) FROM customer) END",
        "note": f"CASE WHEN {_q8m} THEN '(voice: English version)' "
                f"WHEN {_voice_fams} THEN '(voice)' "
                f"WHEN {_writer_fams} THEN '(writer)' "
                f"WHEN CAST(floor((({_RK})) / 12) AS INTEGER) % 3 = 0 "
                f"THEN '(voice)' ELSE "
                + _case(f"CAST(floor((({_RK})) / 36) AS INTEGER) * 5 + 2",
                        CAST_NOTES) + " END",
        "nr_order": f"({_RK}) % 10 + 1",
        # the ELSE stratum must be DISJOINT from the %4 gate: with
        # `RK % 12 + 1`, role 6 needs RK%12=5 which forces RK%4=1 —
        # routed to the actor/actress branch, so half the role types
        # (costume designer among them, q8d) were unassignable
        "role_id": f"CASE WHEN {_q8m} OR {_voice_fams} THEN 2 "
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
    # r9 family company pins: 11 = YouTube-[us] (q15b), 10 = DreamWorks
    # [us] (q24b; also the generic [us] leg for q19b/q29), 1 = [de]
    # non-us (q28), 5 = Lionsgate (q31b), 2/9 = [us]/[nl] alternating
    # on t1 of the q33 link pair
    specs["movie_companies"] = (_FACT, _RK, {
        "id": "_rid",
        "movie_id": "l_orderkey",
        "company_id": f"CASE WHEN {_q8m} THEN 15 "
                      f"WHEN {_q27m} THEN 2 "
                      f"WHEN {_fam(_mv, _FAM_C)} THEN 11 "
                      f"WHEN {_fam(_mv, _FAM_E)} OR {_fam(_mv, _FAM_J)} "
                      f"THEN 10 "
                      f"WHEN {_fam(_mv, _FAM_F)} THEN 10 "
                      f"WHEN {_fam(_mv, _FAM_I)} THEN 1 "
                      f"WHEN {_fam(_mv, _FAM_K)} THEN 5 "
                      f"WHEN {_fam(_mv, _FAM_L1)} THEN 2 + 7 * (_rid % 2) "
                      "ELSE "
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
                f"WHEN {_q27m} THEN NULL "
                f"WHEN {_fam(_mv, _FAM_C)} OR {_fam(_mv, _FAM_E)} "
                f"THEN '(2005) (worldwide) (theatrical)' "
                f"WHEN {_fam(_mv, _FAM_I)} THEN '(2006) (Japan) (TV)' "
                f"WHEN {_fam(_mv, _FAM_K)} THEN '(2008) (USA) (Blu-ray)' "
                "ELSE "
                + _case(f"CAST(floor((({_RK})) / 40) AS INTEGER) * 7 + 1",
                        MC_NOTES) + " END",
    })

    specs["movie_keyword"] = (_FACT, _RK, {
        "id": "_rid",
        "movie_id": "l_orderkey",
        # 30 = 'sequel' (q27 family); 26 nerd (23b), 16 hero (24b),
        # 24 murder (25b/28/31b), 31 superhero (20b),
        # 9 computer-animation (29)
        "keyword_id": f"CASE WHEN {_q27m} THEN 30 "
                      f"WHEN {_fam(_mv, _FAM_C)} THEN 26 "
                      f"WHEN {_fam(_mv, _FAM_F)} THEN 16 "
                      f"WHEN {_fam(_mv, _FAM_G)} THEN 31 "
                      f"WHEN {_writer_fams} OR {_fam(_mv, _FAM_I)} THEN 24 "
                      f"WHEN {_fam(_mv, _FAM_J)} THEN 9 ELSE "
                      f"({_RK} * 7 + 3) % 200 + 1 END",
    })

    mi_type = f"(({_RK}) % {len(_MI_TYPES)})"
    mi_type_id = (f"CASE {mi_type} " + " ".join(
        f"WHEN {i} THEN {_it(t)}" for i, t in enumerate(_MI_TYPES))
        + " END")
    # r9 family movie_info pins: release-date rows for the USA:-pattern
    # families (info_type 5), genre 'Horror' rows for the writer
    # families, a 'Germany' countries row for q28 — type and info pin
    # together so the it.info = '...' join leg holds
    _rel_fams = (f"{_fam(_mv, _FAM_C)} OR {_fam(_mv, _FAM_E)} "
                 f"OR {_fam(_mv, _FAM_F)} OR {_fam(_mv, _FAM_J)}")
    specs["movie_info"] = (_FACT, _RK, {
        "id": "_rid",
        "movie_id": "l_orderkey",
        "info_type_id": f"CASE WHEN {_rel_fams} THEN {_it('release dates')} "
                        f"WHEN {_writer_fams} THEN {_it('genres')} "
                        f"WHEN {_fam(_mv, _FAM_I)} THEN {_it('countries')} "
                        f"ELSE {mi_type_id} END",
        "info": "CASE WHEN l_orderkey % 21636 = 14436 THEN 'Germany' "
                f"WHEN {_q27m} THEN 'Sweden' "
                f"WHEN {_fam(_mv, _FAM_C)} OR {_fam(_mv, _FAM_J)} "
                f"THEN 'USA: May 2005' "
                f"WHEN {_fam(_mv, _FAM_E)} THEN 'USA: April 2008' "
                f"WHEN {_fam(_mv, _FAM_F)} THEN 'USA: March 2010' "
                f"WHEN {_writer_fams} THEN 'Horror' "
                f"WHEN {_fam(_mv, _FAM_I)} THEN 'Germany' ELSE "
                + _mi_info(f"CAST(floor((({_RK})) / 6) AS INTEGER) * 3 + 1",
                           mi_type_id) + " END",
        # q15/q23 grep mi.note for '%internet%' — pinned on family C so
        # the note rides the same row as its 'USA: May 2005' info
        "note": f"CASE WHEN {_fam(_mv, _FAM_C)} THEN 'internet release' "
                f"ELSE CASE CAST(floor((({_RK})) / 7) AS INTEGER) % 3 "
                f"WHEN 0 THEN 'internet release' "
                f"WHEN 1 THEN 'tv broadcast' ELSE NULL END END",
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
        # q33's t2 family is rating-pinned: its year-2007 residue (odd
        # mod 66) and a 2.x rating residue (0 mod 8) are CRT-exclusive
        "info": (f"CASE _itid WHEN {_it('rating')} THEN "
                 f"CASE WHEN {_fam('o_orderkey', _FAM_L2)} THEN '2.0' "
                 f"WHEN {_fam('o_orderkey', _FAM_G)} THEN '8.1' "
                 f"ELSE CAST((o_orderkey * 13) % 8 + 2 AS STRING) || '.' || "
                 f"CAST((o_orderkey * 7) % 10 AS STRING) END "
                 f"WHEN {_it('votes')} THEN "
                 f"CAST((o_orderkey * 31) % 100000 + 5 AS STRING) "
                 f"ELSE CAST((o_orderkey) % 250 + 1 AS STRING) END"),
        "note": "NULL",
    })
    del rating

    specs["person_info"] = ("customer", "c_custkey", {
        "id": "c_custkey",
        "person_id": "c_custkey",
        # height-info people land on c%3=2, which is exactly the NULL
        # gender residue — q29b (female voice actress WITH a height
        # row) is CRT-blocked, so person 76 (female 'Angeli, Bert') is
        # height-pinned while her twin 16 keeps the natural trivia row
        # q29a needs
        "info_type_id": (f"CASE WHEN c_custkey = 76 THEN {_it('height')} "
                         f"WHEN c_custkey % 3 = 0 THEN "
                         f"{_it('mini biography')} WHEN c_custkey % 3 = 1 "
                         f"THEN {_it('trivia')} ELSE {_it('height')} END"),
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
            # q33 pair: every t1-family movie (kind 'tv series')
            # 'follows' the t2-family movie 21 below it (id-21 is
            # ≡ 159 mod 462: tv series, year 2007, rating-pinned 2.0)
            "linked_movie_id":
                "CASE WHEN o_orderkey % 571 = 10 THEN o_orderkey - 3 "
                f"WHEN {_fam('o_orderkey', _FAM_L1)} THEN o_orderkey - 21 "
                "ELSE (o_orderkey * 7 + 3) % (SELECT MAX(o_orderkey) + 1 "
                "FROM orders) END",
            "link_type_id": ("CASE WHEN o_orderkey % 571 = 10 THEN 6 "
                             "WHEN o_orderkey % 7212 = 12 THEN 2 "
                             f"WHEN {_fam('o_orderkey', _FAM_L1)} THEN 2 "
                             f"ELSE o_orderkey % {len(LINK_TYPES)} + 1 "
                             "END"),
        })

    # subject rides floor(id/4), status floor(id/2): over even movie
    # ids all four cast/crew x complete/+verified combos occur (id mod
    # 8 = 0:(cast,complete) 2:(cast,+verified) 4:(crew,complete)
    # 6:(crew,+verified)).  The old `id % 2 + 1` subject was constant 1
    # over the even-id source — 'crew' never existed, which alone
    # emptied q28a/b.
    specs["complete_cast"] = (
        "(SELECT o_orderkey FROM orders WHERE o_orderkey % 2 = 0) t",
        "o_orderkey", {
            "id": "CAST(floor(o_orderkey / 2) AS INTEGER) + 1",
            "movie_id": "o_orderkey",
            "subject_id": "CAST(floor(o_orderkey / 4) AS INTEGER) % 2 + 1",
            "status_id": "CAST(floor(o_orderkey / 2) AS INTEGER) % 2 + 3",
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

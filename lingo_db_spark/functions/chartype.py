"""char(n) semantics — the reference's fixed-size character model.

Reference storage model (src/compiler/Conversion/DBToStd/LowerToStd.cpp:
334-336, 384-388): ``char(1)`` values are stored as i32 codepoints and
compared as integers; ``char(n>1)`` values are stored as plain strings
AS-IS (no space padding).  Type promotion (src/compiler/frontend/
sql_analyzer.cpp:2985-2992): comparing two chars of EQUAL declared
length compares directly; comparing chars of UNEQUAL lengths promotes
both sides to ``string`` and compares the raw values — NOT the ANSI
padded-CHAR comparison.  So ``char(2) 'BU' = char(4) 'BU  '`` is FALSE
here (ANSI padding would say TRUE); that divergence is the pinned,
test-covered behavior.

Spark's own DDL ``CHAR(n)`` pads on write and on literal comparison
(ANSI), which is exactly what the reference does not do — hence these
helpers operate on plain StringType columns and never route through
Spark's CharType.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def char_value(col: Column | str, n: int) -> Column:
    """Cast a string to char(n): keep the first n characters, as-is (no
    padding — reference stores char(n>1) as the raw string,
    LowerToStd.cpp:334-336)."""
    return F.substring(_c(col), 1, n)


def char1_code(col: Column | str) -> Column:
    """char(1) in its storage representation: the i32 codepoint of the
    first character (LowerToStd.cpp:164-166 stores len<=1 chars as i32)."""
    return F.ascii(F.substring(_c(col), 1, 1)).cast("int")


def char_eq(a: Column | str, alen: int, b: Column | str, blen: int) -> Column:
    """Equality under reference char semantics.

    - both char(1): integer codepoint compare (the LowerToStd.cpp:384-388
      fast path);
    - equal lengths: direct string compare;
    - unequal lengths: both sides promote to string and compare raw
      values (sql_analyzer.cpp:2985-2992) — trailing spaces are
      SIGNIFICANT, unlike ANSI padded CHAR comparison."""
    if alen == 1 and blen == 1:
        return char1_code(a) == char1_code(b)
    return _c(a) == _c(b)

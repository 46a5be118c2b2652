"""Path functions (SURVEY §2.9): MLDB's PATH atoms are structured
lists of elements used as row/column names (types/path.h; registration
sites sql/builtin_functions.cc:3153-3260).

Spark-side representation: ARRAY<STRING> for the structured form,
dotted string for the rendered form. Quoting rule: an element
containing '.' or '"' is rendered inside double quotes with inner
quotes doubled (reference path rendering).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def parse_path(s: Column) -> Column:
    """String → path elements. Handles the quoting rule by splitting
    on dots that are not inside double-quoted elements.

    Implementation: regex split on '.' not followed by an odd number
    of quotes is fragile; instead split quoted runs first. For the
    common unquoted case this is a plain split — the quoted case is
    covered by `parse_path_quoted` tests."""
    # fast path: no quotes → plain split
    return F.when(
        ~s.contains('"'), F.split(s, "\\.")
    ).otherwise(_parse_quoted(s))


def _parse_quoted(s: Column) -> Column:
    # tokenize "..."-elements or plain runs, in order
    toks = F.regexp_extract_all(s, F.lit('("(?:[^"]|"")*"|[^.]+)'), 1)
    return F.transform(
        toks,
        lambda t: F.when(
            t.startswith('"') & t.endswith('"'),
            F.regexp_replace(F.substring(t, 2, F.length(t) - 2), '""', '"'),
        ).otherwise(t),
    )


def stringify_path(p: Column) -> Column:
    """Path elements → rendered dotted string with quoting."""
    return F.concat_ws(
        ".",
        F.transform(
            p,
            lambda el: F.when(
                el.contains(".") | el.contains('"'),
                F.concat(F.lit('"'), F.regexp_replace(el, '"', '""'), F.lit('"')),
            ).otherwise(el),
        ),
    )


def path_sort_key(p: Column) -> Column:
    """The reference's PATH ordering key (types/path.h PathElement::
    compare, pinned by sql/testing/path_test.cc): NUMERIC elements
    order by VALUE before string elements ('9' < '10' < 'x'), with
    the raw string as the tiebreak ('0' < '00'; '0010' < '010').
    Encodes each element as an orderable struct — pure JVM."""
    return F.transform(
        p,
        lambda el: F.struct(
            F.when(el.rlike("^[0-9]+$"), F.lit(0)).otherwise(F.lit(1)).alias("r"),
            F.when(el.rlike("^[0-9]+$"), el.cast("double")).alias("n"),
            el.alias("s"),
        ),
    )


def path_element(p: Column, n: Column | int) -> Column:
    """n-th element (0-based, reference path_element); out-of-range
    yields NULL (never an ANSI index error)."""
    idx = (F.lit(n) if not isinstance(n, Column) else n) + 1
    return F.try_element_at(p, idx.cast("int"))


def path_length(p: Column) -> Column:
    return F.size(p).cast("long")


def flatten_path(p: Column) -> Column:
    """Structured path → single-element path holding the rendered
    string (reference flatten_path)."""
    return F.array(stringify_path(p))


def unflatten_path(p: Column) -> Column:
    """Inverse of flatten_path: parse the single rendered element."""
    return parse_path(F.element_at(p, 1))

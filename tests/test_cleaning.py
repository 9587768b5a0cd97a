"""Text-cleaning family (functions/cleaning.py) — cross-engine parity
on hostile inputs, the composition-order contract, and the per-rule
semantics. The oracle-paired surface is q27's 'clean' and
'clean_docs' legs (which hash-check cleaned text VERBATIM on
deterministically-dirtied docs)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from unimib_simpss_spark.functions import cleaning as C

# Hostile inputs: every class the pipeline claims to handle, plus the
# traps (math '<', unclosed tags, double-encoded entities, URLs with
# trailing punctuation, astral-plane chars, CRLF, NULs).
HOSTILE = [
    None,
    "",
    "   ",
    "plain ascii text",
    "<p>Hello <b>world</b></p> rest",
    "see https://example.com/a?b=1&amp;c=2 and www.foo.org/path, ok",
    "math: 3 < 4 and 5 > 2 stays",
    "‘smart’ “quotes” – dash — em … end",
    "​zero‌width‍ joins﻿",
    "ctrl\x00\x07\x1fchars\x7f kept\ttab\nline",
    "fullｗｉｄｔｈ ＡＢＣ!",
    "ligatures: ﬁsh ﬂow oﬃce",
    "&lt;tag&gt; &amp; &amp;amp; &quot;q&quot; &#39;a&#39; &nbsp;sp",
    "emoji \U0001f600 stays \U0001f680",
    "crlf\r\nline\rlone",
    "multi   spaces\t\ttabs\n\n\n\nblanks",
    "<a href='http://x.io/1'>link</a> tail",
    "unclosed <tag still here",
    "WWW.UPPER.COM and HTTPS://X.Y gone",
    "nbsp and　ideo  narrow",
    "a<!-- comment -->b",
    "url at eol https://end.com/x",
    "soft­hyphen",
    "vertical\x0btab url https://a.b/c\x0bafter",
    "see https://x.com Chapter 2 begins",
    "zwsp stop https://y.io/a​kept too",
    "soft https://a.b/x­hyphen kept",
    "trailing ws before LS  ",  # Java $ vs RE2 $ trap
    "line sep and para https://z.q/1 after",
]


def _duck(rows):
    con = duckdb.connect()
    con.register("d", pd.DataFrame({"i": range(len(rows)), "t": rows}))
    return con


def test_hostile_inputs_match_duckdb_bit_for_bit(spark):
    """Cleaned text AND every cleanliness component must be identical
    across engines on all hostile inputs — the same contract the
    driver enforces on q27's clean legs, on nastier data."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(HOSTILE)], "i long, t string"
    )
    comp = C.cleanliness_components("t")
    got = [
        tuple(r)
        for r in df.select(
            "i",
            C.clean_text("t").alias("clean"),
            *[v.alias(k) for k, v in comp.items()],
        )
        .orderBy("i")
        .collect()
    ]
    csql = C.cleanliness_components_sql("t")
    sel = ", ".join(f"{v} AS {k}" for k, v in csql.items())
    want = _duck(HOSTILE).execute(
        f"SELECT i, {C.clean_text_sql('t')} AS clean, {sel} "
        "FROM d ORDER BY i"
    ).fetchall()
    assert got == [tuple(w) for w in want]


def test_each_rule_matches_duckdb(spark):
    """Per-rule parity (not just the composition): each strip/fold
    stage agrees across engines on the full hostile set."""
    pairs = [
        (C.fold_unicode, C.fold_unicode_sql),
        (C.strip_control, C.strip_control_sql),
        (C.strip_urls, C.strip_urls_sql),
        (C.strip_html, C.strip_html_sql),
        (C.collapse_whitespace, C.collapse_whitespace_sql),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(HOSTILE)], "i long, t string"
    )
    con = _duck(HOSTILE)
    for col_fn, sql_fn in pairs:
        got = [
            r["o"]
            for r in df.select("i", col_fn("t").alias("o"))
            .orderBy("i")
            .collect()
        ]
        want = [
            r[0]
            for r in con.execute(
                f"SELECT {sql_fn('t')} FROM d ORDER BY i"
            ).fetchall()
        ]
        assert got == want, col_fn.__name__


@pytest.mark.parametrize(
    ("raw", "want"),
    [
        # math comparison survives the tag stripper
        ("3 < 4 and 5 > 2", "3 < 4 and 5 > 2"),
        # unclosed tag is NOT a tag
        ("unclosed <tag here", "unclosed <tag here"),
        # double-encoded entity decodes exactly one level
        ("&amp;lt;", "&lt;"),
        # URL takes its trailing run, incl. the encoded ampersand
        ("x https://a.b/c?d=1&amp;e=2 y", "x y"),
        # uppercase scheme/www caught by the (?i) group
        ("HTTPS://X.Y and WWW.Z.W end", "and end"),
        # typographic fold
        (
            "‘a’ “b” – …",
            "'a' \"b\" - ...",
        ),
        # fullwidth → ASCII
        ("Ｈｉ！", "Hi!"),
        # ligatures expand
        ("ﬃce", "ffice"),
        # zero-width/soft-hyphen vanish, emoji survives
        ("a​b­c \U0001f600", "abc \U0001f600"),
        # control chars vanish, tabs become spaces
        ("a\x00b\x07c\td", "abc d"),
        # CRLF normalizes, blank-line runs collapse, edges trim
        ("  a\r\n\r\n\r\nb\t", "a\n\nb"),
        # entities decode AFTER tags (so '<' from &lt; is not a tag)
        ("&lt;p&gt;kept&lt;/p&gt;", "<p>kept</p>"),
        # NBSP folds to space then collapses
        ("a  b", "a b"),
        # exotic spaces/zero-widths STOP a URL (review r16 pass 1:
        # the fold runs after the strip, so the stop class must know
        # them or the NBSP-joined word vanishes with the URL)
        ("see https://x.com Chapter 2", "see Chapter 2"),
        ("z https://y.io/a​kept", "z kept"),
    ],
)
def test_clean_text_semantics(spark, raw, want):
    df = spark.createDataFrame([(raw,)], "t string")
    assert df.select(C.clean_text("t").alias("o")).first()["o"] == want


def test_components_on_known_dirt(spark):
    raw = "<p>hi</p> see https://a.b/c ​x"
    r = (
        spark.createDataFrame([(raw,)], "t string")
        .select(
            *[
                v.alias(k)
                for k, v in C.cleanliness_components("t").items()
            ]
        )
        .first()
    )
    assert r["n_tags"] == 2
    assert r["n_urls"] == 1
    assert r["n_control"] == 1
    assert r["n_chars_raw"] == len(raw)
    assert r["n_chars_clean"] == len("hi see x")
    # exact integer-arithmetic half-up round at 6 digits
    d = len(raw) - len("hi see x")
    assert r["stripped_frac"] == (
        (d * 2_000_000 + len(raw)) // (2 * len(raw))
    ) / 1_000_000
    # empty and NULL inputs
    z = (
        spark.createDataFrame([("",), (None,)], "t string")
        .select(
            *[
                v.alias(k)
                for k, v in C.cleanliness_components("t").items()
            ]
        )
        .collect()
    )
    assert (z[0]["n_chars_raw"], z[0]["stripped_frac"]) == (0, 0.0)
    assert z[1]["n_chars_clean"] is None


def test_clean_text_idempotence_contract(spark):
    """clean(clean(x)) == clean(x) EXCEPT through entity decoding:
    '&lt;tag&gt;' decodes to '<tag>' on pass one (correct — the
    entities ARE that text), which pass two would strip as markup.
    One-level decode is the documented semantic, so idempotence holds
    exactly on the entity-free subset — pin both halves so a future
    'fix' cannot silently change either."""
    ent_free = [
        t for t in HOSTILE if t is None or ("&" not in t)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(ent_free)], "i long, t string"
    )
    out = df.select(
        "i",
        C.clean_text("t").alias("once"),
        C.clean_text(C.clean_text("t")).alias("twice"),
    ).collect()
    for r in out:
        assert r["once"] == r["twice"], ent_free[r["i"]]
    # and the documented exception, explicitly
    df2 = spark.createDataFrame([("&lt;p&gt;kept&lt;/p&gt;",)], "t string")
    row = df2.select(
        C.clean_text("t").alias("once"),
        C.clean_text(C.clean_text("t")).alias("twice"),
    ).first()
    assert row["once"] == "<p>kept</p>"
    assert row["twice"] == "kept"


LINE_HOSTILE = [
    None,
    "",
    "one line only",
    "   \n***\n42",  # nothing survives the filter
    "Home | About\nreal content\nShare this:\nShare this:\n***\n42\n"
    "real content\nmore text",
    "a\nb\na\nb\na",
    "<p>x</p>\nnav\nnav\nhttp://x.y gone\n  \npadded   line  ",
    "dup after clean\ndup  after   clean",  # equal only AFTER collapse
]


def test_line_rules_match_duckdb(spark):
    """filter_lines / dedup_lines / clean_document parity on the line
    hostile set — including the empty-kept-list case where DuckDB's
    string_agg is NULL and Spark's array_join is '' (coalesced,
    NULL-preserving)."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(LINE_HOSTILE)], "i long, t string"
    )
    con = _duck(LINE_HOSTILE)
    for col_fn, sql_fn in (
        (C.filter_lines, C.filter_lines_sql),
        (C.dedup_lines, C.dedup_lines_sql),
        (C.clean_document, C.clean_document_sql),
    ):
        got = [
            r["o"]
            for r in df.select("i", col_fn("t").alias("o"))
            .orderBy("i")
            .collect()
        ]
        want = [
            r[0]
            for r in con.execute(
                f"SELECT {sql_fn('t')} FROM d ORDER BY i"
            ).fetchall()
        ]
        assert got == want, col_fn.__name__


def test_line_rule_semantics(spark):
    df = spark.createDataFrame(
        [(LINE_HOSTILE[4],)], "t string"
    )
    row = df.select(
        C.filter_lines("t").alias("f"),
        C.dedup_lines("t").alias("d"),
        C.clean_document("t").alias("c"),
    ).first()
    # filter drops *** and 42, keeps both Share this: copies
    assert row["f"] == (
        "Home | About\nreal content\nShare this:\nShare this:\n"
        "real content\nmore text"
    )
    # dedup keeps first occurrences only, order preserved
    assert row["d"] == (
        "Home | About\nreal content\nShare this:\n***\n42\nmore text"
    )
    # composed: filter first, then dedup
    assert row["c"] == (
        "Home | About\nreal content\nShare this:\nmore text"
    )
    # whitespace-collapse makes near-dup lines exact before dedup
    r2 = (
        spark.createDataFrame([(LINE_HOSTILE[7],)], "t string")
        .select(C.clean_document("t").alias("c"))
        .first()
    )
    assert r2["c"] == "dup after clean"
    with pytest.raises(ValueError, match="min_chars"):
        C.filter_lines("t", min_chars=0)
    with pytest.raises(ValueError, match="min_chars"):
        C.filter_lines_sql("t", min_chars=0)

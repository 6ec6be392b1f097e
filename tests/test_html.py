"""HTML main-content extraction (functions/html.py, plans/html.py).

Unit-level behavior of the jusText-style block classifier on
hand-written pages; the catalog queries' cross-engine exactness is
covered by the DuckDB oracle gate (tools/verify_driver_sim.py).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from github_etl_spark.functions.html import (
    block_structs_expr,
    boilerplate_fraction_expr,
    content_blocks_expr,
    html_main_text_expr,
)


def _one(spark, html, expr):
    return (
        spark.createDataFrame([(html,)], "html string")
        .select(expr(F.col("html")).alias("v"))
        .first()["v"]
    )


CONTENT_P = (
    "<p>the quick brown fox jumps over a lazy dog and keeps running for "
    "a while to make this block long enough</p>"
)


def test_blocks_segment_and_strip(spark):
    html = (
        "<html><head><title>T</title></head><body>"
        "<h1>Head  line</h1><p>alpha <b>beta</b>\n gamma</p></body></html>"
    )
    rows = _one(spark, html, block_structs_expr)
    assert [r["txt"] for r in rows] == ["T", "Head line", "alpha beta gamma"]
    # inline <b> stripped, whitespace normalized, zero anchor chars
    assert [r["link_chars"] for r in rows] == [0, 0, 0]


def test_script_style_comments_removed_even_with_embedded_tags(spark):
    html = (
        "<html><body><!-- <p>not a block</p> -->"
        '<script>var s = "</div>"; if (1 < 2) {}</script>'
        "<style>p{color:red}</style>" + CONTENT_P + "</body></html>"
    )
    rows = _one(spark, html, block_structs_expr)
    assert len(rows) == 1 and rows[0]["txt"].startswith("the quick brown")


def test_link_chars_counts_anchor_text_only(spark):
    html = '<body><p>intro <a href="/x">click here</a> outro</p></body>'
    rows = _one(spark, html, block_structs_expr)
    assert rows[0]["link_chars"] == len("click here")
    assert rows[0]["txt"] == "intro click here outro"


def test_classifier_drops_nav_short_and_linky_blocks(spark):
    html = (
        "<body>"
        '<nav><a href="/">Home</a> <a href="/a">About</a></nav>'
        "<h1>Short title</h1>"
        + CONTENT_P
        + '<footer>(c) 2026 corp - <a href="/t">terms of it all</a>'
        ' <a href="/p">privacy and more</a></footer>'
        "</body>"
    )
    kept = _one(spark, html, content_blocks_expr)
    assert [r["txt"].startswith("the quick") for r in kept] == [True]
    frac = _one(spark, html, boilerplate_fraction_expr)
    assert frac == pytest.approx(0.75)  # 3 of 4 blocks dropped


def test_stopword_density_rule(spark):
    # Long and link-free, but zero stopwords -> boilerplate.
    junk = "<p>" + " ".join(f"tok{i}" for i in range(30)) + "</p>"
    kept = _one(spark, "<body>" + junk + CONTENT_P + "</body>", content_blocks_expr)
    assert len(kept) == 1 and kept[0]["txt"].startswith("the quick")


def test_main_text_joins_content_blocks_in_order(spark):
    p2 = CONTENT_P.replace("quick", "slow")
    text = _one(spark, "<body>" + CONTENT_P + p2 + "</body>", html_main_text_expr)
    lines = text.split("\n")
    assert len(lines) == 2
    assert lines[0].startswith("the quick") and lines[1].startswith("the slow")


def test_empty_and_tagless_inputs(spark):
    assert _one(spark, "", html_main_text_expr) == ""
    assert _one(spark, "", boilerplate_fraction_expr) == 0.0
    # A tagless string is one block, classified on its own merits.
    bare = "the quick brown fox jumps over a lazy dog repeatedly today"
    assert _one(spark, bare, html_main_text_expr) == bare


def test_pre_is_not_split_by_p_tag_prefix(spark):
    # `<pre>` must not match the `p` block tag (the (\s[^>]*)? guard).
    html = "<body><p>one of the lines here is long enough to keep for sure" \
           "</p>x <pre>y</pre> z</body>"
    rows = _one(spark, html, block_structs_expr)
    # pre is NOT a splitter: "x <pre>y</pre> z" stays one block (tags
    # stripped inline).
    assert rows[-1]["txt"] == "x y z"


def test_catalog_queries_run_and_align(spark):
    """Smoke the two catalog entries at sf0.001: flat scalar schema,
    content rows only where blocks were kept."""
    from github_etl_spark.plans import QUERIES

    sf = "/root/testdata/sf0.001"
    ext = QUERIES["html_extract_text"].fn(spark, sf)
    rows = ext.limit(50).collect()
    assert rows
    for r in rows:
        assert r["n_content_blocks"] <= r["n_blocks"]
        assert 0.0 <= r["boilerplate_fraction"] <= 1.0
        if r["n_content_blocks"] == 0:
            assert r["content_len"] == 0 and r["content_prefix"] == ""
    split = QUERIES["pipeline_html_to_split"].fn(spark, sf)
    srows = split.collect()
    assert srows and {r["split"] for r in srows} <= {"train", "val", "test"}


def test_vertical_tab_in_tag_does_not_split_in_either_engine():
    """Java's \\s includes \\x0B, RE2's does not; the tag patterns use
    the explicit intersection class so '<p\\x0Bclass=x>' is NOT a block
    boundary in EITHER engine (lockstep contract).  Pure-regex check in
    both engines, no Spark session needed for the DuckDB half."""
    import re

    import duckdb

    from github_etl_spark.functions.html import (
        BLOCK_SPLIT_RE,
        LINK_RE,
        SCRIPT_RE,
        STYLE_RE,
    )

    page = "<p\x0Bclass=x>"
    assert re.search(BLOCK_SPLIT_RE, page) is None
    n = duckdb.sql(
        f"SELECT len(regexp_extract_all('{page}', '{BLOCK_SPLIT_RE}')) AS n"
    ).fetchone()[0]
    assert n == 0
    # And a plain space IS a boundary in both.
    ok = "<p class=x>"
    assert re.search(BLOCK_SPLIT_RE, ok) is not None
    n = duckdb.sql(
        f"SELECT len(regexp_extract_all('{ok}', '{BLOCK_SPLIT_RE}')) AS n"
    ).fetchone()[0]
    assert n == 1
    # The other three tag patterns carry the same class.
    for pat in (SCRIPT_RE, STYLE_RE, LINK_RE):
        assert "\\s" not in pat
    assert re.search(SCRIPT_RE, "<script\x0Bsrc=x>a</script>") is None
    assert re.search(SCRIPT_RE, "<script src=x>a</script>") is not None

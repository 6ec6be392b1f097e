"""HTML main-content extraction (EXT — the web-corpus front door).

jusText-style boilerplate removal (Pomikalek 2011, public algorithm;
same family as the trafilatura/CCNet front doors): strip comments,
``<script>`` and ``<style>`` elements, segment the page into text
blocks at block-level tags, score each block by character length,
link density (anchor-text chars / block chars) and stopword density,
and keep only the content blocks. The whole operator is a composition
of builtin regexp + higher-order array functions — JVM-side,
whole-stage-codegen'd, ZERO shuffle — so at 100 TB it runs at scan
speed on the raw-crawl partitioning, exactly like the text operators
in functions/text.py.

Every regex here is RE2-and-Java compatible (no lookarounds, no
backreferences) so the DuckDB oracle in plans/html.py runs the
IDENTICAL pattern strings; keep the two in lockstep.

Reference parity note: the reference engine has no HTML operator
(its front door is the GitHub REST API); this module is part of the
north-star LLM-pipeline surface (SURVEY.md text-analysis family).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .rounding import round_det
from .text import EN_STOPWORDS

# --------------------------------------------------------------- patterns

COMMENT_RE = r"(?s)<!--.*?-->"
# `_TAG_WS` is the Java-cap-RE2 whitespace intersection ([ \t\n\f\r]),
# NOT \s: Java's \s includes \x0B, RE2's does not, so a vertical tab
# after a tag name ('<p\x0Bclass=x>') would split blocks in Spark but
# not in the DuckDB oracle.  Same reasoning as WS_RE below.
_TAG_WS = r"[ \t\n\f\r]"
SCRIPT_RE = rf"(?is)<script({_TAG_WS}[^>]*)?>.*?</script>"
STYLE_RE = rf"(?is)<style({_TAG_WS}[^>]*)?>.*?</style>"
# Block-level elements: both the open and the close tag end a text
# block.  `({_TAG_WS}[^>]*)?>` (NOT `[^>]*>`) so `<p class=x>` matches
# while `<param>` / `<pattern>` do not.
_BLOCK_TAGS = (
    "p|div|h1|h2|h3|h4|h5|h6|li|ul|ol|br|hr|table|tr|td|th|blockquote|"
    "section|article|aside|main|header|footer|nav|form|title|head|body|html"
)
BLOCK_SPLIT_RE = rf"(?i)</?({_BLOCK_TAGS})({_TAG_WS}[^>]*)?>"
TAG_RE = r"<[^>]*>"
# Explicit class, NOT \s: Java's \s includes \x0B, RE2's does not.
WS_RE = r"[ \t\n\r]+"
LINK_RE = rf"(?is)<a({_TAG_WS}[^>]*)?>(.*?)</a>"

# jusText-style thresholds, frozen so classification is reproducible.
MIN_BLOCK_CHARS = 25
MAX_LINK_DENSITY = 0.2
MIN_STOP_DENSITY = 0.04


# ------------------------------------------------------------ block algebra


def _clean_html(html_col: Column) -> Column:
    """Comments, then scripts, then styles -> single spaces."""
    c = F.regexp_replace(html_col, COMMENT_RE, " ")
    c = F.regexp_replace(c, SCRIPT_RE, " ")
    return F.regexp_replace(c, STYLE_RE, " ")


def _strip_tags(col: Column) -> Column:
    """Inline tags -> spaces, whitespace normalized, trimmed."""
    return F.trim(F.regexp_replace(F.regexp_replace(col, TAG_RE, " "), WS_RE, " "))


def block_structs_expr(html_col: Column) -> Column:
    """array<struct<txt,link_chars>> of the page's non-empty blocks.

    ``txt`` is the tag-stripped, whitespace-normalized block text;
    ``link_chars`` is the raw character count inside ``<a>...</a>``
    spans of the block (anchor text length, the jusText link-density
    numerator).
    """

    def mk(b: Column) -> Column:
        link_chars = F.aggregate(
            F.regexp_extract_all(b, F.lit(LINK_RE), 2),
            F.lit(0),
            lambda acc, s: acc + F.length(s),
        )
        return F.struct(
            _strip_tags(b).alias("txt"), link_chars.alias("link_chars")
        )

    raw = F.split(_clean_html(html_col), BLOCK_SPLIT_RE)
    return F.filter(F.transform(raw, mk), lambda s: s["txt"] != "")


def _is_content(s: Column) -> Column:
    """jusText-lite block classifier: long enough, not link-dominated,
    and fluent (stopword density above the floor)."""
    text_len = F.length(s["txt"])
    link_density = s["link_chars"] / F.greatest(text_len, F.lit(1)).cast("double")
    words = F.split(F.lower(s["txt"]), " ")  # txt is ws-normalized
    n_stop = F.size(F.filter(words, lambda w: w.isin(*EN_STOPWORDS)))
    stop_density = n_stop / F.greatest(F.size(words), F.lit(1)).cast("double")
    return (
        (text_len >= MIN_BLOCK_CHARS)
        & (link_density <= MAX_LINK_DENSITY)
        & (stop_density >= MIN_STOP_DENSITY)
    )


def content_blocks_expr(html_col: Column) -> Column:
    """The content-classified subset of ``block_structs_expr``."""
    return F.filter(block_structs_expr(html_col), _is_content)


def html_main_text_expr(html_col: Column) -> Column:
    """Main-content text of an HTML page: content blocks joined with
    newlines — the string downstream dedup/quality/tokenize operators
    consume (the front door ahead of sources/corpus.py)."""
    return F.array_join(
        F.transform(content_blocks_expr(html_col), lambda s: s["txt"]), "\n"
    )


def boilerplate_fraction_expr(html_col: Column) -> Column:
    """Fraction of non-empty blocks classified boilerplate (4 dp)."""
    n_blocks = F.size(block_structs_expr(html_col))
    n_content = F.size(content_blocks_expr(html_col))
    return round_det(
        (n_blocks - n_content) / F.greatest(n_blocks, F.lit(1)).cast("double"), 4
    )

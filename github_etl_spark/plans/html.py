"""HTML front-door catalog queries (EXT — web-corpus text extraction).

Fixture rule: every ``documents`` row is wrapped into a deterministic
synthetic HTML page — head with comment/style/script, a link-only nav,
an h1, the document text as two paragraphs (one carrying a trailing
"read more" link), a share bar and a link-heavy footer — by STRING
CONCATENATION.  The template lives in ONE Python list (``_TEMPLATE``)
from which both the Spark column expression and the DuckDB oracle SQL
are generated, so the two sides cannot drift.  Extraction then runs
the jusText-style classifier from functions/html.py in Spark and the
IDENTICAL regex/lambda pipeline in DuckDB, pinning the block
segmentation, link-density and stopword-density rules end-to-end.

The page exercises each classifier rule on purpose: the nav/share/h1
blocks fail the length rule, the footer passes length but fails link
density, and the paragraphs pass or fail on stopword density alone.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.html import (
    BLOCK_SPLIT_RE,
    COMMENT_RE,
    LINK_RE,
    MAX_LINK_DENSITY,
    MIN_BLOCK_CHARS,
    MIN_STOP_DENSITY,
    SCRIPT_RE,
    STYLE_RE,
    TAG_RE,
    WS_RE,
    block_structs_expr,
    html_main_text_expr,
)
from ..functions.rounding import round_det
from ..operators.pipeline import sql_hash_bucket
from ..tables import load_tables
from .ext import _SQL_QUALITY, _SQL_STOPS_EN, _SQL_WORDS
from .registry import query

# ------------------------------------------------------ fixture template
# (kind, value): "lit" pieces are emitted verbatim on both sides;
# "expr" pieces index the per-engine expression tables below.

_TEMPLATE: list[tuple[str, str]] = [
    ("lit", '<html><!-- synthetic fixture page --><head><title>Doc '),
    ("expr", "doc_id"),
    (
        "lit",
        '</title><style>p{margin:0} .nav{color:#333}</style>'
        '<script>var x = 1 < 2; var s = "</div>";</script></head><body>'
        '<nav class="nav"><a href="/">Home</a> <a href="/lang/',
    ),
    ("expr", "lang"),
    ("lit", '">'),
    ("expr", "lang"),
    ("lit", '</a> <a href="/src/'),
    ("expr", "source"),
    ("lit", '">'),
    ("expr", "source"),
    ("lit", '</a></nav><h1>Doc '),
    ("expr", "doc_id"),
    ("lit", ' from '),
    ("expr", "source"),
    ("lit", '</h1><p>'),
    ("expr", "p1"),
    ("lit", '</p><p class="body">'),
    ("expr", "p2"),
    (
        "lit",
        ' <a href="/more">read more</a></p>'
        '<div class="share">Share: <a href="/f">FB</a> <a href="/t">TW</a></div>'
        '<footer>(c) 2026 ',
    ),
    ("expr", "source"),
    (
        "lit",
        ' - <a href="/terms">terms</a> <a href="/privacy">privacy</a>'
        '</footer></body></html>',
    ),
]


def synthesize_html_expr() -> Column:
    """The fixture page as a Spark column over a documents row."""
    t = F.coalesce(F.col("text"), F.lit(""))
    half = F.floor(F.length(t) / F.lit(2)).cast("int")
    exprs = {
        "doc_id": F.col("doc_id").cast("string"),
        "lang": F.coalesce(F.col("lang"), F.lit("")),
        "source": F.coalesce(F.col("source"), F.lit("")),
        "p1": F.substring(t, F.lit(1), half),
        "p2": F.substring(t, half + F.lit(1), F.length(t)),
    }
    return F.concat(
        *[F.lit(v) if k == "lit" else exprs[v] for k, v in _TEMPLATE]
    )


# SQL twin over the aliased CTE columns (t/lg/src, see _SQL_PAGES).
_SQL_EXPRS = {
    "doc_id": "CAST(doc_id AS VARCHAR)",
    "lang": "lg",
    "source": "src",
    "p1": "substr(t, 1, CAST(floor(length(t)/2) AS INT))",
    "p2": "substr(t, CAST(floor(length(t)/2) AS INT) + 1, length(t))",
}
_SQL_HTML = "(" + " || ".join(
    "'" + v.replace("'", "''") + "'" if k == "lit" else _SQL_EXPRS[v]
    for k, v in _TEMPLATE
) + ")"

_SQL_PAGES = f"""
  SELECT doc_id, {_SQL_HTML} AS html
  FROM (SELECT doc_id, COALESCE(text, '') AS t, COALESCE(lang, '') AS lg,
               COALESCE(source, '') AS src FROM documents)
"""

# The extraction pipeline as DuckDB CTEs — every regex literal is the
# SAME Python constant the Spark expressions use (functions/html.py).
_SQL_BLOCKS = f"""
pages AS ({_SQL_PAGES}),
cleaned AS (
  SELECT doc_id,
         regexp_replace(regexp_replace(regexp_replace(html,
             '{COMMENT_RE}', ' ', 'g'),
             '{SCRIPT_RE}', ' ', 'g'),
             '{STYLE_RE}', ' ', 'g') AS h
  FROM pages
),
blocks AS (
  SELECT doc_id,
         list_filter(
           list_transform(
             string_split_regex(h, '{BLOCK_SPLIT_RE}'),
             b -> struct_pack(
               txt := trim(regexp_replace(regexp_replace(b,
                   '{TAG_RE}', ' ', 'g'), '{WS_RE}', ' ', 'g')),
               link_chars := COALESCE(list_sum(list_transform(
                   regexp_extract_all(b, '{LINK_RE}', 2),
                   s -> length(s))), 0))),
           s -> s.txt <> '') AS bs
  FROM cleaned
),
cls AS (
  SELECT doc_id, bs,
         list_filter(bs, s ->
           length(s.txt) >= {MIN_BLOCK_CHARS}
           AND CAST(s.link_chars AS DOUBLE)
               / greatest(length(s.txt), 1) <= {MAX_LINK_DENSITY}
           AND CAST(len(list_filter(string_split(lower(s.txt), ' '),
                 w -> list_contains({_SQL_STOPS_EN}, w))) AS DOUBLE)
               / greatest(len(string_split(lower(s.txt), ' ')), 1)
               >= {MIN_STOP_DENSITY}
         ) AS cb
  FROM blocks
),
extracted AS (
  -- COALESCE: DuckDB's array_to_string on an EMPTY list is NULL, but
  -- Spark's array_join is '' — zero-content pages must agree.
  SELECT doc_id, bs, cb,
         COALESCE(array_to_string(list_transform(cb, s -> s.txt),
                  chr(10)), '') AS content
  FROM cls
)
"""


@query(
    "html_extract_text",
    headline=True,
    oracle=f"""
    WITH {_SQL_BLOCKS}
    SELECT doc_id,
           CAST(len(bs) AS INTEGER) AS n_blocks,
           CAST(len(cb) AS INTEGER) AS n_content_blocks,
           (floor(CAST(len(bs) - len(cb) AS DOUBLE)
                  / greatest(len(bs), 1) * 10000 + 0.5) / 10000)
             AS boilerplate_fraction,
           CAST(length(content) AS INTEGER) AS content_len,
           substr(content, 1, 64) AS content_prefix,
           md5(content) AS content_digest
    FROM extracted
    """,
)
def html_extract_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: HTML -> main-content text (jusText-style block classifier,
    functions/html.py). Zero exchanges: synthesis, segmentation,
    classification and the content digest are all per-row JVM regexp /
    higher-order-array expressions — at 100 TB this runs at scan speed
    on the crawl's native partitioning, the property that matters for
    a front-door operator that sees EVERY raw byte once."""
    from ..functions.html import _is_content

    t = load_tables(spark, sf_dir)
    pages = t["documents"].select(
        "doc_id", synthesize_html_expr().alias("html")
    )
    blocks = pages.select(
        "doc_id", block_structs_expr(F.col("html")).alias("bs")
    )
    cb = F.filter(F.col("bs"), _is_content)
    content = F.array_join(F.transform(cb, lambda s: s["txt"]), "\n")
    return blocks.select(
        "doc_id",
        F.size("bs").alias("n_blocks"),
        F.size(cb).alias("n_content_blocks"),
        round_det(
            (F.size("bs") - F.size(cb))
            / F.greatest(F.size("bs"), F.lit(1)).cast("double"),
            4,
        ).alias("boilerplate_fraction"),
        F.length(content).alias("content_len"),
        F.substring(content, 1, 64).alias("content_prefix"),
        F.md5(content).alias("content_digest"),
    )


@query(
    "pipeline_html_to_split",
    headline=True,
    oracle=f"""
    WITH {_SQL_BLOCKS},
    texts AS (SELECT doc_id, content AS text FROM extracted),
    base AS (
      SELECT doc_id, text,
             CAST(len({_SQL_WORDS}) AS DOUBLE) AS n_tok,
             CAST(len(list_filter({_SQL_WORDS},
                  x -> list_contains({_SQL_STOPS_EN}, x))) AS DOUBLE) AS n_stop,
             CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS DOUBLE)
               AS n_punct,
             CAST(greatest(length(text), 1) AS DOUBLE) AS n_chars_nz
      FROM texts
    ),
    scored AS (
      SELECT doc_id, text, {_SQL_QUALITY} AS quality_score FROM base
    ),
    kept AS (SELECT * FROM scored WHERE quality_score >= 0.5),
    dedup AS (
      SELECT text, MIN(doc_id) AS doc_id, MIN(quality_score) AS quality_score
      FROM kept GROUP BY text
    ),
    bucketed AS (
      SELECT doc_id, length(text) AS content_len, quality_score,
             {sql_hash_bucket("doc_id")} AS bucket
      FROM dedup
    )
    SELECT doc_id, CAST(content_len AS INTEGER) AS content_len,
           quality_score, bucket,
           CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM bucketed
    """,
)
def pipeline_html_to_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT composite: raw HTML -> extracted main text -> quality gate
    (score >= 0.5 on the EXTRACTED text) -> exact-dedup keeper ->
    deterministic hash split, as one oracle-checked unit. The crawl
    front door composed with the existing corpus pipeline: everything
    up to the dedup is per-row (zero exchanges); the single shuffle is
    the groupBy(text) keeper — at 100 TB, one keyed exchange over the
    post-filter survivor set, the same shape as
    pipeline_filter_dedup_split."""
    from ..functions.text import quality_score_from, words_expr
    from ..operators.pipeline import hash_split

    t = load_tables(spark, sf_dir)
    pages = t["documents"].select(
        "doc_id", synthesize_html_expr().alias("html")
    )
    # ONE evaluation of the extraction + quality cascade per row (r13):
    # the r12 shape computed text and quality_score as plain aliases,
    # and predicate pushdown inlined the WHOLE html-extraction regex
    # cascade into the pushed filter once per reference — the captured
    # plan carried 4 copies of the extraction in the Filter plus one
    # in each Project (~5 evaluations per row). Here the extraction is
    # bound as a lambda variable (the web_gate_expr idiom — a bound
    # variable cannot be re-inlined), the word array is staged the
    # same way one level down, and F.inline emits both columns from a
    # single Generate, whose outputs a predicate cannot be pushed
    # beneath. Same expressions, same rounded values.
    fused = F.transform(
        F.array(html_main_text_expr(F.col("html"))),
        lambda txt: F.struct(
            txt.alias("text"),
            F.element_at(
                F.transform(
                    F.array(words_expr(txt)),
                    lambda ws: quality_score_from(txt, ws),
                ),
                F.lit(1),
            ).alias("quality_score"),
        ),
    )
    scored = pages.select("doc_id", F.inline(fused))
    kept = scored.filter(F.col("quality_score") >= 0.5)
    dedup = kept.groupBy("text").agg(
        F.min("doc_id").alias("doc_id"),
        F.min("quality_score").alias("quality_score"),
    )
    return hash_split(dedup, "doc_id").select(
        "doc_id",
        F.length("text").alias("content_len"),
        "quality_score",
        "bucket",
        "split",
    )


@query(
    "warc_scan_stats",
    oracle=f"""
    WITH pages AS ({_SQL_PAGES})
    SELECT doc_id,
           'response' AS warc_type,
           200 AS http_status,
           (doc_id % 2 = 0) AS is_gzip,
           CAST(length(html) AS INTEGER) AS body_len,
           md5(html) AS body_digest
    FROM pages
    """,
)
def warc_scan_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: WARC crawl-container roundtrip (sources/warc.py). Each
    Arrow batch of documents is written as ONE multi-record WARC
    stream — HTTP response records over the shared fixture page, even
    doc_ids as standalone gzip members (the .warc.gz convention), odd
    ones plain — then re-parsed with the REAL streaming reader:
    record framing, per-record gzip sniffing, HTTP status/header/body
    split, and doc identity recovered from WARC-Target-URI. Map-only:
    container bytes never cross a shuffle (plan pinned zero-exchange);
    the oracle replays the page rule directly over documents, so any
    framing/decode defect breaks the digest."""
    import hashlib

    from ..sources.warc import (
        build_warc_record,
        gzip_member,
        iter_warc_records,
        parse_http_response,
    )

    t = load_tables(spark, sf_dir)
    pages = t["documents"].select(
        "doc_id", synthesize_html_expr().alias("html")
    )

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            stream = bytearray()
            for doc_id, html in zip(pdf["doc_id"], pdf["html"]):
                body = html.encode("utf-8")
                http = (
                    b"HTTP/1.1 200 OK\r\n"
                    b"Content-Type: text/html; charset=utf-8\r\n"
                    + f"Content-Length: {len(body)}\r\n\r\n".encode()
                    + body
                )
                rec = build_warc_record(
                    {
                        "WARC-Type": "response",
                        "WARC-Record-ID": f"<urn:fixture:doc-{doc_id}>",
                        "WARC-Date": "2026-01-01T00:00:00Z",
                        "WARC-Target-URI": (
                            f"https://corpus.example/doc/{doc_id}"
                        ),
                        "Content-Type": "application/http;msgtype=response",
                    },
                    http,
                )
                stream += gzip_member(rec) if int(doc_id) % 2 == 0 else rec
            rows = []
            for fields, payload, was_gzip in iter_warc_records(bytes(stream)):
                status, _hdrs, body = parse_http_response(payload)
                rows.append(
                    (
                        int(fields["warc-target-uri"].rsplit("/", 1)[1]),
                        fields["warc-type"],
                        status,
                        was_gzip,
                        len(body),
                        hashlib.md5(body).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "warc_type", "http_status", "is_gzip",
                    "body_len", "body_digest",
                ],
            )

    return pages.mapInPandas(
        kernel,
        "doc_id long, warc_type string, http_status int, is_gzip boolean, "
        "body_len int, body_digest string",
    )

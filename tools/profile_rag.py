"""Stage-level timing for pipeline_rag_retrieval at sf0.1 (r13 probe).

NOTE (r14): this replicates the PRE-FUSION (r12) stage graph — a
separate chunk checkpoint, a standalone encode pass, bm25_multi_topk
without ``doc_base=`` — deliberately kept as the A/B BASELINE shape.
The shipped pipeline_rag_retrieval (plans/ext.py) has fused all three
corpus passes into one checkpoint since r13; profile the shipped
shape with ``tools/opt_probe.py pipeline_rag_retrieval`` and use this
script to quantify what the fusion saves (ADVICE r13).

Replicates the composite's stage graph with a timer around every
eager checkpoint / action, plus a decomposition of the bm25_multi
stage (its corpus tokenization runs once per consuming subtree: the
stats scalar agg and the postings explode). Read-only: noop sink only.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from github_etl_spark.functions.text import (  # noqa: E402
    dedup_tokens_expr,
    words_expr,
)
from github_etl_spark.multimodal.media import embed_text_vec  # noqa: E402
from github_etl_spark.operators.partitioning import (  # noqa: E402
    ensure_parallelism,
)
from github_etl_spark.operators.pipeline import chunk_tokens  # noqa: E402
from github_etl_spark.operators.search import bm25_multi_topk  # noqa: E402
from github_etl_spark.session import eager_checkpoint, get_spark  # noqa: E402
from github_etl_spark.tables import load_tables  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def t(label, fn):
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    print(f"{label:38s} {dt:7.2f}s", flush=True)
    return out


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def run(spark):
    total0 = time.time()
    docs = load_tables(spark, SF)["documents"]
    chunks = chunk_tokens(docs, "text", "doc_id", window=32, stride=24)
    chunks = t(
        "1 chunk ckpt",
        lambda: eager_checkpoint(
            ensure_parallelism(
                chunks.select(
                    (F.col("doc_id") * 100000 + F.col("chunk_id")).alias(
                        "ckey"
                    ),
                    "chunk_text",
                )
            )
        ),
    )
    q = docs.where(F.col("doc_id") < 5).select(
        F.col("doc_id").alias("query_id"),
        F.array_join(F.slice(words_expr(F.col("text")), 1, 12), " ").alias(
            "qtext"
        ),
    )
    l2_of = lambda col: F.aggregate(  # noqa: E731
        col, F.lit(0).cast("long"), lambda a, x: a + x * x
    )
    cnz = t(
        "2 chunk-encode ckpt",
        lambda: eager_checkpoint(
            embed_text_vec(chunks, "chunk_text", "ckey")
            .select("ckey", F.col("vec").alias("v"))
            .withColumn("l2", l2_of(F.col("v")))
            .where(F.col("l2") > 0)
        ),
    )
    qnz = t(
        "3 query-encode ckpt",
        lambda: eager_checkpoint(
            embed_text_vec(q, "qtext", "query_id")
            .select("query_id", F.col("vec").alias("qv"))
            .withColumn("ql2", l2_of(F.col("qv")))
            .where(F.col("ql2") > 0)
        ),
    )
    # --- bm25 decomposition over the SAME checkpointed chunk frame
    toks = chunks.select(
        F.col("ckey"),
        dedup_tokens_expr(F.col("chunk_text")).alias("toks"),
    ).select(
        "ckey",
        F.coalesce(F.size("toks"), F.lit(0)).alias("dl"),
        "toks",
    )
    t("4a bm25 stats agg (tokenize #1)", lambda: toks.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    ).collect())
    qterms = q.select(
        F.col("query_id"),
        F.explode(F.array_distinct(dedup_tokens_expr(F.col("qtext")))).alias(
            "term"
        ),
    )
    terms_all = qterms.select("term").distinct()
    postings = toks.select(
        "ckey", "dl", F.explode("toks").alias("term")
    ).join(F.broadcast(terms_all), "term")
    tf = postings.groupBy("ckey", "dl", "term").agg(F.count("*").alias("tf"))
    t("4b bm25 tf groupBy (tokenize #2)", lambda: noop(tf))
    lex = bm25_multi_topk(
        chunks, q, text_col="chunk_text", id_col="ckey", k=20
    )
    t("4 bm25 full stage noop", lambda: noop(lex))
    print(f"{'TOTAL':38s} {time.time() - total0:7.2f}s", flush=True)


if __name__ == "__main__":
    spark = get_spark("profile_rag")
    spark.range(1000).count()
    for rep in range(int(os.environ.get("REPS", "3"))):
        print(f"--- rep {rep}")
        run(spark)

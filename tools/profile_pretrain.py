"""Stage-level timing for pipeline_pretraining_e2e at sf0.1 (r13 probe).

Replicates the composite's stage graph with a timer around every
eager checkpoint / action so the round's optimization ledger can say
WHERE the seconds go, not just the total. Read-only: noop sink only.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from github_etl_spark.operators.curation import web_gate_expr  # noqa: E402
from github_etl_spark.operators.dedup import minhash_lsh_candidates  # noqa: E402
from github_etl_spark.operators.graph import cluster_assignment  # noqa: E402
from github_etl_spark.operators.pipeline import (  # noqa: E402
    hash_split,
    pack_greedy,
    tokenize_encode,
)
from github_etl_spark.session import eager_checkpoint, get_spark  # noqa: E402
from github_etl_spark.tables import load_tables  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def t(label, fn):
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    print(f"{label:35s} {dt:7.2f}s", flush=True)
    return out


def run(spark):
    total0 = time.time()
    docs = load_tables(spark, SF)["documents"]
    gated = docs.select("doc_id", "text").where(web_gate_expr("text"))
    exact = t(
        "1 gate+exact-dedup ckpt",
        lambda: eager_checkpoint(
            gated.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
        ),
    )
    pairs = minhash_lsh_candidates(
        exact, "text", "doc_id", hash_family="md5_portable"
    ).where(F.col("est_jaccard") >= 0.5)
    labeled = t(
        "2a cluster_assignment (CC rounds)",
        lambda: cluster_assignment(exact.select("doc_id"), pairs, "doc_id"),
    )
    keepers = labeled.where(F.col("is_canonical")).select(
        "component_id", "doc_id"
    )
    kept = t(
        "2 lsh+cc+split ckpt",
        lambda: eager_checkpoint(
            hash_split(keepers, "component_id")
            .join(exact.select("doc_id", "text"), "doc_id")
            .select("doc_id", "text", "split")
        ),
    )
    enc = t(
        "3 vocab+encode ckpt",
        lambda: eager_checkpoint(
            tokenize_encode(kept, "text", "doc_id", k=200, min_df=2)
            .select(
                "doc_id",
                "n_tokens",
                F.expr(
                    "CAST(aggregate(input_ids, CAST(0 AS BIGINT),"
                    " (a, x) -> a + x) AS BIGINT)"
                ).alias("sum_tid"),
            )
            .join(kept.select("doc_id", "split"), "doc_id")
        ),
    )
    packed = pack_greedy(
        enc.select("doc_id", "n_tokens"), "doc_id", "n_tokens", capacity=256
    )
    out = (
        packed.join(enc.select("doc_id", "split", "sum_tid"), "doc_id")
        .groupBy("split", "shard")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.countDistinct("pack_id").cast("long").alias("n_packs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.sum(F.when(F.col("overflow"), 1).otherwise(0))
            .cast("long")
            .alias("n_overflow"),
            F.sum("sum_tid").cast("long").alias("sum_tid"),
        )
    )
    t(
        "4 pack+manifest noop",
        lambda: out.write.format("noop").mode("overwrite").save(),
    )
    print(f"{'TOTAL':35s} {time.time() - total0:7.2f}s", flush=True)


if __name__ == "__main__":
    spark = get_spark("profile_pretrain")
    spark.range(1000).count()  # JVM warm
    for rep in range(int(os.environ.get("REPS", "3"))):
        print(f"--- rep {rep}")
        run(spark)

"""Scale probe: replicate the documents/embeddings fixtures N-fold and
measure how the compute-heavy operators scale with corpus size.

The driver's bench runs at sf0.1 (5k docs); this probe unions the
fixture K times with offset ids (deterministic, no fixture writes) to
check the scaling SHAPE — near-linear is the design claim for minhash
signatures and LSH bucketing; quadratic blowup would flag a
candidate-pair explosion. Writes docs/SCALE_PROBE.md.

Usage: python tools/scale_probe.py [K ...]   (default: 1 4 16)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from github_etl_spark.operators.dedup import minhash_lsh_candidates
from github_etl_spark.operators.similarity import brute_force_topk
from github_etl_spark.session import get_spark
from github_etl_spark.tables import load_tables

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def replicate(df, id_col, k):
    out = df.withColumn(id_col, F.col(id_col) * k)
    parts = [out]
    n = df.agg(F.max(id_col)).collect()[0][0] + 1
    for i in range(1, k):
        parts.append(df.withColumn(id_col, F.col(id_col) * k + i))
    from functools import reduce

    return reduce(lambda a, b: a.unionByName(b), parts)


def main():
    ks = [int(a) for a in sys.argv[1:]] or [1, 4, 16]
    spark = get_spark("scale_probe")
    t = load_tables(spark, SF_DIR, register=False)
    docs, emb = t["documents"], t["embeddings"]
    lines = [
        "# Scale probe — operator cost vs corpus size",
        "",
        f"Fixture: `{SF_DIR}` replicated K-fold (id-offset union), local[32].",
        "Near-linear growth = healthy; superlinear flags candidate-pair",
        "explosion. Regenerate: `python tools/scale_probe.py`.",
        "",
        "| K | docs | minhash+LSH sec | pairs | vecs | ANN topk sec |",
        "|---|---|---|---|---|---|",
    ]
    for k in ks:
        d = replicate(docs, "doc_id", k)
        n_docs = d.count()
        t0 = time.perf_counter()
        pairs = minhash_lsh_candidates(d, "text", "doc_id").count()
        t_lsh = time.perf_counter() - t0

        e = replicate(emb, "vec_id", k)
        n_vec = e.count()
        queries = e.orderBy("vec_id").limit(10)
        t0 = time.perf_counter()
        brute_force_topk(e, queries, k=5).count()
        t_ann = time.perf_counter() - t0
        lines.append(
            f"| {k} | {n_docs} | {t_lsh:.1f} | {pairs} | {n_vec} | {t_ann:.1f} |"
        )
        print(lines[-1], flush=True)
    lines += [
        "",
        "Reading the numbers: replication makes every doc a true",
        "near-duplicate of its K copies, so candidate PAIRS grow as",
        "K\u00b2\u00b7docs by construction \u2014 that growth is the data, not the",
        "algorithm. The cost columns are the design check: signature +",
        "bucketing time should track docs near-linearly (modulo the",
        "parallelism headroom at small K), and brute-force ANN tracks",
        "corpus \u00d7 queries.",
    ]
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "docs", "SCALE_PROBE.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()

"""Derive an sf1.0 parquet dir (~6M lineitem) from the sf0.1 fixtures
by K=10 FK-consistent replication — the driver ships sf{0.001,0.01,
0.1} only, and the 2x bench gate has otherwise never been measured
past sf0.1.

Derivation contract (documented so the SCALE_PROBE numbers are
interpretable):

- TPC-H tables replicate with PER-TABLE key offsets applied
  CONSISTENTLY across foreign keys (l_orderkey tracks o_orderkey,
  o_custkey tracks c_custkey, ...), so every join's selectivity and
  per-key cardinality match the original and total work scales
  linearly — the data becomes 10 disconnected sf0.1 worlds, which is
  exactly what a scaling measurement wants (region/nation stay fixed,
  as TPC-H itself scales them).
- `events` replicates with offset event_id AND user_id: windows/
  sessions keep their per-user depth, there are just 10x more users.
- `documents` replicates with offset doc_id and per-replica WORD-ORDER
  scrambling (tokens reordered by md5(word:pos:replica); replica 0
  keeps the original text). The token multiset per doc is unchanged
  (stats/quality/tokenizer cost identical per row) but shingle SETS
  differ across replicas, so the dedup/LSH families see 10x genuinely
  distinct documents instead of 10-way near-dup clusters whose
  candidate pairs would grow quadratically BY CONSTRUCTION and drown
  the engine-scaling signal.
- `embeddings` replicates with offset vec_id and +-0.2 deterministic
  per-(id,dim) jitter for replicas >0 — near the originals (realistic
  ANN structure) but never bit-identical (no degenerate all-ties
  cells).

Usage: python tools/make_sf1.py [dst_dir]   (default /tmp/sf1_derived)
Then:  SPARK_GRAFT_SF_DIR=/tmp/sf1_derived python bench.py
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
K = 10

TPCH_OFFSETS = {
    # table -> (key column -> offset-source table whose max+1 is the stride)
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"event_id": "events", "user_id": "events__user"},
}

KEY_OF = {
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "events": "event_id",
    "events__user": "user_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}


def main() -> None:
    dst = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_derived"
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    def stride(src_table: str) -> int:
        t = src_table.removesuffix("__user")
        key = KEY_OF[src_table]
        return int(
            con.execute(
                f"SELECT MAX({key}) + 1 FROM "
                f"read_parquet('{SRC}/{t}.parquet')"
            ).fetchone()[0]
        )

    # fixed dims: straight copies
    for t in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )

    # FK-consistent replication
    for t, offsets in TPCH_OFFSETS.items():
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{t}.parquet')"
            ).fetchall()
        ]
        strides = {c: stride(srct) for c, srct in offsets.items()}
        sel = ", ".join(
            f"{c} + k.k * {strides[c]} AS {c}" if c in strides else c
            for c in cols
        )
        con.execute(
            f"COPY (SELECT {sel} "
            f"FROM read_parquet('{SRC}/{t}.parquet') "
            f"CROSS JOIN (SELECT unnest(range({K})) AS k) k) "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )

    # documents: offset ids + per-replica word-order scramble
    dd = stride("documents")
    con.execute(
        f"""
        COPY (
          WITH src AS (SELECT * FROM read_parquet('{SRC}/documents.parquet')),
          rep AS (SELECT s.*, k.k FROM src s
                  CROSS JOIN (SELECT unnest(range({K})) AS k) k),
          scrambled AS (
            SELECT doc_id + k * {dd} AS doc_id,
                   CASE WHEN k = 0 OR text IS NULL THEN text ELSE (
                     SELECT string_agg(w, ' ' ORDER BY
                            md5(w || ':' || CAST(pos AS VARCHAR) || ':'
                                || CAST(k AS VARCHAR)), w)
                     FROM (SELECT unnest(string_split(text, ' ')) AS w,
                                  generate_subscripts(
                                    string_split(text, ' '), 1) AS pos)
                   ) END AS text,
                   lang, source
            FROM rep
          )
          SELECT doc_id, text, lang, source,
                 CAST(length(text) AS BIGINT) AS n_chars
          FROM scrambled
        ) TO '{dst}/documents.parquet' (FORMAT PARQUET)
        """
    )

    # embeddings: offset ids + deterministic jitter for replicas > 0
    ee = stride("embeddings")
    con.execute(
        f"""
        COPY (
          SELECT vec_id + k * {ee} AS vec_id,
                 CASE WHEN k = 0 THEN embedding ELSE
                   list_transform(embedding, (x, i) -> CAST(x +
                     (CAST(concat('0x', substr(md5(CAST(vec_id * 131 + i * 7
                        + k AS VARCHAR)), 1, 8)) AS BIGINT) % 2001 - 1000)
                     / 5000.0 AS FLOAT))
                 END AS embedding,
                 label
          FROM read_parquet('{SRC}/embeddings.parquet')
          CROSS JOIN (SELECT unnest(range({K})) AS k) k
        ) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)
        """
    )

    for t in sorted(
        ["region", "nation", "documents", "embeddings", *TPCH_OFFSETS]
    ):
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{dst}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n}")


if __name__ == "__main__":
    main()

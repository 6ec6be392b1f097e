"""Z-order clustering (operators/zorder.py): key correctness against a
Python Morton reference, and the MEASURED data-skipping benefit — a
two-column predicate box must overlap fewer parquet files' min/max
stats under z-order than under a single-column sort."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from github_etl_spark.operators.zorder import (
    write_zordered,
    zorder_key_expr,
)


def ref_morton(a: int, b: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def test_key_matches_python_reference(spark):
    rows = [(0, 0), (1, 0), (0, 1), (5, 9), (1023, 1), (65535, 65535)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = {
        (r.a, r.b): r.z
        for r in df.select(
            "a", "b", zorder_key_expr(F.col("a"), F.col("b")).alias("z")
        ).collect()
    }
    for a, b in rows:
        assert got[(a, b)] == ref_morton(a, b), (a, b)


def _uniform_grid(spark, n=20000, side=1024):
    # Two independent uniform columns — the worst case for any single
    # sort order, the motivating case for z-order.
    return spark.range(n).select(
        (F.xxhash64("id").bitwiseAND(F.lit(side - 1))).alias("a"),
        (F.xxhash64("id", F.lit(1)).bitwiseAND(F.lit(side - 1))).alias("b"),
        F.col("id").alias("payload"),
    )


def _files_overlapping_box(path, a_rng, b_rng):
    hit = 0
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.read_metadata(f)
        amin = bmin = float("inf")
        amax = bmax = float("-inf")
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for c in range(g.num_columns):
                col = g.column(c)
                name = col.path_in_schema
                st = col.statistics
                if st is None:
                    continue
                if name == "a":
                    amin, amax = min(amin, st.min), max(amax, st.max)
                if name == "b":
                    bmin, bmax = min(bmin, st.min), max(bmax, st.max)
        if amin <= a_rng[1] and amax >= a_rng[0] and bmin <= b_rng[1] and bmax >= b_rng[0]:
            hit += 1
    return hit


def test_zorder_prunes_more_files_than_single_sort(spark, tmp_path):
    df = _uniform_grid(spark)
    zpath, spath = str(tmp_path / "z"), str(tmp_path / "s")
    write_zordered(df, zpath, ("a", "b"), bits=10, n_files=16)
    (
        df.repartitionByRange(16, "a")
        .sortWithinPartitions("a")
        .write.mode("overwrite")
        .parquet(spath)
    )
    # The discriminating predicate is on B ALONE (a unconstrained):
    # an a-sorted layout leaves b unclustered, so EVERY file spans b's
    # full range and none can be skipped; z-order clusters both
    # columns at once, so only the files whose b-tiles intersect the
    # range survive. (A box tight in `a` would be pruned equally well
    # by the single sort — that is exactly the one predicate shape a
    # single sort handles.)
    box = ((0, 1023), (0, 127))
    z_hits = _files_overlapping_box(zpath, *box)
    s_hits = _files_overlapping_box(spath, *box)
    assert s_hits >= 15, s_hits  # single sort: b stats useless
    assert z_hits < s_hits, (z_hits, s_hits)
    assert z_hits <= 8, z_hits
    # And the layouts hold identical data.
    za = spark.read.parquet(zpath).agg(F.sum("payload")).head()[0]
    sa = spark.read.parquet(spath).agg(F.sum("payload")).head()[0]
    assert za == sa

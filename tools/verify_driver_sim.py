"""Driver-contract simulation: consume /root/repo/__spark_entry__.py the
way the round driver does — entry() smoke at sf0.001, every queries()
entry vs oracle_sql() via DuckDB at sf0.01.

Round-2 change: canonicalize the Spark side via toPandas() (the driver
does; round-1's collect()-based harness hid an ArrowInvalid on a
9999-12-31 sentinel), and compare pandas dtype KINDS per column (the
driver's value hash is dtype-sensitive: DuckDB HUGEINT→float64 vs
Spark int64 failed w3_running_sum despite equal values).
"""

import math
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import SparkSession

import __spark_entry__ as mod

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORR = os.environ.get("VERIFY_SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

spark = (
    SparkSession.builder.master("local[16]")
    .appName("driver_sim")
    .config("spark.sql.shuffle.partitions", "16")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

# --- smoke ---
t0 = time.time()
df = mod.entry(spark)
rows = df.collect()
print(f"SMOKE entry(): {len(rows)} rows, schema={[f.name for f in df.schema.fields]}, {time.time()-t0:.1f}s")
assert len(rows) > 0

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_CORR}/{t}.parquet'")


def norm(v):
    from datetime import date, datetime
    from decimal import Decimal

    if v is None or v is pd.NaT:
        return None
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, (float, np.floating)):
        return "NaN" if math.isnan(v) else round(float(v), 9)
    if isinstance(v, (int, np.integer)):
        return int(v)
    if isinstance(v, pd.Timestamp):
        if pd.isna(v):
            return None
        return v.tz_localize(None).isoformat() if v.tzinfo else v.isoformat()
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        # DuckDB fetch_df renders DATE as midnight datetime64; Spark
        # toPandas keeps datetime.date objects — normalize to midnight
        return datetime(v.year, v.month, v.day).isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(norm(x) for x in v)
    if v is pd.NA:
        return None
    try:
        if pd.isna(v):
            return None
    except (TypeError, ValueError):
        pass
    return v


def kind(dtype):
    """Collapse a pandas dtype to the granularity the driver's value
    hash is sensitive to: int-family vs float vs bool vs datetime vs
    object."""
    k = np.dtype(dtype).kind if not isinstance(dtype, pd.api.types.CategoricalDtype) else "O"
    return {"i": "int", "u": "int", "f": "float", "b": "bool", "M": "ts", "m": "td"}.get(k, "obj")


qs = mod.queries()
oracles = mod.oracle_sql()
if len(sys.argv) > 1:  # optional: verify only the named queries
    missing = [a for a in sys.argv[1:] if a not in qs]
    assert not missing, f"unknown queries: {missing}"
    qs = {k: v for k, v in qs.items() if k in sys.argv[1:]}
print(f"CATALOG: {len(qs)} queries, {len(oracles)} with oracle  (sf={SF_CORR})")

n_pass = n_fail = 0
for name in sorted(qs):
    t0 = time.time()
    try:
        sdf = qs[name](spark, SF_CORR)
        spdf = sdf.toPandas()  # driver canonicalization path — must not raise
        scols = sorted(spdf.columns)
        spdf = spdf[scols]
        # Driver-parity canonicalization: the driver row-sorts via pandas
        # sort_values before hashing, which FACTORIZES every column — a
        # complex-typed cell (numpy array/dict) raises `unhashable type`
        # there. r06's tokenize_encode passed this sim (repr-sort) but
        # crashed the driver; run the stricter path so the sim can never
        # again be more permissive than the driver.
        if len(spdf):
            spdf = spdf.sort_values(by=scols, kind="mergesort").reset_index(drop=True)
        if name in oracles:
            dpdf = con.execute(oracles[name]).fetch_df()
            dcols = sorted(dpdf.columns)
            dpdf = dpdf[dcols] if dcols == sorted(dpdf.columns) else dpdf
            if len(dpdf):
                dpdf = dpdf.sort_values(by=dcols, kind="mergesort").reset_index(drop=True)
            ok_cols = scols == dcols
            ok_count = len(spdf) == len(dpdf)
            ok_dtype, dtype_msg = True, ""
            if ok_cols:
                for c in scols:
                    sk, dk = kind(spdf[c].dtype), kind(dpdf[c].dtype)
                    # object can hold ints/floats (e.g. nullable) — only
                    # flag hard int-vs-float / numeric-vs-ts conflicts
                    if sk != dk and "obj" not in (sk, dk):
                        ok_dtype = False
                        dtype_msg += f" {c}:{sk}!={dk}"
            ss = sorted(
                (tuple(norm(v) for v in row) for row in spdf.itertuples(index=False, name=None)),
                key=repr,
            )
            ds = sorted(
                (tuple(norm(v) for v in row) for row in dpdf.itertuples(index=False, name=None)),
                key=repr,
            )
            ok_vals = ss == ds
            ok = ok_cols and ok_count and ok_vals and ok_dtype
            status = (
                "PASS"
                if ok
                else f"FAIL cols={ok_cols} count={ok_count}({len(spdf)}/{len(dpdf)}) vals={ok_vals} dtype={ok_dtype}{dtype_msg}"
            )
        else:
            status = f"ROWS-ONLY({len(spdf)})"
            ok = True
        n_pass += ok
        n_fail += not ok
        print(f"{status:<14} {name:<35} {len(spdf):>7} rows {time.time()-t0:5.1f}s")
    except Exception as ex:
        n_fail += 1
        print(f"ERROR          {name:<35} {type(ex).__name__}: {str(ex)[:160]}")

print(f"\nTOTAL: {n_pass} ok, {n_fail} failed")
sys.exit(1 if n_fail else 0)

"""Every catalog query must run (to a 0-row result, not a crash) on
EMPTY input tables.

At 100 TB this is not a corner case: partition pruning, a filter-heavy
day, or a brand-new tenant routinely hands an operator zero rows, and
an AnalysisException/numpy crash there takes down the whole job. The
round-4 sweep caught exactly one such bug (IVF k-means on an empty
sample); this test keeps the property."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from github_etl_spark.plans import QUERIES

SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def empty_sf_dir(tmp_path_factory):
    """Schema-identical, zero-row mirror of the fixture tables."""
    dst = str(tmp_path_factory.mktemp("sf_empty"))
    for fn in os.listdir(SRC):
        if fn.endswith(".parquet"):
            schema = pq.read_schema(os.path.join(SRC, fn))
            pq.write_table(
                pa.table({f.name: pa.array([], type=f.type) for f in schema}),
                os.path.join(dst, fn),
            )
    return dst


# Global aggregates legitimately emit rows over zero input (COUNT over
# nothing is one row, not none).
GLOBAL_AGG_ROWS = {
    "s8_existence_probe": 1,  # the probe's answer IS "snapshot_exists=0"
    "a4_hll_sketch": 1,  # the cross-group "ALL" union row
}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_survives_empty_tables(spark, empty_sf_dir, name):
    df = QUERIES[name].fn(spark, empty_sf_dir)
    assert df.count() == GLOBAL_AGG_ROWS.get(name, 0)
    assert len(df.schema.fields) > 0

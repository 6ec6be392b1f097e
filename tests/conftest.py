from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from github_etl_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("github_etl_spark_tests", cpus=int(os.environ.get("TEST_CPUS", "8")))
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("TEST_SF_DIR", SF_SMOKE)


def sf_dir_with_table(tmp_path, name: str, table) -> str:
    """Fixture dir = sf0.001 with ONE table replaced: symlink every
    parquet except ``name``, write ``table`` (a pyarrow Table) as
    ``name``. Shared by the tests that pin operator semantics on a
    hand-crafted events/supplier table."""
    import pyarrow.parquet as pq

    dst = str(tmp_path)
    for fn in os.listdir(SF_SMOKE):
        if fn.endswith(".parquet") and fn != f"{name}.parquet":
            os.symlink(os.path.join(SF_SMOKE, fn), os.path.join(dst, fn))
    pq.write_table(table, os.path.join(dst, f"{name}.parquet"))
    return dst

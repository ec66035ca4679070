from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rust_vector_search_spark.session import get_spark  # noqa: E402
from rust_vector_search_spark.sources import TABLES  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


def make_duckdb(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Views registered exactly like the driver's oracle harness."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


@pytest.fixture(scope="session")
def duck_smoke():
    return make_duckdb(SF_SMOKE)


@pytest.fixture(scope="session")
def duck_oracle():
    return make_duckdb(SF_ORACLE)

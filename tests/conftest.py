from __future__ import annotations

import pytest

from realtime_data_pipeline_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_MID = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="rdp-tests", master="local[8]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    # Oracle views at sf0.01 — the DRIVER'S scale.  Round 1 ran parity
    # at sf0.001 and the smaller data masked hash divergence the driver
    # then caught (VERDICT item 2).
    import duckdb

    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{SF_DIR_MID}/{name}.parquet')"
        )
    yield con
    con.close()

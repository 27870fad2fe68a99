"""A8 — relational sink exercised end-to-end (reference
database/operations.py:23-66 bulk_create: one set-oriented append per
epoch, never row-at-a-time).

Spark bundles the Derby embedded driver (used by the Hive metastore),
so the `write_jdbc` seam can be executed against a real JDBC database
with zero new dependencies: append an epoch's metrics table into
embedded Derby, then read it back via ``spark.read.jdbc`` and compare
row-for-row. On a production cluster the only change is the url/driver
pair (e.g. MySQL) + the driver jar on ``spark.jars``.
"""

import pytest
from pyspark.sql import functions as F

from crawler_spark.state.snapshots import METRICS_SCHEMA, write_jdbc

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _derby_url(tmp_path) -> str:
    return f"jdbc:derby:{tmp_path}/a8db;create=true"


@pytest.fixture()
def metrics_df(spark):
    rows = [
        (b, 100 + b, 80 + b, 60 + b, 50 + b, 10 + b, 200 + b, 45 + b)
        for b in range(16)
    ]
    return spark.createDataFrame(rows, METRICS_SCHEMA)


def test_write_jdbc_roundtrip_derby(spark, metrics_df, tmp_path):
    url = _derby_url(tmp_path)
    # embedded Derby is a single-writer database: coalesce(1) mirrors
    # the production pattern of repartitioning to the connection budget
    # before the sink (write_jdbc docstring)
    write_jdbc(
        metrics_df.coalesce(1), url, "epoch_metrics",
        mode="append", driver=DERBY_DRIVER,
    )
    back = spark.read.format("jdbc").options(
        url=url, dbtable="epoch_metrics", driver=DERBY_DRIVER
    ).load()
    assert sorted(back.columns) == sorted(metrics_df.columns)
    got = sorted(tuple(r) for r in back.collect())
    exp = sorted(tuple(r) for r in metrics_df.collect())
    assert got == exp


def test_write_jdbc_append_accumulates(spark, metrics_df, tmp_path):
    """Two epoch appends → both epochs present (the reference's
    per-epoch bulk_create cadence)."""
    url = _derby_url(tmp_path)
    write_jdbc(metrics_df.coalesce(1), url, "epoch_metrics",
               mode="append", driver=DERBY_DRIVER)
    write_jdbc(
        metrics_df.withColumn("host_bucket", F.col("host_bucket") + 16).coalesce(1),
        url, "epoch_metrics", mode="append", driver=DERBY_DRIVER,
    )
    back = spark.read.format("jdbc").options(
        url=url, dbtable="epoch_metrics", driver=DERBY_DRIVER
    ).load()
    assert back.count() == 32
    assert back.agg(F.countDistinct("host_bucket")).collect()[0][0] == 32

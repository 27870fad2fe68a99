"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship frontier query on sf0.001;
`queries()` / `oracle_sql()` expose every implemented operator family
from SURVEY.md §2 (frontier F*, classical-relational, storage S*, text
C*/analysis, dedup, similarity, multimodal, full-epoch) — see
`crawler_spark/queries.py` for the registry and the DuckDB mirrors.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from crawler_spark import queries as Q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: one scheduling epoch's selection over the URL corpus
    synthesized from sf0.001 orders — canonicalize (F1) → admission
    (F2+F5 anti-join) → priority (F4) → per-host politeness rank +
    global top-K (F3+F8)."""
    return Q.f3_schedule(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return Q.queries()


def oracle_sql() -> dict[str, str]:
    return Q.oracle_sql()

"""crawler_spark — a PySpark-native URL-frontier + fetch scheduler.

A from-scratch re-expression of the capabilities of the reference
crawler (moslem-mohseni/crawler, snapshot at /root/reference) on
Apache Spark: a partitioned priority frontier, a distributed URL-seen
set (exact anti-join + per-partition Bloom filters merged via
treeAggregate), per-host politeness budgets enforced through window
ranking, a vectorized Arrow/pandas fetch stage over image+caption
payloads, and parquet snapshot checkpointing with per-partition
lineage.

Everything here derives from public knowledge only: the Apache Spark /
PySpark API and the observable behaviour of the reference repo. This
is NOT a port — the reference is record-at-a-time threaded Python;
this engine is declarative DataFrame programs optimized by Catalyst.
"""

__version__ = "0.1.0"

"""Bucketed co-located joins: the shuffle-elimination scale tool.

At 100 TB the dominant cost of a fact-fact equi-join is shuffling both
sides on the key. Writing the tables bucketed (+ sorted) on the join
key co-locates matching keys file-for-file, so the SortMergeJoin reads
buckets directly — NO exchange on either side, on every subsequent
join against the same layout. This is the storage-layout analogue of
the reference's single-partition total order (BASELINE.md: topic
partitions = 1): instead of forcing order through one partition, the
layout carries the partitioning.

``write_bucketed`` registers a path-based bucketed table;
``bucketed_join`` reads two such tables back and joins them. The
exchange-free plan is pinned by tests/test_bucketed.py (both sides at
the same bucket count; result equality vs the plain join is asserted
too). Bucket counts must match executor-scale at 100 TB (thousands),
which is a write-time knob — the plan shape is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    key: str,
    nbuckets: int = 8,
) -> None:
    """Write ``df`` as a bucketed, per-bucket-sorted table at ``path``
    and register it as ``table`` (replacing any prior registration)."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    (
        df.write.format("parquet")
        .bucketBy(nbuckets, key)
        .sortBy(key)
        .option("path", path)
        .mode("overwrite")
        .saveAsTable(table)
    )


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key: str,
) -> DataFrame:
    """Equi-join two co-bucketed tables on ``key``. With equal bucket
    counts the optimizer plans a SortMergeJoin straight over the bucket
    files — zero Exchange nodes (pinned by test)."""
    return spark.table(left_table).join(spark.table(right_table), key)


def write_date_partitioned(
    df: DataFrame,
    path: str,
    part_col: str,
) -> None:
    """Write ``df`` hive-partitioned on ``part_col`` (one directory per
    value). Readers filtering on the partition column prune whole
    directories at planning time — at 100 TB a day-filter touches one
    day's files, verified by the PartitionFilters entry in the scan
    (tests/test_bucketed.py)."""
    df.write.format("parquet").partitionBy(part_col).mode("overwrite").save(path)

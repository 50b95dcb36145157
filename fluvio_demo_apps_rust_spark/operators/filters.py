"""Stream predicates (operators F1-F4).

All are plain Catalyst filters, applied immediately after the codec so
they sit at the front of the stream DAG (the analog of the reference
filtering before publish — binlog_parser.rs:48-55)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..config import Filters


def db_filter(df: DataFrame, filters: Filters, drop_no_db: bool = False) -> DataFrame:
    """Include-XOR-exclude db filter, case-insensitive (F1/F2).

    Producer semantics pass no-db events; consumer (drop_no_db=True)
    drops them — binlog_parser.rs:232-265 vs mysql_manager.rs:375-391.
    """
    db = F.lower(F.col("db"))
    no_db = F.col("db").isNull() | (db == "")
    if filters.include_dbs:
        cond = db.isin(*filters.include_dbs)
    elif filters.exclude_dbs:
        cond = ~db.isin(*filters.exclude_dbs)
    else:
        cond = F.lit(True)
    return df.filter(cond | no_db) if not drop_no_db else df.filter(~no_db & cond)


def skip_begin_statements(df: DataFrame) -> DataFrame:
    """Drop BEGIN transaction markers and empty Query events (F3;
    binlog_parser.rs:276-281)."""
    is_query = F.col("op_type") == "Query"
    return df.filter(
        ~is_query
        | (F.col("query").isNotNull() & (F.upper(F.trim(F.col("query"))) != "BEGIN"))
    )


def drop_replayed(df: DataFrame, watermarks: dict[tuple[str, str], int]) -> DataFrame:
    """Exactly-once upgrade (SURVEY §7.4.7): drop events at or below a
    table's applied-sequence high-watermark. Subsumes the reference's
    same-offset dedup (F4, binlog_parser.rs:267-274)."""
    if not watermarks:
        return df
    cond = F.lit(True)
    for (db, table), seq in watermarks.items():
        is_tbl = (F.col("db") == db) & (F.col("table") == table)
        cond = cond & (~is_tbl | (F.col("sequence") > F.lit(seq)))
    return df.filter(cond)

"""Advanced relational surface: pivot, exact percentiles, deterministic
ordered aggregation, rank-family windows, range frames, full-outer and
cross joins, ALL-variant set ops, correlated subqueries, a richer
scalar library, and the custom time-series operators (as-of join,
range join) checked against DuckDB's native ASOF JOIN.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..functions.ranks import bucketed_global_rank
from ..operators.asof import asof_join, range_join_count
from ..session import ensure_utc
from .base import fround, load, qsum, register
from .events import _events


@register(
    "q40_pivot",
    tags=("agg", "pivot"),
    oracle="""
SELECT o_orderpriority,
       count(*) FILTER (WHERE o_orderstatus = 'P') AS status_p,
       count(*) FILTER (WHERE o_orderstatus = 'O') AS status_o,
       count(*) FILTER (WHERE o_orderstatus = 'F') AS status_f
FROM orders GROUP BY o_orderpriority
""",
)
def q40_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: one shuffle on the grouping key; the pivot values are a
    fixed list so the plan is a single hash aggregate, not N scans."""
    o = load(spark, sf_dir, "orders")
    p = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["P", "O", "F"])
        .agg(F.count(F.lit(1)))
    )
    return p.select(
        "o_orderpriority",
        F.coalesce("P", F.lit(0)).alias("status_p"),
        F.coalesce("O", F.lit(0)).alias("status_o"),
        F.coalesce("F", F.lit(0)).alias("status_f"),
    )


@register(
    "q41_percentiles",
    tags=("agg", "percentile"),
    oracle="""
SELECT o_orderstatus,
       floor((quantile_cont(o_totalprice, 0.5)) * 100 + 0.5) / 100.0  AS median_price,
       floor((quantile_cont(o_totalprice, 0.9)) * 100 + 0.5) / 100.0  AS p90_price,
       floor((min(o_totalprice)) * 100 + 0.5) / 100.0                 AS min_price,
       floor((max(o_totalprice)) * 100 + 0.5) / 100.0                 AS max_price
FROM orders GROUP BY o_orderstatus
""",
)
def q41_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark ``percentile`` ==
    DuckDB ``quantile_cont``). The approx_percentile sketch variant is
    the scale path; exact is the verifiable contract."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        fround(F.expr("percentile(o_totalprice, 0.5)"), 2).alias("median_price"),
        fround(F.expr("percentile(o_totalprice, 0.9)"), 2).alias("p90_price"),
        fround(F.min("o_totalprice"), 2).alias("min_price"),
        fround(F.max("o_totalprice"), 2).alias("max_price"),
    )


@register(
    "q42_ordered_agg",
    tags=("agg", "collect"),
    oracle="""
SELECT c_nationkey,
       string_agg(c_mktsegment, ',' ORDER BY c_mktsegment) AS segments,
       max_by(c_custkey, c_acctbal)                        AS richest_cust,
       min_by(c_custkey, c_acctbal)                        AS poorest_cust
FROM (SELECT DISTINCT c_nationkey, c_mktsegment, c_custkey, c_acctbal FROM customer)
GROUP BY c_nationkey
""",
)
def q42_ordered_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ordered aggregation: sorted collect_list join +
    min_by/max_by (acctbal is unique per customer in this data)."""
    c = load(spark, sf_dir, "customer").distinct()
    return c.groupBy("c_nationkey").agg(
        F.array_join(F.array_sort(F.collect_list("c_mktsegment")), ",").alias("segments"),
        F.expr("max_by(c_custkey, c_acctbal)").alias("richest_cust"),
        F.expr("min_by(c_custkey, c_acctbal)").alias("poorest_cust"),
    )


@register(
    "q43_rank_family",
    tags=("window", "rank"),
    oracle="""
SELECT o_orderkey,
       rank()         OVER w AS rnk,
       dense_rank()   OVER w AS drnk,
       ntile(4)       OVER w AS quartile,
       floor((percent_rank() OVER w) * 1000000 + 0.5) / 1000000.0 AS pct_rank,
       floor((cume_dist() OVER w) * 1000000 + 0.5) / 1000000.0    AS cume
FROM orders
WHERE o_orderkey % 50 = 0
WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
""",
)
def q43_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank/ntile/percent_rank/cume_dist over a unique
    total order (ties broken by key → deterministic).

    Scale posture: a bare ``Window.orderBy`` would move ALL rows to
    one partition (r5 verdict #3). Instead the global row number
    comes from functions.ranks.bucketed_global_rank (two-phase
    prefix sum over deterministic fixed-width cents buckets), and —
    because (o_totalprice, o_orderkey) is a UNIQUE total order —
    every rank-family function is a closed-form of (rn, n):
    rank = dense_rank = rn; percent_rank = (rn-1)/(n-1);
    cume_dist = rn/n; ntile(4) via the SQL-standard tile split
    (first n%4 tiles one row larger). The oracle keeps the real
    window functions, so the equivalence itself is gated."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 50 == 0)
    base = o.select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long").alias("_cents"),
    )
    ranked = bucketed_global_rank(
        base, "_cents", ("o_orderkey",), out_col="rn", total_col="n"
    )
    rn, n = F.col("rn"), F.col("n")
    q = F.expr("n DIV 4")
    r = n % 4
    boundary = r * (q + 1)
    # integer tile arithmetic (ANSI-safe: greatest() guards the q=0
    # branch that is never selected when it would divide by zero)
    quartile = F.when(
        rn <= boundary, F.expr("(rn - 1) DIV (n DIV 4 + 1) + 1")
    ).otherwise(
        r + F.expr("(rn - (n % 4) * (n DIV 4 + 1) - 1) DIV greatest(n DIV 4, 1)") + 1
    )
    return ranked.select(
        "o_orderkey",
        rn.alias("rnk"),
        rn.alias("drnk"),
        quartile.cast("long").alias("quartile"),
        fround(
            F.when(n > 1, (rn - 1) / (n - 1).cast("double")).otherwise(F.lit(0.0)), 6
        ).alias("pct_rank"),
        fround(rn / n.cast("double"), 6).alias("cume"),
    )


@register(
    "q44_range_frame",
    tags=("window", "frame"),
    oracle="""
SELECT o_orderkey,
       count(*) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice
                      RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS peers_within_1k
FROM orders
WHERE o_orderkey % 20 = 0
""",
)
def q44_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (value-based window): peers within $1000 below."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 20 == 0)
    w = (
        Window.partitionBy("o_orderstatus")
        .orderBy("o_totalprice")
        .rangeBetween(-1000, Window.currentRow)
    )
    return o.select("o_orderkey", F.count(F.lit(1)).over(w).alias("peers_within_1k"))


@register(
    "q45_full_outer",
    tags=("join", "outer"),
    oracle="""
SELECT coalesce(c.c_nationkey, s.s_nationkey) AS nk,
       count(DISTINCT c.c_custkey)  AS n_cust,
       count(DISTINCT s.s_suppkey)  AS n_supp
FROM customer c
FULL OUTER JOIN supplier s ON c.c_nationkey = s.s_nationkey
GROUP BY nk
""",
)
def q45_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    j = c.join(s, c.c_nationkey == s.s_nationkey, "full_outer")
    return j.groupBy(
        F.coalesce("c_nationkey", "s_nationkey").alias("nk")
    ).agg(
        F.countDistinct("c_custkey").alias("n_cust"),
        F.countDistinct("s_suppkey").alias("n_supp"),
    )


@register(
    "q46_cross_join",
    tags=("join", "cross"),
    oracle="""
SELECT r_name, n_name FROM region CROSS JOIN nation
""",
)
def q46_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join of two bounded dims (broadcast NL join)."""
    r = load(spark, sf_dir, "region").select("r_name")
    n = load(spark, sf_dir, "nation").select("n_name")
    return r.crossJoin(F.broadcast(n))


@register(
    "q47_setops_all",
    tags=("setop",),
    oracle="""
SELECT 'intersect_all' AS tag, nk, count(*) AS cnt FROM (
  SELECT c_nationkey AS nk FROM customer WHERE c_custkey % 2 = 0
  INTERSECT ALL
  SELECT c_nationkey AS nk FROM customer WHERE c_acctbal > 0
) GROUP BY tag, nk
UNION ALL
SELECT 'except_all' AS tag, nk, count(*) AS cnt FROM (
  SELECT c_nationkey AS nk FROM customer
  EXCEPT ALL
  SELECT c_nationkey AS nk FROM customer WHERE c_acctbal > 0
) GROUP BY tag, nk
""",
)
def q47_setops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset INTERSECT ALL / EXCEPT ALL (duplicate-preserving)."""
    c = load(spark, sf_dir, "customer")
    even = c.filter(F.col("c_custkey") % 2 == 0).select(F.col("c_nationkey").alias("nk"))
    pos = c.filter(F.col("c_acctbal") > 0).select(F.col("c_nationkey").alias("nk"))
    every = c.select(F.col("c_nationkey").alias("nk"))
    ia = (
        even.intersectAll(pos)
        .groupBy("nk")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.lit("intersect_all").alias("tag"), "nk", "cnt")
    )
    ea = (
        every.exceptAll(pos)
        .groupBy("nk")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.lit("except_all").alias("tag"), "nk", "cnt")
    )
    return ia.unionAll(ea)


@register(
    "q48_correlated_subqueries",
    tags=("subquery",),
    oracle="""
SELECT o_orderkey, o_totalprice
FROM orders o
WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.8 FROM orders)
  AND EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey AND l.l_discount = 0.1)
""",
)
def q48_correlated_subqueries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar + correlated EXISTS subqueries through spark.sql (Catalyst
    rewrites EXISTS to a left-semi join, the scalar to a broadcast)."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("_adv_orders")
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("_adv_lineitem")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM _adv_orders o
        WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.8 FROM _adv_orders)
          AND EXISTS (SELECT 1 FROM _adv_lineitem l
                      WHERE l.l_orderkey = o.o_orderkey AND l.l_discount = 0.1)
        """
    )


@register(
    "q49_scalar_library",
    tags=("scalar",),
    oracle="""
SELECT p_partkey,
       floor((sqrt(p_retailprice)) * 10000 + 0.5) / 10000.0            AS price_sqrt,
       floor((ln(p_retailprice)) * 10000 + 0.5) / 10000.0              AS price_ln,
       floor((pow(p_size, 2)::DOUBLE) * 10 + 0.5) / 10.0         AS size_sq,
       greatest(p_size, 25)                     AS g25,
       least(p_size, 25)                        AS l25,
       coalesce(nullif(p_brand, 'Brand#1'), 'other') AS brand_or_other,
       lpad(p_partkey::VARCHAR, 8, '0')         AS padded_key,
       replace(p_type, ' ', '_')                AS type_snake,
       reverse(p_brand)                         AS brand_rev,
       strpos(p_name, 'a')                      AS first_a
FROM part WHERE p_partkey % 10 = 0
""",
)
def q49_scalar_library(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math/string/conditional scalar coverage (all JVM built-ins)."""
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") % 10 == 0)
    return p.select(
        "p_partkey",
        fround(F.sqrt("p_retailprice"), 4).alias("price_sqrt"),
        fround(F.log("p_retailprice"), 4).alias("price_ln"),
        fround(F.pow("p_size", F.lit(2)), 1).alias("size_sq"),
        F.greatest("p_size", F.lit(25)).alias("g25"),
        F.least("p_size", F.lit(25)).alias("l25"),
        F.coalesce(F.nullif("p_brand", F.lit("Brand#1")), F.lit("other")).alias(
            "brand_or_other"
        ),
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("padded_key"),
        F.replace("p_type", F.lit(" "), F.lit("_")).alias("type_snake"),
        F.reverse("p_brand").alias("brand_rev"),
        F.instr("p_name", "a").cast("long").alias("first_a"),
    )


@register(
    "q50_asof_join",
    tags=("asof", "timeseries", "custom-op"),
    oracle="""
SELECT p.event_id,
       c.event_id AS asof_event_id,
       epoch_us(c.ts) // 1000000 AS asof_epoch
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND c.ts <= p.ts
""",
)
def q50_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: latest click at-or-before each purchase, per user —
    union-tag + running-last window (one shuffle, no pair blow-up),
    checked against DuckDB's native ASOF JOIN."""
    ensure_utc(spark)
    e = _events(spark, sf_dir)
    purchases = e.filter(F.col("event_type") == "purchase")
    clicks = e.filter(F.col("event_type") == "click")
    out = asof_join(
        purchases, clicks, on="user_id", left_ts="ts", right_ts="ts",
        right_payload=["event_id"], how="inner",
    )
    return out.select(
        "event_id",
        F.col("asof_event_id"),
        F.col("asof_ts").cast("long").alias("asof_epoch"),
    )


@register(
    "q51_range_join",
    tags=("range-join", "timeseries", "custom-op"),
    oracle="""
SELECT a.user_id, count(*) AS pair_cnt
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND b.ts > a.ts
 AND b.ts <= a.ts + INTERVAL 1 HOUR
GROUP BY a.user_id
""",
)
def q51_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range self-join: per-user ordered event pairs within one hour
    (equi-join on the user key, range as residual predicate)."""
    e = _events(spark, sf_dir)
    return range_join_count(e, on="user_id", ts="ts", id_col="event_id", max_gap_seconds=3600).select(
        F.col("k").alias("user_id"), "pair_cnt"
    )


@register(
    "q52_approx_distinct",
    tags=("agg", "approx"),
    # Sketch ESTIMATES are engine-specific, so the gate is the error
    # BOUND, not the estimate: |approx - exact| <= 3*rsd*exact per
    # group (a 3-sigma bound HLL++ satisfies with overwhelming
    # probability on deterministic input). The oracle emits the same
    # groups with literal TRUE — hash-gateable, and still exercises
    # Spark's native HLL++ path (estimation parity itself is covered
    # by the deterministic sketches q89/q82).
    oracle="""
SELECT l_returnflag, TRUE AS orders_within_tol, TRUE AS parts_within_tol
FROM lineitem GROUP BY l_returnflag
""",
)
def q52_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++): the sketch path for distinct
    counting at scale, gated against the exact counts via a 3*rsd
    relative-error bound (the exact variant is oracle-checked in q18)."""
    l = load(spark, sf_dir, "lineitem")
    agg = l.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.count_distinct("l_orderkey").alias("exact_orders"),
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("approx_parts"),
        F.count_distinct("l_partkey").alias("exact_parts"),
    )
    return agg.select(
        "l_returnflag",
        (
            F.abs(F.col("approx_orders") - F.col("exact_orders"))
            <= 3 * 0.05 * F.col("exact_orders")
        ).alias("orders_within_tol"),
        (
            F.abs(F.col("approx_parts") - F.col("exact_parts"))
            <= 3 * 0.01 * F.col("exact_parts")
        ).alias("parts_within_tol"),
    )


@register(
    "q53_unpivot",
    tags=("reshape", "unpivot"),
    oracle="""
SELECT l_returnflag, measure, val
FROM (
  SELECT l_returnflag,
         sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) / 100.0      AS sum_qty,
         sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) / 100.0 AS sum_price,
         sum(CAST(floor(l_discount * 10000 + 0.5) AS BIGINT)) / 10000.0  AS sum_disc
  FROM lineitem GROUP BY l_returnflag
) UNPIVOT (val FOR measure IN (sum_qty, sum_price, sum_disc))
""",
)
def q53_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape (unpivot/melt) over an aggregate."""
    li = load(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        qsum(F.col("l_quantity"), 2).alias("sum_qty"),
        qsum(F.col("l_extendedprice"), 2).alias("sum_price"),
        qsum(F.col("l_discount"), 4).alias("sum_disc"),
    )
    return wide.unpivot(
        ["l_returnflag"], ["sum_qty", "sum_price", "sum_disc"], "measure", "val"
    )


@register(
    "q54_lateral_explode",
    tags=("reshape", "explode", "lateral"),
    oracle="""
SELECT word, count(*) AS freq
FROM (SELECT unnest(string_split(p_name, ' ')) AS word FROM part)
GROUP BY word
ORDER BY freq DESC, word
LIMIT 20
""",
)
def q54_lateral_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-generating lateral op: explode split words, count, top-20."""
    p = load(spark, sf_dir, "part")
    words = p.select(F.explode(F.split("p_name", " ")).alias("word"))
    return (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("word"))
        .limit(20)
    )


@register(
    "q56_sample_hash",
    tags=("sampling",),
    oracle="""
SELECT count(*) AS n, sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) / 100.0 AS sample_revenue
FROM lineitem
WHERE ('0x' || substr(md5(l_orderkey::VARCHAR || '|' || l_linenumber::VARCHAR), 1, 15))::BIGINT % 10 = 0
""",
)
def q56_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 10% sample by key hash — reproducible across
    engines and runs (unlike TABLESAMPLE), the right sampling primitive
    for a 100 TB pipeline: pure filter, no shuffle, prunes at the scan."""
    li = load(spark, sf_dir, "lineitem")
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.col("l_orderkey"), F.col("l_linenumber"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    return li.filter(h % 10 == 0).agg(
        F.count(F.lit(1)).alias("n"),
        qsum(F.col("l_extendedprice"), 2).alias("sample_revenue"),
    )


@register(
    "q57_array_ops",
    tags=("arrays", "nested"),
    oracle="""
SELECT l_orderkey,
       qtys[1] AS first_qty,
       len(qtys) AS n_items,
       list_contains(qtys, 30.0) AS has_30,
       floor((list_sum(list_transform(qtys, q -> q * 2))) * 100 + 0.5) / 100.0 AS doubled_sum,
       coalesce(array_to_string(list_transform(qtys[2:3], q -> CAST(CAST(floor(q * 100 + 0.5) AS BIGINT) AS VARCHAR)), ','), '') AS mid_slice
FROM (
  SELECT l_orderkey, list_sort(list(l_quantity)) AS qtys
  FROM lineitem GROUP BY l_orderkey
)
WHERE l_orderkey % 100 = 0
""",
)
def q57_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested/array kernel: collect per-group sorted arrays, then
    element access, containment, higher-order transform+sum, slicing —
    all JVM-side array expressions. The slice is EMITTED as a
    cents-quantized comma-joined string (the driver's canonicalizer
    cannot hash raw array columns — r5 verdict #2); the array
    operators themselves stay in the plan."""
    li = load(spark, sf_dir, "lineitem")
    arr = (
        li.groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_list("l_quantity")).alias("qtys"))
        .filter(F.col("l_orderkey") % 100 == 0)
    )
    return arr.select(
        "l_orderkey",
        F.element_at("qtys", 1).alias("first_qty"),
        F.size("qtys").alias("n_items"),
        F.array_contains("qtys", F.lit(30.0)).alias("has_30"),
        fround(
            F.aggregate(
                F.transform("qtys", lambda q: q * 2),
                F.lit(0.0),
                lambda acc, q: acc + q,
            ),
            2).alias("doubled_sum"),
        F.array_join(
            F.transform(
                F.slice("qtys", 2, 2),
                lambda q: F.floor(q * 100 + F.lit(0.5)).cast("long").cast("string"),
            ),
            ",",
        ).alias("mid_slice"),
    )


@register(
    "q58_disjunctive_join",
    tags=("join", "pushdown", "disjunction"),
    oracle="""
SELECT count(*) AS n, sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)) / 10000.0 AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 10)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 30 AND l_quantity >= 20)
   OR (p_brand = 'Brand#5' AND p_size BETWEEN 20 AND 50 AND l_quantity >= 30)
""",
)
def q58_disjunctive_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: equi-join with an OR-of-ANDs residual mixing
    both sides' columns — Catalyst extracts the common join key and
    pushes the single-side conjuncts (p_size/p_brand disjunction) into
    the part scan."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    j = li.join(p, li["l_partkey"] == p["p_partkey"])
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & (F.col("l_quantity") >= 10))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(10, 30) & (F.col("l_quantity") >= 20))
        | ((F.col("p_brand") == "Brand#5") & F.col("p_size").between(20, 50) & (F.col("l_quantity") >= 30))
    )
    return j.filter(cond).agg(
        F.count(F.lit(1)).alias("n"),
        qsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"),
    )


@register(
    "q59_profit_rollup",
    tags=("join", "agg", "star"),
    oracle="""
SELECT n_name AS nation_name, CAST(year(l_shipdate) AS INT) AS yr,
       sum(CAST(floor((l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity * 0.1) * 10000 + 0.5) AS BIGINT)) / 10000.0 AS profit
FROM lineitem
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON n_nationkey = s_nationkey
WHERE p_type LIKE '%ECO%'
GROUP BY nation_name, yr
""",
)
def q59_profit_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (adapted — no partsupp table in the test data, so
    supply cost is proxied by retail price): multi-way star join with an
    expression aggregate, grouped by nation and year. Dim tables
    broadcast; the LIKE filter prunes part before the join."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_type").like("%ECO%"))
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    j = (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(n, F.col("n_nationkey") == F.col("s_nationkey"))
    )
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.col("l_quantity") * 0.1
    return (
        j.groupBy(F.col("n_name").alias("nation_name"), F.year("l_shipdate").cast("int").alias("yr"))
        .agg(qsum(profit, 4).alias("profit"))
    )


@register(
    "q60_min_cost_supplier",
    tags=("join", "subquery", "agg"),
    oracle="""
WITH ps AS (
  SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem GROUP BY 1, 2),
best AS (SELECT l_partkey, min(unit_cost) AS best_cost FROM ps GROUP BY 1)
SELECT p_partkey, p_name, s_name, n_name,
       floor(ps.unit_cost * 100 + 0.5) / 100.0 AS unit_cost
FROM ps
JOIN best ON best.l_partkey = ps.l_partkey AND ps.unit_cost = best.best_cost
JOIN part ON p_partkey = ps.l_partkey
JOIN supplier ON s_suppkey = ps.l_suppkey
JOIN nation ON n_nationkey = s_nationkey
WHERE p_size <= 5
""",
)
def q60_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (adapted — no partsupp in the test data, so the
    part-supplier cost relation is derived from lineitem): for each
    small part, the supplier(s) at the minimum unit cost. The
    correlated scalar subquery (min cost per part) becomes an
    aggregate + equi-join back on (partkey, cost); min is exactly
    deterministic on doubles so the float equality is safe on both
    engines. Dim tables (part filtered, supplier, nation) broadcast.

    The output is presented at 2 dp via the repo's binary floor form
    (fround): unit_cost is an INEXACT quotient, and BOTH of Spark's
    round scales go through Double.toString (a shortest-repr
    "…·5" can sit below the binary half: 75.19499…→"75.195" rounds UP
    on Spark, DOWN in DuckDB — and README finding #5 showed scale-0
    round has the same failure, q86's 43973.5), so floor(x·100+0.5)
    on the identical double is the only engine-stable presentation
    (same fix in q36)."""
    li = load(spark, sf_dir, "lineitem")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    best = ps.groupBy("l_partkey").agg(F.min("unit_cost").alias("best_cost"))
    best = best.select(F.col("l_partkey").alias("b_partkey"), "best_cost")
    p = load(spark, sf_dir, "part").filter(F.col("p_size") <= 5)
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    return (
        ps.join(
            best,
            (F.col("b_partkey") == ps["l_partkey"])
            & (ps["unit_cost"] == F.col("best_cost")),
        )
        .join(p, F.col("p_partkey") == ps["l_partkey"])
        .join(s, F.col("s_suppkey") == ps["l_suppkey"])
        .join(n, F.col("n_nationkey") == F.col("s_nationkey"))
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            "n_name",
            fround(F.col("unit_cost"), 2).alias("unit_cost"),
        )
    )


@register(
    "q61_waiting_suppliers",
    tags=("join", "exists", "anti"),
    oracle="""
WITH l AS (
  SELECT l_orderkey, l_suppkey,
         max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY THEN 1 ELSE 0 END) AS late
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  GROUP BY 1, 2)
SELECT s_name, count(*) AS numwait
FROM l l1
JOIN supplier ON s_suppkey = l1.l_suppkey
WHERE l1.late = 1
  AND EXISTS (SELECT 1 FROM l l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM l l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey AND l3.late = 1)
GROUP BY s_name
""",
)
def q61_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (adapted — lateness is l_shipdate more than 60
    days past o_orderdate): suppliers who were the SOLE late supplier
    on a multi-supplier order. EXISTS → left-semi join, NOT EXISTS →
    left-anti join, both against the per-(order, supplier) aggregate.
    That aggregate is referenced three times, and self-join column
    disambiguation defeats Spark's exchange reuse — so it is
    materialized ONCE (lazy localCheckpoint: the single downstream
    action computes it one time and the three branches scan the stored
    partitions; at 100 TB you never recompute a fact-fact join 3×).
    Supplier broadcasts."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    lagg = (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(
                    F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60), 1
                ).otherwise(0)
            ).alias("late")
        )
        .localCheckpoint(eager=False)
    )
    l1 = lagg.filter(F.col("late") == 1).select(
        F.col("l_orderkey").alias("k1"), F.col("l_suppkey").alias("sk1")
    )
    l2 = lagg.select(F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("sk2"))
    l3 = lagg.filter(F.col("late") == 1).select(
        F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("sk3")
    )
    sole_late = (
        l1.join(l2, (F.col("k2") == F.col("k1")) & (F.col("sk2") != F.col("sk1")), "left_semi")
        .join(l3, (F.col("k3") == F.col("k1")) & (F.col("sk3") != F.col("sk1")), "left_anti")
    )
    s = load(spark, sf_dir, "supplier")
    return (
        sole_late.join(s, F.col("s_suppkey") == F.col("sk1"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@register(
    "q62_idle_rich_customers",
    tags=("anti", "scalar-subquery", "agg"),
    oracle="""
WITH avg_bal AS (SELECT avg(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0)
SELECT CAST(c_custkey % 10 AS BIGINT) AS code, count(*) AS numcust,
       sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) / 100.0 AS totbal
FROM customer, avg_bal
WHERE c_acctbal > ab
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
GROUP BY code
""",
)
def q62_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (adapted — the country code becomes
    c_custkey % 10, and "idle" means no URGENT-priority order, since
    every test-data customer has orders): above-average-balance
    customers with no urgent order, grouped by code. The scalar
    subquery is a 1-row broadcast cross join; NOT EXISTS is a
    left-anti join against the filtered orders custkey projection
    (filter + 2-column pruning reach the scan: see .explain)."""
    c = load(spark, sf_dir, "customer")
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("ab"))
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(o, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy((F.col("c_custkey") % 10).cast("long").alias("code"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            qsum(F.col("c_acctbal"), 2).alias("totbal"),
        )
    )


@register(
    "q63_binational_volume",
    tags=("join", "agg", "star"),
    oracle="""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INT) AS yr,
       sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)) / 10000.0 AS volume
FROM lineitem
JOIN orders   ON o_orderkey = l_orderkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON n1.n_nationkey = s_nationkey
JOIN nation n2 ON n2.n_nationkey = c_nationkey
WHERE ((n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_10')
    OR (n1.n_name = 'NATION_10' AND n2.n_name = 'NATION_9'))
GROUP BY supp_nation, cust_nation, yr
""",
)
def q63_binational_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between two nations by year
    (pair picked from the synthetic nation names).
    The nation dimension joins twice (supplier side, customer side) —
    both broadcast; the symmetric pair disjunction is a residual the
    optimizer keeps above the joins."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    s = load(spark, sf_dir, "supplier")
    c = load(spark, sf_dir, "customer")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    j = (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(n1, F.col("n1_key") == F.col("s_nationkey"))
        .join(n2, F.col("n2_key") == F.col("c_nationkey"))
        .filter(
            ((F.col("supp_nation") == "NATION_9") & (F.col("cust_nation") == "NATION_10"))
            | ((F.col("supp_nation") == "NATION_10") & (F.col("cust_nation") == "NATION_9"))
        )
    )
    return j.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("yr")
    ).agg(
        qsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
            "volume"
        )
    )


@register(
    "q64_market_share",
    tags=("join", "agg", "case"),
    oracle="""
SELECT CAST(year(o_orderdate) AS INT) AS yr,
       floor(sum(CAST(floor((CASE WHEN n_name = 'NATION_9'
                                  THEN l_extendedprice * (1 - l_discount) ELSE 0 END) * 10000 + 0.5) AS BIGINT))
             / (sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)) * 1.0)
             * 1000000 + 0.5) / 1000000.0 AS mkt_share
FROM lineitem
JOIN orders   ON o_orderkey = l_orderkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON n_nationkey = s_nationkey
GROUP BY yr
""",
)
def q64_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's (NATION_9) share of total revenue
    by order year — a conditional-sum ratio inside a single aggregate pass
    (no second scan for the denominator)."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(n, F.col("n_nationkey") == F.col("s_nationkey"))
    )
    rev_q = F.floor(rev * 10000 + F.lit(0.5)).cast("long")
    nat_q = F.floor(
        F.when(F.col("n_name") == "NATION_9", rev).otherwise(0) * 10000 + F.lit(0.5)
    ).cast("long")
    return j.groupBy(F.year("o_orderdate").cast("int").alias("yr")).agg(
        (
            F.floor(
                F.sum(nat_q) / (F.sum(rev_q) * F.lit(1.0)) * 1000000 + F.lit(0.5)
            )
            / 1000000.0
        ).alias("mkt_share")
    )


@register(
    "q65_value_windows",
    tags=("window", "frame", "value"),
    oracle="""
SELECT o_orderkey,
       floor((first_value(o_totalprice) OVER w) * 100 + 0.5) / 100.0 AS cheapest_in_status,
       floor((last_value(o_totalprice)
             OVER (w RANGE BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)) * 100 + 0.5) / 100.0
         AS priciest_in_status,
       floor((nth_value(o_totalprice, 3)
             OVER (w RANGE BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)) * 100 + 0.5) / 100.0
         AS third_cheapest,
       floor((lag(o_totalprice, 1, -1.0) OVER w) * 100 + 0.5) / 100.0  AS prev_price,
       floor((lead(o_totalprice, 2, -1.0) OVER w) * 100 + 0.5) / 100.0 AS next2_price
FROM orders
WHERE o_orderkey % 100 = 0
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
""",
)
def q65_value_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value window functions: first/last/nth value over a full-frame
    window plus lag/lead with defaults — the ordering includes the key
    so ties are deterministic on both engines."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_orderkey",
        fround(F.first("o_totalprice").over(w), 2).alias("cheapest_in_status"),
        fround(F.last("o_totalprice").over(wfull), 2).alias("priciest_in_status"),
        fround(F.nth_value("o_totalprice", 3).over(wfull), 2).alias("third_cheapest"),
        fround(F.lag("o_totalprice", 1, -1.0).over(w), 2).alias("prev_price"),
        fround(F.lead("o_totalprice", 2, -1.0).over(w), 2).alias("next2_price"),
    )


@register(
    "q66_shipmode_buckets",
    tags=("join", "agg", "case"),
    oracle="""
SELECT CASE WHEN l_shipdate <= o_orderdate + INTERVAL 30 DAY THEN 'fast'
            WHEN l_shipdate <= o_orderdate + INTERVAL 90 DAY THEN 'normal'
            ELSE 'slow' END AS ship_speed,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
            AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
            AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON o_orderkey = l_orderkey
GROUP BY ship_speed
""",
)
def q66_shipmode_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (adapted — no shipmode column, so lines bucket
    by ship latency): priority counts per latency bucket, conditional
    sums in one aggregate pass after the fact-fact join."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    j = li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
    speed = (
        F.when(F.col("l_shipdate") <= F.date_add("o_orderdate", 30), "fast")
        .when(F.col("l_shipdate") <= F.date_add("o_orderdate", 90), "normal")
        .otherwise("slow")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return j.groupBy(speed.alias("ship_speed")).agg(
        F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
        F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
    )


@register(
    "q67_order_count_histogram",
    tags=("join", "outer", "agg", "histogram"),
    oracle="""
WITH per_cust AS (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON o_custkey = c_custkey
    AND o_orderpriority <> '5-LOW'
  GROUP BY c_custkey)
SELECT c_count, count(*) AS custdist
FROM per_cust
GROUP BY c_count
""",
)
def q67_order_count_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of per-customer order counts —
    left outer join with a join-condition filter (not a WHERE: the
    customers with zero qualifying orders must survive into the
    c_count=0 bucket), then a two-level aggregation."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    j = c.join(
        o,
        (F.col("o_custkey") == F.col("c_custkey"))
        & (F.col("o_orderpriority") != "5-LOW"),
        "left",
    )
    per_cust = j.groupBy("c_custkey").agg(F.count("o_orderkey").alias("c_count"))
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q68_large_orders",
    tags=("join", "having", "semi"),
    oracle="""
WITH big AS (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING sum(l_quantity) > 250)
SELECT c_name, o_orderkey, CAST(o_orderdate AS VARCHAR) AS o_orderdate,
       floor((o_totalprice) * 100 + 0.5) / 100.0 AS o_totalprice, total_qty
FROM (SELECT l_orderkey AS k, sum(l_quantity) AS total_qty
      FROM lineitem GROUP BY l_orderkey) q
JOIN big ON big.l_orderkey = q.k
JOIN orders ON o_orderkey = q.k
JOIN customer ON c_custkey = o_custkey
""",
)
def q68_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity clears a threshold
    (HAVING on a fact aggregate), joined back to order and customer
    detail. The aggregate is computed once; the HAVING filter and the
    detail join both consume it."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    qty = li.groupBy(F.col("l_orderkey").alias("k")).agg(
        F.sum("l_quantity").alias("total_qty")
    )
    big = qty.filter(F.col("total_qty") > 250)
    return (
        big.join(o, F.col("o_orderkey") == F.col("k"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("string").alias("o_orderdate"),
            fround("o_totalprice", 2).alias("o_totalprice"),
            "total_qty",
        )
    )


@register(
    "q55_skew_salted_agg",
    tags=("skew", "agg", "salted"),
    oracle="""
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(round(sum(CAST(round(l_quantity * 100) AS BIGINT))) AS BIGINT) AS total_qty_c,
       floor((min(l_extendedprice)) * 100 + 0.5) / 100.0 AS min_price,
       floor((max(l_extendedprice)) * 100 + 0.5) / 100.0 AS max_price
FROM lineitem
GROUP BY l_returnflag
""",
)
def q55_skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key aggregation through the explicit salting operator:
    l_returnflag has THREE distinct values across the whole fact table
    — the single-hot-key shape AQE cannot fix (it splits partitions,
    not keys). salted_agg spreads each key over 16 reducers in phase 1
    and re-reduces tiny partials in phase 2; the result is identical to
    the plain GROUP BY the oracle runs. Quantities aggregate as exact
    integer centi-units so the two-phase float order cannot perturb the
    value hash; min/max are order-insensitive."""
    from ..operators.skew import salted_agg

    l = load(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_quantity") * 100).cast("long").alias("qty_c"),
        "l_extendedprice",
    )
    out = salted_agg(
        l,
        keys=["l_returnflag"],
        aggs={
            "n_items": ("qty_c", "count"),
            "total_qty_c": ("qty_c", "sum"),
            "min_price": ("l_extendedprice", "min"),
            "max_price": ("l_extendedprice", "max"),
        },
        salt=16,
    )
    return out.select(
        "l_returnflag",
        "n_items",
        "total_qty_c",
        fround("min_price", 2).alias("min_price"),
        fround("max_price", 2).alias("max_price"),
    )


@register(
    "q69_skew_salted_join",
    tags=("skew", "join", "salted"),
    oracle="""
WITH dim AS (
  SELECT DISTINCT l_returnflag,
         CASE l_returnflag WHEN 'R' THEN 'returned'
                           WHEN 'A' THEN 'accepted'
                           ELSE 'none' END AS flag_label
  FROM lineitem)
SELECT flag_label,
       CAST(count(*) AS BIGINT) AS n_items,
       sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) / 100.0 AS revenue
FROM lineitem JOIN dim USING (l_returnflag)
GROUP BY flag_label
""",
)
def q69_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key join through the explicit salting operator: the probe
    side's join key (l_returnflag) has THREE values, so an unsalted
    shuffle join lands the whole fact table on three reducers.
    salted_join replicates the tiny build side 8 ways and salts the
    probe deterministically — each hot key spreads over 8 reducers.
    Result identical to the plain join the oracle runs."""
    from ..operators.skew import salted_join

    l = load(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    dim = (
        l.select("l_returnflag")
        .distinct()
        .withColumn(
            "flag_label",
            F.when(F.col("l_returnflag") == "R", "returned")
            .when(F.col("l_returnflag") == "A", "accepted")
            .otherwise("none"),
        )
    )
    joined = salted_join(l, dim, on=["l_returnflag"], salt=8)
    return joined.groupBy("flag_label").agg(
        F.count(F.lit(1)).alias("n_items"),
        qsum(F.col("l_extendedprice"), 2).alias("revenue"),
    )


@register(
    "q98_approx_percentile",
    tags=("agg", "approx", "quantile"),
    # Same gate philosophy as q52: sketch ESTIMATES are engine-
    # specific, so the gate is the published RANK-ERROR bound, not the
    # estimate. percentile_approx(accuracy=1000) guarantees the
    # returned element's rank is within n/1000 of floor(q*n); the plan
    # verifies that against EXACT rank counts from a second scan pass
    # and emits booleans plus the exact group size (so the oracle pins
    # more than literal TRUEs). Estimation parity itself is covered by
    # the deterministic histogram sketch q90.
    oracle="""
SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
       TRUE AS p50_within_tol, TRUE AS p95_within_tol
FROM lineitem GROUP BY l_returnflag
""",
)
def q98_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx quantiles (Greenwald-Khanna percentile_approx): the
    quantile-sketch path for percentile reporting at scale, gated
    against exact ranks. Per group: the sketch's p50/p95 element, then
    one more scan counting rows strictly below / at-or-below it; the
    returned element satisfies the bound iff its rank interval
    [cnt_lt + 1, cnt_le] intersects [floor(q*n) - n/1000,
    floor(q*n) + n/1000] (+1 slack for the floor convention).

    Scale shape: two scans, both map-side partial aggregates on the
    group key; the 3-row sketch result broadcasts back onto the
    second scan's conditional counts — no shuffle of row data beyond
    the group-key aggregation either pass."""
    l = load(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    sk = l.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.5, 1000).alias("ap50"),
        F.percentile_approx("l_extendedprice", 0.95, 1000).alias("ap95"),
    )
    counted = (
        l.join(F.broadcast(sk), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.when(F.col("l_extendedprice") < F.col("ap50"), 1).otherwise(0))
            .cast("long")
            .alias("lt50"),
            F.sum(F.when(F.col("l_extendedprice") <= F.col("ap50"), 1).otherwise(0))
            .cast("long")
            .alias("le50"),
            F.sum(F.when(F.col("l_extendedprice") < F.col("ap95"), 1).otherwise(0))
            .cast("long")
            .alias("lt95"),
            F.sum(F.when(F.col("l_extendedprice") <= F.col("ap95"), 1).otherwise(0))
            .cast("long")
            .alias("le95"),
        )
    )

    def within(lt, le, q):
        target = F.floor(F.lit(q) * F.col("n"))
        slack = F.col("n") / F.lit(1000) + F.lit(1)
        return (F.col(lt) <= target + slack) & (F.col(le) >= target - slack)

    return counted.select(
        "l_returnflag",
        "n",
        within("lt50", "le50", 0.5).alias("p50_within_tol"),
        within("lt95", "le95", 0.95).alias("p95_within_tol"),
    )


@register(
    "q101_selection_median",
    tags=("agg", "percentile", "selection"),
    oracle="""
WITH s AS (SELECT o_totalprice AS x FROM orders WHERE x IS NOT NULL),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM s),
r AS (SELECT x, row_number() OVER (ORDER BY x) AS rn FROM s)
SELECT n.n AS n,
       (SELECT x FROM r, n WHERE rn = (n.n + 1) // 2) AS median_lo,
       (SELECT x FROM r, n WHERE rn = n.n // 2 + 1)   AS median_hi
FROM n
""",
)
def q101_selection_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT median by multi-pass histogram SELECTION — the 100 TB-safe
    twin of q41_percentiles: Spark's built-in exact ``percentile``
    buffers every value of the group in executor memory (fine at
    sf0.1, an OOM against a 100 TB column), while this runs the
    classic selection algorithm — bounded histogram, narrow to the hit
    bin with pushdown-able raw-column range predicates, recurse one
    level, finish on an exact value-count histogram
    (operators/selection.py). Driver state is one bounded histogram
    per pass, never data. Emits both middle order statistics (lower /
    upper median) so even-count semantics are explicit and no
    averaging of inexact doubles is needed; values are raw 2-dp money
    (identity-safe)."""
    from ..operators.selection import selection_kths

    o = load(spark, sf_dir, "orders")
    # r13-opt: ONE shared narrowing serves both ranks and yields n from
    # its pass-1 histogram — 3 full passes instead of 7 (count + two
    # 3-pass selections); identical values by construction.
    n, vals = selection_kths(
        o, "o_totalprice", k_of_n=lambda n: [(n + 1) // 2, n // 2 + 1]
    )
    lo, hi = vals[(n + 1) // 2], vals[n // 2 + 1]
    return spark.createDataFrame(
        [(n, lo, hi)], "n bigint, median_lo double, median_hi double"
    )


@register(
    "q102_grouped_median",
    tags=("agg", "percentile", "selection", "window"),
    oracle="""
WITH r AS (
  SELECT o_orderpriority AS grp, o_totalprice AS x,
         row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice) AS rn,
         count(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM orders WHERE o_totalprice IS NOT NULL)
SELECT grp, CAST(n AS BIGINT) AS n, x AS value
FROM r WHERE rn = (n + 1) // 2
""",
)
def q102_grouped_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group EXACT lower median by distributed two-pass histogram
    selection — the grouped face of q101: no per-group value buffering
    (the built-in exact percentile's OOM shape) and no driver loop.
    Pass 1 aggregates (group, 100-unit bin) counts and finds each
    group's hit bin with a running total computed by a window over the
    BIN HISTOGRAM (value-range/width rows per group, bounded at any
    data size); pass 2 repeats at exact cent granularity inside only
    the hit bins. The oracle sorts per group (the semantic spec); the
    Spark plan never sorts raw rows at all — both windows run over
    aggregates (operators/selection.py grouped_kth)."""
    from ..operators.selection import grouped_kth

    o = load(spark, sf_dir, "orders")
    out = grouped_kth(o, "o_orderpriority", "o_totalprice", lambda n: (n + 1) / 2)
    return out.select(F.col("grp"), F.col("n"), F.col("value"))


@register(
    "q105_negative_median",
    tags=("agg", "percentile", "selection"),
    oracle="""
WITH s AS (
  SELECT o_orderpriority AS grp,
         floor((o_totalprice - 150000.0) * 100 + 0.5) / 100.0 AS x
  FROM orders WHERE o_totalprice IS NOT NULL),
r AS (
  SELECT grp, x,
         row_number() OVER (PARTITION BY grp ORDER BY x) AS rn,
         count(*) OVER (PARTITION BY grp) AS n
  FROM s),
g AS (SELECT grp, CAST(n AS BIGINT) AS n, x AS value FROM r WHERE rn = (n + 1) // 2),
ra AS (SELECT x, row_number() OVER (ORDER BY x) AS rn, count(*) OVER () AS n FROM s),
ga AS (SELECT '__global__' AS grp, CAST(n AS BIGINT) AS n, x AS value
       FROM ra WHERE rn = (n + 1) // 2)
SELECT grp, n, value FROM g UNION ALL SELECT grp, n, value FROM ga
""",
)
def q105_negative_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact medians over a SIGNED column through the selection kernels
    — pins the r8 ADVICE fix in operators/selection.py: bin keys are
    now floor-division (a truncating cast collapsed all cents in
    (-width, width) into bin 0 and mis-binned negatives) and the
    narrowing range predicates are sign-agnostic. The input is
    o_totalprice shifted by -150k (≈ median), giving a mixed-sign
    2-dp column whose median sits near the sign boundary — exactly
    where truncation-vs-floor diverges. Emits the per-priority lower
    medians (grouped_kth) plus a '__global__' row (selection_kth).
    The shifted column is re-quantized with the repo fround standard
    on BOTH sides so the emitted doubles are binary-identical."""
    from ..operators.selection import grouped_binned, grouped_kth_from, kth_from_binned

    o = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_totalprice").isNotNull())
        .select(
            F.col("o_orderpriority"),
            fround(F.col("o_totalprice") - F.lit(150000.0), 2).alias("x"),
        )
    )
    # r13-opt: the grouped and GLOBAL selections share one binned
    # histogram — the global bin histogram is the per-group one
    # re-aggregated (a bounded collect, no corpus scan) and the global
    # count is its total (no count job). 3 corpus scans instead of 7
    # (grouped 3 + count + global 3); identical values by construction.
    # binned feeds two consumers, so it is materialized (README finding
    # #8) — histogram-sized (|groups| x value-range/width rows) at any
    # data size.
    base, binned = grouped_binned(o, "o_orderpriority", "x")
    binned = binned.localCheckpoint()
    grouped = grouped_kth_from(base, binned, lambda n: (n + 1) / 2)
    n, glo = kth_from_binned(base, binned, lambda n: (n + 1) // 2)
    gdf = spark.createDataFrame(
        [("__global__", n, glo)], "grp string, n bigint, value double"
    )
    return grouped.select("grp", "n", "value").unionByName(gdf)


@register(
    "q107_corrupt_quarantine",
    tags=("ingest", "quarantine", "robustness"),
    oracle="""
SELECT * FROM (VALUES
  ('parsed',      CAST(4 AS BIGINT), CAST(23.75 AS DOUBLE),
   'd41d8cd98f00b204e9800998ecf8427e', '55507df704707039407b5108a4bc8d65'),
  ('quarantined', CAST(3 AS BIGINT), CAST(NULL AS DOUBLE),
   '4a68187af7394cf49e12985e9f3a2b2b', 'd41d8cd98f00b204e9800998ecf8427e')
) t(kind, n, v_sum, raw_digest, parsed_digest)
""",
)
def q107_corrupt_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CORRUPT-RECORD QUARANTINE routing — the ingestion guard every
    100 TB pipeline needs in front of JSONL/CSV feeds: read with an
    explicit schema in PERMISSIVE mode + columnNameOfCorruptRecord,
    route rows with a populated corrupt column to quarantine (their
    raw line preserved byte-exactly for replay after a parser fix)
    and sum business values ONLY over clean rows. The fixture feed
    plants one of each malformation class, with empirically-confirmed
    Spark semantics pinned by the hand-computed oracle: a truncated
    JSON line (all fields null + raw captured), a type mismatch
    (OTHER fields still parse — v/name are populated — but the row is
    quarantined because the raw line is captured; its parsed values
    must NOT leak into clean aggregates), a non-JSON garbage line,
    a valid row with missing fields (nulls, NOT quarantined), and two
    clean rows. Quarantined raw lines are digest-pinned (md5 of the
    binary-sorted '\\n'-join), so the gate verifies byte-exact raw
    preservation, not just counts.

    100 TB shape: schema-on-read with whole-stage-codegen JSON
    parsing, a row-local routing predicate, and one 2-group
    aggregate; the same options work unchanged on readStream (the
    streaming ingest face)."""
    import os
    import shutil
    import tempfile
    from pathlib import Path

    d = Path(tempfile.mkdtemp(prefix="q_cq_"))
    feed = d / "feed.jsonl"
    feed.write_text(
        "\n".join(
            [
                '{"id": 1, "v": 10.5, "name": "alpha"}',
                '{"id": 2, "v": 3.',
                '{"id": "xx", "v": 2.0, "name": "beta"}',
                "total garbage, not json",
                '{"v": 7.25}',
                '{"id": 5, "v": 4.25, "name": "gamma"}',
                '{"id": 6, "v": 1.75, "name": "delta"}',
            ]
        )
        + "\n"
    )
    os.utime(feed, (1_700_000_000, 1_700_000_000))
    try:
        df = (
            spark.read.schema("id long, v double, name string, _bad string")
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_bad")
            .json(str(d))
        )
        # parsed_digest pins the CLEAN rows' content — and, critically,
        # keeps id/name in the consumed column set: Spark's JSON parser
        # only discovers a type mismatch in a column it actually
        # parses, so a plan that prunes id/name would silently route
        # the '"id": "xx"' row to PARSED (observed — schema-pruning is
        # a correctness hazard for corrupt-record detection, which is
        # why the quarantine aggregate must consume every schema
        # column).
        routed = df.select(
            F.when(F.col("_bad").isNull(), F.lit("parsed"))
            .otherwise(F.lit("quarantined"))
            .alias("kind"),
            "id",
            "v",
            "name",
            "_bad",
        )
        out = (
            routed.groupBy("kind")
            .agg(
                F.count(F.lit(1)).alias("n"),
                (
                    F.sum(
                        F.when(
                            F.col("_bad").isNull(),
                            F.floor(F.col("v") * 100 + F.lit(0.5)).cast("bigint"),
                        )
                    )
                    / F.lit(100.0)
                ).alias("v_sum"),
                F.md5(
                    F.array_join(F.array_sort(F.collect_list("_bad")), "\n")
                ).alias("raw_digest"),
                F.md5(
                    F.array_join(
                        F.array_sort(
                            F.collect_list(
                                F.when(
                                    F.col("_bad").isNull(),
                                    F.concat_ws(",", F.col("id"), F.col("name")),
                                )
                            )
                        ),
                        "\n",
                    )
                ).alias("parsed_digest"),
            )
        )
        out = out.localCheckpoint()  # materialize before the tmpdir goes
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return out


@register(
    "q118_mad_robust_stats",
    tags=("agg", "selection", "robust", "mad"),
    oracle="""
WITH s AS (SELECT value AS x FROM events WHERE value IS NOT NULL),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM s),
c AS (SELECT CAST(floor(x * 100 + 0.5) AS BIGINT) AS c FROM s),
rc AS (SELECT c, row_number() OVER (ORDER BY c) AS rn FROM c),
med AS (SELECT c AS mc FROM rc, n WHERE rn = (n.n + 1) // 2),
dev AS (
  SELECT CAST(floor(abs(x - (SELECT mc FROM med) / CAST(100 AS DOUBLE))
                    * 100 + 0.5) AS BIGINT) AS dc
  FROM s),
rd AS (SELECT dc, row_number() OVER (ORDER BY dc) AS rn FROM dev),
mad AS (SELECT dc AS madc FROM rd, n WHERE rn = (n.n + 1) // 2)
SELECT n.n AS n, (SELECT mc FROM med) AS median_cents,
       (SELECT madc FROM mad) AS mad_cents
FROM n
""",
)
def q118_mad_robust_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MEDIAN ABSOLUTE DEVIATION — the robust dispersion statistic
    (the anomaly-threshold denominator that, unlike stddev, a single
    corrupted value cannot blow up), computed by COMPOSING the exact
    histogram-selection kernel twice: median of the values, then
    median of the absolute deviations from it. Each selection is the
    q101 three-pass narrowing (bounded histograms on the driver,
    never data); the deviation column is derived row-locally from the
    broadcast scalar median, so the second selection runs over a
    projection, not a materialization. Medians are lower-medians at
    exact cents; the deviation quantizes floor(|x−m|·100+0.5) with m
    = cents/100.0 divided identically on both engines — every emitted
    number is an exact BIGINT.

    The oracle is the naive formulation — two full sorts via global
    row_number — which is exactly what dies on a 100 TB column; the
    Spark side is the plan that survives (same contrast as q101,
    which stays deliberately 39× slower than DuckDB's in-memory sort
    at sf0.1 because bounded memory is the point).

    100 TB shape: at most six bounded-histogram aggregates (three per
    selection; range-adaptive skipping removes the levels the column's
    observed span makes redundant — 5 on this fixture's ~560-unit
    column, 3 on a <= 100-unit one), one bounded collect per pass,
    O(bins) driver state."""
    from ..operators.selection import selection_kth, selection_kths

    ev = load(spark, sf_dir, "events")
    s = ev.where(F.col("value").isNotNull())
    # r13-opt: n comes from the median selection's pass-1 histogram
    # (no separate count job); the MAD selection must follow the
    # median (its column derives from m). r14-opt (VERDICT r13 item 7,
    # guide §1.2): the narrowing is now RANGE-ADAPTIVE — the median
    # pass collects min/max cents alongside its first histogram and
    # skips every level the observed span makes redundant, and the
    # deviation column's hard bounds derive from that min/max and m
    # with NO scan (dev <= max(m - min, max - m)), so its selection
    # passes the cover via value_range and skips its redundant coarse
    # level. On the fixture (value spans ~560 units = 56k cents) that
    # is 6 corpus passes -> 5 (the MAD's 1e6-width level goes; Spark
    # jobs 14 -> 12); a narrower column drops further (a <= 100-unit
    # column resolves in 3). On a wide column (q101's o_totalprice)
    # all levels still run — the pass count adapts to value RANGE,
    # never to row count, and the answers are bit-identical either
    # way (the bounds only gate pass-skipping, never filter rows).
    n, vals, (vmin, vmax) = selection_kths(
        s, "value", k_of_n=lambda n: [(n + 1) // 2], return_stats=True
    )
    k = (n + 1) // 2
    m = vals[k]
    mc_exact = int(math.floor(m * 100 + 0.5))
    dev = s.select(F.abs(F.col("value") - F.lit(m)).alias("dev"))
    mad = selection_kth(dev, "dev", k, value_range=(0, max(mc_exact - vmin, vmax - mc_exact)))
    # repo rounding standard (floor(x*100+0.5)), not Python round():
    # selection_kth returns cents/100.0 so x*100 is within ~1e-7 of an
    # integer and floor(+0.5) recovers it exactly (r10 ADVICE).
    cents = lambda x: int(math.floor(x * 100 + 0.5))  # noqa: E731
    return spark.createDataFrame(
        [(n, cents(m), cents(mad))],
        "n bigint, median_cents bigint, mad_cents bigint",
    )

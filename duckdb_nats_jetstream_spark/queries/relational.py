"""Relational capability surface (SURVEY.md §2.B) — the operator classes the
reference exercises *through* its host engine (projection, filters, casts,
aggregates, grouping, sort/limit, distinct, windows, joins, set ops, CTEs),
expressed Spark-first on the TPC-H-ish driver tables.

Scale notes (these run on local[32] here, but are written for 1000
executors): small dimensions (region/nation/customer/supplier/part) broadcast
— no shuffle of the fact side; fact-fact joins (orders↔lineitem) shuffle on
the join key, which AQE right-sizes; windows partition by a key, never a
global ORDER BY over the fact table.

Float discipline: every SUM/AVG over doubles uses the decimal-exact pattern
from ``functions.exact`` so values hash-match the DuckDB oracle exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from duckdb_nats_jetstream_spark.functions.exact import (
    DEC,
    NET_PRICE_SQL,
    davg,
    decsum,
    dsum,
    net_price,
)
from duckdb_nats_jetstream_spark.tables import read_table

DSUM = "CAST(sum(CAST({x} AS DECIMAL(18,2))) AS DOUBLE)"
DAVG = DSUM + " / count({x})"


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy multi-aggregate grouping. Partial (map-side)
    aggregation + 6-group final: no data-size-proportional shuffle."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2000-12-01")
    )
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            decsum(net_price(), "sum_disc_price"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


PRICING_SUMMARY_SQL = f"""
SELECT l_returnflag, l_linestatus,
       {DSUM.format(x='l_quantity')} AS sum_qty,
       {DSUM.format(x='l_extendedprice')} AS sum_base_price,
       CAST(sum({NET_PRICE_SQL}) AS DOUBLE) AS sum_disc_price,
       {DAVG.format(x='l_quantity')} AS avg_qty,
       {DAVG.format(x='l_extendedprice')} AS avg_price,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dimension broadcast + fact-fact shuffle join
    + top-k (Spark plans TakeOrderedAndProject — no global sort)."""
    cust = read_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1999-01-01")
    )
    li = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1999-01-01")
    )
    return (
        li.join(
            orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(decsum(net_price(), "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


TOP_REVENUE_SQL = f"""
SELECT o_orderkey, CAST(o_orderdate AS TIMESTAMP) AS o_orderdate, o_orderpriority,
       CAST(sum({NET_PRICE_SQL}) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1999-01-01 00:00:00'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


def nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: snowflake join (region→nation→customer→orders→lineitem)
    with every dimension broadcast; only orders↔lineitem shuffles."""
    region = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = read_table(spark, sf_dir, "nation")
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    dims = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(dims), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("n_name")
        .agg(decsum(net_price(), "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


NATION_REVENUE_SQL = f"""
SELECT n_name, CAST(sum({NET_PRICE_SQL}) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


def filter_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's filter-predicate classes in one query: BETWEEN, IN,
    LIKE, OR/AND, IS NULL (test_protobuf.sql:147-203 pattern)."""
    li = read_table(spark, sf_dir, "lineitem")
    out = li.filter(
        (F.col("l_quantity").between(10, 20))
        & (F.col("l_returnflag").isin("A", "R"))
        & ((F.col("l_discount") > 0.05) | (F.col("l_tax") < 0.02))
        & (F.col("l_shipdate").isNotNull())
    )
    return out.select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_discount"
    )


FILTER_MATRIX_SQL = """
SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag, l_discount
FROM lineitem
WHERE l_quantity BETWEEN 10 AND 20
  AND l_returnflag IN ('A', 'R')
  AND (l_discount > 0.05 OR l_tax < 0.02)
  AND l_shipdate IS NOT NULL
"""


def cast_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cast surface: double→int/long/string, string ops
    (test_json_extraction.sql:45-51 pattern)."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_orderkey"),
        F.col("l_linenumber"),
        F.col("l_quantity").cast("int").alias("qty_int"),
        F.col("l_extendedprice").cast("string").alias("price_str"),
        # round() on *decimal* is half-up in both engines (double round is not)
        F.round(net_price(), 2).cast("double").alias("net_rounded"),
        F.concat(F.col("l_returnflag"), F.lit("/"), F.col("l_linestatus")).alias(
            "flag_status"
        ),
    )


CAST_PROJECTION_SQL = f"""
SELECT l_orderkey, l_linenumber,
       CAST(l_quantity AS INTEGER) AS qty_int,
       CAST(l_extendedprice AS VARCHAR) AS price_str,
       CAST(round({NET_PRICE_SQL}, 2) AS DOUBLE) AS net_rounded,
       l_returnflag || '/' || l_linestatus AS flag_status
FROM lineitem
"""


def count_distinct_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) + plain aggregates per group
    (test_timestamp_queries.sql:202-207 pattern)."""
    orders = read_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count("*").alias("n_orders"),
            dsum("o_totalprice", "sum_price"),
        )
        .orderBy("o_orderstatus")
    )


COUNT_DISTINCT_SQL = f"""
SELECT o_orderstatus,
       count(DISTINCT o_custkey) AS n_customers,
       count(*) AS n_orders,
       {DSUM.format(x='o_totalprice')} AS sum_price
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


def conditional_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUM(CASE WHEN ...) conditional aggregation
    (test_subject_filtering.sql:209-218 pattern)."""
    orders = read_table(spark, sf_dir, "orders")
    return orders.agg(
        F.sum(F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)).alias(
            "n_urgent"
        ),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("n_final"),
        F.count("*").alias("n_total"),
    )


CONDITIONAL_AGG_SQL = """
SELECT CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent,
       CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_final,
       count(*) AS n_total
FROM orders
"""


def first_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROW_NUMBER window, partitioned by key (scales: no global sort)."""
    orders = read_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate")
    )


FIRST_ORDER_SQL = """
SELECT o_custkey, o_orderkey, CAST(o_orderdate AS TIMESTAMP) AS o_orderdate
FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders) t
WHERE rn = 1
"""


def order_date_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG window per customer: days between consecutive orders."""
    orders = read_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        orders.withColumn("prev_date", F.lag("o_orderdate").over(w))
        .filter(F.col("prev_date").isNotNull())
        .select(
            "o_custkey",
            "o_orderkey",
            F.datediff(F.col("o_orderdate"), F.col("prev_date"))
            .cast("long")
            .alias("gap_days"),
        )
    )


ORDER_GAPS_SQL = """
SELECT o_custkey, o_orderkey,
       datediff('day', prev_date, o_orderdate) AS gap_days
FROM (SELECT *, lag(o_orderdate) OVER (PARTITION BY o_custkey
                                       ORDER BY o_orderdate, o_orderkey) AS prev_date
      FROM orders) t
WHERE prev_date IS NOT NULL
"""


def trailing_window_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window (time-based moving aggregate): per order, the
    customer's decimal-exact spend and order count over the trailing 90
    days. The frame is keyed on integer epoch-days in BOTH engines so peer
    rows and bounds match exactly."""
    orders = read_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.unix_date(F.col("o_orderdate").cast("date")))
        .rangeBetween(-90, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double").alias("spend_90d"),
        F.count("*").over(w).alias("n_orders_90d"),
    )


TRAILING_SPEND_SQL = """
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS spend_90d,
       COUNT(*) OVER w AS n_orders_90d
FROM orders
WINDOW w AS (PARTITION BY o_custkey
             ORDER BY (CAST(o_orderdate AS DATE) - DATE '1970-01-01')
             RANGE BETWEEN 90 PRECEDING AND CURRENT ROW)
"""


def distinct_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT DISTINCT (test_subject_filtering.sql:32-42 pattern)."""
    cust = read_table(spark, sf_dir, "customer")
    return cust.select("c_mktsegment", "c_nationkey").distinct()


DISTINCT_SEGMENTS_SQL = "SELECT DISTINCT c_mktsegment, c_nationkey FROM customer"


def union_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL building a combined relation
    (test_json_extraction.sql:230-235 pattern)."""
    cust = read_table(spark, sf_dir, "customer").select(
        F.col("c_name").alias("name"), F.lit("customer").alias("kind")
    )
    supp = read_table(spark, sf_dir, "supplier").select(
        F.col("s_name").alias("name"), F.lit("supplier").alias("kind")
    )
    return cust.unionAll(supp)


UNION_ENTITIES_SQL = """
SELECT c_name AS name, 'customer' AS kind FROM customer
UNION ALL
SELECT s_name AS name, 'supplier' AS kind FROM supplier
"""


def balance_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join of two scalar aggregates
    (test_connection_errors.sql:150-162 pattern)."""
    cust = read_table(spark, sf_dir, "customer").agg(davg("c_acctbal", "cust_avg"))
    supp = read_table(spark, sf_dir, "supplier").agg(davg("s_acctbal", "supp_avg"))
    return cust.crossJoin(supp).select(
        "cust_avg",
        "supp_avg",
        (F.col("cust_avg") / F.col("supp_avg")).alias("ratio"),
    )


BALANCE_RATIO_SQL = f"""
SELECT cust_avg, supp_avg, cust_avg / supp_avg AS ratio
FROM (SELECT {DAVG.format(x='c_acctbal')} AS cust_avg FROM customer) a
CROSS JOIN (SELECT {DAVG.format(x='s_acctbal')} AS supp_avg FROM supplier) b
"""


def top_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k = ORDER BY + LIMIT (docs/EXAMPLES.md:329-338 pattern)."""
    part = read_table(spark, sf_dir, "part")
    return (
        part.select("p_partkey", "p_name", "p_retailprice")
        .orderBy(F.col("p_retailprice").desc(), F.col("p_partkey"))
        .limit(15)
    )


TOP_PARTS_SQL = """
SELECT p_partkey, p_name, p_retailprice
FROM part ORDER BY p_retailprice DESC, p_partkey LIMIT 15
"""


def above_average_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery in WHERE (test_sequence_ranges.sql:49-68 pattern) —
    expressed as a broadcast cross join against the 1-row aggregate."""
    cust = read_table(spark, sf_dir, "customer")
    avg_bal = cust.agg(davg("c_acctbal", "avg_bal"))
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .select("c_custkey", "c_name", "c_acctbal")
    )


ABOVE_AVG_SQL = f"""
SELECT c_custkey, c_name, c_acctbal
FROM customer
WHERE c_acctbal > (SELECT {DAVG.format(x='c_acctbal')} FROM customer)
"""


def parts_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE patterns + grouping by type."""
    part = read_table(spark, sf_dir, "part")
    return (
        part.filter(F.col("p_name").like("%widget%"))
        .groupBy("p_type")
        .agg(F.count("*").alias("n_parts"), davg("p_retailprice", "avg_price"))
        .orderBy("p_type")
    )


PARTS_LIKE_SQL = f"""
SELECT p_type, count(*) AS n_parts, {DAVG.format(x='p_retailprice')} AS avg_price
FROM part WHERE p_name LIKE '%widget%'
GROUP BY p_type ORDER BY p_type
"""


def scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-function surface: length, round, upper, interval arithmetic,
    date parts (test_payload_blob.sql:11-17 / test_timestamp_queries.sql:19-20
    patterns)."""
    orders = read_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.length("o_orderpriority").cast("long").alias("prio_len"),
        F.upper(F.col("o_orderstatus")).alias("status_u"),
        F.round(F.col("o_totalprice").cast("decimal(18,2)"), -2)
        .cast("double")
        .alias("price_hundreds"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
    )


SCALAR_FUNCTIONS_SQL = """
SELECT o_orderkey,
       length(o_orderpriority) AS prio_len,
       upper(o_orderstatus) AS status_u,
       CAST(round(CAST(o_totalprice AS DECIMAL(18,2)), -2) AS DOUBLE) AS price_hundreds,
       CAST(o_orderdate AS TIMESTAMP) + INTERVAL '30 days' AS due_date,
       CAST(year(o_orderdate) AS BIGINT) AS order_year,
       CAST(month(o_orderdate) AS BIGINT) AS order_month
FROM orders
"""


def cte_sql_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL entry path: temp views + WITH clause (the reference's CTE /
    CREATE TEMP TABLE patterns, test_sequence_ranges.sql:49-68,
    test_json_extraction.sql:230) — same Catalyst plan as the DataFrame API."""
    read_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    read_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_v")
    return spark.sql(
        """
        WITH cust_orders AS (
          SELECT o_custkey, count(*) AS n_orders,
                 CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
          FROM orders_v GROUP BY o_custkey
        )
        SELECT c.c_mktsegment, count(*) AS n_customers,
               CAST(sum(co.n_orders) AS BIGINT) AS total_orders,
               CAST(sum(CAST(co.spend AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
        FROM cust_orders co JOIN customer_v c ON co.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment
        ORDER BY c.c_mktsegment
        """
    )


CTE_SQL = """
WITH cust_orders AS (
  SELECT o_custkey, count(*) AS n_orders,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
  FROM orders GROUP BY o_custkey
)
SELECT c.c_mktsegment, count(*) AS n_customers,
       CAST(sum(co.n_orders) AS BIGINT) AS total_orders,
       CAST(sum(CAST(co.spend AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
FROM cust_orders co JOIN customer c ON co.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
ORDER BY c.c_mktsegment
"""


def semi_anti_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi (EXISTS) and left-anti (NOT EXISTS) joins — beyond the
    reference's surface, standard for any engine swap."""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders").select("o_custkey")
    with_orders = cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).agg(F.count("*").alias("n_with_orders"))
    without = cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).agg(F.count("*").alias("n_without_orders"))
    return with_orders.crossJoin(without)


SEMI_ANTI_SQL = """
SELECT
  (SELECT count(*) FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)) AS n_with_orders,
  (SELECT count(*) FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)) AS n_without_orders
"""


def percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark ``percentile`` == DuckDB
    ``quantile_cont``: same (n-1)p interpolation)."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            # One percentile buffer per column (array of percentages), not one
            # per requested quantile — same (n-1)p interpolation, ~2x faster.
            F.percentile(
                "l_extendedprice", F.array(F.lit(0.5), F.lit(0.9))
            ).alias("pp"),
            F.percentile("l_quantity", 0.25).alias("p25_qty"),
            F.count("*").alias("n"),
        )
        .select(
            "l_returnflag",
            F.col("pp")[0].alias("p50_price"),
            F.col("pp")[1].alias("p90_price"),
            "p25_qty",
            "n",
        )
        .orderBy("l_returnflag")
    )


PERCENTILES_SQL = """
SELECT l_returnflag,
       quantile_cont(l_extendedprice, 0.5) AS p50_price,
       quantile_cont(l_extendedprice, 0.9) AS p90_price,
       quantile_cont(l_quantity, 0.25) AS p25_qty,
       count(*) AS n
FROM lineitem
GROUP BY l_returnflag ORDER BY l_returnflag
"""


def rollup_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping-set hierarchy (flag → flag+status → grand total)."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n_items"), dsum("l_quantity", "sum_qty"))
        .select(
            # coalesce the NULL grouping markers — comparison harnesses that
            # sort mixed None/str tuples choke on raw rollup output
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n_items",
            "sum_qty",
        )
        .orderBy("returnflag", "linestatus")
    )


ROLLUP_SQL = f"""
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       count(*) AS n_items,
       {DSUM.format(x='l_quantity')} AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY returnflag, linestatus
"""


def intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT set ops: nations having customers vs suppliers."""
    cust_nations = (
        read_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    )
    supp_nations = (
        read_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    )
    both = cust_nations.intersect(supp_nations).withColumn("setop", F.lit("both"))
    # subtract == EXCEPT (set semantics); exceptAll would keep bag leftovers
    cust_only = (
        cust_nations.distinct()
        .subtract(supp_nations.distinct())
        .withColumn("setop", F.lit("customer_only"))
    )
    return both.unionAll(cust_only)


INTERSECT_EXCEPT_SQL = """
SELECT nationkey, 'both' AS setop FROM
  (SELECT c_nationkey AS nationkey FROM customer
   INTERSECT
   SELECT s_nationkey FROM supplier) t
UNION ALL
SELECT nationkey, 'customer_only' AS setop FROM
  (SELECT DISTINCT c_nationkey AS nationkey FROM customer
   EXCEPT
   SELECT DISTINCT s_nationkey FROM supplier) u
"""


def pivot_status_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order counts by market segment × order status (oracle via
    conditional aggregation — same relation, engine-neutral)."""
    cust = read_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = read_table(spark, sf_dir, "orders").select("o_custkey", "o_orderstatus")
    joined = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    return (
        joined.groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .count()
        .na.fill(0, ["O", "F", "P"])
        .select(
            "c_mktsegment",
            F.col("O").alias("n_open"),
            F.col("F").alias("n_final"),
            F.col("P").alias("n_partial"),
        )
        .orderBy("c_mktsegment")
    )


PIVOT_SQL = """
SELECT c_mktsegment,
       CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
       CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_final,
       CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_partial
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


def approx_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates — HLL distinct-count and rank-error-bounded
    percentile. Sketches are engine-specific (Spark HLL++ vs DuckDB HLL,
    t-digest vs GK), so raw sketch outputs can never hash-match across
    engines; the oracle-stable contract is the exact value plus a boolean
    "approx within 5% of exact", which both engines evaluate over their own
    deterministic sketches. This is also the production acceptance test
    you'd run before trusting a sketch at 100 TB, where the exact
    COUNT(DISTINCT) it replaces is the expensive shuffle.

    Plan shape: COUNT(DISTINCT) mixed into the same agg as percentile
    buffers makes Catalyst Expand every row per distinct-group and drag
    the percentile maps across the blowup (measured 9s at sf0.1). Instead
    both distinct counts run on a pre-deduplicated projection — HLL is
    duplicate-insensitive, so approx_count_distinct over distinct rows is
    the same estimate — and the percentile pair aggregates separately;
    the join is 3 rows."""
    orders = read_table(spark, sf_dir, "orders")
    uniq = orders.select("o_orderstatus", "o_custkey").distinct()
    exact = uniq.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_customers_exact"),
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("hll"),
    )
    med = orders.groupBy("o_orderstatus").agg(
        F.percentile(F.col("o_totalprice").cast("double"), 0.5).alias("med_exact"),
        F.expr(
            "approx_percentile(CAST(o_totalprice AS DOUBLE), 0.5, 10000)"
        ).alias("med_approx"),
    )
    n = F.col("n_customers_exact")
    return (
        exact.join(med, "o_orderstatus")
        .select(
            "o_orderstatus",
            "n_customers_exact",
            (F.abs(F.col("hll") - n) <= 0.05 * n).alias("hll_ok"),
            (
                F.abs(F.col("med_approx") - F.col("med_exact"))
                <= 0.05 * F.col("med_exact")
            ).alias("median_ok"),
        )
        .orderBy("o_orderstatus")
    )


APPROX_AGGS_SQL = """
SELECT o_orderstatus,
       count(DISTINCT o_custkey) AS n_customers_exact,
       abs(approx_count_distinct(o_custkey) - count(DISTINCT o_custkey))
           <= 0.05 * count(DISTINCT o_custkey) AS hll_ok,
       abs(approx_quantile(CAST(o_totalprice AS DOUBLE), 0.5)
           - quantile_cont(CAST(o_totalprice AS DOUBLE), 0.5))
           <= 0.05 * quantile_cont(CAST(o_totalprice AS DOUBLE), 0.5) AS median_ok
FROM orders
GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


def price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram via ``width_bucket`` — the building block of a
    data-profiling pass. DuckDB has no width_bucket, so the oracle emulates
    it with integer cent arithmetic; bounds are chosen so both forms are
    float-exact (see APPROX vs exact notes in functions/exact.py)."""
    orders = read_table(spark, sf_dir, "orders")
    bucket = F.width_bucket(
        F.col("o_totalprice").cast("double"), F.lit(0.0), F.lit(600000.0), F.lit(6)
    )
    return (
        orders.groupBy(bucket.cast("long").alias("bucket"))
        .agg(
            F.count("*").alias("n_orders"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
        .orderBy("bucket")
    )


PRICE_HISTOGRAM_SQL = """
SELECT CAST((CAST(o_totalprice * 100 AS BIGINT) // 10000000) + 1 AS BIGINT) AS bucket,
       count(*) AS n_orders,
       min(o_totalprice) AS min_price,
       max(o_totalprice) AS max_price
FROM orders
GROUP BY 1 ORDER BY bucket
"""


def rank_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking-window family: rank/dense_rank/percent_rank/
    cume_dist over a tie-bearing order (o_orderdate), ntile + row_number
    over a deterministic total order. percent_rank and cume_dist are one
    double division each — cross-engine exact."""
    orders = read_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    tie_w = W.partitionBy("o_custkey").orderBy("o_orderdate")
    det_w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(det_w).cast("long").alias("rn"),
        F.rank().over(tie_w).cast("long").alias("rnk"),
        F.dense_rank().over(tie_w).cast("long").alias("drnk"),
        F.ntile(4).over(det_w).cast("long").alias("quartile"),
        F.percent_rank().over(tie_w).alias("pct_rank"),
        F.cume_dist().over(tie_w).alias("cdist"),
    )


RANK_FUNCTIONS_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(row_number() OVER det AS BIGINT) AS rn,
       CAST(rank() OVER tie AS BIGINT) AS rnk,
       CAST(dense_rank() OVER tie AS BIGINT) AS drnk,
       CAST(ntile(4) OVER det AS BIGINT) AS quartile,
       percent_rank() OVER tie AS pct_rank,
       cume_dist() OVER tie AS cdist
FROM orders
WHERE o_custkey < 100
WINDOW tie AS (PARTITION BY o_custkey ORDER BY o_orderdate),
       det AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function surface beyond the reference's tests: regexp
    extraction, translate, padding, and levenshtein (the fuzzy-match
    building block) — all integer/string-deterministic across engines."""
    part = read_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 500)
    return part.select(
        "p_partkey",
        F.regexp_extract("p_type", "^([a-z]+)", 1).alias("type_head"),
        F.translate("p_brand", "#", "-").alias("brand_t"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
        F.levenshtein("p_brand", "p_type").cast("long").alias("lev_bt"),
        F.instr(F.col("p_name"), "red").cast("long").alias("red_at"),
    )


STRING_FUNCTIONS_SQL = """
SELECT p_partkey,
       regexp_extract(p_type, '^([a-z]+)', 1) AS type_head,
       replace(p_brand, '#', '-') AS brand_t,
       lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
       CAST(levenshtein(p_brand, p_type) AS BIGINT) AS lev_bt,
       CAST(strpos(p_name, 'red') AS BIGINT) AS red_at
FROM part
WHERE p_partkey < 500
"""


def market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: the deepest join tree in the registry — lineitem ×
    part(filtered) × orders × customer × nation×2 × region × supplier,
    yearly market share of one supplying nation inside one region's market.

    Scale shape: nation/region broadcast always; the part/supplier/customer
    joins are left to Catalyst+AQE (broadcast at test scale, shuffle at
    TPC-H SF where part is SF×200k rows). Share = two decimal-exact sums
    and ONE double division (see functions/exact.py)."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    supp = read_table(spark, sf_dir, "supplier")
    nat = read_table(spark, sf_dir, "nation")
    reg = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    part_f = (
        read_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    cust_eu = (
        cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .select("c_custkey")
    )
    supp_nat = supp.join(
        F.broadcast(
            nat.select(
                F.col("n_nationkey").alias("sn_key"),
                F.col("n_name").alias("supp_nation"),
            )
        ),
        supp.s_nationkey == F.col("sn_key"),
    ).select("s_suppkey", "supp_nation")
    vol = net_price()
    return (
        li.join(part_f, li.l_partkey == part_f.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust_eu, orders.o_custkey == cust_eu.c_custkey)
        .join(supp_nat, li.l_suppkey == supp_nat.s_suppkey)
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("supp_nation") == "NATION_2", vol)).alias("__t"),
            F.sum(vol).alias("__a"),
        )
        .select(
            "o_year",
            (
                F.coalesce(F.col("__t"), F.lit(0)).cast("double")
                / F.col("__a").cast("double")
            ).alias("mkt_share"),
            F.col("__a").cast("double").alias("total_vol"),
        )
    )


MARKET_SHARE_SQL = f"""
WITH v AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         {NET_PRICE_SQL} AS vol,
         n2.n_name AS supp_nation
  FROM lineitem
  JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey AND r_name = 'EUROPE'
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
)
SELECT o_year,
       CAST(coalesce(sum(CASE WHEN supp_nation = 'NATION_2' THEN vol END), 0)
            AS DOUBLE) / CAST(sum(vol) AS DOUBLE) AS mkt_share,
       CAST(sum(vol) AS DOUBLE) AS total_vol
FROM v GROUP BY o_year
"""


def array_agg_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered array aggregation: per nation, the sorted distinct market
    segments of its customers (emitted string-joined — the driver's
    value-hash compares scalars; array equality is pytest-checked).
    ``collect_set`` is partial-aggregated map-side; sorting is per-group
    post-agg, never a global sort."""
    cust = read_table(spark, sf_dir, "customer")
    return cust.groupBy("c_nationkey").agg(
        F.countDistinct("c_mktsegment").alias("n_segments"),
        F.concat_ws(",", F.sort_array(F.collect_set("c_mktsegment"))).alias(
            "segments"
        ),
    )


ARRAY_AGG_SQL = """
SELECT c_nationkey,
       count(DISTINCT c_mktsegment) AS n_segments,
       array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',') AS segments
FROM customer GROUP BY c_nationkey
"""


def unpivot_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide→long): melts the pivoted status counts back into
    (segment, status, n) rows — Spark plans an Expand, no shuffle beyond
    the input aggregation."""
    wide = pivot_status_by_segment(spark, sf_dir)
    return wide.unpivot(
        ["c_mktsegment"],
        ["n_open", "n_final", "n_partial"],
        "status",
        "n_orders",
    )


UNPIVOT_SQL = f"""
WITH wide AS ({PIVOT_SQL})
SELECT c_mktsegment, 'n_open' AS status, n_open AS n_orders FROM wide
UNION ALL
SELECT c_mktsegment, 'n_final', n_final FROM wide
UNION ALL
SELECT c_mktsegment, 'n_partial', n_partial FROM wide
"""


def udaf_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDF/UDAF registration surface (:mod:`functions.udx` — absent from
    the reference): a grouped-agg pandas UDAF and a scalar vectorized UDF
    computing the same exact-cents total per nation; both columns must
    equal the oracle's single SQL expression."""
    from duckdb_nats_jetstream_spark.functions.udx import cents, cents_sum

    cust = read_table(spark, sf_dir, "customer")
    # Spark disallows mixing a group-agg pandas UDF with JVM aggregates in
    # one agg ([INVALID_PANDAS_UDF_PLACEMENT]) — two aggs, tiny-key join
    udaf = cust.groupBy("c_nationkey").agg(
        cents_sum(F.col("c_acctbal")).alias("bal_cents")
    )
    builtin = cust.groupBy("c_nationkey").agg(
        F.count("*").alias("n_cust"),
        F.sum(cents(F.col("c_acctbal"))).alias("bal_cents_scalar"),
    )
    return builtin.join(udaf, "c_nationkey").select(
        "c_nationkey", "n_cust", "bal_cents", "bal_cents_scalar"
    )


UDAF_CENTS_SQL = """
-- outer CASTs: DuckDB sum(BIGINT) widens to HUGEINT (int128), which the
-- driver's pandas-side hash renders differently from Spark's int64 even
-- when every value is equal (r01 hash_match:false with 25/25 identical
-- rows). BIGINT end-to-end keeps both engines in int64.
SELECT c_nationkey, count(*) AS n_cust,
       CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_cents,
       CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_cents_scalar
FROM customer GROUP BY c_nationkey
"""


def customer_order_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: LEFT OUTER join distribution — how many customers
    placed 0, 1, 2, ... urgent orders (ref exercises inner joins only,
    e.g. ref:test/sql/test_json_extraction.sql:230-249; outer-join counting
    is the classic extension).

    Scale plan: aggregate orders down to (custkey, count) FIRST (one shuffle
    over orders, output ≤ |customers| rows), then left-join customer to the
    compact per-customer counts — never the raw orders fact. The second
    groupBy is over ≤ a few dozen distinct counts."""
    cust = read_table(spark, sf_dir, "customer").select("c_custkey")
    per_cust = (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n"))
    )
    return (
        cust.join(per_cust, cust.c_custkey == per_cust.o_custkey, "left_outer")
        .select(F.coalesce(F.col("n"), F.lit(0)).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


CUSTOMER_ORDER_HISTOGRAM_SQL = """
WITH per_cust AS (
    SELECT c_custkey, count(o_orderkey) AS c_count
    FROM customer LEFT OUTER JOIN orders
      ON c_custkey = o_custkey AND o_orderpriority = '1-URGENT'
    GROUP BY c_custkey
)
SELECT c_count, count(*) AS custdist
FROM per_cust
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated aggregate subquery — revenue of lineitems
    below 20% of their part's average quantity, one brand.

    Spark-first decorrelation: broadcast the brand-filtered part keys into
    lineitem FIRST (the per-part average only needs that part subset, and
    the partkey filter preserves per-part completeness), aggregate the small
    survivor set per partkey, broadcast the thresholds back. Neither shuffle
    touches the full fact table.

    Exactness: l_quantity holds integer-valued doubles, so SUM/AVG are exact
    in any accumulation order; 0.2*avg and the final /7.0 are single IEEE
    ops identical in both engines."""
    bparts = (
        read_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#12")
        .select("p_partkey")
    )
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    li_b = li.join(F.broadcast(bparts), li.l_partkey == bparts.p_partkey).drop(
        "p_partkey"
    )
    thresh = li_b.groupBy("l_partkey").agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_thresh")
    )
    return (
        li_b.join(F.broadcast(thresh), "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast(DEC)).cast("double") / F.lit(7.0))
            .alias("avg_yearly")
        )
    )


SMALL_QTY_REVENUE_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly
FROM lineitem, part
WHERE p_partkey = l_partkey
  AND p_brand = 'Brand#12'
  AND l_quantity < (
      SELECT 0.2 * avg(l_quantity) FROM lineitem l2 WHERE l2.l_partkey = p_partkey
  )
"""


def large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING on an aggregate + IN-subquery — customers
    whose orders exceed 300 total units.

    Scale plan: one shuffle aggregates lineitem per orderkey; the HAVING
    filter shrinks it to a tiny key set that BROADCASTS into orders (the
    IN-subquery becomes a broadcast hash join, no second lineitem pass —
    the aggregate is carried, not recomputed). customer joins on custkey
    un-hinted: AQE broadcasts it at test scale, shuffles at 100 TB."""
    big = (
        read_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            "o_totalprice", "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


LARGE_ORDERS_SQL = """
SELECT c_name, c_custkey, o_orderkey, CAST(o_orderdate AS TIMESTAMP) AS o_orderdate,
       o_totalprice, sum(l_quantity) AS total_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
    SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300
)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


def top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: aggregate feeding a scalar MAX subquery — the
    supplier(s) with peak revenue in a quarter.

    The revenue view is computed once and reused for both the MAX and the
    equality filter (Spark reuses the exchange; the max side is a 1-row
    broadcast). Equality on doubles is safe because both sides derive from
    the same exact decimal sum."""
    rev = (
        read_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-04-01"))
        )
        .groupBy("l_suppkey")
        .agg(decsum(net_price(), "total_revenue"))
    )
    peak = rev.agg(F.max("total_revenue").alias("peak_revenue"))
    supp = read_table(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(peak), rev.total_revenue == peak.peak_revenue)
        .join(F.broadcast(supp), rev.l_suppkey == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


TOP_SUPPLIER_SQL = f"""
WITH rev AS (
    SELECT l_suppkey, CAST(SUM({NET_PRICE_SQL}) AS DOUBLE) AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
    GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN rev ON s_suppkey = l_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
ORDER BY s_suppkey
"""


def dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar subquery threshold + NOT EXISTS anti-join +
    final aggregation — above-average-balance customers with no urgent
    orders, totalled per nation.

    The average-balance threshold is a 1-row aggregate cross-joined in
    (broadcast nested loop of a single row — the Spark idiom for a scalar
    subquery, no collect). NOT EXISTS is a left_anti join against the
    distinct urgent custkeys, which aggregate down before the join."""
    cust = read_table(spark, sf_dir, "customer")
    thr = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (F.sum(F.col("c_acctbal").cast(DEC)).cast("double")
             / F.count("c_acctbal")).alias("thr")
        )
    )
    urgent = (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
        .distinct()
    )
    return (
        cust.crossJoin(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("thr"))
        .join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            dsum("c_acctbal", "totacctbal"),
        )
        .orderBy("c_nationkey")
    )


DORMANT_RICH_SQL = """
SELECT c_nationkey, count(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_acctbal > (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(c_acctbal)
        FROM customer WHERE c_acctbal > 0.0
      )
  AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
      )
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


def disjunctive_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: fact⋈dim join gated by OR-of-AND predicate blocks
    (ref exercises only conjunctive filters, test/sql/test_protobuf.sql:200;
    the disjunctive class is the classic optimizer stress).

    Scale: part broadcasts (no fact shuffle); the disjunction references
    both sides so it evaluates post-join, but the OR of the part-only
    conjuncts (brand IN ...) is implied by the blocks and Catalyst derives
    it as a pushed-down scan filter on the broadcast side."""
    li = read_table(spark, sf_dir, "lineitem")
    pt = read_table(spark, sf_dir, "part")
    q, b, s = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    blocks = (
        (b == "Brand#11") & s.between(1, 15) & q.between(1, 11)
        | (b == "Brand#22") & s.between(1, 25) & q.between(10, 20)
        | (b == "Brand#15") & s.between(1, 35) & q.between(20, 30)
    )
    return (
        li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .filter(blocks)
        .agg(decsum(net_price(), "revenue"), F.count("*").alias("n_items"))
    )


DISJUNCTIVE_JOIN_SQL = f"""
SELECT CAST(sum({NET_PRICE_SQL}) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#22' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 35
       AND l_quantity BETWEEN 20 AND 30)
"""


def waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE slow supplier on a
    multi-supplier order ("slow" = shipped >60 days after order date).

    The textbook form is two correlated subqueries (EXISTS another supplier
    / NOT EXISTS another *slow* supplier) — two extra self-joins of the
    fact table. Spark-first rewrite: aggregate to (order, supplier) grain
    first, then per order — plain counts at both levels. Two narrow
    shuffles instead of three self-joins, and crucially no
    multiple-COUNT(DISTINCT) in one agg, which would plan an Expand that
    triples every shuffled row (measured 2.4s→1.6s at sf0.1). The oracle
    runs the EXISTS/NOT EXISTS formulation, so parity proves the rewrite."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    sup = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    slow = F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60)
    per_supp = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.count(F.when(slow, F.lit(1))).alias("slow_items"))
    )
    per_order = (
        per_supp.groupBy("l_orderkey")
        .agg(
            F.count("*").alias("n_supp"),
            F.count(F.when(F.col("slow_items") > 0, F.lit(1))).alias("n_slow_supp"),
            F.max(F.when(F.col("slow_items") > 0, F.col("l_suppkey"))).alias("slow_supp"),
            # all slow items in the order belong to the unique slow supplier
            # once the n_slow_supp == 1 filter holds
            F.sum("slow_items").alias("n_slow_items"),
        )
        .filter((F.col("n_supp") > 1) & (F.col("n_slow_supp") == 1))
    )
    return (
        per_order.groupBy("slow_supp")
        .agg(F.sum("n_slow_items").alias("numwait"))
        .join(F.broadcast(sup), F.col("slow_supp") == sup.s_suppkey)
        .select("s_name", "numwait")
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(10)
    )


WAITING_SUPPLIERS_SQL = """
SELECT s_name, count(*) AS numwait
FROM lineitem l1
JOIN orders ON l1.l_orderkey = o_orderkey
JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  JOIN orders o3 ON l3.l_orderkey = o3.o_orderkey
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 10
"""


def array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions over the embedding vectors: lambda
    filter, sort+slice, element_at, min/max — all JVM-side Catalyst
    expressions (no UDF, no shuffle beyond the final tiny per-label agg).
    Every derived value is arithmetic-free (counts and element
    pass-throughs), so floats hash-match the oracle exactly."""
    emb = read_table(spark, sf_dir, "embeddings")
    e = F.col("embedding")
    per_vec = emb.select(
        "label",
        F.size(F.filter(e, lambda x: x > F.lit(0.0))).alias("n_pos"),
        F.size(F.filter(e, lambda x: F.abs(x) > F.lit(0.25))).alias("n_big"),
        F.array_max(e).alias("amax"),
        F.array_min(e).alias("amin"),
        F.element_at(F.slice(F.sort_array(e, asc=False), 1, 3), 3).alias("third"),
    )
    return (
        per_vec.groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            F.sum("n_pos").alias("sum_pos"),
            F.sum("n_big").alias("sum_big"),
            F.max("amax").alias("max_elem"),
            F.min("amin").alias("min_elem"),
            F.max("third").alias("max_third"),
        )
        .orderBy("label")
    )


ARRAY_HOF_SQL = """
WITH per_vec AS (
    SELECT label,
           len(list_filter(embedding, x -> x > 0.0)) AS n_pos,
           len(list_filter(embedding, x -> abs(x) > 0.25)) AS n_big,
           list_max(embedding) AS amax,
           list_min(embedding) AS amin,
           list_sort(embedding, 'DESC')[3] AS third
    FROM embeddings
)
SELECT label,
       count(*) AS n_vecs,
       CAST(sum(n_pos) AS BIGINT) AS sum_pos,
       CAST(sum(n_big) AS BIGINT) AS sum_big,
       max(amax) AS max_elem,
       min(amin) AS min_elem,
       max(third) AS max_third
FROM per_vec
GROUP BY label ORDER BY label
"""


QUERIES = {
    "rel_disjunctive_join": (disjunctive_join, DISJUNCTIVE_JOIN_SQL),
    "rel_waiting_suppliers": (waiting_suppliers, WAITING_SUPPLIERS_SQL),
    "rel_array_hof": (array_hof, ARRAY_HOF_SQL),
    "rel_array_agg": (array_agg_segments, ARRAY_AGG_SQL),
    "rel_customer_order_histogram": (
        customer_order_histogram,
        CUSTOMER_ORDER_HISTOGRAM_SQL,
    ),
    "rel_small_qty_revenue": (small_quantity_revenue, SMALL_QTY_REVENUE_SQL),
    "rel_large_orders": (large_orders, LARGE_ORDERS_SQL),
    "rel_top_supplier": (top_supplier, TOP_SUPPLIER_SQL),
    "rel_dormant_rich_customers": (dormant_rich_customers, DORMANT_RICH_SQL),
    "rel_udaf_cents": (udaf_cents, UDAF_CENTS_SQL),
    "rel_market_share": (market_share, MARKET_SHARE_SQL),
    "rel_unpivot": (unpivot_status_counts, UNPIVOT_SQL),
    "rel_intersect_except": (intersect_except, INTERSECT_EXCEPT_SQL),
    "rel_approx_aggs": (approx_aggregates, APPROX_AGGS_SQL),
    "rel_price_histogram": (price_histogram, PRICE_HISTOGRAM_SQL),
    "rel_rank_functions": (rank_functions, RANK_FUNCTIONS_SQL),
    "rel_string_functions": (string_functions, STRING_FUNCTIONS_SQL),
    "rel_pivot_status": (pivot_status_by_segment, PIVOT_SQL),
    "rel_percentiles": (percentiles, PERCENTILES_SQL),
    "rel_rollup": (rollup_aggregates, ROLLUP_SQL),
    "rel_scalar_functions": (scalar_functions, SCALAR_FUNCTIONS_SQL),
    "rel_cte_sql_api": (cte_sql_api, CTE_SQL),
    "rel_semi_anti_customers": (semi_anti_customers, SEMI_ANTI_SQL),
    "rel_pricing_summary": (pricing_summary, PRICING_SUMMARY_SQL),
    "rel_top_revenue_orders": (top_revenue_orders, TOP_REVENUE_SQL),
    "rel_nation_revenue": (nation_revenue, NATION_REVENUE_SQL),
    "rel_filter_matrix": (filter_matrix, FILTER_MATRIX_SQL),
    "rel_cast_projection": (cast_projection, CAST_PROJECTION_SQL),
    "rel_count_distinct": (count_distinct_by_status, COUNT_DISTINCT_SQL),
    "rel_conditional_agg": (conditional_aggregates, CONDITIONAL_AGG_SQL),
    "rel_first_order_per_customer": (first_order_per_customer, FIRST_ORDER_SQL),
    "rel_order_date_gaps": (order_date_gaps, ORDER_GAPS_SQL),
    "rel_trailing_spend": (trailing_window_spend, TRAILING_SPEND_SQL),
    "rel_distinct_segments": (distinct_segments, DISTINCT_SEGMENTS_SQL),
    "rel_union_entities": (union_entities, UNION_ENTITIES_SQL),
    "rel_balance_ratio": (balance_ratio, BALANCE_RATIO_SQL),
    "rel_top_parts": (top_parts, TOP_PARTS_SQL),
    "rel_above_avg_customers": (above_average_customers, ABOVE_AVG_SQL),
    "rel_parts_like": (parts_like, PARTS_LIKE_SQL),
}

"""Relational analytics over the TPC-H-ish tables.

Split from the round-3 single-module contract registry (VERDICT r3
next-round #7); registration order preserved by the package
__init__'s import order.
"""

from __future__ import annotations

from crawl4ai_scraper_spark.contract._base import *  # noqa: F401,F403

# ---------------------------------------------------------------------------
# Relational analytics over the TPC-H-ish tables (engine breadth: multi-join
# planning, broadcast dims, DECIMAL-exact aggregation)
# ---------------------------------------------------------------------------

# Row-level money math in DOUBLE (identical IEEE trees both engines), rounded
# to 4dp and cast to DECIMAL BEFORE aggregation → order-free exact sums.
_REV_SQL = "CAST(ROUND(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(18,4))"


@_q(
    "tpch_q1_pricing_summary",
    f"""SELECT l_returnflag, l_linestatus,
      CAST(CAST(SUM(CAST(ROUND(l_quantity, 4) AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_qty,
      CAST(CAST(SUM(CAST(ROUND(l_extendedprice, 4) AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_base_price,
      CAST(CAST(SUM({_REV_SQL}) AS DECIMAL(38,4)) AS DOUBLE) AS sum_disc_price,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus""",
)
def tpch_q1_pricing_summary(spark, sf):
    """TPC-H Q1 shape: scan-wide grouped DECIMAL aggregation with map-side
    combine — the full-table agg pattern (4 group keys, partial agg collapses
    each partition to 4 rows before the shuffle). Sums accumulate DECIMAL-exact
    (order-free); the FINAL select casts to DOUBLE in both engines so the
    driver's pandas canonicalizer renders trailing-zero values identically
    (VERDICT r2 fix #1)."""
    li = _t(spark, sf, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    )
    rev = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).cast(
        "decimal(18,4)"
    )
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.round("l_quantity", 4).cast("decimal(18,4)")).cast("decimal(38,4)").cast("double").alias("sum_qty"),
        F.sum(F.round("l_extendedprice", 4).cast("decimal(18,4)")).cast("decimal(38,4)").cast("double").alias("sum_base_price"),
        F.sum(rev).cast("decimal(38,4)").cast("double").alias("sum_disc_price"),
        F.count(F.lit(1)).alias("count_order"),
    )


@_q(
    "tpch_q3_shipping_priority",
    f"""SELECT l_orderkey, CAST(revenue AS DOUBLE) AS revenue, orderdate
    FROM (
      SELECT l_orderkey,
             CAST(SUM({_REV_SQL}) AS DECIMAL(38,4)) AS revenue,
             strftime(o_orderdate, '%Y-%m-%d') AS orderdate
      FROM customer JOIN orders ON c_custkey = o_custkey
                    JOIN lineitem ON l_orderkey = o_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l_orderkey, o_orderdate
      ORDER BY revenue DESC, l_orderkey LIMIT 10
    )""",
)
def tpch_q3_shipping_priority(spark, sf):
    """TPC-H Q3 shape: selective dim filter → 3-way join (AQE broadcasts the
    filtered customer side) → grouped revenue → TakeOrdered top-10 (orderkey
    tiebreak for a deterministic LIMIT). Top-10 is selected on the exact
    DECIMAL revenue in both engines; the outer select casts to DOUBLE so
    trailing-zero values render identically under the driver's pandas
    canonicalizer (VERDICT r2 fix #1)."""
    c = _t(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp")
    )
    li = _t(spark, sf, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-01-01 00:00:00").cast("timestamp")
    )
    rev = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).cast(
        "decimal(18,4)"
    )
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(rev).cast("decimal(38,4)").alias("revenue"))
        .select(
            "l_orderkey", "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
        .withColumn("revenue", F.col("revenue").cast("double"))
    )


@_q(
    "tpch_q5_local_supplier_volume",
    f"""SELECT n_name,
           CAST(CAST(SUM({_REV_SQL}) AS DECIMAL(38,4)) AS DOUBLE) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name""",
)
def tpch_q5_local_supplier_volume(spark, sf):
    """TPC-H Q5 shape: 6-way join with tiny dims broadcast (region/nation/
    supplier) and the c_nationkey = s_nationkey locality predicate — the
    join-reordering/broadcast showcase."""
    rev = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).cast(
        "decimal(18,4)"
    )
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    s = F.broadcast(_t(spark, sf, "supplier"))
    n = F.broadcast(_t(spark, sf, "nation"))
    r = F.broadcast(_t(spark, sf, "region").filter(F.col("r_name") == "ASIA"))
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(s, (F.col("l_suppkey") == F.col("s_suppkey"))
              & (F.col("c_nationkey") == F.col("s_nationkey")))
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.sum(rev).cast("decimal(38,4)").cast("double").alias("revenue"))
    )


# --- remaining TPC-H query shapes (round 3) -------------------------------
# The testdata tables are TPC-H-ISH: there is no partsupp table and several
# classic columns are absent (l_shipmode/l_commitdate/l_receiptdate, c_phone,
# o_comment, p_container, p_mfgr).  Each query below keeps the CLASSIC PLAN
# SHAPE (the join/agg/subquery structure Catalyst must handle) with
# predicates adapted to the columns that exist; adaptations are noted per
# query.  Money math follows the repo convention: per-row ROUND(...,4) cast
# to DECIMAL(18,4), order-free DECIMAL sums, DOUBLE only in the final select
# (VERDICT r2 fix #1).  Scalar averages/ratios are computed as
# CAST(<decimal sum> AS DOUBLE) / <count or sum> with the SAME operation
# order in both engines, so the IEEE results are bit-identical.

_DSUM = "CAST(CAST(SUM({}) AS DECIMAL(38,4)) AS DOUBLE)"


def _rev_col() -> F.Column:
    """Per-row revenue, DECIMAL-exact (the Spark twin of _REV_SQL)."""
    return F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
    ).cast("decimal(18,4)")


def _dsum_col(col) -> F.Column:
    return F.sum(col).cast("decimal(38,4)").cast("double")


_UNIT_COST_SQL = "CAST(ROUND(l_extendedprice / l_quantity, 4) AS DECIMAL(18,4))"


@_q(
    "tpch_q2_min_cost_supplier",
    f"""WITH ps AS (
      SELECT l_partkey, l_suppkey, MIN({_UNIT_COST_SQL}) AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ), eligible AS (
      SELECT l_partkey, s_name, s_acctbal, n_name, unit_cost
      FROM ps JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation   ON s_nationkey = n_nationkey
              JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
    )
    SELECT s_name, CAST(s_acctbal AS DOUBLE) AS s_acctbal, n_name,
           p_partkey, CAST(unit_cost AS DOUBLE) AS unit_cost
    FROM eligible
      JOIN (SELECT l_partkey AS mk, MIN(unit_cost) AS mc
            FROM eligible GROUP BY l_partkey) m
        ON l_partkey = mk AND unit_cost = mc
      JOIN part ON l_partkey = p_partkey
    WHERE p_size = 15 AND p_type = 'SMALL'""",
)
def tpch_q2_min_cost_supplier(spark, sf):
    """TPC-H Q2 shape (argmin-per-group + region-restricted dim joins).
    Adapted: no partsupp table, so the supply relationship is DERIVED from
    lineitem — unit_cost = min observed round(extendedprice/quantity, 4) per
    (part, supplier) — and ps_supplycost's argmin becomes min unit_cost
    among ASIA suppliers of the part. Ties keep every min-cost row (classic
    Q2 semantics), exact on DECIMAL equality."""
    li = _t(spark, sf, "lineitem")
    unit = F.round(F.col("l_extendedprice") / F.col("l_quantity"), 4).cast(
        "decimal(18,4)"
    )
    ps = li.groupBy("l_partkey", "l_suppkey").agg(F.min(unit).alias("unit_cost"))
    s = F.broadcast(_t(spark, sf, "supplier"))
    n = F.broadcast(_t(spark, sf, "nation"))
    r = F.broadcast(_t(spark, sf, "region").filter(F.col("r_name") == "ASIA"))
    p = F.broadcast(
        _t(spark, sf, "part").filter(
            (F.col("p_size") == 15) & (F.col("p_type") == "SMALL")
        )
    )
    elig = (
        ps.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .select("l_partkey", "s_name", "s_acctbal", "n_name", "unit_cost")
    )
    mins = elig.groupBy(F.col("l_partkey").alias("mk")).agg(
        F.min("unit_cost").alias("mc")
    )
    return (
        elig.join(mins, (F.col("l_partkey") == F.col("mk"))
                  & (F.col("unit_cost") == F.col("mc")))
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "s_name", F.col("s_acctbal").cast("double").alias("s_acctbal"),
            "n_name", "p_partkey",
            F.col("unit_cost").cast("double").alias("unit_cost"),
        )
    )


@_q(
    "tpch_q4_order_priority",
    """SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority""",
)
def tpch_q4_order_priority(spark, sf):
    """TPC-H Q4 shape (EXISTS → left-semi join, then tiny-key agg).
    Adapted: no l_commitdate/l_receiptdate, so the correlated predicate is
    "some line shipped after the order date" instead of commit<receipt."""
    o = _t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf, "lineitem")
    return (
        o.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@_q(
    "tpch_q6_forecast_revenue",
    """SELECT CAST(CAST(SUM(CAST(ROUND(l_extendedprice * l_discount, 4) AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount >= 0.03 AND l_discount <= 0.07
      AND l_quantity < 24""",
)
def tpch_q6_forecast_revenue(spark, sf):
    """TPC-H Q6: pure pushdown-filter scalar aggregate — every predicate
    reaches the parquet scan as a PushedFilter; no joins, no shuffle beyond
    the final 1-row combine."""
    li = _t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount") >= 0.03) & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    disc_rev = F.round(F.col("l_extendedprice") * F.col("l_discount"), 4).cast(
        "decimal(18,4)"
    )
    return li.agg(_dsum_col(disc_rev).alias("revenue"))


@_q(
    "tpch_q7_volume_shipping",
    f"""WITH v AS (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             EXTRACT(year FROM l_shipdate) AS l_year, {_REV_SQL} AS rev
      FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
           JOIN orders   ON o_orderkey = l_orderkey
           JOIN customer ON c_custkey = o_custkey
           JOIN nation n1 ON s_nationkey = n1.n_nationkey
           JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    SELECT supp_nation, cust_nation, l_year,
           {_DSUM.format('rev')} AS revenue
    FROM v GROUP BY supp_nation, cust_nation, l_year""",
)
def tpch_q7_volume_shipping(spark, sf):
    """TPC-H Q7 shape: the two-role nation dim (joined twice under aliases)
    with a symmetric OR pair predicate, revenue by (nation pair, ship year).
    Both nation sides broadcast; the OR filter prunes before the group-by."""
    n1 = F.broadcast(
        _t(spark, sf, "nation").select(
            F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
        )
    )
    n2 = F.broadcast(
        _t(spark, sf, "nation").select(
            F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
        )
    )
    s = F.broadcast(_t(spark, sf, "supplier"))
    li = _t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        s.join(li, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation",
                 F.year("l_shipdate").alias("l_year"))
        .agg(_dsum_col(_rev_col()).alias("revenue"))
    )


@_q(
    "tpch_q8_market_share",
    f"""WITH v AS (
      SELECT EXTRACT(year FROM o_orderdate) AS o_year, {_REV_SQL} AS rev,
             n2.n_name AS supp_nation
      FROM part JOIN lineitem ON p_partkey = l_partkey
           JOIN supplier ON s_suppkey = l_suppkey
           JOIN orders   ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN nation n1 ON c_nationkey = n1.n_nationkey
           JOIN region   ON n1.n_regionkey = r_regionkey
           JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'PROMO'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    SELECT o_year,
       CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN rev
                          ELSE CAST(0 AS DECIMAL(18,4)) END) AS DECIMAL(38,4)) AS DOUBLE)
       / {_DSUM.format('rev')} AS mkt_share
    FROM v GROUP BY o_year""",
)
def tpch_q8_market_share(spark, sf):
    """TPC-H Q8 shape: 8-way join (nation twice), conditional-share ratio per
    order year. Numerator and denominator both accumulate DECIMAL-exact and
    only the final division runs in DOUBLE (same IEEE op both engines)."""
    p = F.broadcast(_t(spark, sf, "part").filter(F.col("p_type") == "PROMO"))
    s = F.broadcast(_t(spark, sf, "supplier"))
    n1 = F.broadcast(
        _t(spark, sf, "nation").select(
            F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_reg")
        )
    )
    n2 = F.broadcast(
        _t(spark, sf, "nation").select(
            F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
        )
    )
    r = F.broadcast(_t(spark, sf, "region").filter(F.col("r_name") == "ASIA"))
    li = _t(spark, sf, "lineitem")
    o = _t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    c = _t(spark, sf, "customer")
    zero = F.lit(0).cast("decimal(18,4)")
    nat_rev = F.when(F.col("supp_nation") == "NATION_3", _rev_col()).otherwise(zero)
    return (
        p.join(li, F.col("p_partkey") == F.col("l_partkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(n1, F.col("c_nationkey") == F.col("n1_key"))
        .join(r, F.col("n1_reg") == F.col("r_regionkey"))
        .join(n2, F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (_dsum_col(nat_rev) / _dsum_col(_rev_col())).alias("mkt_share")
        )
    )


@_q(
    "tpch_q9_product_profit",
    f"""WITH v AS (
      SELECT n_name AS nation, EXTRACT(year FROM o_orderdate) AS o_year,
             {_REV_SQL} - CAST(ROUND(0.08 * p_retailprice * l_quantity, 4) AS DECIMAL(18,4)) AS amount
      FROM part JOIN lineitem ON p_partkey = l_partkey
           JOIN supplier ON s_suppkey = l_suppkey
           JOIN orders   ON o_orderkey = l_orderkey
           JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%gear%'
    )
    SELECT nation, o_year,
           CAST(CAST(SUM(amount) AS DECIMAL(38,4)) AS DOUBLE) AS sum_profit
    FROM v GROUP BY nation, o_year""",
)
def tpch_q9_product_profit(spark, sf):
    """TPC-H Q9 shape: LIKE-filtered part scan driving a 5-way join, profit
    by (supplier nation, order year). Adapted: no partsupp, so supply cost is
    the deterministic stand-in round(0.08 * p_retailprice * l_quantity, 4)
    instead of ps_supplycost * l_quantity."""
    p = F.broadcast(_t(spark, sf, "part").filter(F.col("p_name").contains("gear")))
    s = F.broadcast(_t(spark, sf, "supplier"))
    n = F.broadcast(_t(spark, sf, "nation"))
    li = _t(spark, sf, "lineitem")
    o = _t(spark, sf, "orders")
    cost = F.round(
        F.lit(0.08) * F.col("p_retailprice") * F.col("l_quantity"), 4
    ).cast("decimal(18,4)")
    return (
        p.join(li, F.col("p_partkey") == F.col("l_partkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(
            F.sum(_rev_col() - cost).cast("decimal(38,4)").cast("double")
            .alias("sum_profit")
        )
    )


@_q(
    "tpch_q10_returned_items",
    f"""SELECT c_custkey, c_name, CAST(revenue_d AS DOUBLE) AS revenue,
           CAST(c_acctbal AS DOUBLE) AS c_acctbal, n_name
    FROM (
      SELECT c_custkey, c_name,
             CAST(SUM({_REV_SQL}) AS DECIMAL(38,4)) AS revenue_d,
             c_acctbal, n_name
      FROM customer JOIN orders ON c_custkey = o_custkey
           JOIN lineitem ON l_orderkey = o_orderkey
           JOIN nation   ON c_nationkey = n_nationkey
      WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-04-01 00:00:00'
        AND l_returnflag = 'R'
      GROUP BY c_custkey, c_name, c_acctbal, n_name
      ORDER BY revenue_d DESC, c_custkey LIMIT 20
    )""",
)
def tpch_q10_returned_items(spark, sf):
    """TPC-H Q10 shape: quarter window + returnflag filter, revenue per
    customer, top-20. The top-k selects on the exact DECIMAL revenue with a
    c_custkey tiebreak (deterministic LIMIT); DOUBLE only in the outer
    select."""
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-04-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    n = F.broadcast(_t(spark, sf, "nation"))
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_rev_col()).cast("decimal(38,4)").alias("revenue_d"))
        .orderBy(F.col("revenue_d").desc(), F.col("c_custkey"))
        .limit(20)
        .select(
            "c_custkey", "c_name",
            F.col("revenue_d").cast("double").alias("revenue"),
            F.col("c_acctbal").cast("double").alias("c_acctbal"),
            "n_name",
        )
    )


@_q(
    "tpch_q11_important_value",
    """WITH v AS (
      SELECT l_partkey, CAST(ROUND(l_extendedprice, 4) AS DECIMAL(18,4)) AS val
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
           JOIN nation ON s_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    )
    SELECT l_partkey, CAST(CAST(SUM(val) AS DECIMAL(38,4)) AS DOUBLE) AS value
    FROM v GROUP BY l_partkey
    HAVING CAST(CAST(SUM(val) AS DECIMAL(38,4)) AS DOUBLE)
         > (SELECT CAST(CAST(SUM(val) AS DECIMAL(38,4)) AS DOUBLE) FROM v) * 0.001""",
)
def tpch_q11_important_value(spark, sf):
    """TPC-H Q11 shape: grouped value vs a GLOBAL-scalar HAVING threshold.
    Adapted: no partsupp, so "stock value" per part is the summed
    extendedprice of lines shipped by EUROPE-region suppliers. The total is
    a one-row broadcast (crossJoin of a scalar frame — never a data-row
    collect); both engines compare value_double > total_double * 0.001."""
    s = F.broadcast(_t(spark, sf, "supplier"))
    n = F.broadcast(_t(spark, sf, "nation"))
    r = F.broadcast(_t(spark, sf, "region").filter(F.col("r_name") == "EUROPE"))
    li = _t(spark, sf, "lineitem")
    val = F.round(F.col("l_extendedprice"), 4).cast("decimal(18,4)")
    v = (
        li.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .select("l_partkey", val.alias("val"))
    )
    per_part = v.groupBy("l_partkey").agg(
        F.sum("val").cast("decimal(38,4)").cast("double").alias("value")
    )
    total = v.agg(
        F.sum("val").cast("decimal(38,4)").cast("double").alias("_total")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value") > F.col("_total") * F.lit(0.001))
        .select("l_partkey", "value")
    )


@_q(
    "tpch_q12_late_shipment_priority",
    """SELECT l_linestatus,
      COUNT(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  AND l_shipdate > o_orderdate + INTERVAL 60 DAY THEN 1 END) AS high_late_count,
      COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                  AND l_shipdate > o_orderdate + INTERVAL 60 DAY THEN 1 END) AS low_late_count,
      COUNT(*) AS total_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_linestatus""",
)
def tpch_q12_late_shipment_priority(spark, sf):
    """TPC-H Q12 shape: fact-fact join + conditional counts per category.
    Adapted: no l_shipmode/l_commitdate/l_receiptdate — the category is
    l_linestatus and "late" means shipped >60 days after the order date.
    Conditional counts use COUNT(CASE ...) (not SUM of 1s) so DuckDB yields
    BIGINT, never HUGEINT (the r1 red class)."""
    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(high & late, 1)).alias("high_late_count"),
            F.count(F.when(~high & late, 1)).alias("low_late_count"),
            F.count(F.lit(1)).alias("total_count"),
        )
    )


@_q(
    "tpch_q13_customer_distribution",
    """SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY c_custkey
    ) GROUP BY c_count""",
)
def tpch_q13_customer_distribution(spark, sf):
    """TPC-H Q13 shape: outer join with a join-side predicate (customers
    with zero qualifying orders survive as c_count=0), then a second tiny
    aggregation over the counts. Adapted: the o_comment NOT LIKE filter
    becomes an o_orderpriority exclusion."""
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders").filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


@_q(
    "tpch_q14_promo_revenue",
    f"""SELECT CAST(CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_REV_SQL}
                          ELSE CAST(0 AS DECIMAL(18,4)) END) AS DECIMAL(38,4)) AS DOUBLE) * 100.0
           / {_DSUM.format(_REV_SQL)} AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'""",
)
def tpch_q14_promo_revenue(spark, sf):
    """TPC-H Q14: promo share of one month's revenue — broadcast part join,
    DECIMAL-exact numerator/denominator, one DOUBLE multiply-then-divide in
    the same order on both engines."""
    p = F.broadcast(_t(spark, sf, "part"))
    li = _t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01 00:00:00").cast("timestamp"))
    )
    zero = F.lit(0).cast("decimal(18,4)")
    promo = F.when(F.col("p_type") == "PROMO", _rev_col()).otherwise(zero)
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (_dsum_col(promo) * F.lit(100.0) / _dsum_col(_rev_col()))
            .alias("promo_revenue")
        )
    )


@_q(
    "tpch_q15_top_supplier",
    f"""WITH rev AS (
      SELECT l_suppkey AS supplier_no,
             CAST(SUM({_REV_SQL}) AS DECIMAL(38,4)) AS total_revenue_d
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(total_revenue_d AS DOUBLE) AS total_revenue
    FROM supplier JOIN rev ON s_suppkey = supplier_no
    WHERE total_revenue_d = (SELECT MAX(total_revenue_d) FROM rev)""",
)
def tpch_q15_top_supplier(spark, sf):
    """TPC-H Q15 shape: derived revenue view + scalar-max subquery (the
    classic CREATE VIEW step inlined as a CTE). The max is a one-row
    broadcast; the equality filter runs on the exact DECIMAL, so revenue
    ties keep every top supplier deterministically."""
    li = _t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev_col()).cast("decimal(38,4)").alias("total_revenue_d")
    )
    mx = rev.agg(F.max("total_revenue_d").alias("_mx"))
    s = F.broadcast(_t(spark, sf, "supplier"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue_d") == F.col("_mx"))
        .join(s, F.col("s_suppkey") == F.col("supplier_no"))
        .select(
            "s_suppkey", "s_name",
            F.col("total_revenue_d").cast("double").alias("total_revenue"),
        )
    )


@_q(
    "tpch_q16_supplier_part_count",
    """SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#4' AND p_type <> 'PROMO'
      AND p_size IN (1, 14, 23, 45)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size""",
)
def tpch_q16_supplier_part_count(spark, sf):
    """TPC-H Q16 shape: NOT-IN exclusion subquery (→ anti join; keys are
    never null) + distinct-count per part attribute group. Adapted: no
    partsupp — the supplies relation is derived from lineitem; the
    "complaints" exclusion becomes negative-balance suppliers."""
    bad = _t(spark, sf, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    p = F.broadcast(
        _t(spark, sf, "part").filter(
            (F.col("p_brand") != "Brand#4") & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 14, 23, 45)
        )
    )
    li = _t(spark, sf, "lineitem").join(
        F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti"
    )
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@_q(
    "tpch_q17_small_quantity_revenue",
    """WITH l AS (
      SELECT l_partkey, l_quantity, l_extendedprice
      FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM part
                          WHERE p_brand = 'Brand#3' AND p_type = 'MEDIUM')
    ), a AS (
      SELECT l_partkey AS ak,
             CAST(CAST(SUM(CAST(ROUND(l_quantity, 4) AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) / COUNT(*) AS avg_qty
      FROM l GROUP BY l_partkey
    )
    SELECT CAST(CAST(SUM(CAST(ROUND(l_extendedprice, 4) AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) / 7.0 AS avg_yearly
    FROM l JOIN a ON l_partkey = ak
    WHERE l_quantity < 0.2 * avg_qty""",
)
def tpch_q17_small_quantity_revenue(spark, sf):
    """TPC-H Q17 shape: correlated per-part AVG subquery (decorrelated to a
    per-part aggregate re-joined to the probe side). Adapted: no
    p_container, so the part filter is brand+type. The average is
    DECIMAL-sum / count in DOUBLE — the same two IEEE ops on both engines,
    so the 0.2*avg boundary cannot diverge."""
    pk = _t(spark, sf, "part").filter(
        (F.col("p_brand") == "Brand#3") & (F.col("p_type") == "MEDIUM")
    ).select("p_partkey")
    l = _t(spark, sf, "lineitem").join(
        F.broadcast(pk), F.col("l_partkey") == F.col("p_partkey"), "left_semi"
    ).select("l_partkey", "l_quantity", "l_extendedprice")
    qty_d = F.round(F.col("l_quantity"), 4).cast("decimal(18,4)")
    a = l.groupBy(F.col("l_partkey").alias("ak")).agg(
        (F.sum(qty_d).cast("decimal(38,4)").cast("double")
         / F.count(F.lit(1))).alias("avg_qty")
    )
    price_d = F.round(F.col("l_extendedprice"), 4).cast("decimal(18,4)")
    return (
        l.join(F.broadcast(a), F.col("l_partkey") == F.col("ak"))
        .filter(F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty"))
        .agg(
            (F.sum(price_d).cast("decimal(38,4)").cast("double") / F.lit(7.0))
            .alias("avg_yearly")
        )
    )


@_q(
    "tpch_q18_large_volume_customer",
    """SELECT c_name, c_custkey, o_orderkey, orderdate,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice,
           CAST(sum_qty_d AS DOUBLE) AS sum_qty
    FROM (
      SELECT c_name, c_custkey, o_orderkey,
             strftime(o_orderdate, '%Y-%m-%d') AS orderdate, o_totalprice,
             CAST(SUM(CAST(ROUND(l_quantity, 4) AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS sum_qty_d
      FROM customer JOIN orders ON c_custkey = o_custkey
           JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
      HAVING SUM(CAST(ROUND(l_quantity, 4) AS DECIMAL(18,4))) > 250
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    )""",
)
def tpch_q18_large_volume_customer(spark, sf):
    """TPC-H Q18 shape: large-volume orders (HAVING on an order-grain
    DECIMAL quantity sum, threshold 250 ≈ the 99th percentile here) with
    customer context, top-100 by totalprice with an orderkey tiebreak."""
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    qty_d = F.round(F.col("l_quantity"), 4).cast("decimal(18,4)")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate",
                 "o_totalprice")
        .agg(F.sum(qty_d).cast("decimal(38,4)").alias("sum_qty_d"))
        .filter(F.col("sum_qty_d") > 250)
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
        .select(
            "c_name", "c_custkey", "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            F.col("sum_qty_d").cast("double").alias("sum_qty"),
        )
    )


@_q(
    "tpch_q19_discounted_revenue",
    f"""SELECT {_DSUM.format(_REV_SQL)} AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#2'  AND p_size BETWEEN 1 AND 5
           AND l_quantity >= 1  AND l_quantity <= 11)
       OR (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 10
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#22' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 20 AND l_quantity <= 30)""",
)
def tpch_q19_discounted_revenue(spark, sf):
    """TPC-H Q19 shape: disjunction of conjunctive brand/size/quantity
    branches spanning BOTH join sides (the OR cannot be pushed to either
    scan alone — the optimizer must evaluate it post-join). Adapted: no
    p_container/l_shipmode, so the branches use size and quantity windows."""
    p = F.broadcast(_t(spark, sf, "part"))
    li = _t(spark, sf, "lineitem")

    def branch(brand, max_size, qlo, qhi):
        return (
            (F.col("p_brand") == brand)
            & (F.col("p_size") >= 1) & (F.col("p_size") <= max_size)
            & (F.col("l_quantity") >= qlo) & (F.col("l_quantity") <= qhi)
        )

    cond = (branch("Brand#2", 5, 1, 11) | branch("Brand#12", 10, 10, 20)
            | branch("Brand#22", 15, 20, 30))
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(_dsum_col(_rev_col()).alias("revenue"))
    )


@_q(
    "tpch_q20_promotion_suppliers",
    """SELECT s_name, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_type = 'PROMO'
        AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_suppkey, l_partkey
      HAVING SUM(CAST(ROUND(l_quantity, 4) AS DECIMAL(18,4))) > 50
    )""",
)
def tpch_q20_promotion_suppliers(spark, sf):
    """TPC-H Q20 shape: nested IN subquery over a grouped HAVING (suppliers
    who moved >50 units of some PROMO part in 1997) → semi join into the
    supplier dim. Adapted: no partsupp, so "availqty vs half of shipped"
    becomes a shipped-quantity threshold per (supplier, part)."""
    p = F.broadcast(_t(spark, sf, "part").filter(F.col("p_type") == "PROMO"))
    li = _t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    qty_d = F.round(F.col("l_quantity"), 4).cast("decimal(18,4)")
    qualifying = (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(qty_d).alias("q"))
        .filter(F.col("q") > 50)
        .select("l_suppkey")
    )
    s = _t(spark, sf, "supplier")
    n = F.broadcast(_t(spark, sf, "nation"))
    return (
        s.join(qualifying, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name")
    )


@_q(
    "tpch_q21_suppliers_kept_waiting",
    """WITH late AS (
      SELECT DISTINCT l_orderkey, l_suppkey
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'F'
        AND l_shipdate > o_orderdate + INTERVAL 90 DAY
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM late l1 JOIN supplier ON l1.l_suppkey = s_suppkey
    WHERE EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s_name""",
)
def tpch_q21_suppliers_kept_waiting(spark, sf):
    """TPC-H Q21 shape: EXISTS + NOT EXISTS correlated on the same fact
    (semi join then anti join, both with a non-equi side condition) —
    suppliers who were the SOLE late shipper of a finished multi-supplier
    order. Adapted: no l_receiptdate/l_commitdate, so "late" = shipped >90
    days after the order date; one waiting incident per (order, supplier)."""
    o = _t(spark, sf, "orders").filter(F.col("o_orderstatus") == "F")
    li = _t(spark, sf, "lineitem")
    late = (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    l2 = li.select(F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2"))
    l3 = late.select(F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3"))
    s = F.broadcast(_t(spark, sf, "supplier"))
    return (
        late.join(l2, (F.col("k2") == F.col("l_orderkey"))
                  & (F.col("s2") != F.col("l_suppkey")), "left_semi")
        .join(l3, (F.col("k3") == F.col("l_orderkey"))
              & (F.col("s3") != F.col("l_suppkey")), "left_anti")
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@_q(
    "tpch_q22_global_sales_opportunity",
    """WITH pool AS (
      SELECT c_custkey, c_acctbal, c_nationkey FROM customer
      WHERE c_nationkey IN (0, 1, 2, 3, 4, 5, 6)
    ), thr AS (
      SELECT CAST(CAST(SUM(CAST(ROUND(c_acctbal, 2) AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) / COUNT(*) AS avg_bal
      FROM pool WHERE c_acctbal > 0.0
    )
    SELECT c_nationkey AS cntrycode, COUNT(*) AS numcust,
           CAST(CAST(SUM(CAST(ROUND(c_acctbal, 2) AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS totacctbal
    FROM pool, thr
    WHERE c_acctbal > avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '1999-07-01 00:00:00')
    GROUP BY c_nationkey""",
)
def tpch_q22_global_sales_opportunity(spark, sf):
    """TPC-H Q22 shape: scalar-average threshold (positive balances only)
    + NOT EXISTS anti join against recent orders, grouped by country.
    Adapted: no c_phone — the country code is c_nationkey restricted to a
    7-nation pool, and "never ordered" becomes "no orders since 1999-07"
    (every customer here has at least one order overall)."""
    pool = _t(spark, sf, "customer").filter(
        F.col("c_nationkey").isin(0, 1, 2, 3, 4, 5, 6)
    ).select("c_custkey", "c_acctbal", "c_nationkey")
    bal_d = F.round(F.col("c_acctbal"), 2).cast("decimal(18,2)")
    thr = pool.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(bal_d).cast("decimal(38,2)").cast("double")
         / F.count(F.lit(1))).alias("avg_bal")
    )
    recent = _t(spark, sf, "orders").filter(
        F.col("o_orderdate") >= F.lit("1999-07-01 00:00:00").cast("timestamp")
    ).select("o_custkey")
    return (
        pool.crossJoin(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(bal_d).cast("decimal(38,2)").cast("double")
            .alias("totacctbal"),
        )
    )


@_q(
    "rollup_order_totals",
    """SELECT COALESCE(o_orderpriority, '(all)') AS priority,
           COALESCE(o_orderstatus, '(all)') AS status,
           COUNT(*) AS n,
           CAST(CAST(SUM(CAST(ROUND(o_totalprice, 4) AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS total
    FROM orders
    GROUP BY ROLLUP (o_orderpriority, o_orderstatus)""",
)
def rollup_order_totals(spark, sf):
    """OLAP grouping sets: ROLLUP over (priority, status) with DECIMAL sums —
    subtotal + grand-total rows computed in one pass (Spark Expand operator,
    still map-side combinable)."""
    o = _t(spark, sf, "orders")
    return (
        o.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round("o_totalprice", 4).cast("decimal(18,4)"))
            .cast("decimal(38,4)").cast("double").alias("total"),
        )
        .select(
            F.coalesce("o_orderpriority", F.lit("(all)")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("(all)")).alias("status"),
            "n", "total",
        )
    )


@_q(
    "window_funcs_orders",
    """SELECT o_orderkey, o_custkey,
           ROW_NUMBER() OVER w AS order_seq,
           CAST(COALESCE(date_diff('second',
               LAG(o_orderdate) OVER w, o_orderdate), -1) AS BIGINT) AS gap_s,
           CAST(CAST(SUM(CAST(ROUND(o_totalprice, 4) AS DECIMAL(18,4)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DECIMAL(38,4)) AS DOUBLE) AS running_total,
           NTILE(4) OVER (PARTITION BY o_custkey
                          ORDER BY o_totalprice DESC, o_orderkey) AS spend_quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""",
)
def window_funcs_orders(spark, sf):
    """Window-function breadth on one pass: per-customer order sequence
    (row_number), inter-order gap (lag diff, tz-free seconds), DECIMAL
    running total, and spend quartile (ntile) — two window specs sharing a
    single shuffle on the customer key."""
    o = _t(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wq = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    gap = (
        F.unix_timestamp(F.col("o_orderdate").cast("timestamp"))
        - F.unix_timestamp(F.lag("o_orderdate").over(w).cast("timestamp"))
    )
    return o.select(
        "o_orderkey", "o_custkey",
        F.row_number().over(w).alias("order_seq"),
        F.coalesce(gap, F.lit(-1)).cast("bigint").alias("gap_s"),
        F.sum(F.round("o_totalprice", 4).cast("decimal(18,4)")).over(run)
        .cast("decimal(38,4)").cast("double").alias("running_total"),
        F.ntile(4).over(wq).alias("spend_quartile"),
    )


@_q(
    "json_props_agg",
    """SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           COUNT(*) AS n,
           CAST(CAST(SUM(CAST(ROUND(value, 4) AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1""",
)
def json_props_agg(spark, sf):
    """Schema-on-read over the semi-structured props column: JSON path
    extraction (native get_json_object — JSON parse stays JVM-side) feeding a
    grouped aggregate; sums in DECIMAL so the hash is order-free."""
    ev = _t(spark, sf, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return (
        ev.select((k % 10).alias("k_bucket"),
                  F.round(F.col("value"), 4).cast("decimal(18,4)").alias("v"))
        .groupBy("k_bucket")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum("v").cast("decimal(38,4)").cast("double").alias("sum_value"))
    )



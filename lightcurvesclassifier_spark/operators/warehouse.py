"""Classic warehouse rollups over the star schema — the TPC-H Q1/Q5
shapes, here as the engine's demonstration of (a) a multi-measure
single-scan aggregate and (b) a fact-to-dimension join chain with
broadcast dims, the two plans every OLAP workload reduces to.

Cross-engine exactness discipline: money is summed as BIGINT cents
(``floor(x·100 + 0.5)`` — the per-row double product is bit-identical
in both engines, integer addition is associative), discounts as basis
points, quantities as integers — so no aggregate needs float-rounding
leeway and the value hash is exact. Averages divide the exact integer
sums once at the end and round to 6.

Scale shape
-----------
``pricing_summary`` is one partial→final hash aggregate over the
filtered scan (the date predicate reaches the parquet scan as a pushed
filter; group count is tiny). ``local_supplier_volume`` joins the
lineitem fact to orders/customer/supplier on their keys (shuffle
joins — all sides are fact-sized at 100 TB) and then to nation/region
via explicit ``broadcast()``; the nation-match predicate
(c_nationkey = s_nationkey) rides on the supplier join, so no extra
exchange. AQE is free to turn the orders join into a broadcast at
small SF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

Q1_CUTOFF = "1998-09-02"
Q5_FROM = "1996-01-01"
Q5_TO = "1997-01-01"


def _cents(x: Column) -> Column:
    return F.floor(x * 100.0 + 0.5).cast("long")


def pricing_summary(li: DataFrame, cutoff: str = Q1_CUTOFF) -> DataFrame:
    """TPC-H Q1 shape: per (returnflag, linestatus) quantity / price /
    discounted / charged sums plus averages, one scan, one aggregate."""
    base = F.col("l_extendedprice")
    disc = base * (1.0 - F.col("l_discount"))
    charge = disc * (1.0 + F.col("l_tax"))
    rows = li.filter(
        F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp")
    ).select(
        "l_returnflag",
        "l_linestatus",
        # floor(x + 0.5), not a bare double→long cast: Spark's cast
        # truncates while DuckDB's rounds half-to-even — identical today
        # only because testdata quantities are integral; this keeps the
        # atol=0 discipline honest for any fractional quantity
        F.floor(F.col("l_quantity") + F.lit(0.5)).alias("_qty"),
        _cents(base).alias("_base_c"),
        _cents(disc).alias("_disc_c"),
        _cents(charge).alias("_charge_c"),
        F.floor(F.col("l_discount") * 10000.0 + 0.5)
        .cast("long")
        .alias("_disc_bp"),
    )
    agg = rows.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("_qty").alias("sum_qty"),
        F.sum("_base_c").alias("sum_base_cents"),
        F.sum("_disc_c").alias("sum_disc_cents"),
        F.sum("_charge_c").alias("sum_charge_cents"),
        F.sum("_disc_bp").alias("_bp"),
        F.count(F.lit(1)).alias("count_order"),
    )
    n = F.col("count_order")
    return agg.select(
        F.col("l_returnflag").alias("returnflag"),
        F.col("l_linestatus").alias("linestatus"),
        "sum_qty",
        "sum_base_cents",
        "sum_disc_cents",
        "sum_charge_cents",
        F.round(F.col("sum_qty") / n, 6).alias("avg_qty"),
        F.round(F.col("sum_base_cents") / (n * 100.0), 6).alias("avg_price"),
        F.round(F.col("_bp") / (n * 10000.0), 6).alias("avg_disc"),
        "count_order",
    )


def pricing_summary_sql(cutoff: str = Q1_CUTOFF) -> str:
    """DuckDB mirror of :func:`pricing_summary` (same cents/bp ints,
    same product order, same final divisions)."""
    return f"""
WITH rows_f AS (
  SELECT l_returnflag, l_linestatus,
         CAST(floor(l_quantity + 0.5) AS BIGINT) AS _qty,
         CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS _base_c,
         CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5)
              AS BIGINT) AS _disc_c,
         CAST(floor(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)
                    * 100.0 + 0.5) AS BIGINT) AS _charge_c,
         CAST(floor(l_discount * 10000.0 + 0.5) AS BIGINT) AS _disc_bp
  FROM lineitem
  WHERE l_shipdate <= TIMESTAMP '{cutoff}'
)
SELECT l_returnflag AS returnflag, l_linestatus AS linestatus,
       CAST(sum(_qty) AS BIGINT) AS sum_qty,
       CAST(sum(_base_c) AS BIGINT) AS sum_base_cents,
       CAST(sum(_disc_c) AS BIGINT) AS sum_disc_cents,
       CAST(sum(_charge_c) AS BIGINT) AS sum_charge_cents,
       round(CAST(sum(_qty) AS BIGINT) / count(*), 6) AS avg_qty,
       round(CAST(sum(_base_c) AS BIGINT) / (count(*) * 100.0), 6)
         AS avg_price,
       round(CAST(sum(_disc_bp) AS BIGINT) / (count(*) * 10000.0), 6)
         AS avg_disc,
       count(*) AS count_order
FROM rows_f GROUP BY l_returnflag, l_linestatus
"""


def local_supplier_volume(
    li: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    r_name: str = "ASIA",
    date_from: str = Q5_FROM,
    date_to: str = Q5_TO,
) -> DataFrame:
    """TPC-H Q5 shape: revenue by nation for orders placed by customers
    of that nation at suppliers of the SAME nation, within a region and
    an order-date year. Fact-side shuffle joins; nation/region are
    explicit broadcasts."""
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
    )
    rev = _cents(F.col("l_extendedprice") * (1.0 - F.col("l_discount")))
    j = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            supplier,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(
            F.broadcast(nation),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(region.filter(F.col("r_name") == r_name)),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
    )
    return j.groupBy(F.col("n_name").alias("nation")).agg(
        F.sum(rev).alias("revenue_cents"),
        F.count(F.lit(1)).alias("n_items"),
    )


def local_supplier_volume_sql(
    r_name: str = "ASIA",
    date_from: str = Q5_FROM,
    date_to: str = Q5_TO,
) -> str:
    """DuckDB mirror of :func:`local_supplier_volume`."""
    return f"""
SELECT n_name AS nation,
       CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0
                           + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents,
       count(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = '{r_name}'
  AND o_orderdate >= TIMESTAMP '{date_from}'
  AND o_orderdate <  TIMESTAMP '{date_to}'
GROUP BY n_name
"""


def cohort_retention(orders: DataFrame) -> DataFrame:
    """Cohort retention matrix: customers bucketed by first-order month
    (the cohort), counted distinct in each month offset since — the
    standard product-analytics triangle.

    Months are linearized to integer ``year·12 + month − 1`` so the
    offset arithmetic is pure integers (engine-exact, no date-diff
    semantics to reconcile). Two shuffles at scale: the per-customer
    min (partial-agg shrinks it to |customers|), then the
    (cohort, offset) distinct count — count(DISTINCT custkey) keyed by
    a small group set; Spark plans it as the standard two-phase expand
    + aggregate."""
    ym = (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1).alias(
        "_ym"
    )
    o = orders.select(F.col("o_custkey").alias("custkey"), ym)
    first = o.groupBy("custkey").agg(F.min("_ym").alias("_cohort"))
    joined = o.join(first, "custkey")
    return (
        joined.groupBy(
            F.col("_cohort").alias("cohort_ym"),
            (F.col("_ym") - F.col("_cohort")).alias("month_offset"),
        )
        .agg(F.count_distinct("custkey").alias("n_customers"))
        .select(
            "cohort_ym",
            "month_offset",
            F.col("n_customers").cast("long").alias("n_customers"),
        )
    )


def cohort_retention_sql() -> str:
    """DuckDB mirror of :func:`cohort_retention`."""
    return """
WITH o AS (
  SELECT o_custkey AS custkey,
         CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS INTEGER)
           AS ym
  FROM orders
),
first_o AS (
  SELECT custkey, min(ym) AS cohort FROM o GROUP BY custkey
)
SELECT f.cohort AS cohort_ym,
       o.ym - f.cohort AS month_offset,
       CAST(count(DISTINCT o.custkey) AS BIGINT) AS n_customers
FROM o JOIN first_o f USING (custkey)
GROUP BY 1, 2
"""


RETURNFLAGS = ("A", "N", "R")


def monthly_flag_revenue(li: DataFrame) -> DataFrame:
    """Monthly revenue pivoted by return flag — the wide report table
    (one row per month, one revenue column per flag). Spark's
    ``pivot()`` with an EXPLICIT value list plans as a two-phase
    aggregate ((month, flag) partials, then the pivot assembly) —
    never a driver-blocking distinct scan to discover the pivot values
    (which the implicit form adds; always pass the list at scale).
    Exact BIGINT-cents sums; months linearized like cohort_retention."""
    ym = (F.year("l_shipdate") * 12 + F.month("l_shipdate") - 1).alias("ym")
    cents = _cents(F.col("l_extendedprice") * (1.0 - F.col("l_discount")))
    wide = (
        li.select(ym, F.col("l_returnflag").alias("flag"), cents.alias("_c"))
        .groupBy("ym")
        .pivot("flag", list(RETURNFLAGS))
        .agg(F.sum("_c"))
    )
    cols = [F.col("ym")]
    for f in RETURNFLAGS:
        cols.append(
            F.coalesce(F.col(f), F.lit(0)).alias(f"rev_{f.lower()}_cents")
        )
    return wide.select(*cols)


def monthly_flag_revenue_sql() -> str:
    """DuckDB mirror of :func:`monthly_flag_revenue` (the pivot written
    as the same conditional aggregates Spark compiles to)."""
    cells = ", ".join(
        "coalesce(CAST(sum(CASE WHEN l_returnflag = '{f}' THEN _c END)"
        " AS BIGINT), 0) AS rev_{fl}_cents".format(f=f, fl=f.lower())
        for f in RETURNFLAGS
    )
    return f"""
WITH rows_c AS (
  SELECT CAST(year(l_shipdate) * 12 + month(l_shipdate) - 1 AS INTEGER)
           AS ym,
         l_returnflag,
         CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5)
              AS BIGINT) AS _c
  FROM lineitem
)
SELECT ym, {cells}
FROM rows_c GROUP BY ym
"""


def repeat_customers(orders: DataFrame, y1: int = 1996, y2: int = 1997) -> DataFrame:
    """Customers active in BOTH years — the set-operation surface
    (INTERSECT distinct): two filtered key projections intersected.
    Catalyst plans this as a left-semi hash join over the distinct
    keys; both sides shrink to |customers| before the shuffle."""
    yr = F.year("o_orderdate")
    a = orders.filter(yr == y1).select(F.col("o_custkey").alias("custkey"))
    b = orders.filter(yr == y2).select(F.col("o_custkey").alias("custkey"))
    return a.intersect(b)


def repeat_customers_sql(y1: int = 1996, y2: int = 1997) -> str:
    return f"""
SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = {y1}
INTERSECT
SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = {y2}
"""


def late_order_priority(
    orders: DataFrame, li: DataFrame, late_days: int = 60
) -> DataFrame:
    """TPC-H Q4 shape: orders counted per priority where AT LEAST ONE
    line shipped later than ``late_days`` after the order date — the
    EXISTS form, planned as a LEFT SEMI join (the probe side stops at
    the first match; no fan-out, no distinct needed)."""
    late = li.select(
        F.col("l_orderkey").alias("_ok"), F.col("l_shipdate").alias("_sd")
    )
    cond = (F.col("o_orderkey") == F.col("_ok")) & (
        F.col("_sd")
        > F.col("o_orderdate") + F.expr(f"INTERVAL {late_days} DAYS")
    )
    semi = orders.join(late, cond, "left_semi")
    return semi.groupBy(
        F.col("o_orderpriority").alias("priority")
    ).agg(F.count(F.lit(1)).alias("n_orders"))


def late_order_priority_sql(late_days: int = 60) -> str:
    return f"""
SELECT o_orderpriority AS priority, count(*) AS n_orders
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey
    AND l.l_shipdate > o.o_orderdate + INTERVAL {late_days} DAY
)
GROUP BY o_orderpriority
"""


def small_qty_revenue(li: DataFrame, frac: float = 0.5) -> DataFrame:
    """TPC-H Q17 shape: revenue locked in small orders — lines whose
    quantity is below ``frac`` of their part's average quantity. The
    correlated scalar subquery decorrelates to a per-part aggregate
    joined back to the fact (the join side is |parts| rows — AQE
    broadcasts it at small SF, shuffle join at 100 TB).

    The threshold comparison uses the exact integer-quantity average
    (sum/count of integral quantities) on both engines — identical
    division inputs, identical comparison."""
    q = F.col("l_quantity")
    # floor(x + 0.5) rather than a bare double→long cast (truncation vs
    # DuckDB's round-half-even) — see pricing_summary
    per_part = li.groupBy(F.col("l_partkey").alias("_pk")).agg(
        (
            F.sum(F.floor(q + F.lit(0.5))) / F.count(q)
        ).alias("_avg_qty")
    )
    j = li.join(per_part, F.col("l_partkey") == F.col("_pk"))
    small = j.filter(q < frac * F.col("_avg_qty"))
    rev = _cents(F.col("l_extendedprice"))
    return small.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(rev).alias("revenue_cents"),
    )


def small_qty_revenue_sql(frac: float = 0.5) -> str:
    return f"""
WITH per_part AS (
  SELECT l_partkey AS pk,
         CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT) * 1.0
           / count(l_quantity) AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT count(*) AS n_lines,
       CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT))
            AS BIGINT) AS revenue_cents
FROM lineitem l JOIN per_part p ON l.l_partkey = p.pk
WHERE l.l_quantity < CAST('{frac!r}' AS DOUBLE) * p.avg_qty
"""


def custdist(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """TPC-H Q13 shape: the distribution of customers by order count,
    INCLUDING zero-order customers — a LEFT OUTER join followed by two
    aggregations (per-customer count, then count-of-counts). Both
    aggregates shrink to |customers| then |distinct counts| rows."""
    o = orders.select(F.col("o_custkey").alias("_ck"))
    per_cust = (
        customer.join(o, F.col("c_custkey") == F.col("_ck"), "left")
        .groupBy("c_custkey")
        .agg(F.count("_ck").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("n_customers")
    )


def custdist_sql() -> str:
    return """
WITH per_cust AS (
  SELECT c.c_custkey, count(o.o_custkey) AS c_count
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey
)
SELECT c_count, count(*) AS n_customers
FROM per_cust GROUP BY c_count
"""


def churned_customers(
    orders: DataFrame, y1: int = 1996, y2: int = 1997
) -> DataFrame:
    """Customers active in ``y1`` but NOT in ``y2`` — the EXCEPT
    DISTINCT surface (the churn complement of :func:`repeat_customers`;
    planned as a left-anti hash join over the distinct key sets)."""
    yr = F.year("o_orderdate")
    a = orders.filter(yr == y1).select(F.col("o_custkey").alias("custkey"))
    b = orders.filter(yr == y2).select(F.col("o_custkey").alias("custkey"))
    return a.subtract(b)  # subtract == EXCEPT DISTINCT


def churned_customers_sql(y1: int = 1996, y2: int = 1997) -> str:
    return f"""
SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = {y1}
EXCEPT
SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = {y2}
"""


def promo_revenue_share(li: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q14 shape: monthly share of revenue from promo-class parts
    — fact ⋈ broadcast part dimension, conditional sum over exact
    BIGINT cents, share as one division of the two exact sums."""
    p = part.select("p_partkey", "p_type")
    rev = _cents(F.col("l_extendedprice") * (1.0 - F.col("l_discount")))
    ym = (F.year("l_shipdate") * 12 + F.month("l_shipdate") - 1).alias("ym")
    j = li.join(
        F.broadcast(p), F.col("l_partkey") == F.col("p_partkey")
    ).select(ym, F.col("p_type"), rev.alias("_c"))
    agg = j.groupBy("ym").agg(
        F.sum(F.when(F.col("p_type") == "PROMO", F.col("_c")).otherwise(0))
        .cast("long")
        .alias("promo_cents"),
        F.sum("_c").alias("total_cents"),
        F.count(F.lit(1)).alias("n_items"),
    )
    share = 100.0 * F.col("promo_cents") / F.col("total_cents")
    return agg.select(
        "ym",
        "promo_cents",
        "total_cents",
        "n_items",
        F.round(share, 6).alias("promo_share_pct"),
    )


def promo_revenue_share_sql() -> str:
    return """
WITH j AS (
  SELECT CAST(year(l_shipdate) * 12 + month(l_shipdate) - 1 AS INTEGER)
           AS ym,
         p_type,
         CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5)
              AS BIGINT) AS _c
  FROM lineitem JOIN part ON l_partkey = p_partkey
)
SELECT ym,
       CAST(sum(CASE WHEN p_type = 'PROMO' THEN _c ELSE 0 END) AS BIGINT)
         AS promo_cents,
       CAST(sum(_c) AS BIGINT) AS total_cents,
       count(*) AS n_items,
       round(100.0 * sum(CASE WHEN p_type = 'PROMO' THEN _c ELSE 0 END)
             / sum(_c), 6) AS promo_share_pct
FROM j GROUP BY ym
"""

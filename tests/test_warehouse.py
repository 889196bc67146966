"""Warehouse rollup semantics (TPC-H Q1/Q5 shapes): measure arithmetic
on a hand-computable fixture, the same-nation join predicate, and the
plan shapes (pushed date filter / broadcast dims)."""

import __spark_entry__ as em
from lightcurvesclassifier_spark.operators import warehouse
from tests.conftest import SF_SMOKE


def test_pricing_summary_measures(spark):
    rows = [
        # flag, status, qty, price, disc, tax, shipdate
        ("A", "F", 10.0, 100.0, 0.10, 0.05, "1997-01-01"),
        ("A", "F", 20.0, 200.0, 0.00, 0.10, "1997-06-01"),
        ("N", "O", 1.0, 50.0, 0.05, 0.00, "1997-01-01"),
        ("A", "F", 99.0, 999.0, 0.99, 0.99, "1999-01-01"),  # after cutoff
    ]
    li = spark.createDataFrame(
        [(r[0], r[1], r[2], r[3], r[4], r[5], r[6]) for r in rows],
        "l_returnflag string, l_linestatus string, l_quantity double, "
        "l_extendedprice double, l_discount double, l_tax double, "
        "l_shipdate_s string",
    ).withColumn("l_shipdate", em.F.col("l_shipdate_s").cast("timestamp"))
    out = {
        (r.returnflag, r.linestatus): r
        for r in warehouse.pricing_summary(li).collect()
    }
    af = out[("A", "F")]
    assert af.count_order == 2  # 1999 row filtered by the cutoff
    assert af.sum_qty == 30
    assert af.sum_base_cents == 30000
    # disc: 100*0.9=90 → 9000c; 200*1.0 → 20000c
    assert af.sum_disc_cents == 29000
    # charge: 90*1.05=94.5 → 9450c; 200*1.1=220 → 22000c
    assert af.sum_charge_cents == 31450
    assert af.avg_qty == 15.0
    assert af.avg_price == 150.0
    assert af.avg_disc == 0.05
    assert out[("N", "O")].sum_disc_cents == 4750


def test_q5_same_nation_predicate(spark):
    """Only (customer, supplier) pairs of the SAME nation contribute."""
    li = spark.createDataFrame(
        [(1, 101, 100.0, 0.0), (2, 102, 200.0, 0.0)],
        "l_orderkey long, l_suppkey long, l_extendedprice double, "
        "l_discount double",
    )
    orders = spark.createDataFrame(
        [(1, 11, "1996-05-01"), (2, 12, "1996-05-01")],
        "o_orderkey long, o_custkey long, d string",
    ).withColumn("o_orderdate", em.F.col("d").cast("timestamp"))
    customer = spark.createDataFrame(
        [(11, 1), (12, 2)], "c_custkey long, c_nationkey int"
    )
    supplier = spark.createDataFrame(
        [(101, 1), (102, 1)], "s_suppkey long, s_nationkey int"
    )  # order 2's supplier is nation 1, customer nation 2 → excluded
    nation = spark.createDataFrame(
        [(1, "N1", 0), (2, "N2", 0)],
        "n_nationkey int, n_name string, n_regionkey int",
    )
    region = spark.createDataFrame([(0, "ASIA")], "r_regionkey int, r_name string")
    out = warehouse.local_supplier_volume(
        li, orders, customer, supplier, nation, region
    ).collect()
    assert len(out) == 1
    assert out[0].nation == "N1"
    assert out[0].revenue_cents == 10000
    assert out[0].n_items == 1


def test_q1_filter_pushed_single_aggregate(spark):
    plan = (
        em.queries()["pricing_summary"](spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "LessThanOrEqual(l_shipdate" in plan  # pushed to the scan
    assert plan.count("Exchange") == 1, plan


def test_q5_dims_arrive_via_broadcast(spark):
    plan = (
        em.queries()["nation_revenue"](spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("BroadcastExchange") >= 2  # nation + region at least


def test_cohort_retention_triangle(spark):
    """Hand-checkable cohort: the cohort month is the first order,
    offsets count distinct customers (repeat orders in one month count
    once), and later-joining customers form their own cohort."""
    rows = [
        (1, "1995-01-15"), (1, "1995-02-10"), (1, "1995-02-20"),
        (2, "1995-01-03"), (2, "1995-03-01"),
        (3, "1995-02-05"),
    ]
    orders = spark.createDataFrame(
        rows, "o_custkey long, d string"
    ).withColumn("o_orderdate", em.F.col("d").cast("timestamp"))
    out = {
        (r.cohort_ym, r.month_offset): r.n_customers
        for r in warehouse.cohort_retention(orders).collect()
    }
    jan = 1995 * 12 + 0
    feb = jan + 1
    assert out[(jan, 0)] == 2          # customers 1 and 2
    assert out[(jan, 1)] == 1          # only customer 1 returned in Feb
    assert out[(jan, 2)] == 1          # only customer 2 in Mar
    assert out[(feb, 0)] == 1          # customer 3's own cohort
    assert len(out) == 4


def test_cmd_histogram_bins_and_null_b_excluded(spark):
    from lightcurvesclassifier_spark.functions import descriptors as D
    from lightcurvesclassifier_spark.sources import testdata as td
    from tests.conftest import SF_SMOKE

    sm = td.stars_more(spark, SF_SMOKE)
    out = D.cmd_histogram(sm).toPandas()
    n_with_b = sm.filter(
        em.F.element_at("more", "b_mag").isNotNull()
    ).count()
    assert out.n_stars.sum() == n_with_b  # every B-carrying star binned once
    assert (out.v_lo == out.vbin * 0.5).all()
    assert len(out) > 1


def test_pivot_wide_report_and_zero_fill(spark):
    rows = [
        ("A", 100.0, 0.0, "1996-01-10"),
        ("A", 50.0, 0.5, "1996-01-20"),
        ("R", 10.0, 0.0, "1996-02-01"),
    ]
    li = spark.createDataFrame(
        rows,
        "l_returnflag string, l_extendedprice double, l_discount double, "
        "d string",
    ).withColumn("l_shipdate", em.F.col("d").cast("timestamp"))
    out = {
        r.ym: r for r in warehouse.monthly_flag_revenue(li).collect()
    }
    jan = 1996 * 12 + 0
    assert out[jan].rev_a_cents == 12500  # 100 + 50*0.5
    assert out[jan].rev_n_cents == 0      # absent flag → zero-filled
    assert out[jan].rev_r_cents == 0
    assert out[jan + 1].rev_r_cents == 1000


def test_repeat_customers_intersect_distinct(spark):
    rows = [
        (1, "1996-03-01"), (1, "1996-07-01"),  # twice in y1 → once out
        (1, "1997-01-01"),
        (2, "1996-05-05"),                      # y1 only
        (3, "1997-02-02"),                      # y2 only
    ]
    orders = spark.createDataFrame(
        rows, "o_custkey long, d string"
    ).withColumn("o_orderdate", em.F.col("d").cast("timestamp"))
    got = [r.custkey for r in warehouse.repeat_customers(orders).collect()]
    assert got == [1]


def test_late_order_priority_semi_semantics(spark):
    """One late line flags the order once (no fan-out from multiple
    late lines); on-time orders are excluded."""
    orders = spark.createDataFrame(
        [(1, "P1", "1996-01-01"), (2, "P1", "1996-01-01"),
         (3, "P2", "1996-01-01")],
        "o_orderkey long, o_orderpriority string, d string",
    ).withColumn("o_orderdate", em.F.col("d").cast("timestamp"))
    li = spark.createDataFrame(
        [(1, "1996-06-01"), (1, "1996-07-01"),  # two late lines, one order
         (2, "1996-01-15"),                      # on time
         (3, "1996-09-01")],
        "l_orderkey long, d string",
    ).withColumn("l_shipdate", em.F.col("d").cast("timestamp"))
    out = {
        r.priority: r.n_orders
        for r in warehouse.late_order_priority(orders, li).collect()
    }
    assert out == {"P1": 1, "P2": 1}


def test_custdist_includes_zero_order_customers(spark):
    customer = spark.createDataFrame(
        [(1,), (2,), (3,)], "c_custkey long"
    )
    orders = spark.createDataFrame(
        [(1,), (1,), (2,)], "o_custkey long"
    )
    out = {
        r.c_count: r.n_customers
        for r in warehouse.custdist(customer, orders).collect()
    }
    assert out == {2: 1, 1: 1, 0: 1}  # customer 3 has zero orders


def test_small_qty_threshold(spark):
    """Part avg qty = 10; only the qty-4 line is under half of it."""
    rows = [
        (7, 4.0, 100.0), (7, 16.0, 200.0),
        (8, 10.0, 50.0),
    ]
    li = spark.createDataFrame(
        rows, "l_partkey long, l_quantity double, l_extendedprice double"
    )
    out = warehouse.small_qty_revenue(li).collect()[0]
    assert out.n_lines == 1
    assert out.revenue_cents == 10000


def test_churned_customers_except_distinct(spark):
    rows = [
        (1, "1996-03-01"), (1, "1996-07-01"),  # y1 twice → once out
        (2, "1996-05-05"), (2, "1997-06-06"),  # retained → excluded
        (3, "1997-02-02"),                      # y2 only → excluded
    ]
    orders = spark.createDataFrame(
        rows, "o_custkey long, d string"
    ).withColumn("o_orderdate", em.F.col("d").cast("timestamp"))
    got = [r.custkey for r in warehouse.churned_customers(orders).collect()]
    assert got == [1]


def test_promo_revenue_share_fixture(spark):
    li = spark.createDataFrame(
        [(1, 100.0, 0.0, "1996-01-05"), (2, 300.0, 0.0, "1996-01-20"),
         (1, 50.0, 0.0, "1996-02-01")],
        "l_partkey long, l_extendedprice double, l_discount double, d string",
    ).withColumn("l_shipdate", em.F.col("d").cast("timestamp"))
    part = spark.createDataFrame(
        [(1, "PROMO"), (2, "ECONOMY")], "p_partkey long, p_type string"
    )
    out = {
        r.ym: r
        for r in warehouse.promo_revenue_share(li, part).collect()
    }
    jan = 1996 * 12 + 0
    assert out[jan].promo_cents == 10000
    assert out[jan].total_cents == 40000
    assert out[jan].promo_share_pct == 25.0
    assert out[jan + 1].promo_share_pct == 100.0

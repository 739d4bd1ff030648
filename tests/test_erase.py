"""Right-to-erasure cascade: the deletion closure must be exact —
every victim's rows gone from all three tables, every non-victim row
untouched."""

from __future__ import annotations

from pyspark.sql import functions as F

from confidential_storm_spark.plans.queries import _ERASE_MOD, erase_propagation
from confidential_storm_spark.sources.tables import load_table


def test_erase_cascade_closure_is_exact(spark, sf_dir):
    res = erase_propagation(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    victims = cust.where(F.col("c_custkey") % _ERASE_MOD == 0).select("c_custkey")
    n_victims = victims.count()
    assert n_victims > 0  # the scenario must actually erase something

    totals = res.agg(
        F.sum("customers_left").alias("c"),
        F.sum("orders_left").alias("o"),
        F.sum("lineitems_left").alias("l"),
    ).collect()[0]

    # customers: exactly the non-victims survive
    assert totals.c == cust.count() - n_victims

    # orders: exactly the orders of non-victims survive
    kept_orders = orders.join(
        victims.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey", "left_anti"
    )
    assert totals.o == kept_orders.count()

    # lineitems: exactly the lines of surviving orders survive
    dead_o = orders.join(
        victims.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey", "left_semi"
    ).select(F.col("o_orderkey").alias("l_orderkey"))
    assert totals.l == li.join(dead_o, "l_orderkey", "left_anti").count()

    # and something was cascaded at each level
    assert kept_orders.count() < orders.count()

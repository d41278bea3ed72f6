"""Bucketed co-located joins must eliminate the shuffle entirely."""

from __future__ import annotations

from pyspark.sql import functions as F

from oil_wells_data_wrangling_spark.sources.bucketed import (
    read_bucketed,
    write_bucketed,
)
from oil_wells_data_wrangling_spark.sources.readers import load_tables


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    write_bucketed(t.lineitem, "li_bucketed", "l_orderkey", 8)
    write_bucketed(t.orders, "ord_bucketed", "o_orderkey", 8)

    li = read_bucketed(spark, "li_bucketed")
    od = read_bucketed(spark, "ord_bucketed")
    # force sort-merge so the test checks bucket co-location, not broadcast
    joined = li.hint("merge").join(od, F.col("l_orderkey") == F.col("o_orderkey"))
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan
    # and it still computes the right thing
    n = joined.count()
    want = t.lineitem.join(
        t.orders, F.col("l_orderkey") == F.col("o_orderkey")
    ).count()
    assert n == want

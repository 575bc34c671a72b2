"""UDAF semantics pinned to the reference's documented examples
(default_udf_library.cc / feature_zero_def.cc / sum_by_category_def.cc)."""

import pytest
from pyspark.sql import functions as F

from openmldb_spark.functions import aggregates as A
from openmldb_spark.operators.window import WindowDef, window_agg


def _one_window(spark, values, spec, dtype="long"):
    """Run spec over a single unbounded window of `values` (ts = index);
    return the last row's aggregate (= aggregate over all values)."""
    rows = [(i, "k", float(v) if dtype == "double" else v) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, f"id int, pk string, v {dtype}")
    wd = WindowDef(partition_by=["pk"], order_by="id", unbounded=True)
    out = window_agg(df, wd, {"agg": spec})
    return [r["agg"] for r in out.orderBy("id").collect()][-1]


def test_ew_avg_reference_example(spark):
    # ref doc: values 0..4, alpha 0.5 -> 3.161290 (default_udf_library.cc:2897)
    got = _one_window(spark, [0, 1, 2, 3, 4], A.ew_avg("v", 0.5), dtype="double")
    assert abs(got - 3.161290) < 1e-5


def test_drawdown_reference_example(spark):
    # ref doc: 1,8,5,2,10,4 -> 0.75 (decline 8 -> 2)
    got = _one_window(spark, [1, 8, 5, 2, 10, 4], A.drawdown("v"), dtype="double")
    assert abs(got - 0.75) < 1e-9


def test_top_reference_example(spark):
    # ref doc: 1,2,3,4,4 + top(v,3) -> "4,4,3"
    got = _one_window(spark, [1, 2, 3, 4, 4], A.top("v", 3))
    assert got == "4,4,3"


def test_median_even_odd(spark):
    assert _one_window(spark, [1, 2, 3, 4], A.median_("v")) == 2.5
    assert _one_window(spark, [1, 2, 3], A.median_("v")) == 2.0


def test_entropy_reference_example(spark):
    # ref doc: 1,1,2,3 -> 1.5 (aggregate_def.cc:386-403); log2
    got = _one_window(spark, [1, 1, 2, 3], A.entropy("v"), dtype="double")
    assert abs(got - 1.5) < 1e-9


def test_sum_cate_reference_example(spark):
    # ref doc: (0,x)(1,y)(2,x)(3,y)(4,x) -> "x:6,y:4"
    rows = [(i, "k", v, c) for i, (v, c) in enumerate([(0, "x"), (1, "y"), (2, "x"), (3, "y"), (4, "x")])]
    df = spark.createDataFrame(rows, "id int, pk string, v long, c string")
    wd = WindowDef(partition_by=["pk"], order_by="id", unbounded=True)
    out = window_agg(df, wd, {"agg": A.sum_cate("v", "c")})
    assert [r["agg"] for r in out.orderBy("id").collect()][-1] == "x:6,y:4"


def test_sum_cate_where_reference_example(spark):
    # ref doc: values 0..4, cond T/F/F/T/T, cats x/y/x/y/x -> "x:4,y:3"
    data = [(0, True, "x"), (1, False, "y"), (2, False, "x"), (3, True, "y"), (4, True, "x")]
    rows = [(i, "k", v, b, c) for i, (v, b, c) in enumerate(data)]
    df = spark.createDataFrame(rows, "id int, pk string, v long, b boolean, c string")
    wd = WindowDef(partition_by=["pk"], order_by="id", unbounded=True)
    out = window_agg(df, wd, {"agg": A.sum_cate_where("v", F.col("b"), "c")})
    assert [r["agg"] for r in out.orderBy("id").collect()][-1] == "x:4,y:3"


def test_top_n_key_sum_cate_where_reference_example(spark):
    # ref doc -> "z:11,y:4" (keys descending, top 2)
    data = [
        (0, True, "x"), (1, True, "y"), (2, False, "x"), (3, True, "y"),
        (4, False, "x"), (5, True, "z"), (6, True, "z"),
    ]
    rows = [(i, "k", v, b, c) for i, (v, b, c) in enumerate(data)]
    df = spark.createDataFrame(rows, "id int, pk string, v long, b boolean, c string")
    wd = WindowDef(partition_by=["pk"], order_by="id", unbounded=True)
    out = window_agg(df, wd, {"agg": A.top_n_key_sum_cate_where("v", F.col("b"), "c", 2)})
    assert [r["agg"] for r in out.orderBy("id").collect()][-1] == "z:11,y:4"


def test_top_n_value_sum_cate_where_reference_example(spark):
    # ref doc -> "z:11,x:4" (agg values descending, top 2)
    data = [
        (0, True, "x"), (1, True, "y"), (2, False, "x"), (3, False, "y"),
        (4, True, "x"), (5, True, "z"), (6, True, "z"),
    ]
    rows = [(i, "k", v, b, c) for i, (v, b, c) in enumerate(data)]
    df = spark.createDataFrame(rows, "id int, pk string, v long, b boolean, c string")
    wd = WindowDef(partition_by=["pk"], order_by="id", unbounded=True)
    out = window_agg(df, wd, {"agg": A.top_n_value_sum_cate_where("v", F.col("b"), "c", 2)})
    assert [r["agg"] for r in out.orderBy("id").collect()][-1] == "z:11,x:4"


def test_top_n_value_cate_where_tie_prints_key_desc(spark):
    # equal aggregate values: reference reverse-iterates a (value asc, key
    # asc) set, so ties print key DESCENDING (containers.h OutputTopNByValue)
    data = [(5, True, "x"), (5, True, "z"), (5, True, "y")]
    rows = [(i, "k", v, b, c) for i, (v, b, c) in enumerate(data)]
    df = spark.createDataFrame(rows, "id int, pk string, v long, b boolean, c string")
    wd = WindowDef(partition_by=["pk"], order_by="id", unbounded=True)
    out = window_agg(df, wd, {"agg": A.top_n_value_sum_cate_where("v", F.col("b"), "c", 2)})
    assert [r["agg"] for r in out.orderBy("id").collect()][-1] == "z:5,y:5"


def test_top_n_ratio_cate_reference_doctest(spark):
    # aggregate_def.cc:410-471 doctest: values 0..6, conds, cats x/x/x/y/y/z/z
    data = [
        (0, True, "x"), (2, True, "x"), (4, True, "x"),
        (1, True, "y"), (3, False, "y"), (5, True, "z"), (6, True, "z"),
    ]
    rows = [(i, "k", v, b, c) for i, (v, b, c) in enumerate(data)]
    df = spark.createDataFrame(rows, "id int, pk string, v long, b boolean, c string")
    wd = WindowDef(partition_by=["pk"], order_by="id", unbounded=True)
    out = window_agg(
        df,
        wd,
        {
            "bykey": A.top_n_key_ratio_cate("v", F.col("b"), "c", 2),
            "byval": A.top_n_value_ratio_cate("v", F.col("b"), "c", 2),
        },
    )
    last = out.orderBy("id").collect()[-1]
    assert last["bykey"] == "z:1.000000,y:0.500000"
    assert last["byval"] == "z:1.000000,x:1.000000"


def test_top_n_ratio_cate_yaml_case66_edges(spark):
    # cases/function/function/test_udaf_function.yaml id=66: NULL category
    # skipped; n=0 -> ''; negative n -> unbounded; value-ties -> key desc
    data = [
        (200, True, "a"), (300, True, "b"), (200, True, None),
        (10, False, "b"), (101, True, "c"),
    ]
    rows = [(i, "k", v, b, c) for i, (v, b, c) in enumerate(data)]
    df = spark.createDataFrame(rows, "id int, pk string, v long, b boolean, c string")
    wd = WindowDef(partition_by=["pk"], order_by="id", unbounded=True)
    out = window_agg(
        df,
        wd,
        {
            "byval2": A.top_n_value_ratio_cate("v", F.col("b"), "c", 2),
            "bykey2": A.top_n_key_ratio_cate("v", F.col("b"), "c", 2),
            "byval_full": A.top_n_value_ratio_cate("v", F.col("b"), "c", -1),
            "bykey_full": A.top_n_key_ratio_cate("v", F.col("b"), "c", -2),
            "byval_empty": A.top_n_value_ratio_cate("v", F.col("b"), "c", 0),
        },
    )
    last = out.orderBy("id").collect()[-1]
    # groups: a 1/1, b 1/2, c 1/1 (NULL-cat row skipped)
    assert last["byval2"] == "c:1.000000,a:1.000000"
    assert last["bykey2"] == "c:1.000000,b:0.500000"
    assert last["byval_full"] == "c:1.000000,a:1.000000,b:0.500000"
    assert last["bykey_full"] == "c:1.000000,b:0.500000,a:1.000000"
    assert last["byval_empty"] == ""


def test_top1_ratio_and_topn_frequency(spark):
    vals = ["a", "a", "a", "b", "b", "c"]
    rows = [(i, "k", v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id int, pk string, v string")
    wd = WindowDef(partition_by=["pk"], order_by="id", unbounded=True)
    out = window_agg(
        df, wd, {"r": A.top1_ratio("v"), "f": A.topn_frequency("v", 2)}
    )
    last = out.orderBy("id").collect()[-1]
    assert abs(last["r"] - 0.5) < 1e-9
    assert last["f"] == "a,b"


def test_topn_frequency_tie_smaller_key_first(spark):
    vals = ["b", "b", "a", "a", "c"]
    rows = [(i, "k", v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id int, pk string, v string")
    wd = WindowDef(partition_by=["pk"], order_by="id", unbounded=True)
    out = window_agg(df, wd, {"f": A.topn_frequency("v", 2)})
    # counts a=2, b=2 tie -> smaller key first (feature_zero_def.cc cmp)
    assert out.orderBy("id").collect()[-1]["f"] == "a,b"


def test_where_family_group(spark):
    rows = [(1, 10.0, True), (2, 20.0, True), (3, 30.0, False), (4, None, True)]
    df = spark.createDataFrame(rows, "id int, v double, b boolean")
    got = df.agg(
        A.sum_where("v", F.col("b")).as_group().alias("s"),
        A.count_where("v", F.col("b")).as_group().alias("c"),
        A.avg_where("v", F.col("b")).as_group().alias("a"),
        A.min_where("v", F.col("b")).as_group().alias("mn"),
        A.max_where("v", F.col("b")).as_group().alias("mx"),
    ).collect()[0]
    assert got["s"] == 30.0 and got["c"] == 2 and got["a"] == 15.0
    assert got["mn"] == 10.0 and got["mx"] == 20.0


def test_nulls_skipped(spark):
    got = _one_window(spark, [1, None, 3], A.sum_("v"))
    assert got == 4
    got = _one_window(spark, [None, None], A.count_("v"))
    assert got == 0
    got = _one_window(spark, [None, None], A.sum_("v"))
    assert got is None


def test_nth_value_where(spark):
    rows = [(1, 10, True), (2, 20, False), (3, 30, True), (4, 40, True)]
    df = spark.createDataFrame(rows, "id int, v long, b boolean")
    df = df.withColumn("pk", F.lit("k"))
    wd = WindowDef(partition_by=["pk"], order_by="id", unbounded=True)
    out = window_agg(
        df,
        wd,
        {
            "n1": A.nth_value_where("v", 1, F.col("b")),
            "n2": A.nth_value_where("v", 2, F.col("b")),
            "nm1": A.nth_value_where("v", -1, F.col("b")),
        },
    )
    last = out.orderBy("id").collect()[-1]
    assert last["n1"] == 10 and last["n2"] == 30 and last["nm1"] == 40


def test_group_agg_having_dataframe_path(spark):
    # DataFrame-path HAVING (R.group_agg having=) — kept here after the
    # `having` gate query was retired into sql_group for the 50-row cap.
    from openmldb_spark.operators import relational as R

    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", 3), ("b", 10)], "k string, v long"
    )
    out = R.group_agg(
        df, ["k"], {"n": F.count(F.lit(1)), "s": F.sum("v")},
        having=F.count(F.lit(1)) >= 2,
    ).collect()
    assert len(out) == 1 and out[0]["k"] == "a" and out[0]["s"] == 6

"""r14 Arrow-batched cate reductions (guide §4.2, VERDICT r13 item 3):
the vectorized Python evaluation must be EXACTLY equal — string for
string — to the interpreted HOF path it replaces, on adversarial inputs
(NaN/±inf/-0.0 doubles, float32 values, int wraparound, null values/keys/
conds, empty frames, astral-plane string keys, int/bool/date keys), and
the plan must carry ONE ArrowEvalPython node instead of the HOF chain.
"""

import datetime

import pytest
from pyspark.sql import functions as F

from openmldb_spark.functions import aggregates as A
from openmldb_spark.operators.window import WindowDef, window_agg

WD = WindowDef(partition_by=["g"], order_by="seq", rows=4)


def _canon(v):
    # NaN != NaN would fail the tuple compare on passthrough input columns;
    # map it to a sentinel (string outputs are compared verbatim)
    if isinstance(v, float) and v != v:
        return "__nan__"
    return v


def _run_both(spark, df, aggs, wdef=WD):
    out = {}
    for flag in ("false", "true"):
        spark.conf.set("spark.graft.window.arrowReduce", flag)
        try:
            got = window_agg(df, wdef, aggs).orderBy("seq").collect()
        finally:
            spark.conf.set("spark.graft.window.arrowReduce", "true")
        out[flag] = [tuple(_canon(v) for v in r) for r in got]
    return out["false"], out["true"]


def _adversarial_double_df(spark):
    nan, inf = float("nan"), float("inf")
    rows = []
    vals = [1.5, -0.0, 0.0, nan, -inf, inf, None, 0.125, 1 / 3, 2.0, -7.25,
            1e300, -1e300, 5e-324, 0.15, 0.25, 1 / 128, None, 3.5, 0.0000005]
    keys = ["a", "b", None, "a", "\U00010000", "", "b", "a", "z", "b",
            "a", "c", "c", "a", "b", "a", "c", "a", "", "b"]
    for i, (v, k) in enumerate(zip(vals, keys)):
        rows.append((i % 3, i, v, k))
    return spark.createDataFrame(rows, "g int, seq long, v double, k string")


CATE_FAMILIES = [
    ("sum_cate", lambda: A.sum_cate("v", "k")),
    ("count_cate", lambda: A.count_cate("v", "k")),
    ("avg_cate", lambda: A.avg_cate("v", "k")),
    ("min_cate", lambda: A.min_cate("v", "k")),
    ("max_cate", lambda: A.max_cate("v", "k")),
    ("top2_key_sum", lambda: A.top_n_key_sum_cate_where("v", F.col("v") > 0, "k", 2)),
    ("top2_val_sum", lambda: A.top_n_value_sum_cate_where("v", F.col("v") > 0, "k", 2)),
    ("top2_val_max", lambda: A.top_n_value_max_cate_where("v", F.col("v").isNotNull(), "k", 2)),
]


@pytest.mark.parametrize("name,mk", CATE_FAMILIES)
def test_cate_arrow_equals_hof_on_adversarial_doubles(spark, name, mk):
    df = _adversarial_double_df(spark)
    hof, arrow = _run_both(spark, df, {name: mk()})
    assert hof == arrow, f"{name}: HOF vs Arrow diverged\n{hof}\n{arrow}"


def test_cate_arrow_long_and_float32_and_wraparound(spark):
    rows = [
        (0, 0, 2**62, 1.5, "a"),
        (0, 1, 2**62, 2.5, "a"),          # long sum wraps in-frame
        (0, 2, -5, float("nan"), "b"),
        (0, 3, None, 0.125, None),
        (0, 4, 7, None, "b"),
        (1, 5, 2**31 - 1, -0.0, "x"),
        (1, 6, 1, 0.0, "x"),
        (1, 7, -(2**60), 3.0e38, "y"),
        (1, 8, -(2**60), 3.0e38, "y"),    # float32 sum overflows to inf
    ]
    df = spark.createDataFrame(rows, "g int, seq long, lv long, fv float, k string")
    aggs = {
        "s_l": A.sum_cate("lv", "k"),
        "mn_f": A.min_cate("fv", "k"),
        "s_f": A.sum_cate("fv", "k"),
        "a_f": A.avg_cate("fv", "k"),
    }
    hof, arrow = _run_both(spark, df, aggs)
    assert hof == arrow, f"\n{hof}\n{arrow}"


def test_cate_arrow_int_bool_date_keys(spark):
    d = datetime.date
    rows = [
        (0, 0, 1.0, 10, True, d(2020, 1, 2)),
        (0, 1, 2.0, 2, False, d(2019, 12, 31)),
        (0, 2, 3.0, 10, True, d(2020, 1, 2)),
        (0, 3, 4.0, None, None, None),
        (0, 4, 5.0, -3, False, d(2021, 6, 1)),
    ]
    df = spark.createDataFrame(
        rows, "g int, seq long, v double, ki long, kb boolean, kd date"
    )
    aggs = {
        "by_int": A.sum_cate("v", "ki"),     # numeric key order, not "10"<"2"
        "by_bool": A.count_cate("v", "kb"),
        "by_date": A.max_cate("v", "kd"),
    }
    hof, arrow = _run_both(spark, df, aggs)
    assert hof == arrow, f"\n{hof}\n{arrow}"


def test_ratio_cate_arrow_equals_hof(spark):
    rows = []
    import math

    for i in range(40):
        v = None if i % 11 == 7 else float(i)
        k = None if i % 13 == 5 else f"k{i % 4}"
        rows.append((i % 3, i, v, k))
    rows.append((0, 100, math.nan, "k0"))  # NaN value is NOT null: eligible
    df = spark.createDataFrame(rows, "g int, seq long, v double, k string")
    aggs = {
        "kr": A.top_n_key_ratio_cate("v", F.col("v") > 20, "k", 2),
        "vr": A.top_n_value_ratio_cate("v", F.col("v") > 20, "k", 2),
        "kr_all": A.top_n_key_ratio_cate("v", F.col("v") > 20, "k", -1),
        "vr_zero": A.top_n_value_ratio_cate("v", F.col("v") > 20, "k", 0),
    }
    # null conds count in the denominator only
    aggs["kr_nullc"] = A.top_n_key_ratio_cate(
        "v", F.when(F.col("seq") % 5 == 0, F.col("v") > 10), "k", 3
    )
    hof, arrow = _run_both(spark, df, aggs)
    assert hof == arrow, f"\n{hof}\n{arrow}"


def test_arrow_plan_has_one_arrow_node_and_no_fallback_for_strings(spark):
    df = _adversarial_double_df(spark)
    aggs = {
        "s": A.sum_cate("v", "k"),
        "c": A.count_cate("v", "k"),
        "t": A.top_n_key_sum_cate_where("v", F.col("v").isNotNull(), "k", 2),
    }
    out = window_agg(df, WD, aggs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1, plan
    assert "BatchEvalPython" not in plan, plan


def test_arrow_unsupported_key_dtype_falls_back_to_hof(spark):
    # timestamp keys have no exactness-proven Python cast: HOF path stays
    df = spark.createDataFrame(
        [(0, 0, 1.0, datetime.datetime(2020, 1, 1))],
        "g int, seq long, v double, kt timestamp",
    )
    out = window_agg(df, WD, {"s": A.sum_cate("v", "kt")})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan, plan
    got = out.collect()[0]["s"]
    assert got.endswith(":1.000000") and got.startswith("2020-01-01"), got


def test_arrow_empty_frame_yields_empty_string(spark):
    # end_rows pushes the frame entirely before the partition start for the
    # first rows: eligible set is empty -> "" on both paths
    wd = WindowDef(partition_by=["g"], order_by="seq", rows=4, end_rows=2)
    df = _adversarial_double_df(spark)
    hof, arrow = _run_both(spark, df, {"s": A.sum_cate("v", "k")}, wdef=wd)
    assert hof == arrow
    assert any(r[-1] == "" for r in arrow)

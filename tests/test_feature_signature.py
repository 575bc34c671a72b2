"""Feature-signature formatters + window_split family goldens
(ref: feature_signature_def.cc, feature_zero_def.cc:591-668)."""

import pytest
from pyspark.sql import functions as F

from openmldb_spark.functions import aggregates as A
from openmldb_spark.functions import feature_signature as FS
from openmldb_spark.operators.window import WindowDef, window_agg
from openmldb_spark.sql import sql


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        (1, 1.5, "red", 1, None),
        (2, 2.0, "blue", 0, 3.25),
        (3, None, None, 1, 7.0),
    ]
    return spark.createDataFrame(
        rows, "id int, f1 double, f2 string, label int, f3 double"
    )


def test_csv_format(spark, df):
    out = df.select(
        "id",
        FS.csv_format(
            FS.multiclass_label(F.col("label")),
            FS.continuous(F.col("f1")),
            FS.continuous(F.col("f3")),
        ).alias("inst"),
    )
    got = {r["id"]: r["inst"] for r in out.collect()}
    assert got[1] == "1,1.500000,"
    assert got[2] == "0,2.000000,3.250000"
    assert got[3] == "1,,7.000000"


def test_libsvm_format(spark, df):
    out = df.select(
        "id",
        FS.libsvm(
            FS.binary_label(F.col("label")),
            FS.continuous(F.col("f1")),
            FS.continuous(F.col("f3")),
        ).alias("inst"),
    )
    got = {r["id"]: r["inst"] for r in out.collect()}
    # null features are skipped but keep their slot number
    assert got[1] == "1 1:1.500000"
    assert got[2] == "0 1:2.000000 2:3.250000"
    assert got[3] == "1 2:7.000000"


def test_libsvm_bucketed_discrete(spark, df):
    out = df.select(
        "id",
        FS.libsvm(
            FS.binary_label(F.col("label")),
            FS.discrete(F.col("f2"), bucket=10),
            FS.continuous(F.col("f3")),
        ).alias("inst"),
    ).collect()
    row2 = {r["id"]: r["inst"] for r in out}[2]
    label, *feats = row2.split(" ")
    assert label == "0"
    # discrete occupies slots 1..10, continuous lands at slot 11
    fid = int(feats[0].split(":")[0])
    assert 1 <= fid <= 10 and feats[0].endswith(":1")
    assert feats[1].startswith("11:")


def test_gcformat_shape(spark, df):
    out = df.select(
        FS.gcformat(
            FS.multiclass_label(F.col("label")),
            FS.gcformat_index(F.col("id")),
            FS.continuous(F.col("f1")),
            FS.discrete(F.col("f2")),
        ).alias("inst"),
    ).collect()
    for r in out:
        label, rest = r["inst"].split(" ", 1)
        idx, feats = rest.split("| ")
        assert label in ("0", "1") and idx.strip().isdigit()


def test_window_split(spark):
    rows = [
        (1, "A", "a,b", 10),
        (2, "A", "c", 20),
        (3, "A", None, 30),
        (4, "B", "x:1|y:2", 10),
        (5, "B", "z:3", 20),
    ]
    t = spark.createDataFrame(rows, "id int, pk string, s string, ts long")
    wd = WindowDef(partition_by=["pk"], order_by="ts", unbounded=True)
    out = window_agg(
        t,
        wd,
        {
            "sp": A.window_split("s", ","),
            "ks": A.window_split_by_key("s", "|", ":"),
            "vs": A.window_split_by_value("s", "|", ":"),
        },
    )
    got = {r["id"]: (r["sp"], r["ks"], r["vs"]) for r in out.collect()}
    # element order = reference window iteration: rows ts-DESC, pieces
    # within a row left-to-right (feature_zero corpus goldens, r8)
    assert got[2][0] == ["c", "a", "b"]
    assert got[3][0] == ["c", "a", "b"]          # null row contributes nothing
    assert got[5][1] == ["z", "x", "y"]
    assert got[5][2] == ["3", "1", "2"]


def test_window_split_via_sql(spark):
    rows = [(1, "A", "a,b", 10), (2, "A", "c", 20)]
    t = spark.createDataFrame(rows, "id int, pk string, s string, ts long")
    out = sql(
        spark,
        "SELECT id, window_split(s, ',') OVER w1 AS parts FROM t WINDOW w1 AS "
        "(PARTITION BY pk ORDER BY ts ROWS BETWEEN 10 PRECEDING AND CURRENT ROW)",
        {"t": t},
    )
    assert {r["id"]: r["parts"] for r in out.collect()}[2] == ["c", "a", "b"]

"""Async offline-job semantics (VERDICT r6 item 2) — the TaskManager
contract: jobs run under their own Spark job group with observable
SUBMITTED/RUNNING/FINISHED/FAILED/STOPPED states, and STOP JOB cancels
the job group (kills running stages), not just the bookkeeping.

Reference: OpenmldbBatchjobManager.scala (job types),
JobInfo.java:32 (states), JobInfoManager.scala:100-124 (stopJob),
cases/integration_test/out_in/test_job.yaml (row schema).
"""

import time

import pytest
from pyspark.sql import functions as F

from openmldb_spark.engine import Engine
from openmldb_spark.jobs import JobManager


@pytest.fixture()
def eng(spark):
    return Engine(spark)


def _wait_state(job, states, timeout=30.0):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if job.state in states:
            return job.state
        time.sleep(0.02)
    raise AssertionError(f"job stuck in {job.state}, wanted {states}")


def _big_csv(tmp_path, rows=3_000_000):
    tmp_path.mkdir(parents=True, exist_ok=True)
    p = tmp_path / "big.csv"
    chunk = "".join(f"{i},x{i}\n" for i in range(1000))
    with open(p, "w") as fh:
        fh.write("id,name\n")
        for _ in range(rows // 1000):
            fh.write(chunk)
    return p


def test_async_load_transitions_to_finished(eng, spark, tmp_path):
    csv = tmp_path / "a.csv"
    csv.write_text("id,name\n1,x\n2,y\n")
    eng.execute("CREATE TABLE asrc (id int, name string)")
    eng.execute("SET @@sync_job = 'false'")
    out = eng.execute(
        f"LOAD DATA INFILE '{csv}' INTO TABLE asrc OPTIONS(format='csv', mode='append')"
    )
    # async submit returns the job row immediately
    [row] = out.collect()
    assert row["state"] in ("Submitted", "Running", "FINISHED")
    job = eng.jobman.get(row["id"])
    assert _wait_state(job, {"FINISHED"}) == "FINISHED"
    assert job.start_time_ms is not None and job.end_time_ms is not None
    # data published on completion
    assert eng.execute("SELECT count(*) AS n FROM asrc").collect()[0]["n"] == 2
    shown = eng.execute(f"SHOW JOB {job.id}").collect()[0]
    assert shown["state"] == "FINISHED" and shown["error"] == ""


def test_stop_job_kills_running_import(eng, spark, tmp_path):
    """The r6 gap: a long-running import must show RUNNING and STOP JOB
    must actually cancel its Spark job group, leaving the table
    unpublished and the state STOPPED.

    STOP inherently races job completion; under heavy host load the
    import can finish inside the race window (job state FINISHED before
    cancelJobGroup lands — the data is then legitimately published, the
    reference behaves the same). Retry with a bigger file instead of
    flaking."""
    eng.execute("SET @@sync_job = 'false'")
    rows = 3_000_000
    for attempt in range(3):
        tbl = f"bsrc{attempt}"
        eng.execute(f"CREATE TABLE {tbl} (id int, name string)")
        big = _big_csv(tmp_path / f"try{attempt}", rows)
        out = eng.execute(
            f"LOAD DATA INFILE '{big}' INTO TABLE {tbl} "
            "OPTIONS(format='csv', mode='append')"
        )
        jid = out.collect()[0]["id"]
        job = eng.jobman.get(jid)
        _wait_state(job, {"Running", "FINISHED"})
        if job.state == "Running":
            # the job may legitimately finish between the two reads — only
            # assert SHOW JOB reflects a real state, not a stale one
            state_shown = eng.execute(f"SHOW JOB {jid}").collect()[0]["state"]
            assert state_shown in ("Running", "FINISHED")
        t0 = time.time()
        stopped = eng.execute(f"STOP JOB {jid}").collect()[0]
        assert stopped["state"] == "STOPPED"
        assert time.time() - t0 < 25, "STOP JOB should cancel, not wait out the job"
        assert job.state == "STOPPED"
        n = eng.execute(f"SELECT count(*) AS n FROM {tbl}").collect()[0]["n"]
        if n != 0:
            # only a job whose body ran to completion before the cancel
            # landed may have published — and then it publishes EVERYTHING.
            # A partial publish is a real isolation bug.
            assert n == rows, (n, rows, job.log)
            rows *= 3
            continue
        return
    pytest.skip("import kept finishing before STOP on 3 growing attempts")


def test_async_failure_records_failed_with_error(eng, spark, tmp_path):
    bad = tmp_path / "bad.csv"
    bad.write_text("id,name\noops,x\n")
    eng.execute("CREATE TABLE fsrc (id int, name string)")
    eng.execute("SET @@sync_job = 'false'")
    out = eng.execute(
        f"LOAD DATA INFILE '{bad}' INTO TABLE fsrc OPTIONS(format='csv', mode='append')"
    )
    job = eng.jobman.get(out.collect()[0]["id"])
    assert _wait_state(job, {"FAILED"}) == "FAILED"
    assert job.error  # the strict-cast message
    assert eng.execute("SELECT count(*) AS n FROM fsrc").collect()[0]["n"] == 0


def test_sync_failure_raises_and_records_failed(eng, tmp_path):
    bad = tmp_path / "bad2.csv"
    bad.write_text("id,name\nnope,x\n")
    eng.execute("CREATE TABLE gsrc (id int, name string)")
    with pytest.raises(Exception):
        eng.execute(
            f"LOAD DATA INFILE '{bad}' INTO TABLE gsrc OPTIONS(format='csv', mode='append')"
        )
    [row] = eng.execute("SHOW JOBS").collect()
    assert row["state"] == "FAILED" and row["error"]


def test_offline_mode_job_type(eng, tmp_path):
    csv = tmp_path / "o.csv"
    csv.write_text("id,name\n1,x\n")
    eng.execute("CREATE TABLE osrc (id int, name string)")
    eng.execute("SET @@execute_mode = 'offline'")
    eng.execute(f"LOAD DATA INFILE '{csv}' INTO TABLE osrc OPTIONS(format='csv', mode='append')")
    [row] = eng.execute("SHOW JOBS").collect()
    assert row["job_type"] == "ImportOfflineData"


def test_async_export_and_stop_semantics(eng, spark, tmp_path):
    eng.execute("CREATE TABLE esrc (id int, name string)")
    eng.execute("INSERT INTO esrc VALUES (1, 'x'), (2, 'y')")
    eng.execute("SET @@sync_job = 'false'")
    out = eng.execute(
        f"SELECT * FROM esrc INTO OUTFILE '{tmp_path}/eout' "
        "OPTIONS(format='csv', mode='overwrite')"
    )
    job = eng.jobman.get(out.collect()[0]["id"])
    assert job.job_type == "ExportOfflineData"
    assert _wait_state(job, {"FINISHED"}) == "FINISHED"
    back = spark.read.option("header", "true").csv(f"{tmp_path}/eout")
    assert back.count() == 2


def test_job_manager_cancels_real_spark_stage(spark):
    """Direct JobManager contract: a sleeping Spark action under the job
    group is killed by stop() well before it would complete."""
    jm = JobManager(spark)

    def slow_body():
        def naps(it):
            time.sleep(120)
            return it

        spark.sparkContext.parallelize(range(8), 8).mapPartitions(naps).count()

    job = jm.submit("RunBatchSql", "select slow", slow_body, sync=False)
    deadline = time.time() + 10
    while job.state == "Submitted" and time.time() < deadline:
        time.sleep(0.02)
    assert job.state == "Running"
    time.sleep(0.5)  # let the stage's tasks launch
    t0 = time.time()
    jm.stop(job.id)
    assert job.state == "STOPPED"
    assert time.time() - t0 < 30, "stop() must interrupt the 120s sleep tasks"
    assert job._thread is not None and not job._thread.is_alive()

"""Between-query status-store trim (functions/_hygiene.py): deletes the
completed queries' task/stage/job/SQL-execution KVStore entries — the
measured ~4-5 MB/query residue that OOMed a bare 1 GiB session mid-board
at sf0.1 in round 9 — without disturbing subsequent query execution."""

from __future__ import annotations

from pyspark.sql import functions as F

from adtech_log_data_pipeline_spark.functions._hygiene import trim_status_store


def _counts(spark, names):
    jvm = spark._jvm
    store = spark.sparkContext._jsc.sc().statusStore().store()
    out = {}
    for n in names:
        out[n.rsplit(".", 1)[1]] = store.count(jvm.java.lang.Class.forName(n))
    return out


CLASSES = [
    "org.apache.spark.status.TaskDataWrapper",
    "org.apache.spark.status.StageDataWrapper",
    "org.apache.spark.status.JobDataWrapper",
    "org.apache.spark.sql.execution.ui.SQLExecutionUIData",
    "org.apache.spark.sql.execution.ui.SparkPlanGraphWrapper",
]


def test_trim_clears_completed_query_entries(spark):
    # two completed queries leave task/stage/job/SQL entries behind
    spark.range(10_000).select((F.col("id") % 13).alias("k")).groupBy(
        "k"
    ).count().collect()
    spark.range(5_000).selectExpr("id % 7 k", "id v").groupBy("k").agg(
        F.sum("v")
    ).collect()
    before = _counts(spark, CLASSES)
    assert before["TaskDataWrapper"] > 0 and before["SQLExecutionUIData"] > 0

    deleted = trim_status_store(spark)
    assert deleted is not None
    after = _counts(spark, CLASSES)
    assert all(v == 0 for v in after.values()), after
    # the report accounts for what actually went away
    assert deleted["SQLExecutionUIData"] == before["SQLExecutionUIData"]
    assert deleted["StageDataWrapper"] == before["StageDataWrapper"]

    # and the session still executes fine afterwards
    assert spark.range(100).count() == 100


def test_trim_disabled_via_env(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_NO_STATUS_TRIM", "1")
    assert trim_status_store(spark) is None


def test_trim_is_idempotent_and_safe_on_empty_store(spark):
    trim_status_store(spark)
    deleted = trim_status_store(spark)  # nothing left: all zero, no raise
    assert deleted is not None
    assert all(v == 0 for v in deleted.values())

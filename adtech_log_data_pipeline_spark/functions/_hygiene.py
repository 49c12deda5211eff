"""Long-lived-session heap hygiene: trim the app-status KVStore between
queries.

Round 9 measured ~4-5 MB/query of post-GC JVM residue in a BARE session
(default 1 GiB heap, default UI retention), OOMing a full sf0.1 board run
near query ~55 (LOCALGATE_r09.json). The residue is the live-UI
ElementTrackingStore: every query leaves TaskDataWrapper /
StageDataWrapper / JobDataWrapper / SQLExecutionUIData (+ plan graphs,
per-stage executor summaries) entries that the listeners only evict past
the retention caps (1000 jobs / 1000 stages / 100k tasks / 1000 SQL
executions) — caps a 206-query board never reaches per-type fast enough,
while their sum exhausts a small heap. The caps are read at listener
construction, so a session the engine did NOT create (the driver's
vanilla session) cannot be fixed by conf.

``trim_status_store`` therefore deletes completed-query status entries
directly through the public KVStore API (ElementTrackingStore.delete /
removeAllByIndexValues) — the same calls the listeners' own cleanup
paths use, just not gated on the retention caps. It runs between
queries (wired into plans/queries.py::_hygienic), when the previous
query's executions/jobs/stages are complete and hence no longer in any
listener's live map (entries still live would be re-written on the next
event, which is why trimming mid-query would be both racy and useless).

py4j pitfalls this module codifies:
  * java.lang.Long round-trips through py4j as python int and returns as
    Integer — a delete(cls, Integer) silently misses a Long-keyed entry.
    Long-keyed classes (SQL executions, plan graphs) are therefore
    deleted via Guava ``Longs.asList(long[])`` built from a primitive
    long[] that python never element-accesses.
  * Stage natural keys are int[2] (stageId, attemptId); py4j passes
    primitive int arrays faithfully, and the per-stage index name on
    task/summary/quantile wrappers is "stage".

Best-effort by contract: every step is exception-guarded, the function
never raises, and $SPARK_GRAFT_NO_STATUS_TRIM=1 disables it. Cost is a
few dozen py4j calls (the per-type entry counts between trims are tens;
the thousands of task entries go through ONE bulk removeAllByIndexValues
per type). At 100 TB this concern is driver-only and identical: status
retention is sized per-application, not per-data."""

from __future__ import annotations

import os

_INT_KEYED = (
    # iterate + delete by natural key (Integer via py4j int — exact match)
    "org.apache.spark.status.JobDataWrapper",
    "org.apache.spark.status.RDDOperationGraphWrapper",
)
_LONG_KEYED = (
    # bulk-delete via Guava Longs.asList (see module docstring)
    "org.apache.spark.sql.execution.ui.SQLExecutionUIData",
    "org.apache.spark.sql.execution.ui.SparkPlanGraphWrapper",
)
_STAGE_INDEXED = (
    # bulk-delete by the "stage" index using the stage int[2] keys
    "org.apache.spark.status.TaskDataWrapper",
    "org.apache.spark.status.ExecutorStageSummaryWrapper",
    "org.apache.spark.status.CachedQuantile",
    "org.apache.spark.status.SpeculationStageSummaryWrapper",
)
_STAGE_CLS = "org.apache.spark.status.StageDataWrapper"


def trim_status_store(spark) -> dict[str, int] | None:
    """Delete completed-query status-store entries; returns the per-class
    deleted counts (or None when disabled/unavailable). Call ONLY between
    queries — entries of an in-flight execution are live and would be
    re-written by the listener on its next event."""
    if os.environ.get("SPARK_GRAFT_NO_STATUS_TRIM"):
        return None
    try:
        jvm = spark._jvm
        gw = spark.sparkContext._gateway
        store = spark.sparkContext._jsc.sc().statusStore().store()
    except Exception:
        return None

    def jc(name):
        return jvm.java.lang.Class.forName(name)

    def natural_keys(cls):
        ti = jvm.org.apache.spark.util.kvstore.KVTypeInfo(cls)
        acc = ti.getAccessor("__main__")
        it = store.view(cls).closeableIterator()
        keys = []
        try:
            while it.hasNext():
                keys.append(acc.get(it.next()))
        finally:
            it.close()
        return keys

    deleted: dict[str, int] = {}

    # 1) stage keys first: they drive the bulk task/summary deletion
    try:
        stage_cls = jc(_STAGE_CLS)
        it = store.view(stage_cls).closeableIterator()
        stage_keys = []
        try:
            while it.hasNext():
                info = it.next().info()
                stage_keys.append((info.stageId(), info.attemptId()))
        finally:
            it.close()
        if stage_keys:
            vals = jvm.java.util.ArrayList()
            jarrs = []
            for sid, att in stage_keys:
                arr = gw.new_array(jvm.int, 2)
                arr[0], arr[1] = sid, att
                vals.add(arr)
                jarrs.append(arr)
            for name in _STAGE_INDEXED:
                try:
                    cls = jc(name)
                    n = store.count(cls)
                    store.removeAllByIndexValues(cls, "stage", vals)
                    deleted[name.rsplit(".", 1)[1]] = n - store.count(cls)
                except Exception:
                    pass
            n = 0
            for arr in jarrs:
                try:
                    store.delete(stage_cls, arr)
                    n += 1
                except Exception:
                    pass
            deleted["StageDataWrapper"] = n
    except Exception:
        pass

    # 2) integer-keyed wrappers: per-entry delete (counts are tens)
    for name in _INT_KEYED:
        try:
            cls = jc(name)
            n = 0
            for k in natural_keys(cls):
                store.delete(cls, k)
                n += 1
            deleted[name.rsplit(".", 1)[1]] = n
        except Exception:
            pass

    # 3) long-keyed SQL wrappers: one bulk call over a primitive long[]
    for name in _LONG_KEYED:
        try:
            cls = jc(name)
            ids = natural_keys(cls)
            if not ids:
                deleted[name.rsplit(".", 1)[1]] = 0
                continue
            arr = gw.new_array(jvm.long, len(ids))
            for i, x in enumerate(ids):
                arr[i] = x
            lst = jvm.com.google.common.primitives.Longs.asList(arr)
            store.removeAllByIndexValues(cls, "__main__", lst)
            deleted[name.rsplit(".", 1)[1]] = len(ids)
        except Exception:
            pass

    return deleted

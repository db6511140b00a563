"""Per-stage/per-job time attribution for one registry query (guide §1).

Runs a query exactly the way bench.py times it (noop sink, clearCache,
2 priming runs + 1 profiled run) in a session with the Spark event log
enabled, then parses the event log to attribute the profiled run's wall
clock to: driver/planning gaps, each job (with its stages, task-time sum,
max task, shuffle bytes, and the operators the stage covers).

Usage: python tools/profile_query.py query [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> int:
    sys.path.insert(0, "/root/repo")
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    log_dir = "/tmp/spark_graft_profile_events"
    os.makedirs(log_dir, exist_ok=True)

    from mempool_dumpster_spark.plans.registry import all_queries
    from mempool_dumpster_spark.session import get_spark

    queries = all_queries()
    spark = get_spark(
        "profile",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{log_dir}",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    app_id = spark.sparkContext.applicationId

    marks: dict[str, tuple[float, float]] = {}
    for name in names:
        fn = queries[name]
        for _ in range(2):  # priming
            spark.catalog.clearCache()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.time() * 1000
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        t1 = time.time() * 1000
        marks[name] = (t0, t1)
        spark.sparkContext.setJobDescription(None)
    spark.stop()

    path = os.path.join(log_dir, app_id)
    if not os.path.exists(path):  # Spark 4 rolling layout
        d = os.path.join(log_dir, f"eventlog_v2_{app_id}")
        parts = [
            os.path.join(d, p)
            for p in sorted(os.listdir(d))
            if p.startswith("events_")
        ]
    else:
        parts = [path]
    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    import itertools

    def _lines():
        for p in parts:
            with open(p) as f:
                yield from f

    for line in _lines():
        if True:
            ev = json.loads(line)
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                jobs[jid] = {
                    "start": ev["Submission Time"],
                    "desc": ev.get("Properties", {}).get(
                        "spark.job.description", ""
                    ),
                    "stages": [s["Stage ID"] for s in ev["Stage Infos"]],
                }
            elif e == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["end"] = ev["Completion Time"]
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                stages[si["Stage ID"]] = {
                    "name": si["Stage Name"],
                    "ntasks": si["Number of Tasks"],
                    "start": si.get("Submission Time"),
                    "end": si.get("Completion Time"),
                }
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                st = stages.setdefault(sid, {})
                m = ev.get("Task Metrics") or {}
                st["task_ms"] = st.get("task_ms", 0) + m.get(
                    "Executor Run Time", 0
                )
                st["gc_ms"] = st.get("gc_ms", 0) + m.get("JVM GC Time", 0)
                st["max_task_ms"] = max(
                    st.get("max_task_ms", 0), m.get("Executor Run Time", 0)
                )
                sr = m.get("Shuffle Read Metrics") or {}
                sw = m.get("Shuffle Write Metrics") or {}
                st["shuf_r"] = st.get("shuf_r", 0) + sr.get(
                    "Remote Bytes Read", 0
                ) + sr.get("Local Bytes Read", 0)
                st["shuf_w"] = st.get("shuf_w", 0) + sw.get(
                    "Shuffle Bytes Written", 0
                )

    for name, (t0, t1) in marks.items():
        print(f"\n=== {name}: wall {(t1 - t0) / 1000:.3f}s ===")
        sel = [
            (jid, j)
            for jid, j in sorted(jobs.items())
            if j.get("desc") == f"profile:{name}" and "end" in j
        ]
        prev_end = t0
        for jid, j in sel:
            gap = j["start"] - prev_end
            dur = j["end"] - j["start"]
            print(f"job {jid}: gap {gap:6.0f}ms  run {dur:6.0f}ms")
            for sid in sorted(j["stages"]):
                st = stages.get(sid)
                if not st or st.get("start") is None:
                    continue
                nm = (st.get("name") or "")[:60]
                print(
                    f"   stage {sid}: wall {st['end'] - st['start']:5.0f}ms"
                    f" tasks {st.get('ntasks', 0):3d}"
                    f" taskSum {st.get('task_ms', 0):6.0f}ms"
                    f" maxTask {st.get('max_task_ms', 0):5.0f}ms"
                    f" gc {st.get('gc_ms', 0):4.0f}ms"
                    f" shufR {st.get('shuf_r', 0):>8d}B"
                    f" shufW {st.get('shuf_w', 0):>8d}B  {nm}"
                )
            prev_end = j["end"]
        print(f"tail gap: {t1 - prev_end:6.0f}ms (last job end -> action return)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

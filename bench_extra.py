"""Extra benchmark harness for the optimization rounds (guide §1.4/§1.5).

NOT part of the frozen driver contract (`bench.py` is frozen): this file
exists so optimization work can (a) time individual queries with the
exact bench.py methodology (same session config, same warm-run +
best-of-3-with-clearCache protocol, same noop sink), (b) A/B test
session configs, and (c) attribute wall time to jobs/stages/tasks via
the Spark event log, which bench.py deliberately does not enable.

Usage:
    python bench_extra.py q1,q2,...            # time queries, report triples
    python bench_extra.py q1 --conf k=v ...    # with session conf overrides
    python bench_extra.py q1 --profile         # + event-log job/stage stats

Query names are the driver-contract names from __spark_entry__.queries().
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM_SF_DIR = os.environ.get("SPARK_GRAFT_WARM_SF_DIR",
                             "/root/testdata/sf0.001")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
EVENT_DIR = "/tmp/jtse_bench_extra_events"


def main() -> None:
    args = sys.argv[1:]
    names = args[0].split(",") if args and not args[0].startswith("-") \
        else []
    extra_conf = {}
    profile = "--profile" in args
    i = 0
    while i < len(args):
        if args[i] == "--conf":
            k, v = args[i + 1].split("=", 1)
            extra_conf[k] = v
            i += 2
        else:
            i += 1

    import shutil

    import __spark_entry__ as entry
    from json_time_series_extractor_spark.plans.session import get_spark

    if profile:
        shutil.rmtree(EVENT_DIR, ignore_errors=True)
        os.makedirs(EVENT_DIR, exist_ok=True)
        extra_conf.setdefault("spark.eventLog.enabled", "true")
        extra_conf.setdefault("spark.eventLog.dir", EVENT_DIR)

    spark = get_spark(app_name="jtse-bench-extra",
                      master=f"local[{CPUS}]",
                      shuffle_partitions=max(CPUS, 8),
                      extra_conf=extra_conf)

    # Same uncounted Python-worker warm as bench.py.
    def _warm(batches):
        import json_time_series_extractor_spark.core.gorilla  # noqa: F401
        import json_time_series_extractor_spark.operators.extract  # noqa
        for b in batches:
            yield b

    (spark.range(CPUS * 4).repartition(CPUS * 2)
     .mapInPandas(_warm, "id long").write.format("noop")
     .mode("overwrite").save())

    queries = entry.queries()
    if any(n.startswith("ann_") for n in names):
        entry._exact_topk_baseline(spark, SF_DIR)
        entry._exact_topk_baseline(spark, WARM_SF_DIR)

    triples: dict = {}
    for name in names:
        fn = queries[name]
        spark.sparkContext.setJobDescription(f"warm:{name}")
        (fn(spark, WARM_SF_DIR).write.format("noop")
         .mode("overwrite").save())
        spark.catalog.clearCache()
        runs = []
        for r in range(3):
            spark.sparkContext.setJobDescription(f"{name}#{r}")
            t0 = time.perf_counter()
            (fn(spark, SF_DIR).write.format("noop")
             .mode("overwrite").save())
            runs.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)
        triples[name] = runs
        print(json.dumps({"query": name, "runs": runs,
                          "best": min(runs)}), flush=True)

    print(json.dumps({"triples": triples,
                      "total_best": round(sum(min(r) for r in
                                              triples.values()), 3)}))
    spark.stop()
    if profile:
        _report_eventlog(names)


def _report_eventlog(names) -> None:
    """Aggregate the event log per job description prefix: job count,
    stage count, task count, task-time sum vs job wall."""
    logs = sorted(glob.glob(EVENT_DIR + "/*/events_*")
                  + [p for p in glob.glob(EVENT_DIR + "/*")
                     if os.path.isfile(p)], key=os.path.getmtime)
    if not logs:
        print("no event log found", file=sys.stderr)
        return
    per: dict = {}
    job_desc: dict = {}
    stage_to_job: dict = {}
    if logs[-1].endswith(".zstd"):
        import io
        import subprocess
        raw = subprocess.run(["zstd", "-dc", logs[-1]],
                             capture_output=True, check=True).stdout
        fh_ctx = io.StringIO(raw.decode("utf-8", "replace"))
    else:
        fh_ctx = open(logs[-1])
    with fh_ctx as fh:
        for line in fh:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                desc = (ev.get("Properties") or {}).get(
                    "spark.job.description", "")
                jid = ev["Job ID"]
                job_desc[jid] = desc
                key = desc.split("#")[0]
                d = per.setdefault(key, dict(jobs=0, stages=0, tasks=0,
                                             task_ms=0, wall_ms=0,
                                             shuffle_read=0,
                                             shuffle_write=0,
                                             _start={}))
                d["jobs"] += 1
                d["_start"][jid] = ev.get("Submission Time", 0)
                for sid in ev.get("Stage IDs", []):
                    stage_to_job[sid] = jid
            elif e == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                key = job_desc.get(jid, "").split("#")[0]
                d = per.get(key)
                if d and jid in d["_start"]:
                    d["wall_ms"] += (ev.get("Completion Time", 0)
                                     - d["_start"][jid])
            elif e == "SparkListenerStageCompleted":
                sid = ev["Stage Info"]["Stage ID"]
                jid = stage_to_job.get(sid)
                key = job_desc.get(jid, "").split("#")[0]
                d = per.get(key)
                if d:
                    d["stages"] += 1
                    d["tasks"] += ev["Stage Info"].get("Number of Tasks", 0)
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                jid = stage_to_job.get(sid)
                key = job_desc.get(jid, "").split("#")[0]
                d = per.get(key)
                if d:
                    ti = ev.get("Task Info", {})
                    d["task_ms"] += (ti.get("Finish Time", 0)
                                     - ti.get("Launch Time", 0))
                    tm = ev.get("Task Metrics") or {}
                    sr = (tm.get("Shuffle Read Metrics") or {})
                    sw = (tm.get("Shuffle Write Metrics") or {})
                    d["shuffle_read"] += (sr.get("Remote Bytes Read", 0)
                                          + sr.get("Local Bytes Read", 0))
                    d["shuffle_write"] += sw.get(
                        "Shuffle Bytes Written", 0)
    for key, d in sorted(per.items()):
        d.pop("_start", None)
        print(json.dumps({"desc": key, **d}))


if __name__ == "__main__":
    main()

"""Per-stage profiler for the scaling investigation.

Runs run_pipeline_fast at a given local-cluster executor count with Spark
event logging, then reduces the event log to a per-stage table:
  stage id/name, wall-clock, sum task runtime, sum executor CPU time,
  shuffle read/write bytes, input bytes, GC time, tasks.
Stages whose wall-clock refuses to shrink with 4x the executors are the
scaling bottleneck; sum-CPU vs sum-runtime separates real work from
contention/wait.

Usage: python scripts/profile_pipeline.py N_EXEC CORPUS_PATH [OUT_JSON]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

EXEC_CORES = 4
SHUFFLE_PARTITIONS = 32


def run(n_exec: int, corpus: str, out_json: str | None) -> None:
    os.environ["PYTHONPATH"] = REPO + os.pathsep + os.environ.get("PYTHONPATH", "")
    from rdf_indexes_spark.pipeline import run_pipeline_fast
    from rdf_indexes_spark.session import get_spark
    from rdf_indexes_spark.sources.transcripts import TRANSCRIPT_SCHEMA

    evdir = tempfile.mkdtemp(prefix=f"evlog_{n_exec}_")
    spark = get_spark(
        cores=n_exec * EXEC_CORES,
        shuffle_partitions=SHUFFLE_PARTITIONS,
        master=f"local-cluster[{n_exec},{EXEC_CORES},8192]",
        app_name=f"profile{n_exec}",
        driver_memory="6g",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{evdir}",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    # warm-up
    from rdf_indexes_spark.synth import generate

    warm = spark.createDataFrame(generate(5000, seed=9).transcripts)
    wd = tempfile.mkdtemp(prefix="prof_warm_", dir="/dev/shm")
    run_pipeline_fast(spark, warm, wd, num_partitions=SHUFFLE_PARTITIONS)
    shutil.rmtree(wd, ignore_errors=True)

    tr = spark.read.schema(TRANSCRIPT_SCHEMA).parquet(corpus)
    tr.count()
    out_dir = tempfile.mkdtemp(prefix="prof_perms_", dir="/dev/shm")
    t_epoch_ms = time.time() * 1000  # filter warm-up stages out of the report
    t0 = time.monotonic()
    counters = run_pipeline_fast(spark, tr, out_dir, num_partitions=SHUFFLE_PARTITIONS)
    elapsed = time.monotonic() - t0
    shutil.rmtree(out_dir, ignore_errors=True)
    spark.stop()
    time.sleep(1)

    stages = [s for s in parse_event_log(evdir, t0) if (s.get("sub") or 0) >= t_epoch_ms]
    result = {
        "n_exec": n_exec,
        "elapsed_sec": round(elapsed, 3),
        "counters": counters,
        "stages": stages,
    }
    print_table(result)
    if out_json:
        with open(out_json, "w") as f:
            json.dump(result, f)
    shutil.rmtree(evdir, ignore_errors=True)


def parse_event_log(evdir: str, t_start: float) -> list[dict]:
    rows = []
    files = []
    for dirpath, _, fns in os.walk(evdir):
        for fn in fns:
            if not fn.startswith("appstatus"):
                files.append(os.path.join(dirpath, fn))
    task_acc_all: dict[int, dict] = {}
    for path in files:
        task_acc = task_acc_all
        with open(path) as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                et = ev.get("Event")
                if et == "SparkListenerTaskEnd":
                    sid = ev["Stage ID"]
                    m = ev.get("Task Metrics") or {}
                    a = task_acc.setdefault(
                        sid,
                        {"run": 0, "cpu": 0, "gc": 0, "sr": 0, "sw": 0, "inp": 0, "tasks": 0, "spill": 0, "fetchwait": 0, "writetime": 0},
                    )
                    a["tasks"] += 1
                    a["run"] += m.get("Executor Run Time", 0)
                    a["cpu"] += m.get("Executor CPU Time", 0) / 1e6  # ns -> ms
                    a["gc"] += m.get("JVM GC Time", 0)
                    a["spill"] += m.get("Memory Bytes Spilled", 0)
                    srm = m.get("Shuffle Read Metrics") or {}
                    a["sr"] += srm.get("Remote Bytes Read", 0) + srm.get("Local Bytes Read", 0)
                    a["fetchwait"] += srm.get("Fetch Wait Time", 0)
                    swm = m.get("Shuffle Write Metrics") or {}
                    a["sw"] += swm.get("Shuffle Bytes Written", 0)
                    a["writetime"] += swm.get("Shuffle Write Time", 0) / 1e6
                    im = m.get("Input Metrics") or {}
                    a["inp"] += im.get("Bytes Read", 0)
                elif et == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    sid = si["Stage ID"]
                    sub = si.get("Submission Time")
                    com = si.get("Completion Time")
                    a = task_acc.get(sid, {})
                    rows.append(
                        {
                            "stage": sid,
                            "name": si.get("Stage Name", "")[:60],
                            "wall_ms": (com - sub) if sub and com else None,
                            "sub": sub,
                            "tasks": a.get("tasks", 0),
                            "run_ms": a.get("run", 0),
                            "cpu_ms": round(a.get("cpu", 0)),
                            "gc_ms": a.get("gc", 0),
                            "shuf_read_mb": round(a.get("sr", 0) / 1e6, 1),
                            "shuf_write_mb": round(a.get("sw", 0) / 1e6, 1),
                            "input_mb": round(a.get("inp", 0) / 1e6, 1),
                            "spill_mb": round(a.get("spill", 0) / 1e6, 1),
                            "fetchwait_ms": a.get("fetchwait", 0),
                            "shufwrite_ms": round(a.get("writetime", 0)),
                        }
                    )
    rows.sort(key=lambda r: r["stage"])
    return rows


def print_table(result: dict) -> None:
    print(f"\n== n_exec={result['n_exec']} elapsed={result['elapsed_sec']}s counters={result['counters']}")
    hdr = f"{'sid':>4} {'wall':>7} {'tasks':>5} {'runSum':>8} {'cpuSum':>8} {'gc':>6} {'sRead':>8} {'sWrite':>8} {'input':>8} {'spill':>7} {'fwait':>6} name"
    print(hdr)
    total_wall = 0
    for r in result["stages"]:
        if r["wall_ms"] is None:
            continue
        total_wall += r["wall_ms"]
        print(
            f"{r['stage']:>4} {r['wall_ms']:>6}m {r['tasks']:>5} {r['run_ms']:>7}m {r['cpu_ms']:>7}m {r['gc_ms']:>5}m "
            f"{r['shuf_read_mb']:>7}M {r['shuf_write_mb']:>7}M {r['input_mb']:>7}M {r['spill_mb']:>6}M {r['fetchwait_ms']:>5}m {r['name']}"
        )
    print(f"total stage wall: {total_wall}ms (serial sum; overlapping stages overcount)")


if __name__ == "__main__":
    n = int(sys.argv[1])
    corpus = sys.argv[2]
    run(n, corpus, sys.argv[3] if len(sys.argv) > 3 else None)

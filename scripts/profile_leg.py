#!/usr/bin/env python
"""Decompose one scaling-leg run into per-stage wall / busy / idle time.

The scaling bench (bench.py) measures T(c) = fixed + W/c; this tool
answers WHERE the fixed term lives. It runs the exact leg workload
(warmup + timed extraction at N cores) with the Spark event log on,
then replays the log: for every stage its wall span, summed task time
(busy core-seconds), and task count; plus the scheduling gaps no stage
covers. Single-task stages and inter-job gaps are the serial/fixed
suspects.

Usage: python scripts/profile_leg.py [cores] [docs]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_leg(cores: int, n_docs: int, evt_dir: str) -> float:
    import bench
    from pdf_context_extractor_agent_spark.session import get_spark, stop_spark

    # PROFILE_PIN=1 reproduces the bench's executor/driver split pinning
    # so the decomposition matches the timed scaling-leg conditions
    pin = os.environ.get("PROFILE_PIN", "0") == "1"
    stop_spark()
    spark = get_spark(
        app_name=f"profile{cores}",
        cores=cores,
        shuffle_partitions=cores * 2,
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.compress": "false",
            "spark.eventLog.dir": f"file://{evt_dir}",
        },
    )
    if pin:
        bench._pin_leg_split(cores)
    # tag the materialization jobs from INSIDE each driver thread:
    # pinned-thread mode means a job group set on the main Python
    # thread does not reach jobs submitted from worker threads
    orig = bench._materialize
    group = ["warm"]

    def tagged(df):
        import threading as _th

        tag = f"{group[0]}:{_th.current_thread().name}"
        df.sparkSession.sparkContext.setJobGroup(tag, tag)
        orig(df)

    bench._materialize = tagged
    bench.run_extraction(spark, 200, cores * 2, check_identity=False)
    if pin:
        bench._pin_leg_split(cores)  # catch workers spawned by the warmup
    t0 = time.monotonic()
    # PROFILE_PARTS: comma list of input partition counts, one timed
    # rep per entry; first entries can serve as JIT warm reps
    parts_list = [
        int(x)
        for x in os.environ.get(
            "PROFILE_PARTS", f"{cores * 4},{cores * 4}"
        ).split(",")
    ]
    for r, parts in enumerate(parts_list):
        group[0] = f"timed{r}_p{parts}"
        out = bench.run_extraction(spark, n_docs, parts, check_identity=False)
        print(
            f"rep {r} parts={parts}: leg secs: {out['secs']:.2f}", flush=True
        )
    stop_spark()
    if pin:
        bench._pin_tree(bench.ALL_CPUS)
    return t0


def parse_events(evt_dir: str, t0_wall: float, cores: int) -> None:
    # event log may be a flat file or a v2 directory (events_* parts)
    files = []
    for root, _dirs, names in os.walk(evt_dir):
        files += [
            os.path.join(root, n)
            for n in names
            if n.startswith("events") or n.startswith("local-")
        ]
    path = max(files, key=os.path.getmtime)
    stages = {}  # (stageId, attempt) -> dict
    jobs = {}
    task_time = {}
    with open(path) as f:
        for line in f:
            try:
                e = json.loads(line)
            except json.JSONDecodeError:
                continue
            ev = e.get("Event")
            if ev == "SparkListenerJobStart":
                jobs[e["Job ID"]] = {
                    "start": e["Submission Time"] / 1000.0,
                    "stages": [s["Stage ID"] for s in e["Stage Infos"]],
                    "group": (e.get("Properties") or {}).get("spark.jobGroup.id", ""),
                }
            elif ev == "SparkListenerJobEnd":
                if e["Job ID"] in jobs:
                    jobs[e["Job ID"]]["end"] = e["Completion Time"] / 1000.0
            elif ev == "SparkListenerStageCompleted":
                si = e["Stage Info"]
                if "Submission Time" not in si:
                    continue
                # RDD scope names identify the PLAN OPERATORS inside the
                # stage (WholeStageCodegen ids, Exchange, AQEShuffleRead,
                # mapInPandas …) — the callsite alone is useless in a
                # threaded driver
                scopes = []
                for rdd in si.get("RDD Info", ()):
                    sc = rdd.get("Scope")
                    if sc:
                        try:
                            nm = json.loads(sc).get("name", "")
                        except json.JSONDecodeError:
                            nm = ""
                        if nm and nm not in scopes:
                            scopes.append(nm)
                stages[si["Stage ID"]] = {
                    "name": si["Stage Name"].split("\n")[0][:70],
                    "ops": ",".join(scopes[:6])[:90],
                    "sub": si["Submission Time"] / 1000.0,
                    "done": si["Completion Time"] / 1000.0,
                    "tasks": si["Number of Tasks"],
                }
            elif ev == "SparkListenerTaskEnd":
                sid = e["Stage ID"]
                m = e.get("Task Metrics") or {}
                task_time[sid] = task_time.get(sid, 0.0) + m.get(
                    "Executor Run Time", 0
                ) / 1000.0

    groups = sorted(
        {v.get("group", "") for v in jobs.values() if v.get("group", "").startswith("timed")}
    )
    for g in groups:
        timed_jobs = {j: v for j, v in jobs.items() if v.get("group") == g and "end" in v}
        if not timed_jobs:
            continue
        w0 = min(v["start"] for v in timed_jobs.values())
        w1 = max(v["end"] for v in timed_jobs.values())
        wall = w1 - w0
        timed_stage_ids = sorted(
            {s for v in timed_jobs.values() for s in v["stages"] if s in stages and stages[s]["sub"] >= w0 - 1}
        )
        print(f"\n=== {g}: {wall:.2f}s wall at {cores} cores "
              f"({wall * cores:.0f} core-seconds capacity)")
        busy_total = 0.0
        print(f"{'stage':>5} {'tasks':>5} {'wall_s':>8} {'busy_cs':>8} {'util':>5}")
        for sid in timed_stage_ids:
            s = stages[sid]
            sw = s["done"] - s["sub"]
            busy = task_time.get(sid, 0.0)
            busy_total += busy
            util = busy / (sw * cores) if sw > 0 else 0
            print(
                f"{sid:>5} {s['tasks']:>5} {sw:>8.2f} {busy:>8.2f} {util:>5.0%}  "
                f"{s.get('ops') or s['name']}"
            )
        spans = sorted((stages[s]["sub"], stages[s]["done"]) for s in timed_stage_ids)
        covered, cur0, cur1 = 0.0, None, None
        for a, b in spans:
            if cur1 is None or a > cur1:
                if cur1 is not None:
                    covered += cur1 - cur0
                cur0, cur1 = a, b
            else:
                cur1 = max(cur1, b)
        if cur1 is not None:
            covered += cur1 - cur0
        print(f"busy core-seconds total: {busy_total:.1f} "
              f"(= {busy_total / cores:.2f}s perfectly parallel at {cores} cores); "
              f"util {busy_total / (wall * cores):.0%}; "
              f"stage-covered {covered:.2f}s; gaps {wall - covered:.2f}s")


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    docs = int(sys.argv[2]) if len(sys.argv) > 2 else 60000
    evt_dir = tempfile.mkdtemp(prefix=f"evt{cores}_")
    t0 = run_leg(cores, docs, evt_dir)
    parse_events(evt_dir, t0, cores)


if __name__ == "__main__":
    main()

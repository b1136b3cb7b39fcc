"""Per-stage JVM-CPU audit of the crawl workload (round-6 perf work).

Runs the bench crawl once at local[N] with the Spark event log enabled,
then aggregates executor CPU time / run time / task count per stage
callsite so the next CPU-µs/URL optimization target is MEASURED, not
guessed (PLANS.md r5: parse+envelope already staged; where does the rest
of the crawl's CPU go?).

Usage: python BENCH/cpu_audit.py [cpus] [n_pages] [rounds]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from collections import defaultdict

CPUS = int(sys.argv[1]) if len(sys.argv) > 1 else 8
PAGES = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
ROUNDS = int(sys.argv[3]) if len(sys.argv) > 3 else 2
ELOG = "/tmp/elog_audit"


def run_crawl_with_elog() -> None:
    import shutil

    shutil.rmtree(ELOG, ignore_errors=True)
    os.makedirs(ELOG, exist_ok=True)
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(CPUS),
        BENCH_CRAWL_PAGES=str(PAGES),
        BENCH_CRAWL_ROUNDS=str(ROUNDS),
        SPARK_GRAFT_CONF=(
            "spark.eventLog.enabled=true"
            f";spark.eventLog.dir={ELOG}"
            ";spark.eventLog.compress=false"
        ),
    )
    out = subprocess.run(
        [sys.executable, "bench.py", "--crawl-only"],
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        capture_output=True,
        text=True,
        check=True,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    print("run:", line)


def audit() -> None:
    logs = [os.path.join(ELOG, f) for f in os.listdir(ELOG)
            if not f.endswith(".inprogress")]
    assert logs, "no completed event log"
    log = max(logs, key=os.path.getmtime)
    if os.path.isdir(log):  # eventlog_v2 rolling layout: a dir of parts
        log_files = sorted(
            os.path.join(log, f)
            for f in os.listdir(log)
            if f.startswith("events_")
        )
    else:
        log_files = [log]
    per_stage: dict[int, dict] = {}
    stage_job: dict[int, str] = {}
    agg = defaultdict(lambda: [0.0, 0.0, 0, 0.0, 0.0])
    # [cpu_s, run_s, n_tasks, ser_s, gc_s] per callsite
    for lf in log_files:
        with open(lf) as fh:
          for raw in fh:
            ev = json.loads(raw)
            t = ev.get("Event")
            if t == "SparkListenerStageSubmitted":
                si = ev["Stage Info"]
                # label AQE/broadcast stages by their RDD scopes (operator
                # names), not the opaque CompletableFuture callsite
                scopes = []
                for rdd in si.get("RDD Info", []):
                    sc = rdd.get("Scope")
                    if sc:
                        nm = json.loads(sc).get("name", "")
                        if nm and nm not in scopes:
                            scopes.append(nm)
                label = (
                    si["Stage Name"].split(" at ")[0]
                    + ": "
                    + ">".join(reversed(scopes[:6]))
                )
                per_stage[si["Stage ID"]] = {
                    "name": si["Stage Name"].split(" at ")[0],
                    "site": label,
                }
            elif t == "SparkListenerJobStart":
                props = ev.get("Properties") or {}
                desc = props.get("spark.job.description") or props.get(
                    "callSite.short", ""
                )
                for sid in ev.get("Stage IDs", []):
                    stage_job[sid] = desc
            elif t == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                m = ev.get("Task Metrics") or {}
                site = (
                    f"[{stage_job.get(sid, '?')[:40]}] "
                    + per_stage.get(sid, {}).get("site", f"stage{sid}")
                )
                a = agg[site]
                a[0] += m.get("Executor CPU Time", 0) / 1e9
                a[1] += m.get("Executor Run Time", 0) / 1e3
                a[2] += 1
                a[3] += (
                    m.get("Result Serialization Time", 0)
                    + m.get("Executor Deserialize Time", 0)
                ) / 1e3
                a[4] += m.get("JVM GC Time", 0) / 1e3
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
    tot_cpu = sum(a[0] for a in agg.values())
    tot_run = sum(a[1] for a in agg.values())
    print(f"\ntotal task CPU {tot_cpu:.1f}s  run {tot_run:.1f}s  "
          f"({len(per_stage)} stages)")
    print(f"{'cpu_s':>8} {'cpu%':>5} {'run_s':>8} {'tasks':>6} "
          f"{'deser_s':>8} {'gc_s':>6}  callsite")
    for site, (cpu, run, n, ser, gc) in rows[:30]:
        print(f"{cpu:8.1f} {100 * cpu / tot_cpu:5.1f} {run:8.1f} {n:6d} "
              f"{ser:8.2f} {gc:6.1f}  {site[:90]}")


if __name__ == "__main__":
    run_crawl_with_elog()
    audit()

"""Per-thread-name JVM CPU breakdown of the crawl workload (round 6).

BENCH/cpu_audit.py showed task CPU (event-log Executor CPU Time) covers
only ~40% of the JVM process CPU during the bench crawl. This harness
attributes the rest: it runs the crawl in-process and samples
/proc/<jvmpid>/task/*/{comm,stat} before/after, aggregating utime+stime
deltas by thread-name prefix (Executor task threads vs C2/C1 JIT
compiler threads vs GC workers vs netty/shuffle vs the main/driver
thread running Catalyst).

Usage: python BENCH/thread_audit.py [cpus] [n_pages] [rounds]
"""

from __future__ import annotations

import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(sys.argv[1]) if len(sys.argv) > 1 else 8
PAGES = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
ROUNDS = int(sys.argv[3]) if len(sys.argv) > 3 else 2

_GROUPS = [
    (re.compile(r"^Executor task"), "executor-tasks"),
    (re.compile(r"^C2 |^C1 |^Compiler"), "jit-compiler"),
    (re.compile(r"^GC |^G1 |^ZGC|^Parallel GC"), "gc"),
    (re.compile(r"^shuffle-|^netty|^rpc-|^dispatcher"), "netty-rpc"),
    (re.compile(r"^qtp|^SparkUI"), "ui"),
    (re.compile(r"^main$"), "main-driver"),
    (re.compile(r"^dag-scheduler"), "dag-scheduler"),
    (re.compile(r"^VM Thread|^VM Periodic"), "vm"),
    (re.compile(r"^parquet|^ForkJoinPool"), "forkjoin-parquet"),
]


def _jvm_pid() -> int:
    pids = []
    for pid in os.listdir("/proc"):
        if pid.isdigit():
            try:
                with open(f"/proc/{pid}/comm") as f:
                    if f.read().strip() == "java":
                        pids.append(int(pid))
            except OSError:
                pass
    assert len(pids) == 1, f"expected exactly one JVM, saw {pids}"
    return pids[0]


def _sample(pid: int) -> dict[int, tuple[str, float]]:
    clk = os.sysconf("SC_CLK_TCK")
    out = {}
    base = f"/proc/{pid}/task"
    for tid in os.listdir(base):
        try:
            with open(f"{base}/{tid}/comm") as f:
                comm = f.read().strip()
            with open(f"{base}/{tid}/stat") as f:
                parts = f.read().rsplit(")", 1)[1].split()
            out[int(tid)] = (comm, (int(parts[11]) + int(parts[12])) / clk)
        except OSError:
            continue
    return out


def group_of(comm: str) -> str:
    for rx, g in _GROUPS:
        if rx.search(comm):
            return g
    return f"other:{comm[:24]}"


def main() -> None:
    os.environ["SPARK_GRAFT_CPUS"] = str(CPUS)
    os.environ["BENCH_CRAWL_PAGES"] = str(PAGES)
    os.environ["BENCH_CRAWL_ROUNDS"] = str(ROUNDS)
    import bench
    from colymer_acquirers_spark.session import get_spark

    bench._use_tmpfs_dirs()
    spark = get_spark(app_name="thread_audit", master=f"local[{CPUS}]")
    spark.range(1).count()  # force JVM up
    pid = _jvm_pid()
    before = _sample(pid)

    # short-lived threads (AQE query-stage pools, broadcast threads, …)
    # exit before a final sample can see them — poll continuously and keep
    # the max CPU ever observed per tid
    import threading

    seen: dict[int, tuple[str, float]] = {}
    stop = threading.Event()

    def poller() -> None:
        while not stop.is_set():
            for tid, (comm, t) in _sample(pid).items():
                prev = seen.get(tid)
                if prev is None or t > prev[1]:
                    seen[tid] = (comm, t)
            stop.wait(0.2)

    th = threading.Thread(target=poller, daemon=True)
    th.start()
    wall, urls, cpu = bench._crawl_bench(spark)
    stop.set()
    th.join()
    for tid, (comm, t) in _sample(pid).items():
        prev = seen.get(tid)
        if prev is None or t > prev[1]:
            seen[tid] = (comm, t)

    agg: dict[str, float] = defaultdict(float)
    for tid, (comm, t1) in seen.items():
        t0 = before.get(tid, (comm, 0.0))[1]
        agg[group_of(comm)] += t1 - t0
    # threads that died mid-run are lost to /proc; report the residual
    # against the process-level counter so nothing hides
    tot = sum(agg.values())
    print(f"\ncrawl: {urls} urls, wall {wall:.1f}s, process-CPU {cpu:.1f}s, "
          f"thread-sum {tot:.1f}s (residual {cpu - tot:.1f}s = exited threads)")
    for g, s in sorted(agg.items(), key=lambda kv: -kv[1]):
        if s > 0.3:
            print(f"{s:8.1f}s  {100 * s / cpu:5.1f}%  {g}")
    spark.stop()


if __name__ == "__main__":
    main()

"""Task-concurrency timeline of a WARM crawl (2nd in one JVM) from the
event log: how much wall time has ZERO running tasks (driver-only
planning/commit gaps) vs full concurrency. Quantifies the Amdahl serial
fraction behind the N->4N wall-efficiency cap (PLANS.md round-6 audit).

Usage: python BENCH/gap_audit.py [cpus]
"""
import json, os, shutil, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
CPUS = int(sys.argv[1]) if len(sys.argv) > 1 else 32
ELOG = "/tmp/elog_gap"
shutil.rmtree(ELOG, ignore_errors=True); os.makedirs(ELOG)
os.environ["SPARK_GRAFT_CPUS"] = str(CPUS)
os.environ["SPARK_GRAFT_CONF"] = (
    "spark.eventLog.enabled=true;spark.eventLog.compress=false;"
    "spark.eventLog.dir=" + ELOG)
import bench
from colymer_acquirers_spark.session import get_spark
bench._use_tmpfs_dirs()
os.environ.pop("SPARK_GRAFT_CONF", None)  # _use_tmpfs_dirs appended; rebuild
os.environ["SPARK_GRAFT_CONF"] = (
    "spark.eventLog.enabled=true;spark.eventLog.compress=false;"
    "spark.eventLog.dir=" + ELOG
    + ";spark.local.dir=/dev/shm/spark-local")
spark = get_spark(app_name="gap_audit", master=f"local[{CPUS}]")
w1 = bench._crawl_bench(spark)
t0 = time.time() * 1000
w2 = bench._crawl_bench(spark)
t1 = time.time() * 1000
print(f"cold: wall={w1[0]:.1f}s urls={w1[1]} cpu={w1[2]:.1f}s")
print(f"warm: wall={w2[0]:.1f}s urls={w2[1]} cpu={w2[2]:.1f}s")
spark.stop()

logs = [os.path.join(ELOG, f) for f in os.listdir(ELOG) if not f.endswith(".inprogress")]
log = max(logs, key=os.path.getmtime)
files = ([os.path.join(log, f) for f in sorted(os.listdir(log)) if f.startswith("events_")]
         if os.path.isdir(log) else [log])
ivs = []
import io, subprocess
def _reader(p):
    if p.endswith(".zstd"):
        out = subprocess.run(["zstd", "-dc", p], capture_output=True, check=True)
        return io.StringIO(out.stdout.decode())
    return open(p)
for lf in files:
    for raw in _reader(lf):
        ev = json.loads(raw)
        if ev.get("Event") == "SparkListenerTaskEnd":
            ti = ev["Task Info"]
            s, e = ti["Launch Time"], ti["Finish Time"]
            if e > t0 and s < t1:
                ivs.append((max(s, t0), min(e, t1)))
ivs.sort()
# busy-time union + concurrency histogram via sweep
events = []
for s, e in ivs:
    events.append((s, 1)); events.append((e, -1))
events.sort()
busy = 0.0; conc_time = {}
cur = 0; last = t0
for t, d in events:
    dt = (t - last) / 1000
    conc_time[cur] = conc_time.get(cur, 0) + dt
    cur += d; last = t
conc_time[cur] = conc_time.get(cur, 0) + max(0, (t1 - last) / 1000)
wall = (t1 - t0) / 1000
idle = conc_time.get(0, 0)
print(f"\nwarm-crawl window: wall {wall:.1f}s, ZERO-running-task (driver-only) time {idle:.1f}s ({100*idle/wall:.0f}%)")
lowpar = sum(v for k, v in conc_time.items() if 1 <= k <= max(1, CPUS // 8))
print(f"time at 1..{CPUS//8} running tasks: {lowpar:.1f}s ({100*lowpar/wall:.0f}%)")
avg_conc = sum(k * v for k, v in conc_time.items()) / wall
print(f"avg running tasks: {avg_conc:.1f} of {CPUS}")
top = sorted(conc_time.items(), key=lambda kv: -kv[1])[:8]
print("top concurrency buckets (tasks: seconds):", [(k, round(v,1)) for k,v in top])

"""Alternating cold A/B: r6 code vs r7 code, warm-crawl wall + JVM CPU.

Evidence for the round-7 alternative scaling gate: the driver-share fix
(lazy rank offsets + one progressive write pool + plan-fragment reuse)
must show >=10% warm-wall reduction in ADJACENT-IN-TIME pairs on this
noisy box (pairwise A/B is the only trustworthy instrument here — see
round-6 notes). Each run: fresh JVM at local[32], bench headline config
(200k pages x words12, 3 rounds), one cold crawl then one warm crawl;
the WARM numbers are the comparison (codegen/JIT fully warmed, so the
delta isolates the driver-share change, not compilation).

Usage: python BENCH/ab_driver_gap.py [pairs] [old_repo_dir]
Writes BENCH/ab_driver_gap_results.json.
"""
import json
import os
import subprocess
import sys

PAIRS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
OLD = sys.argv[2] if len(sys.argv) > 2 else "/tmp/r6_repo"
NEW = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PROBE = r"""
import json, os, sys, time
sys.path.insert(0, os.getcwd())
import bench
from colymer_acquirers_spark.session import get_spark
bench._use_tmpfs_dirs()
spark = get_spark(app_name="ab_gap", master="local[32]")
cold = bench._crawl_bench(spark)
warm = bench._crawl_bench(spark)
spark.stop()
print("RESULT " + json.dumps({
    "cold_wall": round(cold[0], 2), "warm_wall": round(warm[0], 2),
    "urls": warm[1], "warm_cpu": round(warm[2], 1)}))
"""


def run(repo: str) -> dict:
    r = subprocess.run(
        [sys.executable, "-c", PROBE],
        cwd=repo,
        capture_output=True,
        text=True,
        env=dict(os.environ, SPARK_GRAFT_CPUS="32"),
    )
    line = [ln for ln in r.stdout.splitlines() if ln.startswith("RESULT ")]
    if not line:
        raise RuntimeError(r.stdout[-2000:] + r.stderr[-2000:])
    return json.loads(line[-1][len("RESULT "):])


def main():
    rows = []
    for p in range(PAIRS):
        for tag, repo in (("r6", OLD), ("r7", NEW)):
            res = run(repo)
            res["code"] = tag
            res["pair"] = p
            rows.append(res)
            print(res, flush=True)
    pairs = []
    for p in range(PAIRS):
        old = next(r for r in rows if r["pair"] == p and r["code"] == "r6")
        new = next(r for r in rows if r["pair"] == p and r["code"] == "r7")
        pairs.append(
            {
                "pair": p,
                "warm_wall_r6": old["warm_wall"],
                "warm_wall_r7": new["warm_wall"],
                "wall_delta_pct": round(
                    100 * (new["warm_wall"] - old["warm_wall"]) / old["warm_wall"], 1
                ),
                "warm_cpu_r6": old["warm_cpu"],
                "warm_cpu_r7": new["warm_cpu"],
            }
        )
    out = {"runs": rows, "pairs": pairs}
    path = os.path.join(NEW, "BENCH", "ab_driver_gap_results.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(pairs, indent=1))


if __name__ == "__main__":
    main()

"""Alternating cold A/B: pre-fix (8d128c1) vs post-fix (HEAD) crawl CPU/URL.

Each run is a fresh subprocess `python bench.py --crawl-only` at local[32],
bench cold config (200k pages, 3 rounds). Levels alternate A,B,A,B,A,B so
both see the same box weather (r5 protocol).
"""
import json, os, subprocess, sys

CONFIGS = [("pre", "/tmp/ab_prefix"), ("post", "/root/repo")]
N = int(sys.argv[1]) if len(sys.argv) > 1 else 3
res = {k: [] for k, _ in CONFIGS}
for rep in range(N):
    for name, repo in CONFIGS:
        env = dict(os.environ, SPARK_GRAFT_CPUS="32")
        r = subprocess.run([sys.executable, "bench.py", "--crawl-only"],
                           env=env, capture_output=True, text=True, cwd=repo)
        lines = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
        if not lines:
            print(name, "FAILED", r.stdout[-500:], r.stderr[-1500:]); continue
        d = json.loads(lines[-1])
        res[name].append(d)
        print(f"rep{rep} {name}: urls/s={d['crawl_urls_per_sec']} cpu_us/url={d['crawl_cpu_us_per_url']}", flush=True)
for name, rows in res.items():
    if rows:
        cpus = [d["crawl_cpu_us_per_url"] for d in rows]
        tps = [d["crawl_urls_per_sec"] for d in rows]
        print(f"{name}: cpu_us/url median={sorted(cpus)[len(cpus)//2]} all={cpus}  urls/s all={tps}")

#!/usr/bin/env python
"""Benchmark harness.

Default mode: runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": <crawl URLs/sec>, "unit": "urls/sec",
   "suite_sec": <total>, "queries": {name: sec, ...}, "sf": ...,
   "crawl_urls_per_sec": <north-metric throughput>}

--scaling mode: runs the crawl benchmark at local[2] and local[8] (N and 4N
cores — the sandbox proxy for N vs 4N executors, BASELINE.md protocol), each
level CPU-affinity-pinned to exactly its core budget, in fresh subprocesses,
and writes BENCH/BASELINE.md with both throughputs, the wall scaling
efficiency, and the steal-independent CPU-work witness.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

CRAWL_PAGES = int(os.environ.get("BENCH_CRAWL_PAGES", "200000"))
CRAWL_SEEDS = int(os.environ.get("BENCH_CRAWL_SEEDS", "20000"))
CRAWL_ROUNDS = int(os.environ.get("BENCH_CRAWL_ROUNDS", "3"))
CRAWL_BUDGET = int(os.environ.get("BENCH_CRAWL_BUDGET", "20000"))
# realistic page size: ~12x the unit-fixture body → a few KB of html per
# page, so parse work (core-scalable) dominates fixed per-round costs
CRAWL_WORDS_MULT = int(os.environ.get("BENCH_CRAWL_WORDS_MULT", "12"))


def _use_tmpfs_dirs() -> None:
    """Put Spark shuffle/local files AND the bench's crawl workdirs on
    tmpfs (/dev/shm) when available. On this box /tmp is backed by the
    single shared virtual disk; routing high-parallelism shuffle+output IO
    through it measures the disk queue, not the engine — a real cluster
    gives every executor node its own local disks (the same reasoning as
    the per-node memory-bandwidth note in BENCH/BASELINE.md)."""
    if not os.path.isdir("/dev/shm"):
        return
    os.makedirs("/dev/shm/spark-local", exist_ok=True)
    os.makedirs("/dev/shm/benchtmp", exist_ok=True)
    prev = os.environ.get("SPARK_GRAFT_CONF", "")
    if "spark.local.dir" not in prev:
        os.environ["SPARK_GRAFT_CONF"] = (
            (prev + ";" if prev else "") + "spark.local.dir=/dev/shm/spark-local"
        )
    os.environ.setdefault("TMPDIR", "/dev/shm/benchtmp")
    tempfile.tempdir = None  # re-evaluate TMPDIR on next mkdtemp


def _jvm_cpu_seconds() -> float:
    """utime+stime of the local-mode JVM (driver+executors in one process).

    Steal-independent: /proc CPU accounting counts only cycles actually
    granted to the VM, so cpu-per-URL comparisons across parallelism levels
    are immune to host contention."""
    clk = os.sysconf("SC_CLK_TCK")
    total = 0.0
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/comm") as f:
                if f.read().strip() != "java":
                    continue
            with open(f"/proc/{pid}/stat") as f:
                parts = f.read().rsplit(")", 1)[1].split()
            total += (int(parts[11]) + int(parts[12])) / clk  # utime, stime
        except OSError:
            continue
    return total


def _crawl_bench(spark) -> tuple[float, int, float]:
    """North-metric workload: URLs scheduled+parsed over a synthetic frontier.

    Returns (wall_sec, urls_processed, jvm_cpu_sec)."""
    from pyspark.sql import functions as F

    from colymer_acquirers_spark.plans.crawl import run_crawl
    from colymer_acquirers_spark.sources.synth import (
        synth_pages,
        synth_politeness,
        synth_robots,
        synth_seeds,
    )

    from colymer_acquirers_spark.operators.politeness import budget_from_delay

    pages = synth_pages(spark, CRAWL_PAGES, words_mult=CRAWL_WORDS_MULT)
    seeds = synth_seeds(spark, CRAWL_SEEDS)
    # r04 protocol: budgets are DERIVED from heterogeneous crawl delays
    # (budget_from_delay — the politeness window now exercises per-host
    # budget skew at scale, VERDICT r3 #8) instead of one flat constant.
    # Host delay multipliers {2, 1, 2/3} → budgets {B/2, B, 1.5B} with the
    # same mean B = BENCH_CRAWL_BUDGET, so total scheduled work stays at
    # the r03 level while the window ranks against non-uniform limits.
    mult = F.element_at(
        F.array(F.lit(2.0), F.lit(1.0), F.lit(2.0 / 3.0)),
        F.pmod(F.xxhash64("host"), F.lit(3)).cast("int") + 1,
    )
    politeness = budget_from_delay(
        synth_politeness(spark).withColumn("crawl_delay_s", mult),
        round_seconds=float(CRAWL_BUDGET),
    )
    robots = synth_robots(spark)
    workdir = tempfile.mkdtemp(prefix="bench_crawl_")
    cpu0 = _jvm_cpu_seconds()
    t0 = time.monotonic()
    summary = run_crawl(
        spark, pages, seeds, politeness, robots, workdir,
        max_rounds=CRAWL_ROUNDS, metrics_full=False,
    )
    wall = time.monotonic() - t0
    cpu = _jvm_cpu_seconds() - cpu0
    shutil.rmtree(workdir, ignore_errors=True)
    return wall, summary["rank_total"], cpu


def run_bench() -> dict:
    # the driver-contract catalog (superset of colymer_acquirers_spark.
    # queries — includes the composition entries registered there)
    from __spark_entry__ import queries
    from colymer_acquirers_spark.session import get_spark

    _use_tmpfs_dirs()
    spark = get_spark(app_name="bench", master=f"local[{CPUS}]")
    results: dict[str, float] = {}

    # best-of-N headline: this box shows transient host contention (same
    # code measured 4350 and 1174 urls/s two hours apart; JVM-CPU/wall
    # collapsed from ~15 to ~5.5 effective cores during the slow run) —
    # a single sample conflates engine speed with whoever else is on the
    # hypervisor. All runs are reported alongside the best.
    repeats = int(os.environ.get("BENCH_CRAWL_REPEAT", "2"))
    crawl_runs = [_crawl_bench(spark) for _ in range(max(1, repeats))]
    crawl_wall, crawl_urls, crawl_cpu = min(crawl_runs, key=lambda r: r[0])
    results["crawl_3rounds"] = round(crawl_wall, 3)

    headline = [
        "fetch_join_revenue",
        "seen_anti_join",
        "politeness_window_rank",
        "argmax_best_variant",
        "explode_word_count",
        "minhash_signature",
        # r6 rename: the r1-r5 ann_cosine_topk / ngram_jaccard_dfcap /
        # token_count_bpe keys became variant-merged entries when the
        # catalog was consolidated to fit the driver's 50-entry window —
        # each merged entry is a strict superset of its old key's work
        "ann_topk_variants",
        "crawl_one_round_schedule",
        "dedup_exact_hash",
        # round-3 additions (new keys only — earlier keys stay comparable
        # across rounds): dedup/text-analysis families at sf scale
        "simhash16",
        "ngram_jaccard_variants",
        "token_counts",
        "repetition_signals",
        # round-4 additions: the flagship dedup COMPOSITIONS (LSH
        # candidates → exact-verify; pair edges → connected components) —
        # these exercise the explicit-width expansion joins at sf scale
        "minhash_near_dups_verified",
        "near_dup_clusters",
        # corpus-selection family (broadcast eval-shingle decontamination)
        "decontamination_flags",
        # round-5 additions: corpus-cleaning family
        "line_dedup_clean",
        "pii_redaction",
        # round-6 addition: the composed end-to-end training-data product
        # (crawl → clean → dedup → components → keep → split)
        "corpus_pipeline",
    ]
    # r05 protocol (VERDICT r4 #4): per-query numbers are the MEDIAN of
    # BENCH_QUERY_REPEAT executions — r04's single-run table drifted
    # +10-45% on untouched code purely from box weather, making the
    # round-over-round trend unreadable. All runs are kept alongside
    # (queries_runs); the first run of each list is the cold/planning one.
    qrepeat = max(1, int(os.environ.get("BENCH_QUERY_REPEAT", "3")))
    qmap = queries()
    query_runs: dict[str, list[float]] = {}
    for name in headline:
        runs = []
        for _ in range(qrepeat):
            t0 = time.monotonic()
            df = qmap[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.monotonic() - t0, 3))
        query_runs[name] = runs
        results[name] = sorted(runs)[len(runs) // 2]

    total = round(sum(results.values()), 3)
    return {
        "metric": "URLs scheduled+parsed/sec on a synthetic Common-Crawl frontier",
        "value": round(crawl_urls / crawl_wall, 1) if crawl_wall else 0,
        "unit": "urls/sec",
        "suite_sec": total,
        "queries": results,
        "queries_repeat": qrepeat,
        "queries_runs": query_runs,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "crawl_urls": crawl_urls,
        "crawl_wall_sec": round(crawl_wall, 3),
        "crawl_urls_per_sec": round(crawl_urls / crawl_wall, 1) if crawl_wall else 0,
        "crawl_cpu_sec": round(crawl_cpu, 1),
        # cold-vs-cold trend line across rounds: the FIRST run is the only
        # one free of warm-JVM/JIT/page-cache effects — compare this field
        # round-over-round, never the best-of-N headline (VERDICT r3 #3/#4)
        "crawl_first_run_urls_per_sec": (
            round(crawl_runs[0][1] / crawl_runs[0][0], 1)
            if crawl_runs[0][0]
            else 0
        ),
        "crawl_runs_urls_per_sec": [
            round(u / w, 1) if w else 0 for w, u, _ in crawl_runs
        ],
        "cpus": int(CPUS),
    }


SCALE_N = int(os.environ.get("BENCH_SCALE_N", "2"))
SCALE_4N = int(os.environ.get("BENCH_SCALE_4N", "8"))
SCALE_REPEAT = int(os.environ.get("BENCH_SCALE_REPEAT", "2"))


def _baseline_worker(args):
    """One pinned worker: run the engine's frozen text-strip regex over its
    shard of the corpus. Pure CPython `re` in a separate process — no JVM,
    no Spark, no shared interpreter; only the box is shared."""
    shard, cpu_id, corpus_path, n_workers = args
    os.sched_setaffinity(0, {cpu_id})
    import pandas as pd

    from colymer_acquirers_spark.functions.parse import extract_text_series

    with open(corpus_path, "rb") as f:
        pages = f.read().split(b"\x00")
    mine = pd.Series([p.decode() for p in pages[shard::n_workers]])
    t0 = time.monotonic()
    extract_text_series(mine)
    return len(mine), time.monotonic() - t0


def regex_bandwidth_baseline(
    n_pages: int = 24_000, body_words: int = 700
) -> dict:
    """Same-box NON-SPARK control for the scaling gate: the identical
    frozen-rule regex pass (``_STRIP_ALL_RE`` + entity decode + ws
    collapse) over an equivalent html corpus, run by N independent
    CPython processes each pinned to its own core. No JVM, no shuffle,
    no driver — if THIS shows sub-linear N→4N scaling too, the shortfall
    is the box's memory bandwidth, not the engine's plans."""
    from multiprocessing import get_context

    words = ("alpha beta gamma delta epsilon zeta eta theta iota kappa " * (body_words // 10))
    corpus_path = os.path.join(tempfile.gettempdir(), "bw_corpus.bin")
    if not os.path.exists(corpus_path):
        pages = []
        for i in range(n_pages):
            pages.append(
                f'<html><head><title>Page {i}</title>'
                f'<meta name="author" content="Author {i % 50}">'
                f"<style>p{{color:red}}</style></head><body><p>{words} {i}</p>"
                f'<a href="/p/{i}">[0]</a><img src="/m/i{i}.jpg">'
                f"<script>var x = 1 < {i};</script></body></html>"
            )
        with open(corpus_path, "wb") as f:
            f.write(b"\x00".join(p.encode() for p in pages))
    out = {}
    ctx = get_context("spawn")
    for n_workers in (SCALE_N, SCALE_4N):
        best = 0.0
        for _ in range(SCALE_REPEAT):
            t0 = time.monotonic()
            with ctx.Pool(n_workers) as pool:
                res = pool.map(
                    _baseline_worker,
                    [(i, i, corpus_path, n_workers) for i in range(n_workers)],
                )
            wall = time.monotonic() - t0
            total = sum(n for n, _ in res)
            best = max(best, total / wall)
        out[n_workers] = round(best, 1)
    out["efficiency"] = round(
        (out[SCALE_4N] / out[SCALE_N]) / (SCALE_4N / SCALE_N), 3
    )
    return out


SCALE_SESSIONS = int(os.environ.get("BENCH_SCALE_SESSIONS", "3"))


def _skew_md(sessions, uniform_session) -> str:
    """Skew-sensitivity section for BENCH/BASELINE.md (VERDICT r6 #5)."""
    if uniform_session is None:
        return ""
    s0 = sessions[0]
    return f"""
**Host-skew sensitivity (30%-single-host fixture vs uniform hosts):**
the HEADLINE workload above already carries the hard fixture — synth
assigns ~30% of all URLs to host0 (SURVEY §7.4.5), so the W1 two-phase
politeness window and AQE skew joins are exercised by every session. A
paired UNIFORM-host session (`SPARK_GRAFT_HOT_HOST_PCT=0`, run adjacent
in time to session 0) isolates what the skew costs at scale-up:

| fixture | URLs/s @local[{SCALE_N}] | URLs/s @local[{SCALE_4N}] | wall eff | CPU-work eff |
|---|---|---|---|---|
| skewed 30% (session 0, headline fixture) | {s0["out"][SCALE_N]["crawl_urls_per_sec"]} | {s0["out"][SCALE_4N]["crawl_urls_per_sec"]} | {s0["eff"]:.3f} | {s0["cpu_eff"]:.3f} |
| uniform hosts (paired) | {uniform_session["out"][SCALE_N]["crawl_urls_per_sec"]} | {uniform_session["out"][SCALE_4N]["crawl_urls_per_sec"]} | {uniform_session["eff"]:.3f} | {uniform_session["cpu_eff"]:.3f} |

Skewed-vs-uniform wall-efficiency gap:
**{(abs(s0["eff"] - uniform_session["eff"]) / uniform_session["eff"] * 100 if uniform_session["eff"] else 0):.1f}%**
(target: within 10% — the salted two-phase window keeps a hot host from
serializing rank work into one task, so skew should cost throughput, not
scaling efficiency).
"""


def run_scaling() -> None:
    """N vs 4N cores on the same crawl input (BASELINE.md protocol).

    Levels are affinity-pinned (see run_crawl_only): "N cores" means N
    cores even for the JVM's GC/JIT/IO threads. local[2] vs local[8] keeps
    both levels inside measured host capacity (a pure-CPU burn scales
    1→8 procs at 0.99 on this box; 32 threads degrade to 0.76).
    Best-of-SCALE_REPEAT per level damps the ±15-20%% run variance.

    r04 (VERDICT r3 #3): the whole N/4N protocol runs SCALE_SESSIONS
    times; the HEADLINE is the MEDIAN session's wall efficiency, with
    best/worst alongside — one quiet (or noisy) hour on this shared box
    no longer decides the number.
    """
    # scaling-specific workload: bigger rounds + realistic page sizes so the
    # core-scalable work (parse/join/dedup) dominates per-round fixed costs
    os.environ.setdefault("BENCH_CRAWL_PAGES", "400000")
    os.environ.setdefault("BENCH_CRAWL_SEEDS", "100000")
    os.environ.setdefault("BENCH_CRAWL_BUDGET", "200000")
    os.environ.setdefault("BENCH_CRAWL_ROUNDS", "2")
    os.environ.setdefault("BENCH_CRAWL_WORDS_MULT", "25")
    # identical plans at both levels: pin shuffle partitioning to the 4N
    # width so only the executor-thread count varies
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE", str(SCALE_4N))
    pages = int(os.environ["BENCH_CRAWL_PAGES"])
    seeds = int(os.environ["BENCH_CRAWL_SEEDS"])
    budget = int(os.environ["BENCH_CRAWL_BUDGET"])
    rounds = int(os.environ["BENCH_CRAWL_ROUNDS"])
    def _run_session(s, extra_env=None, tag=""):
        out: dict[int, dict] = {}
        runs: dict[int, list] = {}
        # INTERLEAVE the levels (N, 4N, N, 4N) instead of running each
        # level's repeats back-to-back (r5 protocol fix): the box's granted
        # capacity drifts on ~10-minute scales, and a block design lets one
        # level land entirely inside a fast window — r5 measured a session
        # whose local[2] block ran 25% faster than every other session's
        # (1088 vs ~1450 CPU-µs/URL) and printed eff=0.594 with the SAME
        # code that scored 0.79 twice an hour earlier. Adjacent-in-time
        # levels see the same weather, so the ratio measures the engine.
        for rep in range(SCALE_REPEAT):
            for cpus in (SCALE_N, SCALE_4N):
                env = dict(
                    os.environ, SPARK_GRAFT_CPUS=str(cpus), BENCH_AFFINITY="1"
                )
                env.update(extra_env or {})
                r = subprocess.run(
                    [sys.executable, __file__, "--crawl-only"],
                    env=env,
                    capture_output=True,
                    text=True,
                    cwd=REPO,
                )
                line = [
                    ln for ln in r.stdout.splitlines() if ln.startswith("{")
                ][-1]
                res = json.loads(line)
                runs.setdefault(cpus, []).append(res["crawl_urls_per_sec"])
                best = out.get(cpus)
                if (
                    best is None
                    or res["crawl_urls_per_sec"] > best["crawl_urls_per_sec"]
                ):
                    out[cpus] = res
                print(f"session {s}{tag} local[{cpus}]: {res}", file=sys.stderr)
        tn = out[SCALE_N]["crawl_urls_per_sec"]
        t4n = out[SCALE_4N]["crawl_urls_per_sec"]
        cpu_n = out[SCALE_N].get("crawl_cpu_us_per_url", 0)
        cpu_4n = out[SCALE_4N].get("crawl_cpu_us_per_url", 0)
        sess = {
            "out": out,
            "runs": runs,
            "eff": (t4n / tn) / (SCALE_4N / SCALE_N) if tn else 0.0,
            "cpu_eff": (cpu_n / cpu_4n) if cpu_4n else 0.0,
        }
        print(f"session {s}{tag}: eff={sess['eff']:.3f}", file=sys.stderr)
        return sess

    sessions: list[dict] = []
    # skew-sensitivity pair (VERDICT r6 #5): the DEFAULT workload already
    # IS the 30%-single-host fixture (synth HOT_HOST_PCT=30 — the W1
    # two-phase window + AQE skew joins run in every headline session);
    # one extra session per protocol run flattens the hosts
    # (SPARK_GRAFT_HOT_HOST_PCT=0) so BASELINE.md can show skewed-vs-
    # uniform efficiency side by side.
    uniform_session = None
    n_uniform = int(os.environ.get("BENCH_SCALE_UNIFORM_SESSIONS", "1"))
    for s in range(max(1, SCALE_SESSIONS)):
        sessions.append(_run_session(s))
        if s < n_uniform:
            uniform_session = _run_session(
                s, extra_env={"SPARK_GRAFT_HOT_HOST_PCT": "0"}, tag="-uniform"
            )
    by_eff = sorted(sessions, key=lambda x: x["eff"])
    # even session counts: med_eff is the statistical median (mean of the
    # middle two) and the displayed session is the LOWER middle, so the
    # detailed table never looks better than the headline number
    med = by_eff[(len(by_eff) - 1) // 2]
    if len(by_eff) % 2 == 0:
        med_eff = (
            by_eff[len(by_eff) // 2 - 1]["eff"] + by_eff[len(by_eff) // 2]["eff"]
        ) / 2
    else:
        med_eff = med["eff"]
    out, runs, eff, cpu_eff = med["out"], med["runs"], med["eff"], med["cpu_eff"]
    tn, t4n = out[SCALE_N]["crawl_urls_per_sec"], out[SCALE_4N]["crawl_urls_per_sec"]
    cpu_n = out[SCALE_N].get("crawl_cpu_us_per_url", 0)
    cpu_4n = out[SCALE_4N].get("crawl_cpu_us_per_url", 0)
    session_rows = "\n".join(
        f"| {i} | {s['out'][SCALE_N]['crawl_urls_per_sec']} | "
        f"{s['out'][SCALE_4N]['crawl_urls_per_sec']} | {s['eff']:.3f} | "
        f"{s['cpu_eff']:.3f} |"
        for i, s in enumerate(sessions)
    )
    bw = regex_bandwidth_baseline()
    md = f"""# BENCH — scaling evidence (N vs 4N cores)

Protocol (BASELINE.md): same crawl job + same input (synthetic web,
{pages:,} pages, {seeds:,} seeds, {rounds} rounds,
budget {budget}/host/round) at `local[{SCALE_N}]` and
`local[{SCALE_4N}]` — the sandbox proxy for N and 4N executors. Each level
is CPU-AFFINITY-PINNED (`sched_setaffinity`) to exactly its core budget:
without pinning, a local[N] JVM's GC/JIT/shuffle-IO threads overflow onto
extra host cores and inflate the small-N baseline (measured +25% at N=2),
understating true scaling. Best of {SCALE_REPEAT} runs per level with the
levels INTERLEAVED in time (N, 4N, N, 4N — r5 protocol: the box's granted
capacity drifts on ~10-minute scales, and a block design let one level
land entirely inside a fast window: same code printed eff 0.79, 0.79,
then 0.59 when a session's whole local[2] block ran 25% faster than any
other session's), and the whole protocol repeated for {len(sessions)}
SESSIONS — the headline is the MEDIAN session's efficiency (r04
protocol).

r7 engine change relevant to this gate: the per-crawl serial driver
share (rank-offset AQE job cascade + per-write planning gaps + ~1.3-1.8
s/round of py4j plan construction) was eliminated — lazy rank-offset
subplan, ONE progressive write pool, plan-fragment reuse. Alternating
same-day A/B vs the r6 commit (BENCH/ab_driver_gap.py, 5 adjacent
pairs at local[32]): warm-crawl wall lower in ALL 5 pairs, median
−34.7%; zero-running-task driver time 7.9 s (37% of warm wall) → 3.5 s
(21%) by event-log audit (BENCH/gap_audit.py). The serial share is
core-count-independent, so removing it raises the 4N level more than N.
(r5's HOF-staging CPU cut and r6's literal-free JIT fix remain in —
PLANS.md rounds 5-6.)

## All sessions

| session | URLs/s @local[{SCALE_N}] | URLs/s @local[{SCALE_4N}] | wall eff | CPU-work eff |
|---|---|---|---|---|
{session_rows}

**Median wall efficiency across sessions = {med_eff:.3f}**
(best {by_eff[-1]["eff"]:.3f}, worst {by_eff[0]["eff"]:.3f}).
The detailed table below is the median session.
Spark local dirs + crawl workdirs are on tmpfs (/dev/shm): /tmp here is
the single shared virtual disk, whose queue penalizes high parallelism —
a real cluster gives each executor node its own local disks, so disk-bound
IO scales with N just like memory bandwidth does.

Host calibration (same box, measured): a pure register-bound CPU burn
scales 1→8 procs at 0.99 efficiency and 4→16 at 0.97, so host capacity /
steal is NOT the limiter at these levels. A 2→8 or 4→16 level pair keeps
both levels inside measured host capacity (~24 effective cores; 32 procs
degrade to 0.76 on pure CPU).

| parallelism | URLs processed | wall (s) | URLs/sec (best) | JVM-CPU µs/URL | all runs (URLs/sec) |
|---|---|---|---|---|---|
| local[{SCALE_N}]  | {out[SCALE_N]["crawl_urls"]:,} | {out[SCALE_N]["crawl_wall_sec"]} | {tn} | {cpu_n} | {runs[SCALE_N]} |
| local[{SCALE_4N}] | {out[SCALE_4N]["crawl_urls"]:,} | {out[SCALE_4N]["crawl_wall_sec"]} | {t4n} | {cpu_4n} | {runs[SCALE_4N]} |

**Median wall-clock scaling efficiency
(throughput@{SCALE_4N} / throughput@{SCALE_N}) / 4 = {med_eff:.3f}**
(target ≥ 0.8 per BASELINE.json; headline = median of {len(sessions)}
sessions; this section's table shows the median session, eff {eff:.3f})

**CPU-work scaling efficiency (CPU-µs/URL at N ÷ CPU-µs/URL at 4N) = {cpu_eff:.3f}**
— a value ≈ 1.0 means 4N-way execution spends no extra CPU per URL: the
plan has no parallelism overhead (no extra shuffles, no serial recompute).

{_skew_md(sessions, uniform_session)}
**Non-Spark regex bandwidth control (same box, same protocol):** the
engine's frozen text-strip regex over an equivalent html corpus, run by N
independent CPython processes, one pinned core each — no JVM, no Spark,
no driver, nothing shared but the machine:
local[{SCALE_N}]-equivalent {bw[SCALE_N]:,} pages/s → local[{SCALE_4N}]-equivalent
{bw[SCALE_4N]:,} pages/s = **{bw["efficiency"]:.3f} scaling efficiency**. Any
shortfall below 1.0 here is the box's memory bandwidth on regex-over-string
workloads, an engine-independent ceiling for this workload class.

Where the wall gap comes from (event-log audit, /tmp/elog protocol in git
history): (a) driver-only gaps between jobs (Catalyst planning of the
large frozen-rule expression trees — reduced by memoizing the trees and,
round 3, by merging the last two write phases into one concurrent pool);
(b) single-VM memory-bandwidth contention on the string/regex parse path —
JVM-CPU µs/URL inflates with thread count on this box while a
register-bound burn shows none (extra cycles are memory stalls, not
engine work), and the non-Spark control above shows the same sub-linear
behavior with no engine in the loop. On a real N→4N cluster both effects
shrink: executors are separate JVMs on separate machines (per-node
bandwidth and per-node driver concurrency scale with N), which is what
the CPU-work witness isolates.

## Workload note

Every crawl round extracts the full article envelope (author/time/
attachments JVM regex over html) and writes six outputs including the
attachments_new P7 state — throughput is not comparable to rounds that
emitted the thin article schema. Since r04 the per-host budgets are
DERIVED from heterogeneous crawl delays (`budget_from_delay`, delay
multipliers {{2, 1, 2/3}} by host hash → budgets {{B/2, B, 1.5B}} around
the same mean B), so the politeness window ranks against non-uniform
limits; r03 and earlier used one flat budget B for every host.
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(md)


def run_crawl_only() -> None:
    from colymer_acquirers_spark.session import get_spark

    _use_tmpfs_dirs()
    if os.environ.get("BENCH_AFFINITY") == "1" and hasattr(os, "sched_setaffinity"):
        # pin the process tree (incl. the JVM child) to exactly CPUS cores:
        # "N cores" means N cores — without this, a local[N] JVM's GC/IO/JIT
        # threads overflow onto extra host cores and inflate the small-N
        # baseline, understating true N→4N scaling
        os.sched_setaffinity(0, set(range(int(CPUS))))
    spark = get_spark(app_name="bench_crawl", master=f"local[{CPUS}]")
    wall, urls, cpu = _crawl_bench(spark)
    print(
        json.dumps(
            {
                "crawl_urls": urls,
                "crawl_wall_sec": round(wall, 3),
                "crawl_urls_per_sec": round(urls / wall, 1) if wall else 0,
                "crawl_cpu_sec": round(cpu, 1),
                "crawl_cpu_us_per_url": round(1e6 * cpu / urls, 1) if urls else 0,
                "cpus": int(CPUS),
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    elif "--crawl-only" in sys.argv:
        run_crawl_only()
    else:
        print(json.dumps(run_bench()))

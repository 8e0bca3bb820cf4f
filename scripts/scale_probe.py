"""Measured scale curve one-to-two orders ABOVE the shipped testdata.

The plan-shape pins and bench.py's sf0.01-vs-sf0.1 ratio argue every
query is linear in data volume, but sf0.1 is only 100k events — fixed
per-query overhead dominates and a mildly superlinear operator could
hide.  This probe generates a DETERMINISTIC events table at sf1- and
sf10-equivalent volumes (1M / 10M rows — the md5-of-id generator from
sources/synthetic.py shaped to the events schema, including the
props item key and a 30-day out-of-order timestamp spread), stages a
star-schema dir (generated events + the sf0.1 dimensions), and times
the event-heavy headline queries at both scales.

Interpretation: ratio_10x is each query's time ratio across a 10x row
ratio.  Linear-or-better queries land at or below ~10 once the data
dwarfs fixed overhead; the iterative/join-heavy rows
(purchase_window_views, pagerank_top_items, user_session_stats) are
the ones worth watching.

Measurement protocol (default since round 8 — the round-7 probe
learned that warmed-vs-fresh JVM variance contributes ±50% to
single-run exponents, dominating any real plan signal): each
(query, scale) measurement runs in its OWN fresh JVM subprocess —
`runs` back-to-back executions, min taken — so no query inherits
another's codegen caches, broadcast cleanup debt, or GC heap shape,
and the small step never pre-warms the big step.  Shuffle partitions
derive PER SCALE STEP as max(n_cpus, rows / rows-per-task), the
cluster-realistic constant-per-task sizing.  `--mode shared`
restores the old single-JVM loop (fast smoke runs; its exponents
carry the warmth artifact).  The final ratios line is also written
as a JSON artifact (--out, default SCALE.json next to this script's
repo root) so rounds diff measured scale curves, not anecdotes.

Usage: python scripts/scale_probe.py [--rows-small 1000000]
       [--rows-large 10000000] [--runs 2] [--queries a,b,c]
       [--mode fresh|shared] [--out SCALE.json]
Prints one JSON line per scale plus a final ratios line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from realtime_data_pipeline_spark.scratch import scratch_dir  # noqa: E402
from realtime_data_pipeline_spark.session import (  # noqa: E402
    CORPUS_ROWS_PER_TASK,
    corpus_shuffle_partitions,
    default_parallelism,
    get_spark,
)
from realtime_data_pipeline_spark.tables import TABLE_NAMES  # noqa: E402

SF01_DIR = "/root/testdata/sf0.1"

# event-table-heavy bench/driver queries: window agg, sessionization,
# funnel, sequence, per-key argmax, dedup rollup, the big x big
# time-range count, and the iterative graph operator — plus the
# documents-table heavies (the 100 TB dedup/text path)
DEFAULT_QUERIES = [
    "sliding_user_counts",
    "latest_event_per_user",
    "event_dedup_counts",
    "user_session_stats",
    "funnel_conversion",
    "event_transition_matrix",
    "purchase_window_views",
    "pagerank_top_items",
    "text_metrics",
    "minhash_dedup_candidates",
    "simhash_near_dups",
    "ngram_jaccard_pairs",
    "frequent_terms_report",
    "benchmark_contamination",
    "doc_crossdup_rates",
    "corpus_curation_stats",
]

_TYPES = "array('view', 'click', 'purchase', 'signup', 'error')"
_DAY_US = 86_400 * 1_000_000

# Queries whose hot path is the shingle-explode aggregation (per-task
# posting-list hash maps over an exploded 3-gram stream) — the family
# the measured ~0.7 GiB/task-slot floor applies to; workers cap their
# concurrency via session.max_concurrent_tasks_for_heap.
SHINGLE_HEAVY = {
    "ngram_jaccard_pairs",
    "minhash_dedup_candidates",
    "minhash_calibration_report",
    "corpus_curation_stats",
    "simhash_near_dups",
    "source_overlap_matrix",
    "doc_crossdup_rates",
}


def _h32(seed: str) -> str:
    """md5-of-id 32-bit field (the sources/pydatasource.py idiom), as a
    SQL expression over the range column `id`."""
    return (
        f"cast(conv(substring(md5(concat(cast(id as string), ':{seed}')), "
        f"1, 8), 16, 10) as bigint)"
    )


def generate_events(spark, out_dir: str, n_rows: int) -> None:
    """events(event_id, ts, user_id, event_type, value, props) — every
    field an md5 pure function of the id; user cardinality scales with
    volume at the testdata's ~66 events/user; timestamps spread
    out-of-order over 30 days at microsecond grain."""
    n_users = max(1, n_rows // 66)
    df = spark.range(0, n_rows, 1, default_parallelism()).select(
        F.col("id").alias("event_id"),
        F.expr(
            f"timestamp_micros(cast(unix_micros(timestamp'2024-01-01') "
            f"+ ({_h32('s')} % (30 * {_DAY_US})) as bigint))"
        ).cast("timestamp_ntz").alias("ts"),
        F.expr(f"{_h32('u')} % {n_users}").alias("user_id"),
        F.expr(f"element_at({_TYPES}, cast({_h32('t')} % 5 + 1 as int))").alias(
            "event_type"
        ),
        F.expr(f"cast({_h32('v')} % 10000 as double) / 100.0").alias("value"),
        F.expr(
            f"concat('{{\"k\": ', cast({_h32('k')} % 100 as string), '}}')"
        ).alias("props"),
    )
    df.write.mode("overwrite").parquet(f"{out_dir}/events.parquet")


def generate_documents(
    spark, out_dir: str, n_docs: int, vocab: str = "closed"
) -> None:
    """documents(doc_id, text, lang, source, n_chars) at probe scale:
    ~50-token texts, 5 langs, 20 sources.  Every 10th doc REPEATS its
    decade-leader's token stream with only the position-index salt
    changed on the last 5 tokens — planted near-duplicate structure so
    the dedup operators do real candidate work at every scale instead
    of hashing unique noise.

    vocab='closed' (the r7 probe): 25% of draws from a 50-word head,
    the rest from a FIXED 5000-word tail — posting lists for every
    tail word grow linearly with the corpus, the df-cap's documented
    worst-case intermediate regime.  vocab='open': the tail draw is
    power-law inverse-CDF over an UNBOUNDED id space
    (tid = floor(u^-1.25), u uniform on (0,1] from the same md5 hash),
    so token frequencies are Zipf-ish and distinct vocabulary grows
    ~n^0.8 — the Heaps-law shape of real corpora, where the df-cap's
    linear asymptote should show up as a measured ratio, not an
    analytic argument."""
    base = "cast(id - (id % 10) as string)"  # decade leader's stream
    tok = (
        # position-salted 32-bit hash of (leader, pos) for the first
        # 45 tokens, of (self, pos) for the last 5 — near-dups share a
        # 45-token prefix
        f"cast(conv(substring(md5(concat("
        f"  if(p < 45, {base}, cast(id as string)), ':', cast(p as string)"
        f")), 1, 8), 16, 10) as bigint)"
    )
    if vocab == "closed":
        tail = f"concat('w', cast(({tok}) % 5000 as string))"
    else:
        # u in (0,1] at 1e-6 grain; floor(100·u^-1.25) is an
        # offset power-law inverse CDF: P(tid >= x) = (x/100)^-0.8
        # for x >= 100, so the most frequent tail word sits at ~0.8%
        # of tail draws (a realistic mid-frequency word, not a
        # degenerate 40% super-token) while distinct vocabulary still
        # grows ~n^0.56 (measured 347 -> 1255 over a 10x doc step) —
        # integer-rendered so the token string is exact and
        # deterministic
        u = f"((({tok}) % 1000000) + 1) / 1000000.0"
        tail = (
            f"concat('w', cast(cast(100 * pow({u}, -1.25) as bigint) "
            f"as string))"
        )
    text = (
        f"array_join(transform(sequence(0, 49), p -> "
        f"if(({tok}) % 4 = 0, concat('hot', cast(({tok}) % 50 as string)), "
        f"{tail})), ' ')"
    )
    df = spark.range(0, n_docs, 1, default_parallelism()).select(
        F.col("id").alias("doc_id"),
        F.expr(text).alias("text"),
        F.expr(
            f"element_at(array('en','de','fr','es','zh'), "
            f"cast({_h32('lang')} % 5 + 1 as int))"
        ).alias("lang"),
        F.expr(f"concat('src', cast({_h32('src')} % 20 as string))").alias(
            "source"
        ),
    ).withColumn("n_chars", F.length("text").cast("long"))
    df.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")


def generate_embeddings(spark, out_dir: str, n_vecs: int) -> None:
    """embeddings(vec_id, embedding float[64], label) at probe scale —
    every component an md5 pure function of (id, dim), uniform on
    [-0.2, 0.2] (the testdata's component range), label an md5 bucket
    over 10 classes.  vec_ids 0-7 stay the serving query batch and
    8-15 the codebook rows (ann_stored_index_topk's fixed predicates),
    so the ANN build+serve path runs unchanged at any staged |V| —
    build cost scales with |V| (assignment pass + cell-partitioned
    write), serve with the probed cells' population."""
    if n_vecs < 16:
        raise ValueError(
            f"n_vecs={n_vecs}: the ANN contract needs vec_ids 0-7 "
            "(serving queries) and 8-15 (codebook rows) present, so "
            "staged embeddings require n_vecs >= 16"
        )
    comp = (
        "cast((cast(conv(substring(md5(concat(cast(id as string), ':', "
        "cast(d as string), ':e')), 1, 8), 16, 10) as bigint) % 400001 "
        "- 200000) / 1000000.0 as float)"
    )
    df = spark.range(0, n_vecs, 1, default_parallelism()).select(
        F.col("id").alias("vec_id"),
        F.expr(f"transform(sequence(0, 63), d -> {comp})").alias(
            "embedding"
        ),
        F.expr(f"cast({_h32('lbl')} % 10 as int)").alias("label"),
    )
    df.write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")


def stage_star_dir(
    spark, d: str, n_rows: int, n_docs: int, vocab: str = "closed",
    n_vecs: int = 0,
) -> None:
    """Fill a pre-created dir `d` with the star schema at this scale
    (the caller owns the dir's lifetime — in fresh mode the PARENT
    creates it so atexit cleanup survives the staging subprocess).
    Stamps a manifest.json with the staged sizes: --use-dirs reads it
    back so worker concurrency caps and data_ratio always describe the
    corpus actually in the dir, never whatever --docs-* defaults the
    caller forgot to repeat (ADVICE r9).  n_vecs=0 symlinks the sf0.1
    embeddings (the classic probe); n_vecs>0 generates the table at
    scale for the ANN soak."""
    gen_embeddings = n_vecs > 0
    for name in TABLE_NAMES:
        if name in ("events", "documents"):
            continue
        if name == "embeddings" and gen_embeddings:
            continue
        os.symlink(f"{SF01_DIR}/{name}.parquet", f"{d}/{name}.parquet")
    generate_events(spark, d, n_rows)
    generate_documents(spark, d, n_docs, vocab=vocab)
    if gen_embeddings:
        generate_embeddings(spark, d, n_vecs)
    with open(f"{d}/manifest.json", "w") as f:
        json.dump({"n_rows": n_rows, "n_docs": n_docs, "vocab": vocab,
                   "n_vecs": n_vecs}, f)


def _cpu_jiffies() -> tuple[int, int]:
    """(user+nice, system) jiffies from /proc/stat — the storm
    detector's inputs."""
    parts = open("/proc/stat").readline().split()
    v = list(map(int, parts[1:4]))
    return v[0] + v[1], v[2]


_BYTE_KEYS = ("disk_spill", "mem_spill", "shuffle_write")


def _stage_totals(spark) -> dict[str, int]:
    """Cumulative task-metric byte totals over every stage the app has
    run, read from the live AppStatusStore (the UI's backing store —
    works with spark.ui.enabled=false).  Wall-time ratios can hide a
    superlinear plan behind host noise; the resource that actually
    killed the r9 5M-doc ngram step was shuffle-SPILL bytes, so the
    probe records bytes per step alongside seconds (VERDICT r9 #3).
    Callers take deltas around each timed run."""
    sc = spark.sparkContext
    jvm = sc._jvm
    store = sc._jsc.sc().statusStore()
    stages = store.stageList(
        jvm.java.util.ArrayList(),  # all statuses
        False,  # details
        False,  # withSummaries
        sc._gateway.new_array(jvm.double, 0),  # no task quantiles
        jvm.java.util.ArrayList(),  # all task statuses
    )
    tot = dict.fromkeys(_BYTE_KEYS, 0)
    for i in range(stages.size()):
        s = stages.apply(i)
        tot["disk_spill"] += s.diskBytesSpilled()
        tot["mem_spill"] += s.memoryBytesSpilled()
        tot["shuffle_write"] += s.shuffleWriteBytes()
    return tot


def _measure_runs(spark, name: str, d: str, runs: int) -> list[dict]:
    """`runs` timed executions against dir `d` (noop sink — full
    execution, no driver materialization), each annotated with the
    box's user/sys CPU-time delta (host interference visibility) and
    the run's stage-metric byte deltas (spill visibility)."""
    from realtime_data_pipeline_spark.plans.registry import REGISTRY

    out = []
    for _ in range(runs):
        b0 = _stage_totals(spark)
        u0, s0 = _cpu_jiffies()
        t0 = time.perf_counter()
        REGISTRY[name].fn(spark, d).write.format("noop").mode(
            "overwrite"
        ).save()
        wall = time.perf_counter() - t0
        u1, s1 = _cpu_jiffies()
        b1 = _stage_totals(spark)
        out.append(
            {"wall": wall, "user_s": (u1 - u0) / 100.0,
             "sys_s": (s1 - s0) / 100.0,
             **{k: b1[k] - b0[k] for k in _BYTE_KEYS}}
        )
        spark.catalog.clearCache()
    return out


def _is_stormy(run: dict) -> bool:
    """Host-interference signature measured on this box: minutes-long
    bursts where the kernel eats the machine (e.g. 1535 CPU-s of sys
    vs 48 of user in an 87 s wall for a query whose clean profile is
    ~100 user / ~7 sys in ~5 s).  sys > user on a Spark SQL query is
    never the engine — whole-stage codegen work is user time."""
    return run["sys_s"] > max(run["user_s"], 1.0)


def _measure(spark, name: str, d: str, runs: int) -> dict:
    """Best (min-wall) run — {"sec", disk_spill, mem_spill,
    shuffle_write} — retrying up to twice when every run in a batch
    carries the host-storm signature, so a freeze that spans one
    worker's whole measurement window doesn't masquerade as a scale
    exponent.  If the storm outlasts all retries the stormy minimum is
    returned anyway (annotated upstream) — never silently dropped.
    Byte fields come from the SAME run as the reported wall time."""
    best = None
    all_runs = []
    for _attempt in range(3):
        batch = _measure_runs(spark, name, d, runs)
        all_runs += batch
        clean = [r for r in batch if not _is_stormy(r)]
        if clean:
            cand = min(clean, key=lambda r: r["wall"])
            if best is None or cand["wall"] < best["wall"]:
                best = cand
            break
        print(
            json.dumps({"query": name, "storm_retry": batch}),
            file=sys.stderr, flush=True,
        )
    if best is None:
        best = min(all_runs, key=lambda r: r["wall"])
    return {"sec": round(best["wall"], 3),
            **{k: best[k] for k in _BYTE_KEYS}}


def _worker(args) -> None:
    """Fresh-JVM measurement of ONE (query, staged dir) pair; prints a
    single JSON line the parent parses.  Runs in its own subprocess so
    no measurement inherits another QUERY's JVM warmth — but warms its
    OWN JVM to steady state first (two discarded runs: measured run-0
    is dominated by class loading + C1 JIT at ~10-15 s and run-1 by C2
    tiering; sliding_user_counts at 1M rows measured 16.0 / 4.6 / 1.9 /
    1.6 s across four runs in one fresh JVM).  The quantity under test
    is the steady-state cost of the PLAN at each scale — the cluster
    analogue is a long-running JIT-warm executor — so cold-JVM constant
    overhead must not ride the small step and bias every ratio
    sublinear."""
    from realtime_data_pipeline_spark.session import (
        max_concurrent_tasks_for_heap,
    )

    # The shingle-explode aggregation family has a measured execution
    # -memory floor of ~0.7 GiB PER CONCURRENT TASK (the r8 open-vocab
    # soak: 32 tasks on a 12 GiB heap starved the hash-map-to-sorter
    # spill handoff itself; the same step ran at 48 GiB).  Cap the
    # worker's task slots to what the heap provisions — the probe-side
    # embodiment of the cluster rule session.py encodes.
    # Gate on the soak regime (>=1M docs anywhere in the RUN): the
    # floor was measured at 5M open-vocab docs, where the per-task
    # posting map's key set grows with corpus vocabulary; the default
    # 500k-doc probe ran 32 slots on 12 GiB without starving, so
    # capping it would only skew cross-round timing diffs.  The parent
    # passes the run's MAX step docs to EVERY worker, so both steps of
    # a soak run under the SAME slot count — a scale ratio measured
    # under different concurrency per step measures the cap, not the
    # plan.
    cores = default_parallelism()
    if args.worker_query in SHINGLE_HEAVY and args.worker_docs >= 1_000_000:
        heap = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
        cores = min(cores, max_concurrent_tasks_for_heap(heap))
    spark = get_spark(
        app_name=f"rdp-scale-worker-{args.worker_query}",
        master=f"local[{cores}]",
        shuffle_partitions=args.shuffle_partitions or default_parallelism(),
    )
    if args.warm_runs > 0:  # JIT warm-up (see docstring); soak steps
        # run many minutes each, where one warm run already reaches
        # C2 steady state and a second only burns wall-clock
        _measure(spark, args.worker_query, args.worker_dir, args.warm_runs)
    res = _measure(spark, args.worker_query, args.worker_dir, args.runs)
    print(json.dumps({"query": args.worker_query, **res}), flush=True)
    spark.stop()


def _spawn_worker(
    args, name: str, d: str, parts: int, cap_docs: int
) -> dict:
    import subprocess

    cmd = [
        sys.executable,
        os.path.abspath(__file__),
        "--worker-query", name,
        "--worker-dir", d,
        "--worker-docs", str(cap_docs),
        "--runs", str(args.runs),
        "--warm-runs", str(args.warm_runs),
        "--shuffle-partitions", str(parts),
    ]
    if args.driver_mem:
        cmd += ["--driver-mem", args.driver_mem]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        # surface the worker's real error before the parent dies (and
        # its atexit removes the staged dirs — the evidence).  A JVM
        # stack trace easily exceeds any fixed tail and buries the
        # root cause hundreds of lines up (the r9 soak failure
        # surfaced 4000 chars of mid-trace frames and nothing else),
        # so ALSO extract the marker lines from the full stderr.
        markers = [
            ln for ln in proc.stderr.splitlines()
            if any(
                m in ln
                for m in (
                    "Exception", "Error", "Caused by", "UNABLE_TO",
                    "OutOfMemory", "No space", "Traceback",
                )
            ) and not ln.lstrip().startswith("at ")
        ]
        sys.stderr.write(
            "---- worker root-cause lines ----\n"
            + "\n".join(markers[:40])
            + "\n---- worker stderr tail ----\n"
            + proc.stderr[-4000:]
        )
        raise RuntimeError(
            f"worker {name} failed (exit {proc.returncode}); "
            f"stderr tail above"
        )
    # Scan stdout in reverse for the worker's JSON result line: stray
    # stdout after the print (JVM shutdown chatter) or an empty stdout
    # with exit 0 must produce a descriptive error, not an opaque
    # JSONDecodeError/IndexError (ADVICE r8).
    for line in reversed(proc.stdout.strip().splitlines()):
        try:
            obj = json.loads(line)
        except ValueError:
            continue
        if isinstance(obj, dict) and obj.get("query") == name and "sec" in obj:
            return obj
    raise RuntimeError(
        f"worker {name} exited 0 but emitted no result JSON; "
        f"stdout tail: {proc.stdout[-2000:]!r}"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows-small", type=int, default=1_000_000)
    ap.add_argument("--rows-large", type=int, default=10_000_000)
    # testdata keeps a 20:1 events:documents ratio — preserve it
    ap.add_argument("--docs-small", type=int, default=50_000)
    ap.add_argument("--docs-large", type=int, default=500_000)
    # 0 = symlink the sf0.1 embeddings table (the classic probe);
    # >0 = generate embeddings at scale (the ANN build+serve soak)
    ap.add_argument("--vecs-small", type=int, default=0)
    ap.add_argument("--vecs-large", type=int, default=0)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--queries", default=",".join(DEFAULT_QUERIES))
    # fresh (default): every (query, scale) measurement in its own JVM
    # subprocess — the controlled protocol whose exponents round 7
    # showed are reproducible; shared: the old one-JVM loop (faster,
    # warmth-contaminated).
    ap.add_argument("--mode", choices=("fresh", "shared"), default="fresh")
    # closed = the r7 fixed-5000-word tail (df-cap worst case);
    # open = Heaps-law power-law tail (real-corpus shape) — see
    # generate_documents
    ap.add_argument("--vocab", choices=("closed", "open"), default="closed")
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "SCALE.json",
        ),
        help="write the final ratios line here as a JSON artifact "
        "(empty string to skip)",
    )
    # at 100M rows the default 32 shuffle partitions put 3M+ rows in
    # each hash-aggregate task and the default 8g heap thrashes GC —
    # a LOCAL artifact a real cluster doesn't have (it sizes executor
    # count and spark.sql.shuffle.partitions to the data).  These let
    # the big-step run be configured cluster-realistically so the
    # measured exponent reflects plan shape, not driver-heap pressure.
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--driver-mem", default=None)
    # Cluster-realistic protocol: a real cluster holds per-task volume
    # roughly CONSTANT as data grows (more executors × more shuffle
    # partitions), so the probe derives shuffle partitions PER SCALE
    # STEP as max(n_cpus, rows / rows-per-task).  Without this, the
    # big step's per-task hash tables are 10× larger than the small
    # step's — cache locality and GC then contribute a superlinear
    # term that is pure single-JVM artifact (measured: sliding window
    # counts at 100M rows ran 2.1× faster under matched task sizing
    # with an identical plan).  --shuffle-partitions overrides.
    # Default adopted r12 (verdict r11 #4): CORPUS_ROWS_PER_TASK, the
    # measured sweet spot from the r11 partition-lever soaks (175k —
    # mem-spill -27%, wall -16% on the 10M-doc step vs the r8-r10
    # protocol's 350k; SOAK_r11_20x_parts2x.json).  Soaks now run at
    # the helper-computed count by default; pass --rows-per-task
    # 350000 to reproduce the r8-r10 artifact series exactly.
    ap.add_argument(
        "--rows-per-task", type=int, default=CORPUS_ROWS_PER_TASK
    )
    ap.add_argument(
        "--use-dirs",
        default=None,
        help="comma-separated pre-staged small,large dirs (skip "
        "staging — the generators are deterministic, so a dir staged "
        "with the same sizes/vocab is byte-identical); caller owns "
        "their cleanup",
    )
    # internal: subprocess entrypoints for --mode fresh
    ap.add_argument("--worker-query", default=None, help=argparse.SUPPRESS)
    ap.add_argument("--worker-dir", default=None, help=argparse.SUPPRESS)
    ap.add_argument(
        "--worker-docs", type=int, default=0, help=argparse.SUPPRESS
    )
    ap.add_argument(
        "--warm-runs", type=int, default=2,
        help="discarded in-JVM warm-up executions per worker before "
        "the timed runs (JIT steady state); soaks use 1",
    )
    ap.add_argument("--stage-out", default=None, help=argparse.SUPPRESS)
    ap.add_argument(
        "--stage-rows", type=int, default=None, help=argparse.SUPPRESS
    )
    ap.add_argument(
        "--stage-docs", type=int, default=None, help=argparse.SUPPRESS
    )
    ap.add_argument(
        "--stage-vecs", type=int, default=0, help=argparse.SUPPRESS
    )
    args = ap.parse_args()

    if args.driver_mem:
        os.environ["SPARK_GRAFT_DRIVER_MEM"] = args.driver_mem
    if args.worker_query:
        return _worker(args)
    if args.stage_out:
        spark = get_spark(
            app_name="rdp-scale-stager",
            master=f"local[{default_parallelism()}]",
            shuffle_partitions=default_parallelism(),
        )
        stage_star_dir(
            spark, args.stage_out, args.stage_rows, args.stage_docs,
            vocab=args.vocab, n_vecs=args.stage_vecs,
        )
        spark.stop()
        return None

    names = [n for n in args.queries.split(",") if n]
    n = default_parallelism()

    steps = (
        (args.rows_small, args.docs_small, args.vecs_small),
        (args.rows_large, args.docs_large, args.vecs_large),
    )
    # stage both dirs up front.  In fresh mode staging runs in a
    # SUBPROCESS: py4j's spark.stop() leaves the gateway JVM alive as
    # a child of this parent for the whole run, and a resident
    # multi-GB JVM measurably inflates every worker measurement —
    # the parent must never own a JVM.  The parent still CREATES the
    # scratch dirs so atexit cleanup is tied to the run's lifetime.
    # Dirs and results are keyed by STEP INDEX, not n_rows: a docs-only
    # soak can legitimately use identical row counts for both steps, and
    # n_rows keys would then collide — one shared dir, the second staging
    # overwriting the first, and every ratio silently 1.0 (ADVICE r8).
    # vecs must be staged at BOTH steps or NEITHER: a 0-vs-positive
    # mix would compare the fixed symlinked sf0.1 embeddings against a
    # generated table AND drop the vec axis from data_ratio — every
    # |V|-scaled query would then flag "superlinear" against a ratio
    # of 1.0, the exact mislabeling ADVICE r9 fixed for docs-only
    # soaks.  Fail loudly BEFORE any staging, measurement, or scratch
    # dir creation (ADVICE r11: the old post-dirs check left empty
    # scratch dirs behind on the early exit).  In --use-dirs mode the
    # CLI vec flags are about to be DISCARDED for the manifest sizes,
    # so checking them here would abort runs whose on-disk corpora are
    # consistent — that path checks after the manifest overwrite only.
    def _check_vecs_consistent(s) -> None:
        if (s[0][2] == 0) != (s[1][2] == 0):
            raise RuntimeError(
                f"staged vecs mix generated and symlinked embeddings "
                f"across steps ({s[0][2]} vs {s[1][2]}) — set "
                f"--vecs-small and --vecs-large together (or re-stage "
                f"the dirs)"
            )

    if not args.use_dirs:
        _check_vecs_consistent(steps)
    if args.use_dirs:
        pre = args.use_dirs.split(",")
        dirs = {0: pre[0], 1: pre[1]}
        # Pre-staged dirs carry their own sizes: read the manifest each
        # staging run stamps, so the shingle-heavy concurrency cap and
        # data_ratio describe the corpus actually on disk — a caller
        # reusing 5M-doc soak dirs with the default --docs-large 500000
        # previously ran uncapped and starved (ADVICE r9).
        manifests = []
        for d in pre:
            mpath = os.path.join(d, "manifest.json")
            if not os.path.exists(mpath):
                raise RuntimeError(
                    f"{d} has no manifest.json — re-stage it (any "
                    "--stage-out run stamps one), or stage fresh dirs; "
                    "trusting --rows/--docs flags for unmanifested "
                    "dirs is exactly the starvation footgun this "
                    "manifest closes"
                )
            with open(mpath) as f:
                manifests.append(json.load(f))
        steps = tuple(
            (m["n_rows"], m["n_docs"], m.get("n_vecs", 0))
            for m in manifests
        )
        vocabs = {m.get("vocab") for m in manifests}
        if manifests and len(vocabs) == 1 and args.vocab not in vocabs:
            args.vocab = vocabs.pop()  # label the artifact truthfully
    else:
        dirs = {
            i: scratch_dir(f"rdp_scale_s{i}_{n_rows}_")
            for i, (n_rows, _, _) in enumerate(steps)
        }
    if args.use_dirs:
        # --use-dirs replaced steps with the manifest sizes: re-check
        # the vec-axis consistency for the corpus actually on disk.
        # (On the flag-derived path `steps` is unchanged since the
        # pre-staging check above, so re-checking would be dead code.)
        _check_vecs_consistent(steps)

    if args.use_dirs:
        spark = None if args.mode == "fresh" else get_spark(
            app_name="rdp-scale-probe",
            master=f"local[{n}]",
            shuffle_partitions=args.shuffle_partitions or n,
        )
    elif args.mode == "fresh":
        import subprocess

        for i, (n_rows, n_docs, n_vecs) in enumerate(steps):
            cmd = [
                sys.executable, os.path.abspath(__file__),
                "--stage-out", dirs[i],
                "--stage-rows", str(n_rows),
                "--stage-docs", str(n_docs),
                "--stage-vecs", str(n_vecs),
                "--vocab", args.vocab,
            ]
            if args.driver_mem:
                cmd += ["--driver-mem", args.driver_mem]
            proc = subprocess.run(cmd, capture_output=True, text=True)
            if proc.returncode != 0:
                # mirror _spawn_worker: surface the subprocess's real
                # error before raising (ADVICE r8 — check=True swallowed
                # the stderr inside CalledProcessError)
                sys.stderr.write(proc.stderr[-4000:])
                raise RuntimeError(
                    f"staging step {i} ({n_rows} rows / {n_docs} docs) "
                    f"failed (exit {proc.returncode}); stderr tail above"
                )
        spark = None
    else:
        spark = get_spark(
            app_name="rdp-scale-probe",
            master=f"local[{n}]",
            shuffle_partitions=args.shuffle_partitions or n,
        )
        for i, (n_rows, n_docs, n_vecs) in enumerate(steps):
            stage_star_dir(
                spark, dirs[i], n_rows, n_docs, vocab=args.vocab,
                n_vecs=n_vecs,
            )

    results: dict[int, dict[str, dict]] = {}
    step_parts: dict[int, int] = {}
    cap_docs = max(d for _, d, _ in steps)
    for i, (n_rows, n_docs, n_vecs) in enumerate(steps):
        # constant-per-task sizing must track whichever table carries
        # the step's volume: a docs-only soak (tiny --rows-small with
        # --docs-large in the millions) still needs its shuffle
        # partitions scaled to the corpus.  Sizing logic lives in
        # session.corpus_shuffle_partitions (one source of truth);
        # since r12 the default --rows-per-task IS the measured sweet
        # spot (CORPUS_ROWS_PER_TASK = 175k, SOAK_r11_20x_parts2x.json)
        # — artifacts before r12 ran 350k, so cross-series ratio
        # comparisons must read the recorded rows_per_task field.
        parts = args.shuffle_partitions or corpus_shuffle_partitions(
            n_events=n_rows, n_docs=n_docs, n_vecs=n_vecs,
            rows_per_task=args.rows_per_task,
        )
        step_parts[i] = parts
        d = dirs[i]
        step: dict[str, dict] = {}
        for name in names:
            if args.mode == "fresh":
                step[name] = _spawn_worker(args, name, d, parts, cap_docs)
            else:
                spark.conf.set("spark.sql.shuffle.partitions", str(parts))
                _measure(spark, name, d, 1)  # warm (shared-JVM mode only)
                step[name] = _measure(spark, name, d, args.runs)
        results[i] = step
        print(
            json.dumps(
                {"rows": n_rows, "docs": n_docs, "vecs": n_vecs,
                 "queries": {q: r["sec"] for q, r in step.items()},
                 "bytes": {q: {k: r.get(k) for k in _BYTE_KEYS}
                           for q, r in step.items()}}
            ),
            flush=True,
        )

    small = {q: r["sec"] for q, r in results[0].items()}
    large = {q: r["sec"] for q, r in results[1].items()}
    # the step whose table carries the volume defines the data ratio —
    # rows-only (the classic probe), docs-only (a soak), or both; a
    # docs-only soak previously computed 1.0 from rows alone and
    # flagged perfectly linear doc-scaling as superlinear (ADVICE r9)
    (rows_s, docs_s, vecs_s), (rows_l, docs_l, vecs_l) = steps
    data_ratio = max(
        rows_l / rows_s, docs_l / docs_s,
        (vecs_l / vecs_s) if vecs_s else 0.0,
    )
    ratios = {
        name: round(large[name] / small[name], 2) if small[name] > 0 else None
        for name in names
    }
    # spill/shuffle byte curves: wall-time ratios hide superlinear
    # spill behind host noise — the r9 5M-doc ngram step died on spill
    # VOLUME, not time (VERDICT r9 #3)
    write_ratios = {
        name: (
            round(
                results[1][name]["shuffle_write"]
                / results[0][name]["shuffle_write"], 2
            )
            if results[0][name].get("shuffle_write") else None
        )
        for name in names
    }
    artifact = {
        "metric": "scale_probe_ratio",
        "mode": args.mode,
        "vocab": args.vocab,
        "runs": args.runs,
        "driver_mem": args.driver_mem
        or os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        "rows": [rows_s, rows_l],
        "docs": [docs_s, docs_l],
        "vecs": [vecs_s, vecs_l],
        # the per-step shuffle-partition counts actually used — the
        # constant-per-task lever; lever comparisons (same dirs, a
        # different --rows-per-task) are uninterpretable without it
        "shuffle_partitions": [step_parts[0], step_parts[1]],
        "rows_per_task": args.rows_per_task,
        "data_ratio": data_ratio,
        "small_sec": small,
        "large_sec": large,
        "small_bytes": {q: {k: r.get(k) for k in _BYTE_KEYS}
                        for q, r in results[0].items()},
        "large_bytes": {q: {k: r.get(k) for k in _BYTE_KEYS}
                        for q, r in results[1].items()},
        "ratios": ratios,
        "shuffle_write_ratios": write_ratios,
        "superlinear": sorted(
            n for n, r in ratios.items() if r and r > data_ratio * 1.2
        ),
        "superlinear_shuffle_write": sorted(
            n for n, r in write_ratios.items() if r and r > data_ratio * 1.2
        ),
    }
    print(json.dumps(artifact), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(artifact, f, indent=1, sort_keys=True)
            f.write("\n")
    if args.mode == "shared":
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())

"""100x scale-up with INJECTED HOT KEYS (VERDICT r4 ask 1).

scripts/stress.py proves ~linear scaling to 10x on *perturbed* replicas;
this harness extends the evidence to 100x sf0.1 (~60 M lineitem rows,
10 M events, 500 k documents) and deliberately plants the skew the 10x
run lacked:

- **hot user_id**: ~10% of ALL event rows are remapped to one user
  (pmod(event_id, 10) == 0 -> HOT_USER; the id shift per replica is a
  multiple of 10, so the fraction is exact at every K). This is the
  bot-traffic shape that breaks per-user stateful ops.
- **hot shingles**: ~10% of documents get the same 16-token passage
  prepended (block-aligned, so it is ONE recurring 16-word block for
  f26 and a shared shingle mass for f2's LSH buckets).

Keys driven (the skew-exposed set from the verdict): f2, c33, c1, d11,
f31, f26 — plus d2 (watermark state) and c36 (sessionize: the hot user
is a genuine single-key straggler probe) for continuity with SCALE.md
§9b. Streaming keys replay CHUNKED (64 time-ordered files) instead of
the oracle harness's single batch: a single-batch replay never advances
the watermark, so stream-stream join state holds EVERY hot-user row and
the per-key state scan goes quadratic BY HARNESS CONSTRUCTION — chunked
replay is the production-shaped run where watermarks evict state
between batches.

The hot user makes d11 a special case. A stream-stream join scans the
per-key state list for every arriving row of that key; a key carrying
10% of the stream therefore costs ~rows_hot x in-state_hot state-store
row evaluations ON ONE PARTITION — at K=100 that is
~200k clicks x ~2k in-window purchases ≈ 4x10^8 serial evals, an
*inherent* property of per-key stream-join semantics (no engine
partitions one key's state), not a plan defect. The harness therefore
runs d11 twice: `d11_hot_probe` under a wall-clock budget, recording
measured per-batch cost and batches completed (quantifying the floor),
and `d11_botfiltered` — the production mitigation, a pre-join filter
dropping the bot user — which must meet the linear-scaling criterion.

Per-task metrics come from the Spark event log (SparkListenerTaskEnd),
assigned to keys by wall-clock window; per key we report the worst
max/median task-duration ratio over stages with >= 8 tasks and >= 0.2 s
median (below that, constant task overhead dominates and the ratio is
noise, not skew).

Run:  python scripts/stress100.py [K] [workdir]
Emits one JSON line per key and a trailing summary JSON with
{key: {secs, rows, straggler, stage}} for SCALE.md.

Long-haul subsets (the stress_tpch.py convention): set
SPARK_GRAFT_STRESS_KEYS=f2_minhash_dedup,f14_family_resolution,... to
run only those stages; only the tables they read are materialized
(e.g. the K=1000 dedup probe replicates documents/embeddings without
paying for 600 M lineitem rows it never reads). Shuffle partitions
scale linearly with K (override: SPARK_GRAFT_SHUFFLE_PARTITIONS).
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F, types as T  # noqa: E402

from nyc_taxi_data_engineering_project_spark import catalog, registry  # noqa: E402
from nyc_taxi_data_engineering_project_spark.session import get_session  # noqa: E402

K = int(sys.argv[1]) if len(sys.argv) > 1 else 100
SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_stress100"

_SHIFT = 100_000_000  # divisible by 10: pmod hot-row selection is K-stable
HOT_USER = 100_000_000_000  # above any shifted user_id at any sane K
HOT_PASSAGE = " ".join(f"hotblk{i}" for i in range(16))  # one f26 block
N_EVENT_FILES = 64   # time-ordered part files for the stream replay
FILES_PER_BATCH = 4  # -> 16 micro-batches: the watermark advances ~2 d
# of event time per batch at any K (the files split the SAME 30-day
# range), bounding join state to ~one batch's span while keeping the
# fixed per-micro-batch overhead (state-store commits, file listing,
# planning) at 16x, not 64x — measured 4.3 s/batch for the two-sided
# join at 32 state partitions, the dominant cost at small K

_REKEY: dict[str, list[str]] = {
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    # embeddings replicate with the VECTOR UNCHANGED (r6): K identical
    # copies per vector is the maximal bucket-concentration skew for the
    # hyperplane-LSH family — every replica family lands in ONE f13
    # bucket by construction (identical sign bits on every plane), the
    # embedding-space analog of f2's hot-shingle replica families.
    "embeddings": ["vec_id"],
}

BATCH_KEYS = [
    "c1_smj_selfjoin", "c33_salted_join",
    "f2_minhash_dedup", "f26_passage_dedup", "f31_training_order",
    "c36_sessionize",  # hot user = deliberate single-key straggler probe
    "f13_embedding_neardup",  # r6: identical-replica families (above)
]


STREAM_BUDGET_S = 240  # wall budget for the hot-user probe

# Optional comma-separated stage subset for long-haul probes (the
# stress_tpch.py convention) — e.g. the K=1000 dedup-pipeline run,
# where materializing 600 M lineitem rows for stages that never read
# them would dominate the probe:
#   SPARK_GRAFT_STRESS_KEYS=f2_minhash_dedup,f14_family_resolution
# Only the tables the selected stages read are materialized.
_ONLY = {k.strip() for k in
         os.environ.get("SPARK_GRAFT_STRESS_KEYS", "").split(",")
         if k.strip()}

_TABLES_FOR: dict[str, set[str]] = {
    "c1_smj_selfjoin": {"lineitem"},
    "c33_salted_join": {"lineitem", "orders"},
    "f2_minhash_dedup": {"documents"},
    "f26_passage_dedup": {"documents"},
    "f31_training_order": {"documents"},
    "c36_sessionize": {"events"},
    "f13_embedding_neardup": {"embeddings"},
    "f2_planted_recall": {"documents"},
    "f13_dup_recall": {"embeddings"},
    "f14_family_resolution": {"documents"},
    "d2_watermark": {"events"},
    "d8_stateful": {"events"},
    "d11_botfiltered": {"events"},
    "d11_hot_probe": {"events"},
}

# drift guard (r6 ADVICE): every registered batch stage must be
# selectable — a BATCH_KEYS entry missing from _TABLES_FOR would be
# permanently unselectable via SPARK_GRAFT_STRESS_KEYS (hard exit
# below), and the dict otherwise only drifts silently as stages are
# added. Stream stages are checked where they are defined.
_uncovered = set(BATCH_KEYS) - set(_TABLES_FOR)
assert not _uncovered, (
    f"BATCH_KEYS not covered by _TABLES_FOR: {sorted(_uncovered)} — "
    "add their table sets so they stay subsettable")

_unknown = _ONLY - set(_TABLES_FOR)
if _unknown:
    sys.exit(f"unknown SPARK_GRAFT_STRESS_KEYS: {sorted(_unknown)}")

NEEDED_TABLES: set[str] = (
    set().union(*(_TABLES_FOR[k] for k in _ONLY)) if _ONLY
    else set(_REKEY)
)


def _want(key: str) -> bool:
    return not _ONLY or key in _ONLY


def materialize(spark) -> None:
    # one map-only explode(sequence) pass per table (the stress_tpch.py
    # shape): the original K-way unionAll loop built a K-arm plan whose
    # analysis cost grows with K and stops analyzing around K≈1000.
    # Output rows are identical: same key shifts, same per-replica
    # "r{i} " document prefix, same hot-row selections (the shift is a
    # multiple of 10, so pmod selections are K-stable either way).
    t0 = time.time()
    for name, keys in _REKEY.items():
        if name not in NEEDED_TABLES:
            continue
        df = catalog.table(spark, SRC, name)
        copies = df.withColumn(
            "_i", F.explode(F.sequence(F.lit(0), F.lit(K - 1)))
        )
        for kcol in keys:
            copies = copies.withColumn(
                kcol,
                F.col(kcol) + F.col("_i").cast("long") * F.lit(_SHIFT),
            )
        if name == "documents":
            # perturb content so replicas are DISTINCT docs (verbatim
            # copies would widen every dup group K-fold — degenerate)
            copies = copies.withColumn(
                "text",
                F.when(
                    F.col("_i") > 0,
                    F.concat(F.lit("r"), F.col("_i").cast("string"),
                             F.lit(" "), F.col("text")),
                ).otherwise(F.col("text")),
            )
        copies = copies.drop("_i")
        if name == "events":
            copies = copies.withColumn(
                "user_id",
                F.when(F.pmod("event_id", F.lit(10)) == 0,
                       F.lit(HOT_USER)).otherwise(F.col("user_id")),
            )
            # time-ordered part files -> the file stream source replays
            # them oldest-first and the watermark advances between
            # micro-batches (range partition i holds ts range i)
            copies = copies.repartitionByRange(N_EVENT_FILES, "ts")
        if name == "documents":
            # OUTERMOST prepend, after the replica prefix: the hot
            # passage stays block-aligned at position 0 in every hot doc
            copies = copies.withColumn(
                "text",
                F.when(F.pmod("doc_id", F.lit(10)) == 0,
                       F.concat(F.lit(HOT_PASSAGE + " "), F.col("text"))
                       ).otherwise(F.col("text")),
            )
        copies.write.mode("overwrite").parquet(f"{WORK}/{name}.parquet")
    # enforce mtime order = ts order for the stream source's file sort
    ev_dir = f"{WORK}/events.parquet"
    if os.path.isdir(ev_dir):
        parts = sorted(
            p for p in os.listdir(ev_dir) if p.endswith(".parquet"))
        base = time.time() - len(parts) * 2
        for i, p in enumerate(parts):
            os.utime(os.path.join(ev_dir, p), (base + i * 2, base + i * 2))
    print(f"materialized {K}x in {time.time()-t0:.0f}s -> {WORK}",
          flush=True)


def _chunked_events(spark):
    """Chunked-replay twin of streaming.events_stream: same schema and
    micros->timestamp cast, but one file per micro-batch so the
    watermark advances and state evicts (see module docstring)."""
    schema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ])
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", FILES_PER_BATCH)
        .parquet(f"{WORK}/events.parquet")
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )


def d11_chunked(spark, bot_filter: bool):
    """queries/streaming_q.d11_stream_stream_join's exact join topology
    (watermarks both sides, equi on user + 30-min interval), chunked.
    ``bot_filter`` applies the production mitigation: drop the hot user
    BEFORE the join (a codegen'd filter at the scan — the same pre-join
    bot/abuse filter every large-scale event pipeline runs)."""
    src = _chunked_events(spark)
    if bot_filter:
        src = src.filter(F.col("user_id") != HOT_USER)
    clicks = (
        src
        .filter(F.col("event_type") == "click")
        .select(F.col("event_id").alias("click_id"),
                F.col("user_id").alias("c_user"),
                F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", "1 hour")
    )
    purchases = (
        src
        .filter(F.col("event_type") == "purchase")
        .select(F.col("event_id").alias("purchase_id"),
                F.col("user_id").alias("p_user"),
                F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", "1 hour")
    )
    return clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 30 MINUTES")),
    ).select("click_id", "purchase_id",
             F.col("c_user").alias("user_id"))


def f2_planted_recall(spark) -> dict:
    """Planted-pair recall at this K (r5 verdict ask 6): f2's
    recall >= 0.9 gate runs at sf0.001/sf0.01 only, and hot-shingle
    skew is exactly where LSH banding degrades SILENTLY — the shared
    hot passage floods band buckets past the width cap, and capped
    buckets are dropped before the pair join (llm.py's count-gated
    caps), so lost planted pairs would show up nowhere else.
    _planted_corpus plants 20 near-dup pairs (docs 0-19 minus their
    last two tokens, ids shifted by planted_offset); docs 0 and 10
    additionally carry the hot passage here, putting planted pairs
    INSIDE the hot-shingle mass. Count how many survive banding over
    the stressed corpus."""
    from nyc_taxi_data_engineering_project_spark.queries.llm import (
        planted_offset,
    )

    docs = catalog.table(spark, WORK, "documents")
    off = planted_offset(docs)
    out = registry.QUERIES["f2_minhash_dedup"](spark, WORK)
    found = {
        (r.doc_a, r.doc_b)
        for r in out.filter(F.col("doc_a") < 20).collect()
    }
    planted = {(i, i + off) for i in range(20)}
    hit = len(planted & found)
    return {"planted_pairs": 20, "found": hit,
            "recall": round(hit / 20, 3)}


def f13_dup_recall(spark) -> dict:
    """Exact-duplicate recall for the embedding near-dup path under
    identical-replica skew (r6): for each of vectors 0-19, the pair
    (v, v + _SHIFT) — the vector and its first replica, cosine exactly
    1.0 — must surface. Identical vectors share every hyperplane sign
    bit, so the family is IN one bucket by construction; what this
    probes is the hot-bucket machinery (sub-split cannot separate
    identical vectors; past the 512 width gate the pair must survive
    via the star path's representative) and that the pair expansion is
    not silently capped. The f13 analog of f2_planted_recall."""
    out = registry.QUERIES["f13_embedding_neardup"](spark, WORK)
    # every pair whose smaller id is an ORIGINAL vector (originals are
    # the global id minimum, so this captures both direct family pairs
    # and any >512-bucket star edges, whose representative is always an
    # original); two metrics because the star path intentionally routes
    # a family through its bucket rep rather than emitting every direct
    # pair — DIRECT recall is the strict read, CONNECTED recall is what
    # downstream dedup (connected components / keep-min) consumes.
    edges = [
        (r.id_a, r.id_b)
        for r in out.filter(F.col("id_a") < 2000)
        .select("id_a", "id_b").collect()
    ]
    edge_set = set(edges)
    direct = sum((v, v + _SHIFT) in edge_set for v in range(20))
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    connected = sum(find(v) == find(v + _SHIFT) for v in range(20))
    return {"dup_pairs": 20, "direct": direct, "connected": connected,
            "n_edges_sampled": len(edges),
            "recall": round(connected / 20, 3)}


def f14_family_resolution(spark) -> dict:
    """End-to-end dedup pipeline at stress scale (r6): f2's pair graph
    — star fallback included — through f14's distributed connected
    components. Each ~K-member replica family (original doc v plus its
    "r{i} "-prefixed copies, all pairwise near-dups) must resolve into
    ONE cluster; with the r5 drop-cap, mega-families produced no edges
    at all and every member became its own singleton cluster, i.e. the
    100 TB boilerplate would survive dedup untouched. Probe: original v
    and its first replica v+_SHIFT share a cluster_id, for v in 0-19
    (tolerance for inherent banding misses, same as the f2 gate)."""
    out = registry.QUERIES["f14_dedup_clusters"](spark, WORK)
    probe = out.filter(
        (F.col("doc_id") < 20)
        | ((F.col("doc_id") >= _SHIFT) & (F.col("doc_id") < _SHIFT + 20))
    ).collect()
    cl = {r.doc_id: r.cluster_id for r in probe}
    resolved = sum(
        v in cl and v + _SHIFT in cl and cl[v] == cl[v + _SHIFT]
        for v in range(20)
    )
    return {"families": 20, "resolved": resolved,
            "recall": round(resolved / 20, 3)}


def d2_chunked(spark):
    """d2_watermark's aggregate (1 h tumbling windows, 10 min
    watermark, append mode), chunked."""
    return (
        _chunked_events(spark)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("win_start"), "event_type", "n")
    )


def d8_chunked(spark):
    """queries/streaming_q.d8_stateful's exact state topology (per-user
    running (count, max) in GroupState via applyInPandasWithState),
    chunked. The scale contrast with d11: the hot user carries 10% of
    ALL rows here too, but d8's per-key state is O(1) — two scalars —
    so the hot key costs one pandas group per micro-batch, not a
    per-row scan of an O(n) state list. Arbitrary stateful processing
    survives the bot user that serializes the stream-stream join; the
    floor that remains is the Python-worker round-trip per key-batch,
    which scales with DISTINCT KEYS per micro-batch (state cardinality
    is ~200k users at K=100), not with the hot key's row count."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState

    def track(key, pdfs, state: GroupState):
        n, vmax = state.get if state.exists else (0, float("-inf"))
        for pdf in pdfs:
            n += len(pdf)
            if len(pdf):
                vmax = max(vmax, float(pdf["value"].max()))
        state.update((n, vmax))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "max_value": [vmax]}
        )

    return (
        _chunked_events(spark)
        .groupBy("user_id")
        .applyInPandasWithState(
            track,
            outputStructType="user_id long, n_events long, max_value double",
            stateStructType="n long, vmax double",
            outputMode="update",
            timeoutConf="NoTimeout",
        )
    )


def run_stream(sdf, name: str, budget_s: float | None = None,
               output_mode: str = "append") -> dict:
    # 8 state partitions (frozen at query start), as run_available_now:
    # each partition is a state store paying a commit per micro-batch —
    # a fixed overhead that dwarfs per-row work even at 100x. The hot
    # user lands in one of them by design; that task IS the probe.
    spark = sdf.sparkSession
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            sdf.writeStream.format("noop")
            .option("checkpointLocation", f"{WORK}/ckpt_{name}")
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        if budget_s is None:
            q.awaitTermination()
            return {}
        done = q.awaitTermination(budget_s)
        prog = q.recentProgress
        if not done:
            q.stop()
            q.awaitTermination()
        batches = [p for p in prog if p.get("numInputRows", 0) > 0]
        per_batch = [round(p["batchDuration"] / 1e3, 1) for p in batches]
        return {
            "completed": bool(done),
            "batches_done": len(batches),
            "batch_secs": per_batch[-8:],
            "input_rows": sum(p["numInputRows"] for p in batches),
        }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def straggler_from_eventlog(evlog_dir: str, windows: dict) -> dict:
    """Per key: worst max/median task-duration ratio over qualifying
    stages ( >= 8 tasks, >= 0.2 s median) whose tasks launched inside
    the key's wall-clock window."""
    tasks: dict[int, list[tuple[float, float]]] = {}  # stage -> [(launch, dur)]
    paths = []
    for root, _dirs, files in os.walk(evlog_dir):
        # v1: one file named by app id; v2 rolling: events_N_* inside an
        # eventlog_v2_* dir (plus an appstatus marker to skip)
        paths += [os.path.join(root, f) for f in files
                  if not f.startswith((".", "appstatus"))]
    for path in paths:
        with open(path) as fh:
            for line in fh:
                if '"SparkListenerTaskEnd"' not in line:
                    continue
                try:
                    ev = json.loads(line)
                    info = ev["Task Info"]
                    dur = (info["Finish Time"] - info["Launch Time"]) / 1e3
                    tasks.setdefault(ev["Stage ID"], []).append(
                        (info["Launch Time"] / 1e3, dur)
                    )
                except (KeyError, json.JSONDecodeError):
                    continue
    out = {}
    for key, (t0, t1) in windows.items():
        worst, worst_stage = None, None
        for sid, ts_ in tasks.items():
            in_win = [d for (lt, d) in ts_ if t0 <= lt <= t1]
            if len(in_win) < 8:
                continue
            med = statistics.median(in_win)
            if med < 0.2:
                continue
            ratio = max(in_win) / med
            if worst is None or ratio > worst:
                worst, worst_stage = ratio, (sid, len(in_win), round(med, 2),
                                             round(max(in_win), 2))
        out[key] = {"straggler": round(worst, 2) if worst else None,
                    "stage": worst_stage}
    return out


def main() -> None:
    registry.load_all()
    # reuse an existing materialization (pass --fresh to force rebuild);
    # checkpoints and the event log always start clean
    have_data = all(
        os.path.isdir(f"{WORK}/{t}.parquet") for t in NEEDED_TABLES
    ) and "--fresh" not in sys.argv
    if os.path.isdir(WORK) and not have_data:
        shutil.rmtree(WORK)
    for sub in os.listdir(WORK) if os.path.isdir(WORK) else []:
        if sub.startswith(("ckpt_", "evlog")):
            shutil.rmtree(os.path.join(WORK, sub))
    os.makedirs(f"{WORK}/evlog", exist_ok=True)
    # shuffle-partition sizing rule (SCALE.md §2/§13): scale the initial
    # count linearly with K so a partition fits executor memory; AQE
    # coalesces the excess at small K
    n_shuffle = int(os.environ.get(
        "SPARK_GRAFT_SHUFFLE_PARTITIONS", str(max(32, (32 * K) // 100))))
    spark = get_session(
        "stress100",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{WORK}/evlog",
            "spark.eventLog.compress": "false",
            "spark.sql.shuffle.partitions": str(n_shuffle),
        },
    )
    if not have_data:
        materialize(spark)
    else:
        print(f"reusing materialized {WORK}", flush=True)

    # untimed warmup: the first timed key otherwise absorbs one-off JVM
    # costs (codegen compiler warmup, parquet reader init, shuffle
    # service spin-up) and its scale ratio reads better than it is —
    # touch every table and exercise a join + agg + shuffle first
    t0 = time.time()
    for t in sorted(NEEDED_TABLES):
        catalog.table(spark, WORK, t).count()
    if {"lineitem", "orders"} <= NEEDED_TABLES:
        li = catalog.table(spark, WORK, "lineitem").select(
            "l_orderkey").limit(500_000)
        od = catalog.table(spark, WORK, "orders").select(
            F.col("o_orderkey").alias("l_orderkey"))
        li.join(od, "l_orderkey").groupBy(
            F.pmod("l_orderkey", F.lit(97))).count().write.format(
            "noop").mode("overwrite").save()
    else:
        # subset run without the fact tables: still force one shuffle +
        # agg + codegen round before the first timed stage
        t = sorted(NEEDED_TABLES)[0]
        df = catalog.table(spark, WORK, t)
        df.limit(500_000).groupBy(
            F.pmod(F.hash(df.columns[0]), F.lit(97))
        ).count().write.format("noop").mode("overwrite").save()
    print(f"warmup {time.time()-t0:.1f}s", flush=True)

    windows: dict[str, tuple[float, float]] = {}
    results: dict[str, dict] = {}

    def run(key, fn):
        t0 = time.time()
        try:
            extra = fn() or {}
            secs = round(time.time() - t0, 2)
            results[key] = {"secs": secs, **extra}
            windows[key] = (t0, time.time())
            print(f"  {key}: {secs}s {extra if extra else ''}", flush=True)
        except Exception as exc:  # noqa: BLE001
            results[key] = {"secs": -1.0, "err": str(exc)[:200]}
            print(f"  {key}: ERROR {exc}", flush=True)
        spark.catalog.clearCache()

    for key in BATCH_KEYS:
        if _want(key):
            run(key, lambda k=key: registry.QUERIES[k](spark, WORK)
                .write.format("noop").mode("overwrite").save())
    stages = [
        ("f2_planted_recall", lambda: f2_planted_recall(spark)),
        ("f13_dup_recall", lambda: f13_dup_recall(spark)),
        ("f14_family_resolution", lambda: f14_family_resolution(spark)),
        ("d2_watermark", lambda: run_stream(d2_chunked(spark), "d2")),
        ("d8_stateful", lambda: run_stream(d8_chunked(spark), "d8",
                                           budget_s=STREAM_BUDGET_S,
                                           output_mode="update")),
        ("d11_botfiltered",
         lambda: run_stream(d11_chunked(spark, bot_filter=True), "d11bf")),
        ("d11_hot_probe",
         lambda: run_stream(d11_chunked(spark, bot_filter=False), "d11hot",
                            budget_s=STREAM_BUDGET_S)),
    ]
    for key, fn in stages:
        if _want(key):
            run(key, fn)

    time.sleep(2)  # let the event log flush the last task ends
    stragglers = straggler_from_eventlog(f"{WORK}/evlog", windows)
    for key, s in stragglers.items():
        results.setdefault(key, {}).update(s)
    total = sum(r["secs"] for r in results.values() if r["secs"] > 0)
    summary = {"K": K, "src": SRC, "total_secs": round(total, 1),
               "hot_user_frac": 0.1, "hot_doc_frac": 0.1,
               "results": results}
    print(json.dumps(summary), flush=True)
    with open(f"{WORK}/summary_K{K}.json", "w") as fh:
        json.dump(summary, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()

"""Catalog layer — the Spark equivalent of the reference's DDL bootstrap
(``sql/init.sql:9-47``; SURVEY.md §3 entry point 2).

The reference materializes a fixed star schema and three B-tree indexes.
In Spark the same capability is: register the parquet tables in the session
(temp views here; ``saveAsTable`` for a persistent metastore), and replace
indexes with storage layout — date partitioning for range pruning, broadcast
joins for the small dimensions (SURVEY.md §1.4, §4.1).
"""

from __future__ import annotations

import functools
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

TESTDATA_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# (Broadcast decisions are made at each join site with F.broadcast —
# the zones-dim observation of SURVEY.md §1.1 — and asserted by
# tests/test_plans.py; no central dim list exists so the code can't
# drift from the actual physical plans.)


def nanos_ts_columns(path: str) -> tuple[str, ...]:
    """Names of columns the parquet footer types as TIMESTAMP(NANOS).

    Driver-side footer peek (pyarrow metadata read, no data IO; cached).
    The type of a driver-provided file has CHANGED between rounds
    (events.ts nanos → micros, see TESTDATA.md), silently breaking code
    that assumed one unit — so the batch and stream readers dispatch on
    the actual footer type instead of assuming, and they do it for
    EVERY timestamp column of every table (orders/lineitem dates are
    timestamp[us] today and would break ~40 keys the same way if they
    flipped).

    Cache key (ADVICE r5): a single file keys on (path, mtime_ns,
    size) — size is the cheap second discriminator for filesystems with
    coarse mtime ticks, where an in-process rewrite can land in the
    same tick. A directory keys on the FULL sorted part list with each
    part's (mtime_ns, size), so adding/rewriting ANY part re-dispatches
    (keying only parts[0] served stale answers when other parts moved).
    Directories additionally peek EVERY part footer and refuse a
    mixed-unit table loudly — a single-unit dispatch cannot represent
    one, and any subset peek can miss the odd part out."""
    import glob as _glob

    if os.path.isdir(path):  # Spark-written table: peek part files
        parts = sorted(_glob.glob(os.path.join(path, "*.parquet")))
        if not parts:
            return ()
        try:
            fingerprint = tuple(
                (os.path.basename(p), st.st_mtime_ns, st.st_size)
                for p in parts for st in (os.stat(p),)
            )
        except OSError:
            return ()
        # peek EVERY part: first+last missed a differing unit in an
        # interior part (partial compaction, or lexicographic part
        # ordering interleaving two writers' files), silently misreading
        # it — the exact incident class this guard exists to refuse.
        # Footer reads are metadata-only (~ms each) and the result is
        # cached per directory fingerprint, so the cost is one-time per
        # table version; a 100 TB table with thousands of parts pays it
        # once at first dispatch, not per query.
        return _nanos_ts_columns_at(tuple(parts), fingerprint)
    try:
        st = os.stat(path)
    except OSError:
        return ()
    return _nanos_ts_columns_at((path,), (st.st_mtime_ns, st.st_size))


@functools.lru_cache(maxsize=256)
def _nanos_ts_columns_at(peek_paths: tuple, fingerprint: tuple
                         ) -> tuple[str, ...]:
    import pyarrow.parquet as pq

    per_part = []
    for p in peek_paths:
        try:
            schema = pq.read_schema(p)
        except Exception as exc:
            if len(peek_paths) > 1:
                # a directory with one unreadable footer (mid-write,
                # truncated) must refuse LOUDLY: swallowing it would
                # return () for the whole table and silently disable
                # both the nanos dispatch and the mixed-unit guard —
                # the exact silent-misread this function exists to
                # prevent. (A single bad file fails Spark's own read
                # immediately, so () is harmless there.)
                raise ValueError(
                    f"unreadable parquet footer in part file {p} "
                    f"(of {len(peek_paths)} parts): cannot determine "
                    f"the table's timestamp unit — is a writer still "
                    f"running? ({exc})"
                ) from exc
            return ()
        per_part.append(tuple(
            f.name for f in schema if getattr(f.type, "unit", None) == "ns"
        ))
    if len(set(per_part)) > 1:
        # report the MINORITY unit as the anomaly (the majority defines
        # "the table"; blaming whichever cols differ from parts[0] would
        # finger the nine good parts when the one stray sorts first)
        from collections import Counter

        majority = Counter(per_part).most_common(1)[0][0]
        odd = [
            (p, cols) for p, cols in zip(peek_paths, per_part)
            if cols != majority
        ]
        raise ValueError(
            f"mixed TIMESTAMP units across part files of one table: "
            f"{len(peek_paths) - len(odd)} of {len(peek_paths)} parts "
            f"have nanos columns {majority} but {odd[0][0]} has "
            f"{odd[0][1]} ({len(odd)} minority part(s)); a single-unit "
            "reader dispatch cannot represent this — rewrite the table "
            "with one unit"
        )
    return per_part[0]


def events_ts_is_nanos(path: str) -> bool:
    """True iff the events parquet stores ``ts`` as TIMESTAMP(NANOS)."""
    return "ts" in nanos_ts_columns(path)


def _path_fingerprint(path: str):
    """Cheap identity of a parquet source for driver-side caches: a
    file is (mtime_ns, size); a directory is the full sorted part list
    with each part's (mtime_ns, size) — the same invalidation rule as
    :func:`nanos_ts_columns`. ``None`` = unstat-able (don't cache)."""
    import glob as _glob

    try:
        if os.path.isdir(path):
            return tuple(
                (os.path.basename(p), st.st_mtime_ns, st.st_size)
                for p in sorted(_glob.glob(os.path.join(path, "*.parquet")))
                for st in (os.stat(p),)
            )
        st = os.stat(path)
        return (st.st_mtime_ns, st.st_size)
    except OSError:
        return None


# Driver-side parquet schema cache (r14 optimization round, guide §1/§5:
# the driver should do almost no per-query work). ``spark.read.parquet``
# pays ~140 ms of py4j + Hadoop footer inference PER CALL; with ~190
# ``table()`` call sites × 2 bench reps that inference was ~25% of the
# whole sf0.1 board's wall. Passing the cached schema back to the reader
# (``spark.read.schema(s).parquet(path)``) skips inference (~19 ms) and
# changes NOTHING downstream: the relation still gets fresh attribute
# ids (no self-join aliasing hazard), and column pruning + predicate
# pushdown are scan-time properties, unaffected (asserted in
# tests/test_plans.py PushedFilters checks). Keyed on the same
# fingerprint rule as the nanos dispatch, so a rewritten file re-infers.
#
# Scope assumption (r14 ADVICE): the cache is process-global, keyed on
# (path, fingerprint) only — NOT on the SparkSession or on parquet-
# inference confs (e.g. spark.sql.parquet.inferTimestampNTZ.enabled).
# Every session in this engine comes from session.get_session with
# uniform parquet-inference settings, so one inferred schema is valid
# process-wide; a host application mixing sessions with DIFFERENT
# inference confs must clear _SCHEMA_CACHE between them (or key a fork
# of this cache on the session, the _VIEW_MEMO pattern).
_SCHEMA_CACHE: dict[tuple, object] = {}


def _read_parquet_cached(spark: SparkSession, path: str) -> DataFrame:
    fp = _path_fingerprint(path)
    if fp is None:
        return spark.read.parquet(path)
    key = (path, fp)
    sch = _SCHEMA_CACHE.get(key)
    if sch is None:
        df = spark.read.parquet(path)
        if len(_SCHEMA_CACHE) > 256:  # bound: a few bytes per entry
            _SCHEMA_CACHE.clear()
        _SCHEMA_CACHE[key] = df.schema
        return df
    return spark.read.schema(sch).parquet(path)


def _read_parquet_dispatch(spark: SparkSession,
                           paths: tuple[str, ...]) -> DataFrame:
    """Read an explicit set of parquet part files with the same
    nanos-footer dispatch :func:`table` applies to whole sources —
    used by the incremental layout path, which reads only the parts a
    source APPENDED (the whole-source readers can't scope to a
    subset). Mixed units among the given parts refuse loudly via
    :func:`_nanos_ts_columns_at`."""
    try:
        fingerprint = tuple(
            (os.path.basename(p), st.st_mtime_ns, st.st_size)
            for p in paths for st in (os.stat(p),)
        )
    except OSError:
        fingerprint = paths
    ns_cols = _nanos_ts_columns_at(tuple(paths), fingerprint)
    if ns_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(*paths)
    for c in ns_cols:
        df = df.withColumn(
            c,
            F.timestamp_micros(F.expr(f"`{c}` div 1000"))
            .cast("timestamp_ntz"),
        )
    return df


def table(spark: SparkSession, sf_dir: str, name: str,
          with_derived: bool = False) -> DataFrame:
    """Read one testdata table (one parquet file per TESTDATA.md).

    ``with_derived=True`` additionally exposes the table's registered
    derived layout columns (``LAYOUT_DERIVED``, e.g. embeddings'
    ``graft_lsh_bucket``): served STORED (pre-partitioned) when a
    layout is registered, computed on the fly otherwise — value-
    identical either way, so query results never depend on whether the
    index exists (the reference's expression-index economics:
    ``sql/init.sql:44-47``). Default serves the plain schema — derived
    columns are dropped from a served layout so ordinary consumers see
    the source schema unchanged.

    Timestamps are parquet timestamp[us] (→ native ``TIMESTAMP_NTZ``;
    session tz is pinned UTC by session.py so NTZ↔epoch conversions are
    deterministic). Any column a regenerated file stores as
    TIMESTAMP(NANOS) — which Spark's micro-precision engine cannot
    represent — is read as a long and floor-divided to micros, the same
    truncation DuckDB applies when casting ns → its micro-precision
    TIMESTAMP, so oracle comparisons agree either way.

    When a workload layout is registered for (this session, this
    ``sf_dir``) — see :func:`build_workload_layout` — and serving is on
    (``spark.spark_graft.layout_serve``, default true), the bucketed
    copy is returned instead: same rows and schema, plus the persisted
    hash-partitioning that lets every orderkey join/aggregate plan
    without an Exchange. The reference's index transparency
    (``sql/init.sql:44-47``: queries don't opt in to indexes) for
    Spark."""
    bucketed = spark.conf.get(_layout_conf_key(sf_dir, name), None)
    if bucketed is not None and (
        spark.conf.get(LAYOUT_SERVE_CONF, "true").lower() == "true"
    ):
        # staleness gate (refuse loudly, the footer-type-gate posture):
        # an index must never silently serve rows its source no longer
        # has. Metadata-only stat walk, ~µs per call at plan build.
        src = os.path.join(sf_dir, f"{name}.parquet")
        built_fp = spark.conf.get(
            _layout_conf_key(sf_dir, name) + ".src", None)
        if built_fp is not None:
            try:
                cur_fp = _source_fingerprint(src)
            except (FileNotFoundError, OSError) as exc:
                # a DELETED source is the extreme staleness case — the
                # gate must still speak in its own vocabulary, not leak
                # a bare os.stat error (r8 ADVICE)
                raise ValueError(
                    f"workload layout {bucketed!r} is STALE: the source "
                    f"{src} no longer exists ({exc}). Drop the layout "
                    f"(drop_workload_layout) or restore the source."
                ) from exc
            if cur_fp != built_fp:
                raise ValueError(
                    f"workload layout {bucketed!r} is STALE: the source "
                    f"{src} changed after the layout was built. Rebuild "
                    f"with build_workload_layout(..., rebuild=True), or "
                    f"drop it (drop_workload_layout) to fall back to the "
                    f"plain scan."
                )
        served = spark.table(bucketed)
        derived = LAYOUT_DERIVED.get(name, {})
        if derived and with_derived:
            missing = [c for c in derived if c not in served.columns]
            if missing:
                # backstop for a layout built under an older derived-
                # column set that slipped past the manifest gate (e.g.
                # conf-registered in this session before an engine
                # upgrade): refuse loudly rather than fail analysis
                raise ValueError(
                    f"workload layout {bucketed!r} lacks derived "
                    f"column(s) {missing} the current engine defines — "
                    f"it was built under an older LAYOUT_DERIVED set. "
                    f"Rebuild with build_workload_layout(..., "
                    f"rebuild=True).")
        if derived and not with_derived:
            served = served.drop(*derived)
        return served
    path = os.path.join(sf_dir, f"{name}.parquet")
    ns_cols = nanos_ts_columns(path)
    if ns_cols:
        # session-scoped by design, NOT restored: the scan evaluates
        # lazily (possibly long after this call), so the flag must
        # outlive the builder. Only set when a file actually IS nanos;
        # a session also reading OTHER nanos parquet it wants typed as
        # long would need a separate session.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        for c in ns_cols:
            # cast to NTZ so both dispatch branches yield the SAME type
            # (micros files read natively as NTZ); under the UTC-pinned
            # session the LTZ→NTZ cast is wall-clock identity.
            df = df.withColumn(
                c,
                F.timestamp_micros(F.expr(f"`{c}` div 1000"))
                .cast("timestamp_ntz"),
            )
    else:
        df = _read_parquet_cached(spark, path)
    if with_derived:
        for col_name, factory in LAYOUT_DERIVED.get(name, {}).items():
            df = df.withColumn(col_name, factory(df))
    return df


# Per-session view-registration memo (r14 optimization round):
# ``createOrReplaceTempView`` costs ~110 ms of py4j/catalog work per
# view per call, and the SQL-surface keys re-registered identical views
# every bench rep. The memo records what each view name was last
# registered AS — (sf_dir, source fingerprint, layout-serving state) —
# and skips the re-registration only on an exact match, so a changed
# file, a different sf_dir, a registered/dropped layout, or a new
# session re-registers exactly as before. Keyed weakly on the session
# object: a stopped/recreated session starts with an empty memo.
import weakref as _weakref

_VIEW_MEMO: "_weakref.WeakKeyDictionary[SparkSession, dict]" = (
    _weakref.WeakKeyDictionary()
)


def register_views(spark: SparkSession, sf_dir: str,
                   names: tuple[str, ...] = TESTDATA_TABLES) -> None:
    """CREATE-OR-REPLACE temp views for SQL-surface queries (C30/C31).

    Mirrors ``CREATE TABLE IF NOT EXISTS`` idempotency
    (``sql/init.sql:12,21``): safe to call repeatedly.

    Invariant (r14 ADVICE): temp views named after TESTDATA_TABLES are
    only ever (re)registered THROUGH this function — the per-session
    memo below skips a re-registration when (sf_dir, source
    fingerprint, layout state) are unchanged, so any code that drops or
    overwrites one of these view names outside this function would be
    silently masked by the skip. No such code exists; a future drop
    helper must also clear the session's ``_VIEW_MEMO`` entry.
    """
    try:
        memo = _VIEW_MEMO.setdefault(spark, {})
    except TypeError:  # un-weakref-able session stub (tests)
        memo = {}
    serve = spark.conf.get(LAYOUT_SERVE_CONF, "true")
    for name in names:
        path = os.path.join(sf_dir, f"{name}.parquet")
        state = (sf_dir, _path_fingerprint(path),
                 spark.conf.get(_layout_conf_key(sf_dir, name), None),
                 serve)
        if memo.get(name) == state:
            continue
        table(spark, sf_dir, name).createOrReplaceTempView(name)
        memo[name] = state


def bootstrap_database(spark: SparkSession, db: str = "nyc") -> None:
    """``CREATE SCHEMA IF NOT EXISTS nyc`` (``sql/init.sql:9``) equivalent."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")


# ------------------------------------------------------- A15 workload layout
# The reference builds its indexes ONCE in DDL and every query uses them
# transparently (``sql/init.sql:44-47`` — no per-query opt-in). This is
# that economics for Spark: one bucketed build of the orderkey-keyed fact
# tables, after which :func:`table` serves the bucketed copies to EVERY
# query in the session — the orderkey workload class (tpch q3/q9/q18/q21-
# shaped joins and aggregates, including group-bys on orderkey SUPERSETS)
# stops shuffling the facts. Measured at K=100: 2.4–4.3× with 2→0 / 4→1
# Exchanges (SCALE.md §13c); proved through the ordinary registry keys —
# identical results and strictly fewer shuffles — in
# tests/test_workload_layout.py. The build cost is paid once per layout
# dir and amortizes across every subsequent orderkey query (115 s built
# both facts at K=100, repaid within a handful of q18/q21 runs).

LAYOUT_BUCKET_KEYS = {
    "orders": "o_orderkey", "lineitem": "l_orderkey",
    # r9 (verdict ask 2): the dedup/ANN family's layout class.
    # documents buckets on the STORED doc_id — hash partitioning is
    # preserved through Generate (explode), so every tokenize→explode→
    # groupBy(doc_id) aggregate in the F-group (f10 simhash, f25/f26
    # passage rollups, f29 unigram LM, f30 n-gram decontamination)
    # plans with ZERO Exchanges, no query changes (probed before
    # productizing: explode→groupBy(doc_id) 1→0 exchanges).
    "documents": "doc_id",
    # embeddings lays out on a DERIVED column: the fixed-hyperplane LSH
    # bucket (f3_lsh_ann's bucket rule), materialized at build — a
    # persisted ANN index. Static planes are exactly the indexable
    # class: appended vectors land in the same buckets, so incremental
    # maintenance stays valid; the data-ADAPTIVE quantizers (f13's
    # split refinement, f21's seed/k-means cells) are deliberately NOT
    # layout keys — their bucket rule changes with the data, so an
    # append would silently invalidate the stored assignment (they
    # need periodic refit, a rebuild, not maintenance).
    "embeddings": "graft_lsh_bucket",
}
# Tables laid out as VALUE-PARTITIONED (one directory per key value)
# instead of hash-bucketed. For an ANN index the win is SCAN PRUNING,
# not shuffle avoidance — the query side is small and broadcasts, so
# the candidate side never shuffles anyway; what a 100 TB index must
# avoid is READING the 99% of buckets no query probes. Partitioning by
# the bucket value makes Spark's dynamic partition pruning scope the
# candidate scan to exactly the probed buckets (verified in the plan:
# ``dynamicpruningexpression(graft_lsh_bucket IN ...)``); bucket count
# is the LSH plane count's 2^n, which is deliberately bounded (IVF-file
# shape: cells = directories).
LAYOUT_VALUE_PARTITIONED = {"embeddings"}
# Join families: tables that equi-join each other on their bucket keys
# must share ONE bucket count or the shuffle-free join property is
# silently lost (hash(x) mod 128 and mod 64 land the same key in
# different buckets). Tables in different families never join on their
# bucket keys, so their counts are independent (documents/embeddings
# each stand alone: the F-group never joins them to the TPC-H facts
# on bucket keys).
LAYOUT_FAMILIES = {"orders": "orderkey", "lineitem": "orderkey"}
LAYOUT_SERVE_CONF = "spark.spark_graft.layout_serve"


def _embeddings_lsh_bucket(df: DataFrame):
    """Derived bucket column for the embeddings layout: f3_lsh_ann's
    exact bucket expression (sign bits against the fixed seeded
    hyperplanes) over the raw ``embedding`` column. Lazy import — the
    plane literals and the shared bucket rule live with the query
    family (queries/llm.py) and llm imports this module. Memoized
    JVM-scoped (r10): the expression references its input by name and
    is df-independent, so one ~300-round-trip py4j build serves every
    table() call in the process instead of taxing each one ~0.3 s."""
    from .queries.llm import LSH_PLANES

    return _embeddings_lsh_bucket_at(len(LSH_PLANES))(df)


def _embeddings_lsh_bucket_at(n_planes: int):
    """Width-parameterized variant (r11, the wide-plane ANN layout):
    the SAME seeded prefix-stable plane stream, first ``n_planes``
    planes — plane i is identical at every width, so a 4-plane layout
    and a 10-plane layout agree on the shared sign bits and the
    4-plane oracle contract never moves. Deployments size the width
    with ``llm.lsh_planes_for(corpus_rows)`` (the measured §19c
    bucket-width rule) and build the layout AT that width, so the
    stored assignment — not a per-run tagging scan — is what the wide
    mode probes (SCALE.md §19c finding 2: the wide mode without a
    stored assignment goes tagging-scan-bound)."""
    def factory(df: DataFrame):
        from .queries.llm import bucket_expr

        return bucket_expr("lsh", n_planes, "embedding", as_double=True)

    return factory


def _derived_factories(name: str, lsh_planes: int | None) -> dict:
    """The derived-column factory map for one table, with the
    embeddings bucket bound to ``lsh_planes`` when given (None = the
    default 4-plane contract width)."""
    facs = dict(LAYOUT_DERIVED.get(name, {}))
    if name == "embeddings" and lsh_planes is not None:
        facs["graft_lsh_bucket"] = _embeddings_lsh_bucket_at(lsh_planes)
    return facs


def layout_lsh_planes(spark: SparkSession, sf_dir: str) -> int | None:
    """Plane width of the registered-and-serving embeddings layout's
    stored ``graft_lsh_bucket``, or None when no layout serves. The
    vector family gates on this: a stored bucket is only trusted when
    its build width matches the query's requested width — otherwise
    the bucket is recomputed inline and the layout is just a plain
    (correct, unpruned) scan."""
    if spark.conf.get(_layout_conf_key(sf_dir, "embeddings"),
                      None) is None:
        return None
    if spark.conf.get(LAYOUT_SERVE_CONF, "true").lower() != "true":
        return None
    from .queries.llm import LSH_PLANES

    return int(spark.conf.get(
        _layout_conf_key(sf_dir, "embeddings") + ".lsh_planes",
        str(len(LSH_PLANES))))


def _embeddings_nrm(df: DataFrame):
    """Derived vector norm (the metadata every real ANN index stores
    next to its postings): the vector family's exact ``_norm`` over the
    double-cast embedding, so cosines ride a stored scalar instead of a
    per-query 64-element fold over every candidate row. Memoized
    JVM-scoped like the bucket expression."""
    from .queries.llm import nrm_expr

    return nrm_expr("embedding", as_double=True)


# table -> {derived_col_name: factory(df) -> Column}; derived columns
# are MATERIALIZED into the layout table (bucketBy needs a stored
# column) and recomputed on the fly when no layout is registered, so
# ``table(..., with_derived=True)`` is value-identical either way.
# (Unused derived columns are column-pruned out of any plan that
# doesn't reference them — exposing several costs nothing per query.)
LAYOUT_DERIVED: dict[str, dict] = {
    "embeddings": {
        "graft_lsh_bucket": _embeddings_lsh_bucket,
        "graft_nrm": _embeddings_nrm,
    },
}


def _layout_conf_key(sf_dir: str, name: str) -> str:
    """Session-conf key registering the bucketed twin of one table.

    Keyed on the resolved sf_dir so one session can hold layouts for
    several data dirs (tests at sf0.001, bench at sf0.1) without
    cross-serving. Conf-based (not module state) so the registration is
    per-SparkSession and dies with it — a fresh session never sees a
    stale layout."""
    import hashlib

    h = hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    return f"spark.spark_graft.layout.{h}.{name}"


def _source_parts(path: str) -> dict[str, list[int]]:
    """Per-part metadata map of a parquet source (single file or
    Spark-written directory): ``{basename: [mtime_ns, size]}``, the
    same discriminator the nanos-dispatch cache uses. Metadata-only
    (os.stat), no data IO. This is the unit the incremental layout
    maintenance diffs: an append-only ingest adds entries without
    touching existing ones."""
    import glob as _glob

    if os.path.isdir(path):
        parts = sorted(_glob.glob(os.path.join(path, "*.parquet")))
    else:
        parts = [path]
    return {
        os.path.basename(p): [st.st_mtime_ns, st.st_size]
        for p in parts for st in (os.stat(p),)
    }


def _fingerprint_of(parts: dict[str, list[int]]) -> str:
    import hashlib

    acc = hashlib.sha1()
    for name in sorted(parts):
        mt, sz = parts[name]
        acc.update(f"{name}:{mt}:{sz};".encode())
    return acc.hexdigest()[:16]


def _source_fingerprint(path: str) -> str:
    """Cheap content-version fingerprint of a parquet source: sha1 over
    the sorted per-part (mtime_ns, size) map."""
    return _fingerprint_of(_source_parts(path))


def _manifest_path(layout_path: str, tbl: str) -> str:
    # underscore-prefixed: Spark's file index ignores it, so it can
    # live INSIDE the table directory and travel with the data
    return os.path.join(layout_path, tbl, "_graft_manifest.json")


def _read_manifest(layout_path: str, tbl: str) -> dict | None:
    import json

    try:
        with open(_manifest_path(layout_path, tbl)) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def _write_manifest(layout_path: str, tbl: str, manifest: dict) -> None:
    import json

    with open(_manifest_path(layout_path, tbl), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
        f.write("\n")


def _acquire_build_lock(path: str) -> str:
    """Single-writer gate for a layout directory (r9, verdict ask 7):
    two sessions building the same ``path`` would race
    ``write_bucketed`` into one external location. O_EXCL creation is
    the atomic claim; the holder's pid is recorded so a crashed
    builder's stale lock is detected (dead pid → the lock is stolen
    and the build proceeds — crash recovery, not contention) while a
    LIVE builder raises loudly. Same-host scope by design: this engine
    deploys one driver per layout build (the reference's own
    single-writer posture, ``terraform/main.tf:149-165``); builders on
    different hosts against shared storage need an external
    coordinator, which a pid file cannot be."""
    os.makedirs(path, exist_ok=True)
    lock = os.path.join(path, "_graft_build.lock")
    while True:
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.write(fd, f"{os.getpid()}\n".encode())
            os.close(fd)
            return lock
        except FileExistsError:
            try:
                with open(lock) as f:
                    holder = int(f.read().strip() or "0")
            except (OSError, ValueError):
                holder = 0
            alive = False
            if holder > 0:
                try:
                    os.kill(holder, 0)
                    alive = True
                except ProcessLookupError:
                    alive = False
                except PermissionError:
                    # EPERM ≠ dead: the pid EXISTS but belongs to
                    # another user (shared-host build). Treating it as
                    # dead would steal a live builder's lock — the
                    # exact race the lock exists to prevent. Only
                    # ESRCH proves the holder is gone. (r10 ADVICE)
                    alive = True
            if alive:
                raise RuntimeError(
                    f"another layout build (pid {holder}) holds "
                    f"{lock}; concurrent builds into one layout path "
                    f"race the table writes. Wait for it, or remove "
                    f"the lock if you are certain it is abandoned."
                )
            # stale lock from a crashed builder: steal and retry the
            # atomic claim (another waiter may steal first — loop)
            try:
                os.remove(lock)
            except OSError:
                pass


def build_workload_layout(
    spark: SparkSession,
    sf_dir: str,
    path: str,
    buckets: int | None = None,
    tables: tuple[str, ...] = ("orders", "lineitem"),
    rebuild: bool = False,
    lsh_planes: int | None = None,
) -> dict[str, str]:
    """Build + register the bucketed workload layout — Spark's
    ``CREATE INDEX`` (A15, ``sql/init.sql:44-47``).

    ``lsh_planes`` (r11) sets the plane width of the embeddings
    layout's stored LSH bucket (default: the 4-plane oracle-contract
    width; deployments pass ``llm.lsh_planes_for(corpus_rows)``). Like
    an explicit ``buckets``, an explicit width that mismatches an
    existing fresh layout triggers a full rebuild; ``None`` reuses
    whatever width the manifest records. The width is registered in
    session conf and consulted by the vector family
    (:func:`layout_lsh_planes`): a query probing at a different width
    than the stored assignment recomputes buckets inline instead of
    trusting mismatched storage.

    Each fact table is rewritten once as a hash-bucketed, per-bucket-
    sorted external table on its orderkey (``io.write_bucketed``) under
    ``path``, then registered in the session conf so :func:`table`
    transparently serves it. Idempotent like ``CREATE INDEX IF NOT
    EXISTS``: an existing layout table is re-registered without a
    rebuild unless ``rebuild=True`` (use after the source data changed).
    Returns ``{source_name: layout_table_name}``.

    Sizing: ``buckets`` fixes BOTH the scan parallelism (a bucketed
    scan runs one task per bucket — AQE cannot re-split it) and the
    join/agg parallelism for every consumer, so it must scale with the
    CLUSTER, not the data. Default: ``4 × defaultParallelism`` (floor
    32). Measured at K=1000 (~600 M lineitem rows, 32 cores, SCALE.md
    §15c): 32 buckets STARVES the scan — q3/q9 run 1.9-2.3× SLOWER than
    plain despite fewer exchanges — while 128 (4× cores) wins 1.9-2.2×
    on q3/q9/q18; undersizing the bucket count turns the index into a
    regression. Both tables must share the count or the shuffle-free
    join property is lost (enforced here by building them together).
    Disable serving without dropping via
    ``spark.conf.set(LAYOUT_SERVE_CONF, "false")`` — the A/B switch
    tests and operators use.

    Subset builds (``tables=("lineitem",)``) keep the one-count-per-
    family invariant (r8 ADVICE): if a sibling in the same join family
    (``LAYOUT_FAMILIES``) is already registered, ``buckets=None``
    REUSES the sibling's count, and an explicit mismatching ``buckets``
    raises — a family split across two counts would silently lose the
    shuffle-free join the layout exists for.

    Maintenance is INCREMENTAL for append-only sources (r9, verdict
    ask 1): each build persists a ``_graft_manifest.json`` inside the
    layout table dir recording the source's per-part (mtime_ns, size)
    map. When the source drifts by strictly ADDING part files — the
    reference's own monthly-append ingest pattern
    (``python/ingest_data.py:160-166``) — only the new parts are read,
    bucketized, and APPENDED into the existing bucketed table (a
    bucketed INSERT: one new sorted run per touched bucket), so a
    month's maintenance costs O(month), not O(100 TB fact). Any drift
    the diff can't scope — a modified or deleted part, a changed
    bucket count or key — keeps the loud full-rebuild posture. The
    manifest also lets a FRESH session re-register a still-fresh
    layout without any rebuild (the fingerprint used to live only in
    session conf, so every new session paid a full build)."""
    # family-consistency gate BEFORE defaulting: a registered sibling's
    # count wins over the parallelism default
    buckets_explicit = buckets is not None
    for name in tables:
        fam = LAYOUT_FAMILIES.get(name)
        if fam is None:
            continue
        for sib, sib_fam in LAYOUT_FAMILIES.items():
            if sib_fam != fam or sib in tables:
                continue
            sib_buckets = spark.conf.get(
                _layout_conf_key(sf_dir, sib) + ".buckets", None)
            if sib_buckets is None:
                continue
            if buckets is None:
                buckets = int(sib_buckets)
            elif int(buckets) != int(sib_buckets):
                raise ValueError(
                    f"bucket-count mismatch within join family {fam!r}: "
                    f"{sib!r} is registered at {sib_buckets} buckets but "
                    f"this build of {name!r} asked for {buckets}. Both "
                    f"facts must share one count for shuffle-free joins "
                    f"— rebuild the whole family together, or pass "
                    f"buckets={sib_buckets}."
                )
    if buckets is None:
        buckets = max(32, 4 * spark.sparkContext.defaultParallelism)
    if lsh_planes is not None:
        # same validation f3's env gate applies (r11 review): the plane
        # stream is a 16-deep seeded prefix and bucket_expr silently
        # truncates past it — an out-of-range width would build an
        # index LABELED wider than its data, which no query width could
        # ever match (permanently unserved) and which a later in-range
        # call would needlessly full-rebuild
        from .queries.llm import _LSH_MAX_PLANES, _N_LSH_PLANES

        if not _N_LSH_PLANES <= int(lsh_planes) <= _LSH_MAX_PLANES:
            raise ValueError(
                f"lsh_planes={lsh_planes} outside "
                f"[{_N_LSH_PLANES}, {_LSH_MAX_PLANES}] — the seeded "
                f"plane prefix holds {_LSH_MAX_PLANES} planes and the "
                f"oracle contract floors at {_N_LSH_PLANES}")

    lock = _acquire_build_lock(path)
    try:
        return _build_layout_tables(spark, sf_dir, path, buckets,
                                    buckets_explicit, tables, rebuild,
                                    lsh_planes)
    finally:
        try:
            os.remove(lock)
        except OSError:
            pass


def _build_layout_tables(
    spark: SparkSession,
    sf_dir: str,
    path: str,
    buckets: int,
    buckets_explicit: bool,
    tables: tuple[str, ...],
    rebuild: bool,
    lsh_planes: int | None = None,
) -> dict[str, str]:
    from . import io as _io

    built: dict[str, str] = {}
    for name in tables:
        key = LAYOUT_BUCKET_KEYS[name]  # KeyError = not a layout table
        h = _layout_conf_key(sf_dir, name).split(".")[-2]
        tbl = f"spark_graft_layout_{h}_{name}"
        conf_key = _layout_conf_key(sf_dir, name)
        src_path = os.path.join(sf_dir, f"{name}.parquet")
        cur_parts = _source_parts(src_path)
        cur_fp = _fingerprint_of(cur_parts)
        _recover_compact_swap(path, tbl)  # r14 ask 2: heal killed swap
        manifest = _read_manifest(path, tbl)
        # the manifest (written atomically with the data) is the
        # on-disk truth of which source version the table was built
        # from; session conf is the fallback for pre-manifest layouts
        built_fp = (manifest or {}).get("fingerprint") \
            or spark.conf.get(conf_key + ".src", None)
        # r11: plane width of the embeddings stored LSH bucket —
        # explicit param > manifest-recorded width > the 4-plane
        # contract default (a pre-r11 manifest without the field IS
        # the default width)
        if name == "embeddings":
            from .queries.llm import LSH_PLANES as _LSH_DEFAULT

            planes_req = lsh_planes
            default_planes = len(_LSH_DEFAULT)
            manifest_planes = (manifest or {}).get("lsh_planes")
            # stored width of an EXISTING build: manifest first; for a
            # conf-only pre-manifest layout (manifest None) fall back
            # to the .lsh_planes conf set at the original build —
            # otherwise a wide stored assignment would silently
            # re-register as the 4-plane default and _embeddings would
            # trust a wide bucket as 4-plane (r11 ADVICE)
            conf_planes = spark.conf.get(conf_key + ".lsh_planes", None)
            stored_planes = manifest_planes or (
                int(conf_planes) if conf_planes else None)
            eff_planes: int | None = (planes_req or stored_planes
                                      or default_planes)
        else:
            planes_req = None
            default_planes = 0
            manifest_planes = None
            stored_planes = None
            eff_planes = None

        def _toctou_gate(what: str) -> None:
            # r8 ADVICE: the fingerprint was taken BEFORE a potentially
            # minutes-long build; a source mutated mid-build must not
            # be registered as fresh. Re-stat, drop the manifest (the
            # table's contents are a mix of versions — the next build
            # must be full), refuse loudly.
            post_fp = _source_fingerprint(src_path)
            if post_fp != cur_fp:
                try:
                    os.remove(_manifest_path(path, tbl))
                except OSError:
                    pass
                raise ValueError(
                    f"source {src_path} changed WHILE the layout for "
                    f"{name!r} was {what} (fingerprint {cur_fp} → "
                    f"{post_fp}); the built table is a mix of versions "
                    f"and was NOT registered. Re-run "
                    f"build_workload_layout once the source is settled."
                )

        def _full_build() -> None:
            # read the PLAIN source explicitly (serve flag off for this
            # read): rebuilding with the layout registered must not
            # read the layout table into itself
            prev = spark.conf.get(LAYOUT_SERVE_CONF, "true")
            spark.conf.set(LAYOUT_SERVE_CONF, "false")
            try:
                # materialize the derived bucket columns (computed on
                # the fly by the plain path) into the table, bound to
                # this build's plane width (r11)
                src = table(spark, sf_dir, name)
                for cn, fac in _derived_factories(name,
                                                  eff_planes).items():
                    src = src.withColumn(cn, fac(src))
            finally:
                spark.conf.set(LAYOUT_SERVE_CONF, prev)
            if name in LAYOUT_VALUE_PARTITIONED:
                # co-locate each partition VALUE into one task before
                # the partitioned write (r11): an unrepartitioned frame
                # writes every input partition × every value it touches
                # — at a wide-plane LSH layout (2^11+ dirs × 64 input
                # partitions) that is the 100k-tiny-files failure mode;
                # repartition(key) caps files at ~one per value (the
                # posture _compact_one already takes)
                _io.write_value_partitioned(
                    src.repartition(F.col(key)), tbl, key,
                    path=os.path.join(path, tbl))
            else:
                _io.write_bucketed(src, tbl, key, buckets=buckets,
                                   path=os.path.join(path, tbl))
            _toctou_gate("building")
            _write_manifest(path, tbl, {
                "fingerprint": cur_fp, "parts": cur_parts,
                "buckets": int(buckets), "key": key, "source": src_path,
                "mode": ("partitioned" if name in LAYOUT_VALUE_PARTITIONED
                         else "bucketed"),
                "derived": sorted(LAYOUT_DERIVED.get(name, {})),
                **({"lsh_planes": int(eff_planes)}
                   if name == "embeddings" else {}),
            })

        reg_buckets = int(buckets)
        # a layout built under an OLDER derived-column set must be
        # rebuilt in full — re-registering it would serve a schema the
        # engine no longer produces (missing graft_* columns), and an
        # incremental append would write rows the old files lack
        derived_drift = (
            manifest is not None
            and manifest.get("derived", [])
            != sorted(LAYOUT_DERIVED.get(name, {}))
        )
        if rebuild or not spark.catalog.tableExists(tbl) \
                or built_fp is None or derived_drift:
            # missing or version-unknown table must never be re-blessed
            # against the current source; build IS the rebuild,
            # CREATE INDEX style
            _full_build()
        elif built_fp == cur_fp:
            existing = (int(manifest["buckets"]) if manifest is not None
                        else int(spark.conf.get(
                            conf_key + ".buckets", str(int(buckets)))))
            planes_mismatch = (
                planes_req is not None
                and planes_req != (stored_planes or default_planes))
            if (buckets_explicit and existing != int(buckets)) \
                    or planes_mismatch:
                # fresh table, but built at a DIFFERENT count/width
                # than the caller EXPLICITLY asked for: re-registering
                # the old build would silently hand back a layout the
                # caller didn't request, while the drift path treats
                # the same mismatch as a full-rebuild trigger. Match
                # that posture — rebuild as requested. (r10 ADVICE;
                # r11 extends it to the LSH plane width)
                _full_build()
            else:
                # fresh — register only (CREATE INDEX IF NOT EXISTS),
                # even from a brand-new session (manifest carries the
                # proof)
                reg_buckets = existing
                if name == "embeddings":
                    eff_planes = stored_planes or default_planes
        else:
            # drifted: diff the part maps — append-only drift is the
            # incremental path, anything else rebuilds in full
            old_parts = (manifest or {}).get("parts", {})
            new_names = [n for n in cur_parts if n not in old_parts]
            appended_only = (
                manifest is not None
                and manifest.get("key") == key
                and os.path.isdir(src_path)
                and bool(new_names)
                and all(cur_parts.get(n) == meta
                        for n, meta in old_parts.items())
                and (not buckets_explicit
                     or int(buckets) == int(manifest["buckets"]))
                and (planes_req is None
                     or planes_req == (manifest_planes or default_planes))
            )
            if not appended_only:
                _full_build()
            else:
                if name == "embeddings":
                    # appended rows MUST get the stored assignment's
                    # width, whatever this call would default to
                    eff_planes = manifest_planes or default_planes
                delta = _read_parquet_dispatch(
                    spark, tuple(os.path.join(src_path, n)
                                 for n in sorted(new_names)))
                for cn, fac in _derived_factories(name,
                                                  eff_planes).items():
                    # static derived rules only (fixed-literal hashes):
                    # appended rows get the same bucket assignment the
                    # existing rows got at build
                    delta = delta.withColumn(cn, fac(delta))
                if name in LAYOUT_VALUE_PARTITIONED:
                    # same tiny-files guard as the full build: one new
                    # run per touched VALUE, not per (input partition ×
                    # value) — wide-plane layouts touch thousands of
                    # dirs per append otherwise
                    _io.write_value_partitioned(
                        delta.repartition(F.col(key)), tbl, key,
                        mode="append")
                else:
                    _io.write_bucketed(delta, tbl, key,
                                       buckets=int(manifest["buckets"]),
                                       mode="append")
                _toctou_gate("incrementally appending to")
                new_manifest = {
                    "fingerprint": cur_fp, "parts": cur_parts,
                    "buckets": int(manifest["buckets"]), "key": key,
                    "source": src_path,
                    "mode": manifest.get("mode", "bucketed"),
                    "derived": sorted(LAYOUT_DERIVED.get(name, {})),
                    "compactions": int(manifest.get("compactions", 0)),
                    "minor_compactions":
                        int(manifest.get("minor_compactions", 0)),
                    **({"lsh_planes": int(eff_planes)}
                       if name == "embeddings" else {}),
                }
                _write_manifest(path, tbl, new_manifest)
                reg_buckets = int(manifest["buckets"])
                # auto-compaction (r10, verdict ask 5): each append
                # lands one new sorted run per touched bucket; once the
                # average passes LAYOUT_COMPACT_RUNS_PER_BUCKET, merge
                # back to ~one file per bucket NOW, under the build
                # lock this path already holds — the policy decision
                # the manual compact_workload_layout left open.
                if (_runs_per_bucket(path, tbl, new_manifest)
                        > LAYOUT_COMPACT_RUNS_PER_BUCKET):
                    # MINOR compaction (r13): merge only the append
                    # runs, cost ∝ appended bytes — the pigeonhole
                    # guarantees at least one bucket is above the
                    # per-bucket threshold whenever the average trips
                    _minor_compact_one(spark, path, name, tbl)
        # fingerprint the source AS BUILT: table() refuses to serve the
        # layout once the source drifts from this
        spark.conf.set(conf_key + ".src", cur_fp)
        spark.conf.set(conf_key + ".buckets", str(reg_buckets))
        if name == "embeddings":
            # the width of the STORED assignment — layout_lsh_planes
            # reads this so the vector family only trusts a stored
            # bucket built at the width it is probing (r11)
            spark.conf.set(conf_key + ".lsh_planes", str(int(eff_planes)))
        spark.conf.set(conf_key, tbl)
        built[name] = tbl
    return built


def _layout_n_files(d: str) -> int:
    return sum(1 for root, _dirs, files in os.walk(d)
               for f in files if f.endswith(".parquet"))


def _runs_per_bucket(path: str, tbl: str, manifest: dict) -> float:
    """Average sorted runs per bucket/partition of a layout table —
    the auto-compaction trigger metric. Bucketed tables divide total
    parquet files by the bucket count; value-partitioned tables by the
    number of partition directories (each append lands ≤1 new file per
    touched bucket/partition, so the average tracks append cadence
    without parsing bucket ids out of file names)."""
    tbl_dir = os.path.join(path, tbl)
    n_files = _layout_n_files(tbl_dir)
    if manifest.get("mode") == "partitioned":
        n_parts = sum(
            1 for e in os.scandir(tbl_dir)
            if e.is_dir() and "=" in e.name)
        return n_files / max(1, n_parts)
    return n_files / max(1, int(manifest.get("buckets", 1)))


# Auto-compaction threshold (r10, verdict ask 5): compact a layout
# table once its appends average more than this many sorted runs per
# bucket. Economics from the K=100 lifecycle probe (SCALE.md §18a):
# one compaction costs ~½ an append (2.7 s vs 4.7 s) and resets the
# per-bucket read fan-in to 1, so triggering every ~4 appends keeps
# the amortized maintenance overhead ~15% while capping the
# small-files growth that §15c measured turning the layout into a
# regression. Tune per deployment cadence if needed.
LAYOUT_COMPACT_RUNS_PER_BUCKET = 4


def _compact_one(spark: SparkSession, path: str, name: str,
                 tbl: str) -> tuple[int, int]:
    """Compact ONE layout table back to ~one file per bucket. Assumes
    the caller holds the build lock (compact_workload_layout and the
    auto-compaction hook in the incremental-append path both do).
    Returns (files_before, files_after)."""
    import shutil

    from . import io as _io

    key = LAYOUT_BUCKET_KEYS[name]
    _recover_compact_swap(path, tbl)  # r14 ask 2: heal a killed swap
    manifest = _read_manifest(path, tbl)
    if manifest is None:
        raise ValueError(
            f"no manifest for layout table {tbl!r} under "
            f"{path!r} — compact only manifest-tracked layouts "
            f"(rebuild with build_workload_layout first)")
    tbl_dir = os.path.join(path, tbl)
    tmp_dir = os.path.join(path, tbl + "_compact_tmp")
    tmp_tbl = tbl + "_compact_tmp"

    before = _layout_n_files(tbl_dir)
    # read the FILES, not the catalog table: the bucketed
    # scan's partitioning already satisfies the repartition,
    # so the optimizer elides the exchange and each INPUT FILE
    # task writes its own bucket files — defeating the merge.
    # A plain file read carries no bucket metadata, so the
    # repartition really co-locates each bucket into one task
    # (observed: 12→9 files instead of 12→4 via spark.table).
    df = spark.read.parquet(tbl_dir)
    shutil.rmtree(tmp_dir, ignore_errors=True)
    spark.sql(f"DROP TABLE IF EXISTS {tmp_tbl}")
    if name in LAYOUT_VALUE_PARTITIONED:
        _io.write_value_partitioned(
            df.repartition(F.col(key)), tmp_tbl, key,
            path=tmp_dir)
    else:
        buckets = int(manifest["buckets"])
        _io.write_bucketed(
            df.repartition(buckets, F.col(key)), tmp_tbl, key,
            buckets=buckets, path=tmp_dir)
    # swap: catalog entry for the tmp table goes (external drop
    # keeps files), then the data directories trade places
    spark.sql(f"DROP TABLE {tmp_tbl}")
    _swap_compacted(spark, path, tbl, tmp_dir, {
        **manifest,
        "compactions": int(manifest.get("compactions", 0)) + 1,
    })
    return before, _layout_n_files(tbl_dir)


def _recover_compact_swap(path: str, tbl: str) -> None:
    """Writer-side heal of a compaction swap interrupted by PROCESS
    DEATH (r14, verdict ask 2 — proven by kill -9 injection, not
    simulated files: scripts/crash_injection_probe.py).

    :func:`_swap_compacted` trades directories in two renames; a crash
    between them leaves the live table directory MISSING with the
    pre-compaction tree parked at ``<tbl>_compact_old`` (its manifest
    inside — the manifest travels with the directory). Readers fail
    loudly in that window (the catalog table points at a missing
    path); the heal is O(1): rename the parked tree back. A crash
    AFTER the second rename but before the manifest write leaves a
    valid compacted tree with no manifest — that degrades to the loud
    full-rebuild posture (manifest None), correct but O(corpus), and
    is left alone here because the parked old tree is the
    known-good state only in the missing-target window.

    Called ONLY by maintainer entry points under the build lock
    (_compact_one, _minor_compact_one, _build_layout_tables) — the
    sketch-store posture: single maintainer heals, readers never
    mutate. Leftover ``_compact_tmp``/``_minor_scratch`` trees from a
    crashed run are cleared by the compaction paths themselves (they
    rmtree before building)."""
    import shutil

    tbl_dir = os.path.join(path, tbl)
    old_dir = tbl_dir + "_compact_old"
    if not os.path.isdir(tbl_dir) and os.path.isdir(old_dir):
        os.rename(old_dir, tbl_dir)
        return
    # both present: the crash landed after the second rename (new tree
    # live) — the parked old tree is superseded garbage
    if os.path.isdir(tbl_dir) and os.path.isdir(old_dir) \
            and _read_manifest(path, tbl) is not None:
        shutil.rmtree(old_dir, ignore_errors=True)


def _swap_compacted(spark: SparkSession, path: str, tbl: str,
                    tmp_dir: str, new_manifest: dict) -> None:
    """Directory-swap tail shared by major and minor compaction: trade
    the live table directory for the freshly-built ``tmp_dir``, write
    the manifest, REFRESH, delete the old tree — failure-safe."""
    import shutil

    from .crashpoints import crash_point

    tbl_dir = os.path.join(path, tbl)
    old_dir = os.path.join(path, tbl + "_compact_old")
    shutil.rmtree(old_dir, ignore_errors=True)
    os.rename(tbl_dir, old_dir)
    crash_point("layout_swap_between_renames")  # r14 ask 2: kill -9 seam
    try:
        os.rename(tmp_dir, tbl_dir)
        # the old manifest traveled away with old_dir; the
        # compacted tree gets a fresh one (same fingerprint —
        # the SOURCE didn't move)
        _write_manifest(path, tbl, new_manifest)
    except BaseException:
        # failure-safe swap (r10 ADVICE): the still-registered
        # catalog table must never point at a missing or
        # manifest-less directory — park whatever landed and
        # restore the original tree + manifest
        if os.path.isdir(old_dir):
            if os.path.isdir(tbl_dir):
                failed = tbl_dir + "_compact_failed"
                shutil.rmtree(failed, ignore_errors=True)
                os.rename(tbl_dir, failed)
            os.rename(old_dir, tbl_dir)
        raise
    # REFRESH before deleting the old tree: queries planned from here
    # on list the compacted files; only a query already executing
    # against the pre-swap listing races the delete (the honest limit
    # of directory-swap compaction on a plain filesystem — pinned by
    # tests/test_workload_layout.py's concurrent-reader test)
    spark.sql(f"REFRESH TABLE {tbl}")
    shutil.rmtree(old_dir, ignore_errors=True)


# Minor compaction merges a bucket's append RUNS once it holds at least
# this many files (largest file = the base, everything else = runs).
# 3 means: base + >= 2 accumulated runs — a bucket with one run keeps
# read fan-in 2, not worth a rewrite.
LAYOUT_MINOR_COMPACT_MIN_FILES = 3


def _minor_compact_one(spark: SparkSession, path: str, name: str,
                       tbl: str,
                       min_files: int = LAYOUT_MINOR_COMPACT_MIN_FILES,
                       ) -> tuple[int, int]:
    """SELECTIVE (LSM-minor) compaction of one layout table (r13,
    verdict ask 3): merge only the accumulated append RUNS — every
    file of a bucket/partition except its largest — and HARDLINK
    everything else into the new tree, so the rewrite cost scales with
    the APPENDED fraction, not the corpus size. r12 measured the full
    rewrite at 63.3 s vs 68.8 s rebuild at the 9.8 M-vector tier (8%
    margin — because _compact_one rewrites every bucket's base data);
    minor compaction reads and writes ONLY run bytes. Buckets below
    ``min_files`` are untouched (read fan-in ≤ 2 is fine); the base
    file of a compacted bucket is linked, never copied. Read fan-in
    after a pass is ≤ 2 (base + one merged run); the merged run grows
    with total appended data, so a periodic FULL compaction
    (``compact_workload_layout(..., full=True)``) remains the major
    step, LSM-style. The publish is the same atomic directory swap as
    the major path (one rename — the concurrent-reader race profile is
    unchanged). Caller holds the build lock. Returns
    (files_before, files_after); a no-op when no bucket crosses the
    threshold."""
    import re
    import shutil

    from . import io as _io

    key = LAYOUT_BUCKET_KEYS[name]
    _recover_compact_swap(path, tbl)  # r14 ask 2: heal a killed swap
    manifest = _read_manifest(path, tbl)
    if manifest is None:
        raise ValueError(
            f"no manifest for layout table {tbl!r} under {path!r} — "
            f"compact only manifest-tracked layouts "
            f"(rebuild with build_workload_layout first)")
    tbl_dir = os.path.join(path, tbl)
    before = _layout_n_files(tbl_dir)
    partitioned = name in LAYOUT_VALUE_PARTITIONED

    # group the data files by bucket: partition DIRECTORY for the
    # value-partitioned mode, bucket-id file-name suffix for the
    # bucketed mode (Spark writes part-...-<uuid>_NNNNN.c000...)
    groups: dict[str, list[str]] = {}
    if partitioned:
        for e in os.scandir(tbl_dir):
            if e.is_dir() and "=" in e.name:
                groups[e.name] = [
                    os.path.join(e.path, f) for f in os.listdir(e.path)
                    if f.endswith(".parquet")]
    else:
        for f in os.listdir(tbl_dir):
            if not f.endswith(".parquet"):
                continue
            m = re.search(r"_(\d+)\.c\d+", f)
            if m is None:
                raise ValueError(
                    f"cannot parse a bucket id out of {f!r} under "
                    f"{tbl_dir!r} — minor compaction needs the bucketed "
                    f"writer's file naming; run a full compaction.")
            groups.setdefault(m.group(1), []).append(
                os.path.join(tbl_dir, f))

    kept: list[str] = []
    runs: list[str] = []
    for files in groups.values():
        if len(files) >= min_files:
            by_size = sorted(files, key=os.path.getsize, reverse=True)
            kept.append(by_size[0])
            runs.extend(by_size[1:])
        else:
            kept.extend(files)
    if not runs:
        return before, before

    # ONE job merges every run (not a per-bucket loop): read only the
    # run files, repartition on the bucket key so each bucket's runs
    # land in one output file, write with the same layout writer so
    # bucket ids / partition values are preserved
    scratch = os.path.join(path, tbl + "_minor_scratch")
    scratch_tbl = tbl + "_minor_scratch"
    shutil.rmtree(scratch, ignore_errors=True)
    spark.sql(f"DROP TABLE IF EXISTS {scratch_tbl}")
    if partitioned:
        # basePath recovers the partition column from the dir names
        df = spark.read.option("basePath", tbl_dir).parquet(*runs)
        _io.write_value_partitioned(
            df.repartition(F.col(key)), scratch_tbl, key, path=scratch)
    else:
        buckets = int(manifest["buckets"])
        df = spark.read.parquet(*runs)
        _io.write_bucketed(
            df.repartition(buckets, F.col(key)), scratch_tbl, key,
            buckets=buckets, path=scratch)
    spark.sql(f"DROP TABLE {scratch_tbl}")

    from .crashpoints import crash_point

    crash_point("minor_compact_mid_scratch")  # r14 ask 2: kill -9 seam
    # assemble the new tree: hardlinks for every kept file (zero data
    # movement), the merged run files moved in from scratch
    tmp_dir = os.path.join(path, tbl + "_compact_tmp")
    shutil.rmtree(tmp_dir, ignore_errors=True)
    os.makedirs(tmp_dir)
    for f in kept:
        dst = os.path.join(tmp_dir, os.path.relpath(f, tbl_dir))
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        os.link(f, dst)
    for root, _dirs, files in os.walk(scratch):
        for f in files:
            if not f.endswith(".parquet"):
                continue
            src = os.path.join(root, f)
            dst = os.path.join(tmp_dir, os.path.relpath(src, scratch))
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            os.rename(src, dst)
    shutil.rmtree(scratch, ignore_errors=True)

    _swap_compacted(spark, path, tbl, tmp_dir, {
        **manifest,
        "minor_compactions":
            int(manifest.get("minor_compactions", 0)) + 1,
    })
    return before, _layout_n_files(tbl_dir)


def build_ann_index(spark: SparkSession, sf_dir: str,
                    path: str, rebuild: bool = False) -> dict:
    """The ANN deployment recipe as ONE call (r11): size the LSH plane
    width from the corpus with the measured §19c rule
    (``llm.lsh_planes_for`` — hold expected bucket width ≈ 2000), build
    the embeddings layout AT that width, and return what a deployment
    needs to know. Queries opt into the wide width explicitly
    (``SPARK_GRAFT_LSH_PLANES=<lsh_planes>`` for f3_lsh_ann) — the
    width is deliberately NOT auto-followed by default queries, because
    the engine's transparency invariant says results never depend on
    whether an index exists; an approximate op's RESULT changing with
    layout registration would break it (and the 4-plane oracle
    contract with it).

    Returns ``{"table": <layout table>, "lsh_planes": <width>,
    "corpus_rows": <n>, "buckets": 2**width}``. Measured at 3.16 M /
    9.8 M vectors (SCALE.md §20): layout-served wide queries run
    7.3× / 6.5× faster than the 4-plane layout and 10× / 18× faster
    than the scan-bound wide mode, recall 1.0."""
    from .queries.llm import lsh_planes_for

    prev = spark.conf.get(LAYOUT_SERVE_CONF, "true")
    spark.conf.set(LAYOUT_SERVE_CONF, "false")
    try:
        n = table(spark, sf_dir, "embeddings").count()
    finally:
        spark.conf.set(LAYOUT_SERVE_CONF, prev)
    width = lsh_planes_for(n)
    built = build_workload_layout(spark, sf_dir, path,
                                  tables=("embeddings",),
                                  rebuild=rebuild, lsh_planes=width)
    return {"table": built["embeddings"], "lsh_planes": width,
            "corpus_rows": n, "buckets": 1 << width}


def compact_workload_layout(spark: SparkSession, sf_dir: str,
                            path: str,
                            tables: tuple[str, ...] | None = None,
                            full: bool = True,
                            ) -> dict[str, tuple[int, int]]:
    """Merge a layout table's accumulated append runs back to one file
    per bucket (r9 — the maintenance seam incremental appends open):
    every :func:`build_workload_layout` append lands one new sorted
    file per touched bucket, so a monthly cadence grows files-per-
    bucket linearly and eventually hits the small-files pathology the
    layout exists to avoid. Compaction is the B-tree's merge step.

    Mechanics — no source re-read, no shuffle beyond one co-located
    repartition: the layout table is read back (one task per bucket),
    repartitioned on its own bucket key (Spark's repartition hash is
    the same Murmur3-pmod the bucketed writer uses, so each task holds
    exactly one bucket → exactly one output file per bucket), written
    bucketed to a temp location, and the files are SWAPPED under the
    unchanged catalog table (bucket ids live in the file names, which
    the swap preserves; REFRESH TABLE drops the stale listing). The
    manifest is rewritten with the SAME source fingerprint — the
    source didn't move, so staleness state and future incremental
    appends are unaffected. Value-partitioned tables compact the same
    way with a per-partition-value repartition. Single-writer via the
    build lockfile. Returns {table: (files_before, files_after)}.

    Since r10 this is also called AUTOMATICALLY by the maintenance
    path: an incremental append that pushes a table past
    ``LAYOUT_COMPACT_RUNS_PER_BUCKET`` average runs per bucket
    triggers a compaction of that table under the same build lock.

    ``full=False`` (r13, verdict ask 3) runs the SELECTIVE minor step
    instead — :func:`_minor_compact_one` merges only each bucket's
    accumulated append runs and hardlinks the untouched base files, so
    the cost scales with the appended fraction rather than the corpus
    size. The auto-compaction hook uses the minor step; call
    ``full=True`` periodically (the LSM major step) to return read
    fan-in to exactly one file per bucket."""
    names = tuple(tables) if tables is not None else tuple(LAYOUT_BUCKET_KEYS)
    unknown = sorted(n for n in names if n not in LAYOUT_BUCKET_KEYS)
    if unknown:
        raise ValueError(
            f"not layout tables: {unknown} — compactable tables are "
            f"{sorted(LAYOUT_BUCKET_KEYS)} (LAYOUT_BUCKET_KEYS)")
    lock = _acquire_build_lock(path)
    try:
        out: dict[str, tuple[int, int]] = {}
        for name in names:
            conf_key = _layout_conf_key(sf_dir, name)
            tbl = spark.conf.get(conf_key, None)
            if tbl is None:
                continue
            out[name] = (_compact_one(spark, path, name, tbl) if full
                         else _minor_compact_one(spark, path, name, tbl))
        return out
    finally:
        try:
            os.remove(lock)
        except OSError:
            pass


def check_stream_identity(owner, last: int, stream_id, batch_id: int,
                          what: str, advice: str) -> bool:
    """Shared exactly-once replay decision for every streaming
    maintainer — the sketch writers (queries/llm.py) and the layout
    ingest below delegate here so the rule can never drift between
    stores (r13 review; the rule itself is the r12 ADVICE fix):
    batch ids are only monotonic WITHIN one checkpoint, so the guard
    is keyed on (stream identity, batch id). Returns True when the
    batch is a replay (caller no-ops); raises when a DIFFERENT
    identity presents a non-monotonic batch id (a fresh/relocated
    checkpoint restarting at 0 — treating those as replays would
    silently drop new data); returns False when the batch should fold
    in. ``last < 0`` marks batch-built state any stream may adopt."""
    if last < 0:
        return False
    if owner != stream_id and int(batch_id) <= last:
        raise ValueError(
            f"{what} was last maintained by stream {owner!r} up to "
            f"batch {last}, but stream {stream_id!r} presented batch "
            f"{batch_id}: a fresh/relocated checkpoint restarts batch "
            f"ids at 0, and treating this as a replay would silently "
            f"drop new data. Resume the ORIGINAL checkpoint, or "
            f"{advice}")
    return int(batch_id) <= last


def _stream_marker_path(src_path: str) -> str:
    # underscore-prefixed: Spark's file listing and _source_parts'
    # *.parquet glob both ignore it, so the marker travels WITH the
    # source directory without perturbing fingerprints or scans
    return os.path.join(src_path, "_graft_stream.json")


def layout_ingest_writer(sf_dir: str, path: str, name: str,
                         stream_id: str | None = None,
                         buckets: int | None = None,
                         lsh_planes: int | None = None,
                         publish: str = "write",
                         source_log: str | None = None):
    """Per-batch maintainer for a STREAMING layout source (r13 — the
    lifecycle symmetry the sketch products completed in r12/r13: every
    stored product now has build / incremental-append / streaming
    maintenance / serve). Each micro-batch publishes into the SOURCE
    directory as deterministically named part files, then the standard
    incremental maintenance path (:func:`build_workload_layout`)
    bucketizes ONLY that delta into the layout — the reference's
    monthly-append ingest (``python/ingest_data.py:160-166``) running
    continuously against its indexes (``sql/init.sql:44-47``), with
    per-batch cost O(batch), never O(corpus).

    Exactly-once under replay, without making the data write atomic
    with the layout append (they are different storage systems):

    1. the batch lands under deterministic names
       ``part-graft-<sid>-<batch:09d>-<i>.parquet`` via a write to an
       underscore-prefixed temp dir + per-file rename — a crashed
       attempt's partial publication is deleted and rewritten on
       replay (safe: see 2);
    2. the stream marker ``_graft_stream.json`` (stream identity +
       ``last_batch_id``) commits atomically AFTER the files and
       BEFORE the layout consumes them, so a replayed ``batch_id <=
       last_batch_id`` never touches published files the layout may
       already have appended (rewriting them would read as
       modified-source drift and force a full rebuild);
    3. the maintenance step runs on EVERY call — including replays —
       because its manifest diff is idempotent: a crash after the
       marker but before the append leaves pending source parts that
       the replay (or the next batch, or any manual build) folds in.

    Identity semantics mirror the sketch writers'
    (``queries/llm._check_stream_identity``): batch ids are only
    monotonic WITHIN one checkpoint, so a DIFFERENT stream identity
    presenting a non-monotonic batch id refuses loudly instead of
    silently skipping genuinely new data as replays; a different
    stream with a monotonically HIGHER batch id may adopt the source
    (its file names are sid-scoped, so no collision is possible).

    Single-maintainer posture: while a stream owns a source directory,
    concurrent layout builds from OTHER sessions are excluded by the
    build lock, and manual builds between CLEAN batches are safe (the
    diff is append-only). r13 ADVICE caveat: a manual build that lands
    inside the crash-before-marker window consumes a crashed batch's
    PARTIAL publication; the subsequent replay deletes and rewrites
    those files, which the differ correctly reads as non-append drift
    and degrades to a FULL rebuild — the right outcome, but O(corpus)
    cost, not the append-only path. ``buckets``/``lsh_planes`` pass
    through to the underlying build — the first batch against a fresh
    layout is the full build that fixes them.

    ``publish`` (r15 optimization, guide §1.2 — don't recompute what a
    cheaper operation moves): how a batch's rows land in the source
    directory.

    - ``"write"`` (default): ``batch_df.write.parquet`` — a Spark job
      that re-serializes every batch row. Works for ANY streamed
      frame (transformed, non-file sources) and is the durable
      general path.
    - ``"link"``: hardlink (copy across filesystems) the batch's own
      INPUT FILES under the deterministic names — a metadata move, no
      Spark job, no byte rewrite. ONLY valid when the streamed frame
      is a BARE file-source scan of immutable feed files (no
      filter/projection/transform — the batch's rows are exactly its
      input files' rows verbatim); the caller opts in because only it
      knows its plan. d14's feed replay is exactly this shape, and at
      ingest scale the saving is a full re-serialization of every
      batch. The batch→files mapping comes from the file source's own
      checkpointed metadata log (``source_log`` =
      ``<checkpoint>/sources/<i>``; the foreachBatch frame wraps the
      executed RDD, so ``inputFiles()`` is empty there) — Spark's
      durable record of exactly which files constitute each batch,
      written at batch construction, so it exists for originals AND
      replays. Misuse is guarded loudly: a missing/empty log entry
      for a non-empty batch refuses, as does a file already inside
      the source directory (self-publication). The crash/replay
      protocol is IDENTICAL — same deterministic names, same
      delete-then-republish on replay, same marker commit (links are
      published via a temp name + atomic rename, like the write
      path's per-file renames)."""
    if publish not in ("write", "link"):
        raise ValueError(f"publish={publish!r}; expected 'write' or 'link'")
    if publish == "link" and source_log is None:
        raise ValueError(
            "publish='link' requires source_log (the file source's "
            "checkpoint metadata dir, <checkpoint>/sources/<i>) — "
            "stream_append_layout wires it automatically")

    src_path = os.path.join(sf_dir, f"{name}.parquet")

    def _ingest(batch_df, batch_id: int) -> None:
        import glob as _glob
        import hashlib as _hashlib
        import json as _json
        import shutil as _shutil

        spark = batch_df.sparkSession
        os.makedirs(src_path, exist_ok=True)
        marker = _stream_marker_path(src_path)
        state = None
        if os.path.exists(marker):
            with open(marker) as fh:
                state = _json.load(fh)
        replay = False
        if state is not None:
            replay = check_stream_identity(
                state.get("stream_id"),
                int(state.get("last_batch_id", -1)),
                stream_id, batch_id,
                f"layout source at {src_path}",
                "feed the new stream into its own source directory.")
        if not replay:
            sid = _hashlib.sha1(str(stream_id).encode()).hexdigest()[:8]
            stem = f"part-graft-{sid}-{int(batch_id):09d}-"
            # sid-scoped so two streams feeding DIFFERENT sources that
            # happen to share a directory prefix can never collide
            if publish == "link":
                from urllib.parse import unquote as _unquote
                from urllib.parse import urlparse as _urlparse

                sibling = os.path.join(os.path.dirname(source_log), "1")
                if os.path.isdir(sibling):
                    # a second FILE source would publish only source
                    # 0's files — silent row loss; refuse loudly.
                    # (Non-file second sources — rate/socket — write no
                    # sources/<i> dir and are undetectable here; they
                    # are outside the documented single-bare-file-
                    # source contract the CALLER opts into.)
                    raise ValueError(
                        "publish='link' supports exactly ONE file "
                        f"source, but this stream checkpoints a second "
                        f"source at {sibling} — use publish='write'.")
                # Spark compacts the file-source metadata log every
                # compactInterval (default 10) batches: that batch's
                # entry is named '<id>.compact' and is CUMULATIVE
                # (every entry since batch 0, each carrying its own
                # batchId) — so dispatch on whichever file exists and
                # filter to THIS batch's entries.
                log_file = os.path.join(source_log, str(int(batch_id)))
                if not os.path.exists(log_file):
                    log_file += ".compact"
                entries: list[str] = []
                try:
                    with open(log_file) as fh:
                        for line in fh:
                            line = line.strip()
                            if not line or line.startswith("v"):
                                continue  # version header
                            rec = _json.loads(line)
                            if int(rec.get("batchId", -1)) != int(batch_id):
                                continue  # compact file: other batches
                            entries.append(
                                _unquote(_urlparse(rec["path"]).path))
                except OSError as exc:
                    raise ValueError(
                        f"publish='link': no file-source metadata log "
                        f"entry at {log_file} — the stream's source is "
                        f"not a file source (or not source 0). Use the "
                        f"default publish='write'. ({exc})") from exc
                in_files = sorted(entries)
                if not in_files:
                    raise ValueError(
                        f"publish='link': batch {batch_id}'s metadata "
                        f"log lists no files — use the default "
                        f"publish='write' for non-file sources or "
                        f"transformed streams.")
                # the published name is forced to .parquet, so the feed
                # bytes must BE parquet; a non-.parquet-named feed file
                # may be any format the stream reader was built with —
                # refuse loudly rather than publish bytes the parquet
                # maintenance path would misread (and never silently
                # drop a file the batch actually contained)
                odd = [p for p in in_files if not p.endswith(".parquet")]
                if odd:
                    raise ValueError(
                        f"publish='link': batch {batch_id} contains "
                        f"non-.parquet-named input files {odd[:3]} — "
                        f"the link contract is a bare PARQUET file "
                        f"source; use the default publish='write'.")
                src_abs = os.path.abspath(src_path) + os.sep
                for p in in_files:
                    if os.path.abspath(p).startswith(src_abs):
                        raise ValueError(
                            f"publish='link' batch input {p} already "
                            f"lives inside the source directory "
                            f"{src_path} — self-publication would "
                            f"duplicate rows.")
                # same replay posture as the write path: a crashed
                # attempt's partial publication is deleted and re-linked
                for f in _glob.glob(os.path.join(src_path,
                                                 stem + "*.parquet")):
                    os.remove(f)
                # dot-prefixed temp names: hidden from Spark's file
                # listing AND from every *.parquet glob in this module,
                # so a crash mid-link can never leave a stray the
                # readers or the write-path cleanup would miss (the
                # write path's underscore-prefixed temp dir posture)
                for stale in _glob.glob(
                        os.path.join(src_path, f".{stem}*.inprogress")):
                    try:
                        os.remove(stale)
                    except OSError:
                        pass
                for i, p in enumerate(in_files):
                    dst = os.path.join(src_path, f"{stem}{i:05d}.parquet")
                    tmpdst = os.path.join(
                        src_path, f".{stem}{i:05d}.inprogress")
                    try:
                        os.link(p, tmpdst)
                    except OSError:  # cross-device: fall back to copy
                        _shutil.copy2(p, tmpdst)
                    os.replace(tmpdst, dst)
            else:
                tmp = os.path.join(src_path, f"_graft_ingest_tmp_{sid}")
                _shutil.rmtree(tmp, ignore_errors=True)
                batch_df.write.mode("overwrite").parquet(tmp)
                # a crashed prior attempt may have published a PARTIAL
                # set of files (the marker proves the layout never
                # consumed them — consumption only happens after the
                # marker commit)
                for f in _glob.glob(os.path.join(src_path,
                                                 stem + "*.parquet")):
                    os.remove(f)
                parts = sorted(f for f in os.listdir(tmp)
                               if f.endswith(".parquet"))
                for i, f in enumerate(parts):
                    os.replace(os.path.join(tmp, f),
                               os.path.join(src_path,
                                            f"{stem}{i:05d}.parquet"))
                _shutil.rmtree(tmp, ignore_errors=True)
            from .crashpoints import crash_point

            crash_point("layout_publish_before_marker")  # r14 ask 2
            mtmp = marker + ".tmp"
            with open(mtmp, "w") as fh:
                _json.dump({"stream_id": stream_id,
                            "last_batch_id": int(batch_id)}, fh)
            os.replace(mtmp, marker)
            crash_point("layout_marker_before_append")  # r14 ask 2
        # maintenance on every call: idempotent manifest diff; heals a
        # crash that landed between the marker commit and the append
        build_workload_layout(spark, sf_dir, path, buckets=buckets,
                              tables=(name,), lsh_planes=lsh_planes)

    return _ingest


def stream_append_layout(stream_df, sf_dir: str, path: str, name: str,
                         checkpoint: str,
                         buckets: int | None = None,
                         lsh_planes: int | None = None,
                         publish: str = "write") -> None:
    """Drain a streaming DataFrame into a workload-layout SOURCE and
    keep the layout incrementally maintained (r13): foreachBatch +
    checkpoint (source offset tracking) + :func:`layout_ingest_writer`
    (replay-guarded deterministic publication + manifest-diff append)
    = exactly-once layout maintenance. availableNow trigger — call
    again as new data lands, or swap the trigger for a continuous
    cadence. The checkpoint's absolute path is the stream identity
    (the sketch writers' posture): batch ids are only monotonic within
    one checkpoint, so the replay guard is keyed on both. ``publish``
    passes through to :func:`layout_ingest_writer` — ``"link"`` is the
    zero-rewrite publication for bare single-file-source replays (see
    there for the contract); the batch→files mapping is read from THIS
    checkpoint's ``sources/0`` metadata log."""
    writer = layout_ingest_writer(
        sf_dir, path, name, stream_id=os.path.abspath(checkpoint),
        buckets=buckets, lsh_planes=lsh_planes, publish=publish,
        source_log=(os.path.join(os.path.abspath(checkpoint),
                                 "sources", "0")
                    if publish == "link" else None))
    q = (stream_df.writeStream.foreachBatch(writer)
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    # foreachBatch executes against a CLONED SparkSession whose SQLConf
    # dies with the stream — the catalog TABLE is shared (it lives in
    # the shared state) but the serve registration is per-session, so
    # re-register the now-fresh layout in the caller's session. The
    # manifest proves freshness: this is registration only, no rebuild.
    # (Skip when the stream never delivered a batch into a fresh
    # source — there is nothing to register yet.)
    if os.path.exists(os.path.join(sf_dir, f"{name}.parquet")):
        build_workload_layout(stream_df.sparkSession, sf_dir, path,
                              buckets=buckets, tables=(name,),
                              lsh_planes=lsh_planes)


def drop_workload_layout(spark: SparkSession, sf_dir: str,
                         tables: tuple[str, ...] | None = None) -> None:
    """Unregister and drop the layout for ``sf_dir`` (``DROP INDEX``).

    Catalog metadata only for the external tables — delete the layout
    ``path`` separately if the storage should go too. ``tables`` scopes
    the drop (default: every layout table)."""
    for name in (tables if tables is not None else LAYOUT_BUCKET_KEYS):
        conf_key = _layout_conf_key(sf_dir, name)
        tbl = spark.conf.get(conf_key, None)
        if tbl is not None:
            spark.sql(f"DROP TABLE IF EXISTS {tbl}")
            spark.conf.unset(conf_key)
            spark.conf.unset(conf_key + ".src")
            spark.conf.unset(conf_key + ".buckets")
            spark.conf.unset(conf_key + ".lsh_planes")

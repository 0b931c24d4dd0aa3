"""Group F query keys — LLM-training-data pipeline operators over the
``documents`` and ``embeddings`` tables (SURVEY.md §2 group F; north-star
mandate: dedup, similarity search, multimodal columns, text analysis —
designed for 100 TB).

Design rules applied throughout:
- everything is DataFrame expressions (JVM/codegen) — no Python UDFs in
  any hot path; the only pandas surface is the explicitly-stubbed
  multimodal decode (f12), which is Arrow-batched;
- the quadratic ops (near-dup, ANN) have a linear-ish LSH path next to
  the exact baseline, because at 100 TB the cross join does not exist;
- all hash-derived signatures use xxhash64 with literal seeds —
  deterministic across runs and partitionings.
"""

from __future__ import annotations

import functools
import itertools
import math
import os
import random

from pyspark.sql import DataFrame, Observation, Window as W, functions as F

from .. import fx
from ..catalog import table
from ..pinning import pin, unpin
from ..registry import query

# --------------------------------------------------------------- helpers

STOPWORDS_EN = ("the", "a", "of", "and", "in", "to", "is")
STOPWORDS_ES = ("el", "la", "de", "y", "en", "que")
STOPWORDS_DE = ("der", "die", "das", "und", "ist")


def _tokens(col="text"):
    return F.split(F.col(col), " ")


def _shingles(tok_col, n=3):
    """Distinct word n-gram shingles as an array column (pure exprs).

    PERFORMANCE CONTRACT: ``tok_col`` must be a materialized column
    reference (``F.col("toks")``), never the ``split()`` expression
    itself — each ``element_at`` inside the lambda re-evaluates its
    operand, so an inline split re-tokenizes the document per gram per
    position (measured 8× slower at sf0.1). Callers go through
    ``_hashed_shingles``."""
    idx = F.sequence(F.lit(1), F.size(tok_col) - (n - 1))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(tok_col, (i + k).cast("int")) for k in range(n)]
        ),
    )
    # guard BEFORE building the sequence: sequence(1, 0) is the
    # DESCENDING array [1, 0], not empty, and element_at(toks, 0) throws —
    # short docs must short-circuit to an empty shingle set
    return F.when(
        F.size(tok_col) >= n, F.array_distinct(grams)
    ).otherwise(F.array().cast("array<string>"))


def _hashed_shingles(docs, n=3):
    """doc_id + distinct word-n-gram shingles hashed to int64.

    Two-step plan: tokens materialize as a column, then shingles build
    from element_at on the column ref (see _shingles contract), then each
    gram maps to xxhash64 — downstream set ops and shuffles move
    fixed-width longs instead of strings (same set semantics; 64-bit
    collisions negligible)."""
    toked = docs.select("doc_id", _tokens().alias("toks")).filter(
        F.size("toks") >= n
    )
    return toked.select(
        "doc_id",
        F.transform(_shingles(F.col("toks"), n), lambda g: F.xxhash64(g))
        .alias("grams"),
    )


def planted_offset(docs) -> int:
    """Id offset for planted synthetic near-duplicates: max(doc_id)+1,
    so planted ids can NEVER collide with a real document at any corpus
    size (a fixed +100000 offset corrupts clustering once the corpus
    passes 100k docs). Served from parquet column stats — no data scan.
    Tests derive expected planted ids through this same function."""
    row = docs.agg(F.max("doc_id").alias("m")).first()
    return int(row.m) + 1 if row.m is not None else 1


def _planted_corpus(docs):
    """documents ∪ planted near-duplicates (docs 0-19 with the last two
    tokens dropped, id shifted by ``planted_offset``) — the shared
    deterministic corpus for the near-dup operators (f2, f20), tokenized.

    Size guard BEFORE the slice: slice() with a negative length throws,
    so a 1-token doc among doc_id<20 must be excluded, not sliced."""
    offset = planted_offset(docs)
    toked = docs.select("doc_id", _tokens().alias("toks"))
    mutated = toked.filter(
        (F.col("doc_id") < 20) & (F.size("toks") >= 3)
    ).select(
        (F.col("doc_id") + offset).alias("doc_id"),
        F.slice("toks", 1, F.size("toks") - 2).alias("toks"),
    )
    return toked.unionByName(mutated).filter(F.size("toks") >= 3)


_EMB_DIM = 64  # testdata embedding dimensionality (TESTDATA.md)


def _dot(a, b):
    """Sequential double dot product — same accumulation order as the
    oracle's loop, so results are bit-identical.

    This is the GENERAL form (any length, higher-order functions).
    HOFs are CodegenFallback — interpreted per element — which is fine
    where the call count is linear in the corpus (per-row norms,
    bucket tagging), but NOT in the pair-cosine hot loop whose row
    count is superlinear (probed pairs): use :func:`_dot_unrolled`
    there (r9 — the K=316 ANN probe caught the pair projection at
    ~ms/pair with executor stacks pinned in ZipWith.eval/
    ArrayAggregate.eval)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _dot_unrolled(a, b):
    """The pair-cosine hot-loop spelling of :func:`_dot` (r9):
    ``0.0 + a1·b1 + … + a64·b64`` statically unrolled over the fixed
    embedding dim — plain whole-stage-codegen arithmetic, no
    interpreted HOF. Bit-identical to the HOF fold and to DuckDB's
    list_dot_product loop: same 0.0-seeded left-fold order, each
    element cast to double exactly once (a no-op on already-double
    arrays, so both raw float and pre-cast arrays work).

    NULL semantics match the fold: NULL vector / NULL element poison
    the sum to NULL (the trailing size guard is ADDITIVE —
    ``acc + when(ok, 0.0)`` — not a conditional wrapper, because a
    300-node chain inside a when() branch cannot be method-split and
    janino rejects the generated code past 64 KB); NaN propagates.
    The one divergence from the fold is two equal-length non-64
    arrays (fold summed them, this yields NULL) — no corpus produces
    that shape, and _VEC_OK already treats dimension drift as
    unusable-vector poison.

    Scope discipline: ONE unrolled dot per stage compiles and runs
    fast (measured); composing several into one projection (bucket
    tagging = 4 dots + norm + probes) blows the 64 KB method limit
    and falls back to interpretation WORSE than the HOF — per-row
    derivations therefore stay on :func:`_dot`, and their scale path
    is layout materialization (catalog.LAYOUT_DERIVED), not wider
    unrolling.

    Takes column NAMES and memoizes the built Column: constructing
    the 300-node tree costs ~190 py4j round trips (~1 s per query
    invocation — measured as a flat overhead on every key that calls
    this); an unresolved-by-name Column is plan-agnostic, so one
    build serves every query in the process. The memo key includes
    the SparkContext's applicationId (r10 ADVICE): a cached Column
    wraps py4j refs into the JVM context that built it, and after a
    ``spark.stop()``/restart in the same process (tests, notebooks,
    probe scripts) the old entries would serve dead JVM references."""
    return _dot_unrolled_cached(a, b, _jvm_token())


_NO_JVM_COUNTER = itertools.count()


def _jvm_token() -> str:
    """Cache discriminator for memoized Column expressions: the
    applicationId identifies the JVM context whose py4j refs the
    cached Column wraps — a restart mints a new one, so stale entries
    miss instead of serving dead references. When the calling thread
    has no active session (r10 ADVICE: expressions built from a
    secondary thread), fall back to the process-wide active
    SparkContext's applicationId; if no context is resolvable at all,
    mint a UNIQUE token so the memo is bypassed rather than pooling
    entries under a shared constant that survives stop()/restart."""
    from pyspark import SparkContext
    from pyspark.sql import SparkSession

    sess = SparkSession.getActiveSession()
    if sess is not None:
        return sess.sparkContext.applicationId
    sc = SparkContext._active_spark_context
    if sc is not None:
        return sc.applicationId
    return f"<no-jvm-{next(_NO_JVM_COUNTER)}>"


@functools.lru_cache(maxsize=64)
def _dot_unrolled_cached(a_name: str, b_name: str, _app_id: str):
    a, b = F.col(a_name), F.col(b_name)
    acc = F.lit(0.0)
    for i in range(_EMB_DIM):
        acc = acc + (F.element_at(a, i + 1).cast("double")
                     * F.element_at(b, i + 1).cast("double"))
    ok = (F.size(a) == _EMB_DIM) & (F.size(b) == _EMB_DIM)
    return acc + F.when(ok, F.lit(0.0))


def _as_double(arr):
    return F.transform(arr, lambda x: x.cast("double"))


def _norm(a):
    return F.sqrt(_dot(a, a))


# Fixed random-hyperplane set for the ANN scale path — seeded, so the
# DuckDB oracle can inline the exact same literals and check values.
# Like F13_PLANES, the full set is ONE seeded prefix-stable stream
# (r10): plane i is identical at every count, so the 4-plane oracle
# contract is untouched while the scale mode (SPARK_GRAFT_LSH_PLANES /
# lsh_planes_for) can widen to up to _LSH_MAX_PLANES as the corpus
# grows. 16 planes = 65 536 buckets ≈ a 130 M-vector corpus at the
# measured ~2 K target bucket width (SCALE.md §19c).
_N_LSH_PLANES = 4
_LSH_MAX_PLANES = 16
_LSH_RNG = random.Random(42)
LSH_ALL_PLANES = [
    [_LSH_RNG.uniform(-1.0, 1.0) for _ in range(64)]
    for _ in range(_LSH_MAX_PLANES)
]
LSH_PLANES = LSH_ALL_PLANES[:_N_LSH_PLANES]

# f13's hyperplane sets — module-level so the implementation and its
# DuckDB oracle inline the SAME literals. The base planes are a PREFIX
# of one seeded stream: n_planes grows with corpus size, but plane i is
# identical at every size, so one static oracle serves all SFs. The 8
# split planes come from an INDEPENDENT seed for the same reason (r3
# drew them by CONTINUING the base rng after n_planes blocks, which
# shifted them whenever n changed — unoraclable).
# 40 planes covers n ≈ 64·2^40 ≈ 7e13 vectors (the plane-count rule is
# k = round(log2(n/64 + 1))) — beyond any 100 TB corpus, so the
# fail-fast guard in _f13_planes is unreachable in practice (ADVICE r5:
# the r5 cap of 16 turned an oracle-only concern into a potential
# production failure at ~4.2M vectors). Cost of the larger prefix: a
# one-time module-import list build and a longer inlined oracle string;
# the Spark side still uses only the first k planes.
_F13_MAX_PLANES = 40
# Oracle-side spelling of _embeddings' usable-vector predicate (see its
# docstring): squared norm positive-finite excludes null, NaN-element,
# Inf-element, and all-zero vectors; the explicit null-element check
# exists because DuckDB's list_sum SKIPS null elements (a [1.0, NULL,
# ...] vector would get a finite norm and be kept) while Spark's
# fold-based norm nulls out and excludes it — parquet list<float>
# permits null elements and a failed encoder can emit them (r6 review
# finding). BETWEEN spells positive-and-finite off ONE subtree: NaN
# fails `<= max` (DuckDB orders NaN above every number — a bare `> 0`
# would KEEP a NaN norm), +Inf fails `<= max`, 0 fails `>= min`.
_VEC_OK = (
    "(embedding IS NOT NULL"
    " AND length(list_filter(embedding, x -> x IS NULL)) = 0"
    " AND list_sum(list_transform(CAST(embedding AS DOUBLE[]),"
    " x -> x * x)) BETWEEN 5e-324 AND 1.7976931348623157e308)"
)

_f13_rng = random.Random(42)
F13_PLANES = [
    [_f13_rng.uniform(-1.0, 1.0) for _ in range(64)]
    for _ in range(_F13_MAX_PLANES)
]
_f13_split_rng = random.Random(4242)
F13_SPLIT_PLANES = [
    [_f13_split_rng.uniform(-1.0, 1.0) for _ in range(64)]
    for _ in range(8)
]

# f36's quantizer planes — an INDEPENDENT seeded prefix-stable stream
# (not F13_PLANES: the two operators' cluster geometries must be free
# to evolve separately — widening f13's pair-search buckets must not
# silently re-cluster f36's prototype partition). Same 40-plane
# envelope and the same prefix-stability contract: plane i is
# identical at every count, so one static oracle serves all SFs.
_F36_MAX_PLANES = 40
_f36_rng = random.Random(3636)
F36_PLANES = [
    [_f36_rng.uniform(-1.0, 1.0) for _ in range(64)]
    for _ in range(_F36_MAX_PLANES)
]


def _f36_planes(k: int):
    """First ``k`` f36 quantizer planes; refuses past the inlined-oracle
    envelope for exactly :func:`_f13_planes`'s reason."""
    if k > _F36_MAX_PLANES:
        raise ValueError(
            f"f36 needs {k} hyperplanes but the prefix-stable plane set "
            f"(and its inlined DuckDB oracle) holds _F36_MAX_PLANES="
            f"{_F36_MAX_PLANES}; raise _F36_MAX_PLANES — both sides extend "
            "the same seeded prefix, so the oracle stays exact."
        )
    return F36_PLANES[:k]


def _f13_planes(k: int):
    """First ``k`` planes of the seeded stream (prefix-stable in k).

    Refuses k > _F13_MAX_PLANES instead of silently extending: the
    DuckDB oracle inlines exactly _F13_MAX_PLANES literals and slices
    ``[1:k]``, so a silently-extended Spark side would diverge from the
    oracle (false FAIL) past ~4.2M vectors. Raising _F13_MAX_PLANES
    regenerates BOTH sides from the same seeded prefix consistently."""
    if k > _F13_MAX_PLANES:
        raise ValueError(
            f"f13 needs {k} hyperplanes but the prefix-stable plane set "
            f"(and its inlined DuckDB oracle) holds _F13_MAX_PLANES="
            f"{_F13_MAX_PLANES}; raise _F13_MAX_PLANES — both sides extend "
            "the same seeded prefix, so the oracle stays exact."
        )
    return F13_PLANES[:k]


def _f13_oracle() -> str:
    """DuckDB twin of f13_embedding_neardup: same plane literals, same
    size→plane-count rule, same hot-bucket split and star-pair residue
    handling, same rounded-cosine threshold. The only cross-engine seams
    are (a) Python banker's round vs DuckDB half-away in the plane-count
    rule — differs only when log2 lands exactly on .5, unreachable for
    real corpus counts — and (b) float ulp at the 0.3 threshold,
    absorbed by rounding to 6 dp before comparing (f3's proven
    pattern)."""
    def bits(planes):
        return [
            f"(CASE WHEN list_dot_product(e, [{', '.join(repr(v) for v in p)}])"
            f" > 0 THEN {1 << i} ELSE 0 END)"
            for i, p in enumerate(planes)
        ]

    base_bits = ", ".join(bits(F13_PLANES))
    sub_bits = " + ".join(bits(F13_SPLIT_PLANES))
    cos = fx.sql_round("list_cosine_similarity(ea, eb)", 6)
    return f"""
    WITH params AS (
        SELECT GREATEST(2, CAST(round(log2(GREATEST(COUNT(*), 1) / 64.0 + 1))
                                AS INTEGER)) AS k
        FROM embeddings WHERE {_VEC_OK}
    ), base AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
        FROM embeddings WHERE {_VEC_OK}
    ), tagged AS (
        SELECT vec_id, e,
               CAST(list_sum(([{base_bits}])[1:k]) AS BIGINT) AS bucket
        FROM base, params
    ), w1 AS (
        SELECT bucket, COUNT(*) AS w FROM tagged GROUP BY 1
    ), refined AS (
        SELECT t.vec_id, t.e,
               CASE WHEN w1.w > 512
                    THEN t.bucket * 257 + 1 + ({sub_bits})
                    ELSE t.bucket * 257 END AS bucket
        FROM tagged t JOIN w1 USING (bucket)
    ), w2 AS (
        SELECT bucket, COUNT(*) AS w FROM refined GROUP BY 1
    ), flagged AS (
        SELECT r.vec_id, r.e, r.bucket, w2.w
        FROM refined r JOIN w2 USING (bucket)
    ), cold_pairs AS (
        SELECT a.vec_id AS id_a, a.e AS ea, b.vec_id AS id_b, b.e AS eb
        FROM flagged a JOIN flagged b USING (bucket)
        WHERE a.w <= 512 AND a.vec_id < b.vec_id
    ), reps AS (
        SELECT bucket, MIN(vec_id) AS rid, arg_min(e, vec_id) AS re
        FROM flagged WHERE w > 512 GROUP BY bucket
    ), star_pairs AS (
        SELECT r.rid AS id_a, r.re AS ea, h.vec_id AS id_b, h.e AS eb
        FROM flagged h JOIN reps r USING (bucket)
        WHERE h.w > 512 AND h.vec_id <> r.rid
    ), pairs AS (
        SELECT * FROM cold_pairs UNION ALL SELECT * FROM star_pairs
    )
    SELECT id_a, id_b, {cos} AS cosine
    FROM pairs WHERE {cos} > 0.3
    """


def _lsh_ann_oracle(n_planes: int = _N_LSH_PLANES) -> str:
    """DuckDB twin of f3_lsh_ann (and, at ``n_planes`` > 4, of the wide
    scale mode — r11's f3_lsh_ann_wide): same planes (inlined literals
    from the one prefix-stable seeded stream), same bucket rule (sign
    bits), same Hamming-1 multi-probe, same top-k."""
    plane_sql = [
        "[" + ", ".join(repr(v) for v in plane) + "]"
        for plane in LSH_ALL_PLANES[:n_planes]
    ]
    bucket = " + ".join(
        f"(CASE WHEN list_dot_product(e, {p}) > 0 THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(plane_sql)
    )
    probe_list = ", ".join(
        ["bucket"] + [f"xor(bucket, {1 << i})" for i in range(n_planes)]
    )
    return f"""
    WITH tagged AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
               {bucket} AS bucket
        FROM embeddings WHERE {_VEC_OK}
    ), probes AS (
        SELECT vec_id AS query_id, e AS qe,
               unnest([{probe_list}]) AS bucket
        FROM tagged WHERE vec_id < 20
    ), pairs AS (
        SELECT p.query_id, c.vec_id AS neighbor_id,
               list_cosine_similarity(p.qe, c.e) AS cos
        FROM probes p JOIN tagged c USING (bucket)
        WHERE p.query_id <> c.vec_id
    )
    SELECT query_id, neighbor_id,
           FLOOR(cos * 1000000.0 + 0.5) / 1000000.0 AS cosine, rk
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cos DESC, neighbor_id
        ) AS rk FROM pairs
    ) WHERE rk <= 5
    """


def _embeddings(spark, sf_dir, with_bucket: bool = False,
                n_planes: int | None = None) -> DataFrame:
    """Shared embeddings source for the vector family (f3/f13/f21/f28).

    Unusable vectors are EXCLUDED at the source (r6 edge findings): a
    100 TB embedding table carries nulls (failed encoder calls), NaN
    elements (encoders write garbage, not always null), and all-zero
    vectors (norm 0 → every cosine is 0/0). Nulls crashed every
    downstream consumer differently (numpy refused the ragged k-means
    sample, DuckDB's list_inner_product raised, Spark dot products
    silently yielded null buckets); NaN and zero-norm vectors are the
    same poison one step later — NaN cosines rank nondeterministically
    and 0/0 divides. One predicate covers all three: the squared norm
    must be finite and positive (a NaN element makes it NaN, an Inf
    element makes it Inf, all-zero makes it 0). A vector that can hold
    no place in similarity space is excluded; counting/alerting on them
    is a data-quality concern (f33's class), not a similarity-operator
    one. Every vector-family oracle carries the matching ``_VEC_OK``
    predicate.

    The accessor reads the table's DERIVED columns (r9): ``nrm`` comes
    from the layout's materialized ``graft_nrm`` when one is
    registered (the metadata a real ANN index stores per row — no
    per-query 64-element fold over candidates), computed on the fly
    otherwise — identical values either way, catalog.LAYOUT_DERIVED
    materializes the exact same expression. ``with_bucket=True``
    additionally exposes the fixed-hyperplane LSH bucket as ``bucket``
    (served pre-partitioned from ``graft_lsh_bucket`` under a layout —
    the persisted ANN index f3_lsh_ann's candidate side rides).
    Catalyst prunes whichever derived column a query doesn't
    reference, so the no-layout path pays only for what it uses."""
    e = table(spark, sf_dir, "embeddings", with_derived=True).filter(
        F.col("embedding").isNotNull()
    )
    emb = _as_double(F.col("embedding"))
    cols = ["vec_id", "label", emb.alias("emb"),
            F.col("graft_nrm").alias("nrm")]
    if with_bucket:
        # r11 (wide-plane layout end-to-end): the STORED bucket column
        # is only trusted when its build width matches the requested
        # width — `graft_lsh_bucket` serves both the 4-plane contract
        # default and a wide-plane layout built via
        # build_workload_layout(lsh_planes=...); any mismatch (e.g.
        # wide query over a 4-plane layout, or the default oracle
        # contract over a wide layout) recomputes inline from the same
        # prefix-stable plane stream, value-correct but unpruned.
        from ..catalog import layout_lsh_planes

        want = n_planes or _N_LSH_PLANES
        stored = layout_lsh_planes(spark, sf_dir)
        served_width = stored if stored is not None else _N_LSH_PLANES
        if want == served_width:
            cols.append(F.col("graft_lsh_bucket").alias("bucket"))
        else:
            cols.append(bucket_expr("lsh", want, "embedding",
                                    as_double=True).alias("bucket"))
    out = e.select(*cols)
    return out.filter(
        ~F.isnan("nrm") & (F.col("nrm") > 0)
        & (F.col("nrm") < F.lit(float("inf")))
    )


def _sampled_kmeans(emb, k, sample_cap=4096, iters=8, seed=42):
    """Seeded Lloyd k-means fit on a bounded sample of ``emb.emb`` —
    the coarse-structure build shared by f21 (IVF quantizer) and f28
    (topic clustering). Hash-ordered ``limit`` = deterministic uniform
    sample in one TakeOrdered job; driver memory is bounded at
    sample_cap × dim regardless of corpus size (the standard big-data
    k-means posture: the fit sees a sample, the full corpus only ever
    gets a map-only assignment pass). Returns the k×dim centroid array —
    tiny driver state shipped to workers by closure."""
    import numpy as np

    sample = np.array(
        [r.emb for r in emb.select("emb", "vec_id")
         .orderBy(F.xxhash64("vec_id")).limit(sample_cap).collect()]
    )
    # empty-partition robustness: an empty corpus (a date-filtered run
    # over an empty month) has no structure to fit — return None and
    # let the caller emit its empty result instead of crashing in
    # rng.choice; a corpus smaller than k fits what it has (fewer cells
    # than asked is the correct degenerate quantizer, not an error)
    if len(sample) == 0:
        return None
    k = min(k, len(sample))
    rng = np.random.default_rng(seed)
    centers = sample[rng.choice(len(sample), k, replace=False)]
    for _ in range(iters):
        d2 = ((sample[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for j in range(k):  # empty cell keeps its previous centroid
            members = sample[assign == j]
            if len(members):
                centers[j] = members.mean(axis=0)
    return centers


# Portable seed quantizer (r8: the f21/f28 oracle graduation). The Lloyd
# fit above is seeded and driver-bounded but its centroids are fitted in
# numpy — no static SQL twin can reproduce 8 iterations of float means
# bit-exactly, which is why f21/f28 were rows-only through r7. The
# graduation replaces the REGISTERED keys' quantizer with one both
# engines derive from the data identically: the centroids are the
# embeddings of the k vectors with the smallest Knuth-style multiplicative
# hash of vec_id — pure BIGINT arithmetic (no overflow: (2^31-1)·A + C
# < 2^63), i.e. k-means with hash-random init and zero Lloyd iterations,
# a standard cheap IVF coarse quantizer. Assignment distances use
# SEQUENTIAL per-element accumulation (cumsum, not matmul) so d² is
# bit-identical to DuckDB's list_dot_product fold (the f3-proven
# equivalence), and every ordering ties on (d², cell) in both engines —
# the assignment is exact, not ulp-close. The Lloyd fit remains the
# data-adaptive option (quantizer="kmeans", exercised by tests).
_SEED_M = 2_147_483_648  # 2^31
_SEED_A = 1_103_515_245
_SEED_C = 12_345


def _seed_hash_col(c):
    return F.pmod(F.pmod(c, F.lit(_SEED_M)) * _SEED_A + _SEED_C,
                  F.lit(_SEED_M))


def _seed_hash_sql(expr: str) -> str:
    # positive-safe modulo in DuckDB (% keeps the dividend's sign)
    return (f"((((({expr}) % {_SEED_M}) + {_SEED_M}) % {_SEED_M})"
            f" * {_SEED_A} + {_SEED_C}) % {_SEED_M}")


def _seed_centroids(emb, k):
    """The k seed vectors in cell order (hash rank, vec_id tie-break) —
    one driver-bounded TakeOrdered collect, k×dim driver state."""
    import numpy as np

    rows = (
        emb.select("vec_id", "emb")
        .orderBy(_seed_hash_col(F.col("vec_id")).asc(),
                 F.col("vec_id").asc())
        .limit(k)
        .collect()
    )
    if not rows:
        return None
    return np.array([r.emb for r in rows])


def _seq_dot(x2d, centers_np):
    """x·cᵀ with strictly SEQUENTIAL accumulation over the dim axis —
    bit-identical to the oracle's list_dot_product fold (numpy's matmul
    uses pairwise/SIMD accumulation, which is ulp-close but not equal;
    an ulp flips an argmin only on near-ties, and near-ties are exactly
    what an adversarial corpus plants). dim vectorized-batch adds of a
    b×k accumulator — each scalar lane is the exact IEEE sequence
    ``((0 + x₁c₁) + x₂c₂) + …`` the fold computes; memory stays b×k."""
    import numpy as np

    acc = np.zeros((x2d.shape[0], centers_np.shape[0]))
    for i in range(centers_np.shape[1]):
        acc = acc + x2d[:, i, None] * centers_np[None, :, i]
    return acc


def _nearest_seed_udf(centers_np):
    """Arrow-batched exact-portable nearest-cell assignment: argmin of
    (c·c − 2·x·c) with sequential dots; numpy argmin takes the FIRST
    index on ties = the oracle's ORDER BY d2, cell."""
    import numpy as np

    c_sq = np.cumsum(centers_np * centers_np, axis=1)[:, -1]

    @F.pandas_udf("integer")
    def nearest_seed(embs):  # Series[array<double>] -> Series[int]
        import pandas as pd

        x = np.stack(embs.values)
        d2 = c_sq[None, :] - 2.0 * _seq_dot(x, centers_np)
        return pd.Series(d2.argmin(axis=1))

    return nearest_seed


def _probe_seeds_udf(centers_np, nprobe):
    """The nprobe nearest cells per query, stable-sorted so distance
    ties resolve by cell index — the oracle's ORDER BY d2, cell."""
    import numpy as np

    c_sq = np.cumsum(centers_np * centers_np, axis=1)[:, -1]

    @F.pandas_udf("array<integer>")
    def probe_seeds(embs):  # Series[array<double>] -> Series[list[int]]
        import pandas as pd

        x = np.stack(embs.values)
        d2 = c_sq[None, :] - 2.0 * _seq_dot(x, centers_np)
        order = np.argsort(d2, axis=1, kind="stable")
        return pd.Series(list(order[:, :nprobe]))

    return probe_seeds


def _hyperplane_bucket(planes, emb_col):
    """Sign-bit LSH bucket id for ``emb_col`` against ``planes`` —
    the single definition of the bucket rule shared by every
    random-hyperplane path (f3_lsh_ann, f13), so the boundary and bit
    order cannot silently diverge between them."""
    out = F.lit(0)
    for i, plane in enumerate(planes):
        bit = (
            _dot(emb_col, F.array(*[F.lit(v) for v in plane])) > 0
        ).cast("int")
        out = out + bit * (2 ** i)
    return out


# Memoized spellings of the vector family's df-independent derived
# expressions (r10, verdict ask 2): building a k-plane bucket tree
# costs k × (64 F.lit + array + fold) py4j round trips — a flat
# ~0.3-0.4 s tax every invocation of table(..., with_derived=True) and
# every f13 call paid, measured as the whole vector family's bench
# regression after the r9 kernel change. The Columns reference their
# inputs BY NAME, so one build per (plane set, prefix, column, JVM)
# serves every query in the process; _jvm_token keys out dead-JVM refs.
_PLANE_SETS = {
    "lsh": lambda: LSH_ALL_PLANES,
    "f13": lambda: F13_PLANES,
    "f13_split": lambda: F13_SPLIT_PLANES,
    "f36": lambda: F36_PLANES,
}


def bucket_expr(planes_key: str, n: int, emb_name: str,
                as_double: bool = False):
    """Memoized :func:`_hyperplane_bucket` over the first ``n`` planes
    of the named module plane set, applied to column ``emb_name``."""
    return _bucket_expr_cached(planes_key, n, emb_name, as_double,
                               _jvm_token())


@functools.lru_cache(maxsize=64)
def _bucket_expr_cached(planes_key: str, n: int, emb_name: str,
                        as_double: bool, _app_id: str):
    col = F.col(emb_name)
    if as_double:
        col = _as_double(col)
    return _hyperplane_bucket(_PLANE_SETS[planes_key]()[:n], col)


def nrm_expr(emb_name: str, as_double: bool = False):
    """Memoized vector norm over the named column (the stored-metadata
    expression catalog.LAYOUT_DERIVED materializes as ``graft_nrm``)."""
    return _nrm_expr_cached(emb_name, as_double, _jvm_token())


@functools.lru_cache(maxsize=16)
def _nrm_expr_cached(emb_name: str, as_double: bool, _app_id: str):
    col = F.col(emb_name)
    if as_double:
        col = _as_double(col)
    return _norm(col)


# ------------------------------------------------------------ F1: dedup
@query(
    "f1_exact_dedup",
    oracle="""
    SELECT sha256(text) AS content_hash,
           MIN(doc_id) AS keep_doc_id,
           COUNT(*) AS n_copies
    FROM documents GROUP BY 1
    """,
)
def f1_exact_dedup(spark, sf_dir):
    """F1: exact content dedup — SHA-256 content hash → groupBy → keep the
    min id. At 100 TB this is one shuffle on a 32-byte key with partial
    aggregation; hashing happens map-side in codegen. (dropDuplicates is
    the one-liner variant; the hash form keeps lineage of what was kept.)
    """
    return (
        table(spark, sf_dir, "documents")
        .groupBy(F.sha2("text", 256).alias("content_hash"))
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


# f2's tuning constants — module-level so the implementation and its
# DuckDB oracle read the SAME literals (the F13_PLANES pattern).
F2_N_HASHES, F2_N_BANDS, F2_MAX_BUCKET = 32, 4, 64

# Universal-hash permutation constants for the 32 minhash seeds:
# perm_j(x) = (a_j * x + b_j) mod p with p = 2^31 - 1 and x = s mod p
# (s is the 56-bit packed gram hash). a_j*x < 2^62, so the arithmetic
# never overflows a signed long under EITHER ANSI posture, and both
# engines compute it exactly. Fixed literals (seeded once, pasted) so
# the values cannot drift between processes or Python versions; a
# per-seed Kirsch-Mitzenmacher h1 + j*h2 was tried first and REJECTED:
# for large j the argmin gram is dominated by min(h2), correlating the
# minhash rows across seeds and dropping banding recall to 0.86 —
# below the 0.9 gate (classic LSH folklore, measured here).
F2_HASH_P = 2147483647
F2_PERMS = (
    (1571058545, 730493951), (1660058740, 1293707555),
    (1122761735, 1579482913), (72772567, 776319282),
    (1809802580, 1088400265), (1716185262, 1854787490),
    (1376580201, 1232262116), (126093127, 1718349004),
    (1255154079, 929465993), (1495162255, 1110399376),
    (253380337, 223979956), (331484110, 2008330132),
    (554108161, 2135836560), (84440658, 430566606),
    (287728255, 1463639562), (1926419603, 34250603),
    (492340083, 377114938), (1370280527, 1486839300),
    (1398888244, 2122241593), (1078376802, 462006862),
    (988049140, 2126155473), (827766902, 1307509404),
    (1105680809, 1314894100), (2032715449, 109028814),
    (2091592247, 1492510468), (1748677567, 1091064767),
    (791347239, 583621836), (1267255616, 288603717),
    (146926940, 761214734), (923038556, 1674215711),
    (1858616511, 193761614), (804076797, 119361460),
)


def _f2_oracle_ctes() -> str:
    """The full f2 pipeline as DuckDB CTEs (through ``verified``), shared
    by the f2 and f14 oracles. Reproducible cross-engine because every
    hash is md5-derived (see f2's docstring): base shingle hash = two
    28-bit md5-hex halves packed into a 56-bit long; per-seed minhash =
    universal hashing (a_j·(s mod p) + b_j) mod p, p = 2^31−1 (< 2^62,
    exact integer arithmetic in both engines, no overflow under either
    ANSI posture); band hash = md5 of the 8 pipe-joined minhash values
    + the band id."""
    rpb = F2_N_HASHES // F2_N_BANDS
    m_cols = ", ".join(
        "list_min(list_transform(sh, s -> "
        f"({a} * (s % {F2_HASH_P}) + {b}) % {F2_HASH_P}"
        f")) AS m{j}"
        for j, (a, b) in enumerate(F2_PERMS)
    )
    band_selects = "\n        UNION ALL ".join(
        "SELECT doc_id, {b} AS band_id, ('0x' || substring(md5({cat}), 1, 15))::BIGINT AS band_hash FROM minh"
        .format(
            b=b,
            cat=" || '|' || ".join(
                f"m{j}::VARCHAR" for j in range(b * rpb, (b + 1) * rpb)
            ) + f" || '|{b}'",
        )
        for b in range(F2_N_BANDS)
    )
    return f"""
    toked AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ), corpus AS (
        SELECT doc_id, toks FROM toked WHERE len(toks) >= 3
        UNION ALL
        SELECT doc_id + (SELECT COALESCE(MAX(doc_id) + 1, 1) FROM documents),
               toks[1:len(toks) - 2]
        FROM toked WHERE doc_id < 20 AND len(toks) >= 5
    ), shingled AS (
        SELECT doc_id,
               list_transform(
                   list_transform(
                       list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                                      FOR i IN generate_series(1, len(toks) - 2)]),
                       g -> md5(g)),
                   m -> ('0x' || substring(m, 1, 7))::BIGINT * 268435456
                        + ('0x' || substring(m, 8, 7))::BIGINT) AS sh
        FROM corpus
    ), minh AS (
        SELECT doc_id, sh, {m_cols} FROM shingled
    ), bands AS (
        {band_selects}
    ), bucket_stats AS (
        SELECT band_id, band_hash, COUNT(*) AS w, MIN(doc_id) AS rep
        FROM bands GROUP BY 1, 2
    ), all_pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a
        JOIN bands b ON a.band_id = b.band_id AND a.band_hash = b.band_hash
                    AND a.doc_id < b.doc_id
        JOIN bucket_stats s ON s.band_id = a.band_id
                           AND s.band_hash = a.band_hash
        WHERE s.w BETWEEN 2 AND {F2_MAX_BUCKET}
    ), star_pairs AS (
        SELECT s.rep AS doc_a, b.doc_id AS doc_b
        FROM bands b
        JOIN bucket_stats s ON s.band_id = b.band_id
                           AND s.band_hash = b.band_hash
        WHERE s.w > {F2_MAX_BUCKET} AND b.doc_id <> s.rep
    ), cand AS (
        SELECT DISTINCT doc_a, doc_b
        FROM (SELECT * FROM all_pairs UNION ALL SELECT * FROM star_pairs)
    ), verified AS (
        SELECT c.doc_a, c.doc_b,
               CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
               / len(list_distinct(list_concat(a.sh, b.sh))) AS j
        FROM cand c
        JOIN shingled a ON a.doc_id = c.doc_a
        JOIN shingled b ON b.doc_id = c.doc_b
    )"""


@query(
    "f2_minhash_dedup",
    oracle="WITH " + _f2_oracle_ctes() + """
    SELECT doc_a, doc_b,
           FLOOR(j * 10000.0 + 0.5) / 10000.0 AS jaccard
    FROM verified WHERE j >= 0.6
    """,
)
def f2_minhash_dedup(spark, sf_dir):
    """F2: MinHash+LSH near-duplicate detection, built from scratch in
    DataFrame ops (shingle → 32 minhashes → 4 bands of 8 → hot-bucket cap
    → band-bucket join → exact-Jaccard verify ≥ 0.6).

    Oracle-checked as of r6: previously rows-only because the minhash
    path was built on Spark's xxhash64, which DuckDB cannot reproduce.
    The hash family is now cross-engine exact: ONE md5 per distinct
    shingle, its first 14 hex chars packed into a 56-bit long ``s``,
    and the 32 per-seed permutations computed by the classic universal
    family ``(a_j·(s mod p) + b_j) mod p`` with p = 2^31−1 (F2_PERMS
    literals) — four long ops per gram per seed, cheaper than the
    xxhash64 it replaces, and bit-identical in both engines, so the
    ENTIRE pipeline including banding recall has an exact SQL twin
    (_f2_oracle_ctes) and the key is value-hash-verified. a_j·x < 2^62,
    so the arithmetic is ANSI-posture-agnostic (a wraparound long
    multiply would throw under ansi=true, the edge sweep's second
    posture; nothing here can overflow). Band hash = md5 of the
    pipe-joined minhash octet + band id (4 md5s per doc — off the hot
    path). Banding recall vs the exact all-pairs baseline is still < 1
    by design (an LSH property); the behavioral gates in
    tests/test_llm_ops.py (soundness + recall ≥ 0.9 + planted-pair
    recovery) stay as the semantic check.

    The corpus is documents ∪ planted near-duplicates (docs 0-19 with
    the last two tokens dropped, ids shifted past max(doc_id) — see
    ``planted_offset``) so the operator's output is deterministic and
    non-empty on synthetic data.

    Scale posture: candidate generation is an equi self-join on
    (band_id, band_hash) — shuffle-partitioned by bucket, never all-pairs.
    Hot buckets are the known skew risk (boilerplate shingles; here, the
    synthetic corpus's tiny vocabulary makes one common shingle own the
    global minimum hash for many seeds, colliding thousands of docs into
    one bucket — quadratic blowup). Mitigations: 8 minhash rows per band
    (collision needs 8 shared minima, not 4) and a bucket-width cap at
    MAX_BUCKET — buckets at or under the cap expand all-pairs (bounded
    at B·MAX_BUCKET² candidates regardless of skew); buckets OVER the
    cap emit STAR pairs to the bucket's min-doc_id representative
    (linear in width) instead of being dropped. Dropping was the r5
    behavior and it failed at scale: the r6 100×-stress recall probe
    measured planted-pair recall 0.15 (3/20) because every ~100-member
    replica family flooded its band buckets past the cap and the cap
    silently discarded them — i.e. the MOST-duplicated content is
    exactly what a drop-cap misses. A mega-cluster's all-pairs output
    is inherently quadratic (no sound algorithm emits it at linear
    cost); the star pattern is the standard linear-cost answer that
    keeps every true member reachable from the representative, which is
    what downstream dedup (f14 connected components, f1-style
    keep-min) actually consumes. Same exact-Jaccard verify applies to
    star candidates, so soundness is unchanged. The verify step rejoins
    shingle sets by doc id (broadcast-size here; bucketed join at
    scale); a 10M-copy boilerplate family makes its representative a
    hot verify-join key — AQE's skew split handles a replicated
    single-array payload."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = _planted_corpus(docs)
    # Two materialization decisions, both measured (see BASELINE.md):
    # - the repartition barrier spreads the (possibly few-file) scan
    #   across the cluster before the expensive minhash stage, and stops
    #   projection collapse from substituting the shingle transform into
    #   all 32 minhash lambdas (14× recompute without it);
    # - pinning.pin() pins the shingled frame, which three plan branches
    #   consume (band generation + both sides of the verify join) and
    #   which Spark would otherwise re-evaluate per branch — exchange
    #   reuse does not fire across differently-aliased subtrees. The pin
    #   MECHANISM is the session's spark.spark_graft.pin_mode (pinning.py):
    #   localCheckpoint for single-node/bench (blocks owned by the plan,
    #   self-cleaning, not executor-loss tolerant), persist(DISK_ONLY)
    #   or a checkpoint table for clusters. bucket_key="doc_id" makes
    #   the checkpoint_table layout hash-bucketed+sorted on doc_id, so
    #   the verify join below plans with ZERO Exchange on both shingle
    #   sides (SCALE.md §7's 100 TB posture, proved in
    #   tests/test_bucketing.py). The payload is only doc_id +
    #   hashed-gram arrays (~8·|grams| B/doc), far smaller than the
    #   text it derives from.
    # NB: no filter on size(sh) here — the toks-size filter above already
    # guarantees ≥1 gram, and a post-projection filter on `sh` would be
    # pushed below the projection, re-evaluating the entire shingle
    # expression a second time (measured 2.7× on this stage).
    shingled = (
        corpus.select(
            "doc_id",
            # two-level transform: the inner one materializes md5(g) so
            # the two substring reads share ONE md5 evaluation per gram
            # (a single-level lambda referencing md5(g) twice computes
            # it twice — measured 1.7× on this stage)
            F.transform(
                F.transform(_shingles(F.col("toks")), lambda g: F.md5(g)),
                lambda m: F.conv(F.substring(m, 1, 7), 16, 10).cast("long")
                * F.lit(268435456).cast("long")
                + F.conv(F.substring(m, 8, 7), 16, 10).cast("long"),
            ).alias("sh"),
        )
        .repartition(F.col("doc_id"))
    )
    shingled = pin(shingled, "f2_shingled", bucket_key="doc_id")

    n_hashes, n_bands, max_bucket = F2_N_HASHES, F2_N_BANDS, F2_MAX_BUCKET
    rows_per_band = n_hashes // n_bands
    # one minhash expression per seed, each referenced exactly once in
    # its band hash — no expression is duplicated, so nothing recomputes.
    # Built as a single SQL string: the equivalent Column-API construction
    # (32 Python lambdas) costs seconds of py4j round-trips per call;
    # F.expr ships the whole tree to the JVM parser in one hop.
    # Hash spellings mirror _f2_oracle_ctes exactly (md5-derived base,
    # universal-hash permutations — see F2_PERMS), band hash over the
    # pipe-joined minhash octet.
    minh = [
        f"array_min(transform(sh, s -> ({a} * (s % {F2_HASH_P}) + {b}) "
        f"% {F2_HASH_P}))"
        for a, b in F2_PERMS
    ]
    band_structs = ", ".join(
        "named_struct('band_id', {b}, 'band_hash', "
        "cast(conv(substr(md5(concat_ws('|', {args}, '{b}')), 1, 15), "
        "16, 10) as bigint))"
        .format(
            b=b,
            args=", ".join(
                f"cast({m} as string)"
                for m in minh[b * rows_per_band:(b + 1) * rows_per_band]
            ),
        )
        for b in range(n_bands)
    )
    # pinned like the shingles: THREE consumers below (the stats agg and
    # both bucket joins) would otherwise each re-derive all 32 minhashes
    # from the shingle arrays — the dominant map cost of the whole
    # operator. The payload is 4 rows of 3 longs per doc.
    bands = pin(
        shingled.select(
            "doc_id",
            F.explode(F.expr(f"array({band_structs})")).alias("band"),
        ).select("doc_id", "band.band_id", "band.band_hash"),
        "f2_bands",
    )

    # Candidate generation as a count-gated aggregation instead of a band
    # self-join + window cap. Phases on the same bucket key:
    # (1) per-bucket stats (count + min doc_id) — map-side-combinable,
    #     so a degenerate hot bucket costs one counter, never a buffer;
    # (2) collect_list ONLY over buckets that passed the 2..cap width
    #     gate, so no aggregation buffer can exceed cap ids. Gating
    #     BEFORE the list build matters: a width filter after
    #     collect_list would bound the pair *output* but still
    #     materialize the hot bucket's full doc array in one reduce task
    #     (OOM at 10^7-id buckets). Both phases and the gate join hash
    #     on (band_id, band_hash), so the exchange is shared/aligned;
    # (3) buckets OVER the cap: star pairs (rep=min doc_id → member) via
    #     a broadcast-size join of the few hot-bucket keys back onto
    #     bands — map-only, linear in bucket width, no per-bucket buffer
    #     anywhere (see docstring: the r6 100× recall fix).
    # All-pairs work and shuffle stay bounded by B·cap²; star work is
    # linear however skewed the input.
    pair_expr = (
        "flatten(transform(ids, (x, i) -> "
        "transform(slice(ids, i + 2, size(ids)), y -> "
        "named_struct('doc_a', least(x, y), 'doc_b', greatest(x, y)))))"
    )
    bucket_key = ["band_id", "band_hash"]
    bucket_stats = bands.groupBy(*bucket_key).agg(
        F.count(F.lit(1)).alias("w"), F.min("doc_id").alias("rep")
    )
    ok_buckets = (
        bucket_stats
        .filter((F.col("w") >= 2) & (F.col("w") <= max_bucket))
        .select(*bucket_key)
    )
    all_pairs = (
        bands.join(ok_buckets, bucket_key)
        .groupBy(*bucket_key)
        .agg(F.collect_list("doc_id").alias("ids"))
        .filter(F.size("ids") >= 2)
        .select(F.explode(F.expr(pair_expr)).alias("p"))
        .select("p.doc_a", "p.doc_b")
    )
    hot_reps = (
        bucket_stats.filter(F.col("w") > max_bucket)
        .select(*bucket_key, "rep")
    )
    star_pairs = (
        bands.join(hot_reps, bucket_key)
        .filter(F.col("doc_id") != F.col("rep"))
        # rep is the bucket MIN, so (rep, member) is already ordered
        .select(F.col("rep").alias("doc_a"), F.col("doc_id").alias("doc_b"))
    )
    cand = all_pairs.unionByName(star_pairs).distinct()
    sh_a = shingled.select(F.col("doc_id").alias("doc_a"),
                           F.col("sh").alias("sh_a"))
    sh_b = shingled.select(F.col("doc_id").alias("doc_b"),
                           F.col("sh").alias("sh_b"))
    verified = (
        cand.join(sh_a, "doc_a")
        .join(sh_b, "doc_b")
        .select(
            "doc_a", "doc_b",
            (
                F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
                / F.size(F.array_union("sh_a", "sh_b"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.6)
    )
    return verified.select("doc_a", "doc_b", fx.r4(F.col("jaccard")).alias("jaccard"))


@query("f20_ml_minhash_lsh")  # rows-only: library LSH, no SQL twin
def f20_ml_minhash_lsh(spark, sf_dir):
    """F20: the pyspark.ml form of near-dup detection (SURVEY.md §2 F2's
    named primitives): shingles → binary HashingTF vectors → MinHashLSH →
    ``approxSimilarityJoin`` at Jaccard distance ≤ 0.4, over the same
    planted-duplicate corpus as f2.

    Two findings from measurement (sf0.1, 5000 docs):
    - the feature frame MUST be persisted — ``approxSimilarityJoin``
      references it on both join sides and in the model transform, and
      without pinning every task re-derives it from the parquet scan
      (35 s unpinned → ~3 s pinned);
    - with that fixed, the library is competitive locally, but its hash
      tables are single-minhash bands with no bucket-width cap, so its
      candidate volume on boilerplate-heavy corpora is unbounded — the
      from-scratch f2 (8-row bands + explicit cap) stays the scale path
      with those knobs exposed. Same planted pairs must surface
      (asserted in tests)."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = _planted_corpus(docs)
    shingled = corpus.select(
        "doc_id", _shingles(F.col("toks")).alias("grams")
    )
    tf = HashingTF(inputCol="grams", outputCol="features",
                   numFeatures=1 << 14, binary=True)
    # pin: approxSimilarityJoin references this frame on both join sides
    # and inside the model transform — without pinning, every task
    # re-derives it from the parquet scan. Mode-switchable (pinning.py):
    # default localCheckpoint blocks die with the result frame instead
    # of holding a session-wide CacheManager entry.
    feat = pin(tf.transform(shingled).select("doc_id", "features"),
               "f20_feat")
    lsh = MinHashLSH(inputCol="features", outputCol="hashes",
                     numHashTables=4, seed=42)
    model = lsh.fit(feat)
    joined = model.approxSimilarityJoin(feat, feat, 0.4,
                                        distCol="jaccard_dist")
    return (
        joined.filter(
            F.col("datasetA.doc_id") < F.col("datasetB.doc_id")
        )
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            fx.r4(1 - F.col("jaccard_dist")).alias("jaccard"),
        )
    )


# ------------------------------------------- F3: similarity search (ANN)
@query(
    "f3_cosine_topk",
    oracle=f"""
    SELECT * FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               FLOOR(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                            CAST(c.embedding AS DOUBLE[]))
                     * 1000000.0 + 0.5) / 1000000.0 AS cosine,
               ROW_NUMBER() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                                   CAST(c.embedding AS DOUBLE[]))
                            DESC, c.vec_id
               ) AS rk
        FROM (SELECT * FROM embeddings WHERE {_VEC_OK}) q
        JOIN (SELECT * FROM embeddings WHERE {_VEC_OK}) c
          ON q.vec_id <> c.vec_id
        WHERE q.vec_id < 20
    ) WHERE rk <= 5
    """,
)
def f3_cosine_topk(spark, sf_dir):
    """F3: exact brute-force cosine top-k — the correctness baseline for
    similarity search. Queries (small side) broadcast against the full
    candidate set; norms are precomputed once per side; per-pair work is a
    sequential 64-dim double dot in codegen (bit-identical to the oracle's
    loop). Top-k is a per-query window, planned as partial top-k under AQE.
    The scale path (bucketed candidates instead of all-pairs) is
    f3_lsh_ann."""
    emb = _embeddings(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("q_emb"), F.col("nrm").alias("q_nrm"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("emb").alias("c_emb"), F.col("nrm").alias("c_nrm"),
    )
    pairs = F.broadcast(q).join(
        c, F.col("query_id") != F.col("neighbor_id")
    )
    cos = (_dot_unrolled("q_emb", "c_emb")
           / (F.col("q_nrm") * F.col("c_nrm")))
    w = W.partitionBy("query_id").orderBy(
        F.col("_cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.select("query_id", "neighbor_id", cos.alias("_cos"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select(
            "query_id", "neighbor_id",
            fx.r6(F.col("_cos")).alias("cosine"), "rk",
        )
    )


def lsh_planes_for(n_rows: int, target_bucket: int = 2000) -> int:
    """Measured plane-count rule for the LSH ANN scale mode (r10,
    SCALE.md §19c): hold the EXPECTED bucket width ≈ ``target_bucket``
    as the corpus grows — ``n = log2(corpus / target)`` planes, floored
    at the 4-plane oracle contract, capped at the seeded prefix. With
    Hamming-1 multi-probe the probed candidate count per query is then
    ≈ (n+1)·target, i.e. LOGARITHMIC growth in corpus size where the
    pinned-4-plane contract is linear (pairs/query = corpus/16 — the
    §18b honest negative this rule closes)."""
    import math as _math

    if n_rows <= 0:
        return _N_LSH_PLANES
    return max(_N_LSH_PLANES,
               min(_LSH_MAX_PLANES,
                   round(_math.log2(max(n_rows / target_bucket, 1.0)))))


@query("f3_lsh_ann", oracle=_lsh_ann_oracle())
def f3_lsh_ann(spark, sf_dir):
    """F3 scale path: random-hyperplane LSH ANN with multi-probe. Each
    vector gets a 4-bit signature (sign of dot with 4 fixed seeded
    hyperplanes) → 16 buckets; each query probes its own bucket plus the
    4 Hamming-1 neighbors (explode over 5 probe ids), joins candidates
    equi on bucket id, then exact top-k within the probed set. At 100 TB:
    bucket count scales with data (more planes), the join stays
    equi/shuffle-partitionable, candidates are indexed once while the
    (small) query side fans out — recall/cost is tuned by probe radius,
    never by widening to all-pairs. Recall vs the exact baseline is
    asserted in tests/test_llm_ops.py; because the hyperplanes are fixed
    literals, the whole approximate pipeline is ALSO value-checked
    against a DuckDB twin that inlines the same planes.

    Scale mode (r10): ``SPARK_GRAFT_LSH_PLANES=<n>`` widens the
    signature to ``n`` planes from the same seeded prefix
    (:data:`LSH_ALL_PLANES`; probe radius widens with it). The default
    stays the 4-plane oracle contract; deployments size ``n`` with
    :func:`lsh_planes_for` (the measured bucket-width rule, SCALE.md
    §19c, recall ≥ 0.9 gated in tests/test_llm_ops.py) and build the
    embeddings layout AT that width
    (``build_workload_layout(lsh_planes=n)``, r11) so the wide mode
    rides the stored pre-partitioned assignment with DPP pruning —
    the 100 TB deployment shape §19c finding 2 named. A width with no
    matching layout computes buckets inline (value-correct,
    tagging-scan-bound)."""
    n_planes = int(os.environ.get("SPARK_GRAFT_LSH_PLANES",
                                  _N_LSH_PLANES))
    if not _N_LSH_PLANES <= n_planes <= _LSH_MAX_PLANES:
        raise ValueError(
            f"SPARK_GRAFT_LSH_PLANES={n_planes} outside "
            f"[{_N_LSH_PLANES}, {_LSH_MAX_PLANES}] — the seeded plane "
            f"prefix holds {_LSH_MAX_PLANES} planes and the oracle "
            f"contract floors at {_N_LSH_PLANES}")
    # bucket comes from the shared accessor: the embeddings layout
    # serves it pre-partitioned (stored graft_lsh_bucket — the
    # persisted ANN index) whenever the layout was BUILT at this
    # width (r11: build_workload_layout(lsh_planes=n) persists a
    # wide-plane assignment, closing SCALE.md §19c finding 2's
    # tagging-scan-bound wide mode); any width mismatch recomputes
    # inline from the same prefix-stable plane stream.
    return _lsh_ann_topk(spark, sf_dir, n_planes)


def _lsh_ann_topk(spark, sf_dir, n_planes: int):
    """The LSH ANN plan at one signature width — shared by f3_lsh_ann
    (env-selected width, default the 4-plane contract) and
    f3_lsh_ann_wide (pinned 8-plane scale mode, r11)."""
    tagged = _embeddings(spark, sf_dir, with_bucket=True,
                         n_planes=n_planes)
    probes = F.array(
        F.col("bucket"),
        *[F.col("bucket").bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)],
    )
    q = (
        tagged.filter(F.col("vec_id") < 20)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("emb").alias("q_emb"), F.col("nrm").alias("q_nrm"),
            F.explode(probes).alias("bucket"),
        )
    )
    c = tagged.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("emb").alias("c_emb"), F.col("nrm").alias("c_nrm"), "bucket",
    )
    pairs = q.join(c, ["bucket"]).filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    cos = (_dot_unrolled("q_emb", "c_emb")
           / (F.col("q_nrm") * F.col("c_nrm")))
    w = W.partitionBy("query_id").orderBy(
        F.col("_cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.select("query_id", "neighbor_id", cos.alias("_cos"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("query_id", "neighbor_id",
                fx.r6(F.col("_cos")).alias("cosine"), "rk")
    )


# the wide demo width: 8 planes = 256 buckets — wide enough that the
# probed fraction (9/256 ≈ 3.5%) is a different regime from the
# contract default's 5/16 ≈ 31%, small enough that the sf0.01 oracle
# corpus (~5k vectors) still populates buckets
_WIDE_DEMO_PLANES = 8


@query("f3_lsh_ann_wide", oracle=_lsh_ann_oracle(_WIDE_DEMO_PLANES))
def f3_lsh_ann_wide(spark, sf_dir):
    """F3 scale mode under ORACLE (r11, self-initiated): the WIDE LSH
    signature itself value-checked against a DuckDB twin — 8 planes
    from the same prefix-stable seeded stream (256 buckets, Hamming-1
    multi-probe = 9 probes), fixed literals inlined on both sides, so
    the approximate SCALE path gets the same oracle grade as the
    4-plane contract instead of a rows-only recall gate. Serves the
    stored assignment with DPP pruning when the embeddings layout was
    built at this width (``build_workload_layout(lsh_planes=8)`` /
    ``build_ann_index`` at an ~0.5 M-row corpus); computes inline
    otherwise — value-identical either way (the §20 transparency
    test). At 100 TB the width comes from :func:`lsh_planes_for` and
    the layout is built AT it; this key pins the machinery at a width
    the sf0.01 oracle corpus can populate."""
    return _lsh_ann_topk(spark, sf_dir, _WIDE_DEMO_PLANES)


def _f21_oracle(k: int = 16, nprobe: int = 4) -> str:
    """DuckDB twin of f21_ivf_ann: derives the SAME seed centroids from
    the data (portable hash rank — no literals needed, so one static
    string serves every SF), assigns by the same sequential-accumulation
    d² with the same (d², cell) tie order, probes the same nprobe cells,
    and ranks the same cosine (the f3-proven
    _dot ≡ list_dot_product equivalence)."""
    h = _seed_hash_sql("vec_id")
    return f"""
    WITH base AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
        FROM embeddings WHERE {_VEC_OK}
    ), seeds AS (
        SELECT se, rn - 1 AS cell FROM (
            SELECT e AS se,
                   ROW_NUMBER() OVER (ORDER BY {h}, vec_id) AS rn
            FROM base) WHERE rn <= {k}
    ), d AS (
        SELECT b.vec_id, b.e, s.cell,
               list_dot_product(s.se, s.se)
                   - 2 * list_dot_product(b.e, s.se) AS d2
        FROM base b CROSS JOIN seeds s
    ), assigned AS (
        SELECT vec_id, e, cell FROM (
            SELECT vec_id, e, cell, ROW_NUMBER() OVER (
                PARTITION BY vec_id ORDER BY d2, cell) AS arn
            FROM d) WHERE arn = 1
    ), probes AS (
        SELECT vec_id AS query_id, e AS qe, cell FROM (
            SELECT vec_id, e, cell, ROW_NUMBER() OVER (
                PARTITION BY vec_id ORDER BY d2, cell) AS prn
            FROM d WHERE vec_id < 20) WHERE prn <= {nprobe}
    ), pairs AS (
        SELECT p.query_id, a.vec_id AS neighbor_id,
               list_cosine_similarity(p.qe, a.e) AS cos
        FROM probes p JOIN assigned a USING (cell)
        WHERE p.query_id <> a.vec_id
    )
    SELECT query_id, neighbor_id,
           FLOOR(cos * 1000000.0 + 0.5) / 1000000.0 AS cosine, rk
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cos DESC, neighbor_id
        ) AS rk FROM pairs
    ) WHERE rk <= 5
    """


@query("f21_ivf_ann", oracle=_f21_oracle())
def f21_ivf_ann(spark, sf_dir, quantizer="seed"):
    """F21: IVF (inverted-file) ANN — the second of the two scale
    structures the training-pipeline mandate names (LSH is f3_lsh_ann).
    A coarse quantizer partitions the corpus into cells; every vector
    is assigned to its nearest centroid in one Arrow-batched map pass;
    each query probes its nprobe=4 nearest cells and runs exact cosine
    top-k inside them only.

    Quantizers (r8 graduation — see the _SEED_M block comment): the
    registered key uses the PORTABLE seed quantizer (centroids = the k
    hash-ranked corpus vectors, zero Lloyd iterations), which both
    engines derive identically — the key is fully oracle-hash-checked.
    ``quantizer="kmeans"`` keeps the seeded Lloyd fit
    (``_sampled_kmeans``) as the data-adaptive option for clustered
    embeddings; its fitted centroids live only in numpy, so that
    variant is recall-gated rather than hash-checked
    (tests/test_llm_ops.py exercises both).

    Scale posture (either quantizer): driver state is k×dim regardless
    of corpus size; assignment is map-only, one Arrow batch pass; the
    probe join is equi on cell id, shuffle-partitionable; recall/cost
    is tuned by k and nprobe."""
    k, nprobe = 16, 4
    emb = _embeddings(spark, sf_dir)
    if quantizer == "seed":
        centers_np = _seed_centroids(emb, k=k)
    else:
        centers_np = _sampled_kmeans(emb, k=k)
    if centers_np is None:  # empty corpus: no index, no neighbors
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, cosine double, rk int")
    nprobe = min(nprobe, len(centers_np))  # k may have been clamped
    nearest_cell = _nearest_seed_udf(centers_np)
    probe_cells = _probe_seeds_udf(centers_np, nprobe)

    # cells: one map pass; pinned so the probe join's two reads (query
    # side + corpus side) don't recompute the scan+assignment (mode per
    # pinning.py; default localCheckpoint is released with the result)
    tagged = pin(emb.withColumn("cell", nearest_cell("emb")), "f21_cells")
    q = (
        tagged.filter(F.col("vec_id") < 20)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("emb").alias("q_emb"), F.col("nrm").alias("q_nrm"),
            F.explode(probe_cells("emb")).alias("cell"),
        )
    )
    c = tagged.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("emb").alias("c_emb"), F.col("nrm").alias("c_nrm"), "cell",
    )
    cos = (_dot_unrolled("q_emb", "c_emb")
           / (F.col("q_nrm") * F.col("c_nrm")))
    w = W.partitionBy("query_id").orderBy(
        F.col("_cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        q.join(c, ["cell"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("_cos"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("query_id", "neighbor_id",
                fx.r6(F.col("_cos")).alias("cosine"), "rk")
    )


@query("f13_embedding_neardup", oracle=_f13_oracle())
def f13_embedding_neardup(spark, sf_dir):
    """Embedding-cosine near-dup: pairs above a cosine threshold found
    through the LSH buckets (same machinery as f3_lsh_ann, pair output) —
    the embedding-space member of the dedup family. The hyperplane count
    scales as log2(n / target_bucket_width), holding expected bucket
    width (and so per-bucket quadratic work) constant as the corpus
    grows — the count() that sizes it is a metadata-cheap scalar, the
    same pattern a real pipeline gets from table stats.

    The per-pair cosine runs as an Arrow-batched pandas UDF (one einsum
    over the whole batch) — the bucketed self-join emits ~n²/buckets
    pairs, and a vectorized kernel beats the interpreted higher-order
    fold by ~4× there; the JVM `_dot` stays in the exact-baseline ops
    where bit-identical accumulation against the oracle matters."""
    # size from the USABLE population — the exact frame that gets
    # bucketed and the population the oracle's params CTE counts (r6
    # review finding: an IS-NOT-NULL count here and a _VEC_OK count
    # there can land either side of a log2 rounding boundary and derive
    # different plane counts, diverging every bucket id).
    #
    # r15 (verdict ask 7, guide §1.2/§5): the r14 shape paid TWO full
    # passes over the corpus before any pair work — a count() scan to
    # size the plane count, then a separate pin materialization of the
    # tagged frame. Folded: the source frame is pinned ONCE with an
    # attached Observation whose count rides the pin's own
    # materialization job (zero extra pass — at 100 TB the count scan
    # was a full corpus read), and the plane-count rule consumes the
    # observed n. The bucket tag is then derived LAZILY from the
    # pinned blocks: its two consumers (width gate, refinement join)
    # re-derive only the k·64-dim sign dots — linear, expression-level
    # work over in-memory blocks — instead of forcing a second
    # corpus-sized materialization (the r14 tagged pin). The value is
    # identical: same n (observed count == count()), same planes, same
    # buckets. localCheckpoint, not persist: blocks are freed with the
    # result.
    obs = Observation()
    emb = pin(
        _embeddings(spark, sf_dir)
        .observe(obs, F.count(F.lit(1)).alias("n")),
        "f13_emb",
    )
    n = int(obs.get["n"])
    n_planes = max(2, round(math.log2(max(n, 1) / 64 + 1)))
    _f13_planes(n_planes)  # keeps the >40-plane fail-fast guard
    tagged = emb.withColumn("bucket", bucket_expr("f13", n_planes, "emb"))
    # Hot-bucket SPLIT (not drop): plane count targets an EXPECTED width
    # of 64 under uniformity, but clustered corpora — the very thing a
    # near-dup detector hunts — concentrate in few buckets, and an
    # uncapped bucket self-join goes quadratic on the hot bucket (m²/2
    # pairs through one task). Dropping hot buckets would discard exactly
    # the dense clusters the operator exists to find, so oversized
    # buckets instead get 8 MORE sign bits (256-way sub-split; cold
    # buckets shift into a disjoint id space — ×257 keeps hot sub-ids
    # from colliding with the next cold bucket; the base bucket is cast
    # long first so the multiply can't wrap int32 at high plane counts
    # and silently re-merge unrelated sub-buckets). The width gate is a
    # map-side-combinable count, and the refined frame is re-pinned:
    # three consumers (re-gate + both self-join sides) read one
    # materialization instead of re-deriving the split bits.
    max_bucket = 512
    widths = tagged.groupBy("bucket").agg(F.count(F.lit(1)).alias("_w"))
    bucket_l = F.col("bucket").cast("long")
    refined = (
        tagged.join(widths, "bucket")
        .withColumn(
            "bucket",
            F.when(
                F.col("_w") > max_bucket,
                bucket_l * 257 + 1
                + bucket_expr("f13_split", len(F13_SPLIT_PLANES),
                              "emb"),
            ).otherwise(bucket_l * 257),
        )
        .drop("_w")
    )
    refined = pin(refined, "f13_refined")
    w2 = refined.groupBy("bucket").agg(F.count(F.lit(1)).alias("_w"))
    flagged = refined.join(w2, "bucket")
    cold = flagged.filter(F.col("_w") <= max_bucket)
    a = cold.select(F.col("vec_id").alias("id_a"),
                    F.col("emb").alias("emb_a"), "bucket")
    b = cold.select(F.col("vec_id").alias("id_b"),
                    F.col("emb").alias("emb_b"), "bucket")
    # Sub-buckets STILL hot after 8 extra bits are (near-)identical
    # vectors no hyperplane separates — all-pairs there is quadratic with
    # zero information gain. Emit STAR pairs around the min-id member
    # instead: linear output whose pairs would still connect the whole
    # residue cluster under a connected-components pass like f14's (f14
    # consumes f2's minhash pairs today; wiring it to f13 is a one-line
    # input swap). Caveat: star pairs pass the same cosine>threshold
    # filter, so a member below-threshold to the REPRESENTATIVE drops
    # even if above-threshold to another member — acceptable for the
    # near-identical residue this branch handles. (rep < member ⇒
    # id_a < id_b holds by construction.)
    hot = flagged.filter(F.col("_w") > max_bucket)
    w_b = W.partitionBy("bucket")
    star = (
        hot.withColumn(
            "_rep", F.min(F.struct(F.col("vec_id"), F.col("emb"))).over(w_b)
        )
        .filter(F.col("vec_id") != F.col("_rep.vec_id"))
        .select(
            F.col("_rep.vec_id").alias("id_a"),
            F.col("_rep.emb").alias("emb_a"),
            F.col("vec_id").alias("id_b"),
            F.col("emb").alias("emb_b"),
        )
    )

    @F.pandas_udf("double")
    def cosine_batch(xa, xb):  # Series -> Series (SCALAR pandas UDF)
        import numpy as np
        import pandas as pd

        ma = np.stack(xa.values)
        mb = np.stack(xb.values)
        num = np.einsum("ij,ij->i", ma, mb)
        den = (np.linalg.norm(ma, axis=1) * np.linalg.norm(mb, axis=1))
        return pd.Series(num / den)

    pairs = (
        a.join(b, ["bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "emb_a", "id_b", "emb_b")
        .unionByName(star)
    )
    return (
        pairs.select("id_a", "id_b",
                     fx.r6(cosine_batch("emb_a", "emb_b")).alias("cosine"))
        # synthetic embeddings are isotropic random (max pairwise cosine
        # ≈0.48); 0.3 marks the top ~1% as "near-dup" for a non-degenerate
        # demonstration — real corpora use 0.85-0.95
        .filter(F.col("cosine") > 0.3)
    )


@query(
    "f14_dedup_clusters",
    # Oracle-checked as of r6 (was rows-only): f2's pair set now has an
    # exact SQL twin (md5-derived hashes, see f2), so connected
    # components over it does too — a recursive CTE computes the true
    # transitive closure and takes MIN(label) per node. The Spark side
    # (1 fused init + 9 pointer-jumping rounds, path halving) equals
    # true CC whenever every component's effective diameter is within
    # the ~2^9 bound the halving gives, and REFUSES loudly otherwise —
    # so a converged Spark result always matches this oracle; star
    # pairs keep hot clusters at radius <= 2, and the driver's
    # value-hash at three SFs is exactly the check that the premise
    # holds on real data.
    oracle="WITH RECURSIVE " + _f2_oracle_ctes() + """
    , pairs AS (
        SELECT doc_a, doc_b FROM verified WHERE j >= 0.6
    ), edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION
        SELECT doc_b, doc_a FROM pairs
    ), nodes AS (
        SELECT doc_id FROM documents
        UNION
        SELECT src FROM edges
    ), reach(id, lab) AS (
        SELECT doc_id, doc_id FROM nodes
        UNION
        SELECT e.dst, r.lab FROM edges e JOIN reach r ON r.id = e.src
    )
    SELECT id AS doc_id, MIN(lab) AS cluster_id, MIN(lab) = id AS keep
    FROM reach GROUP BY id
    """,
)
def f14_dedup_clusters(spark, sf_dir):
    """F14: duplicate-cluster resolution — connected components over the
    near-duplicate pair graph (f2's output), turning pairwise matches
    into dedup decisions: every doc in the corpus gets a cluster_id (the
    minimum doc_id in its component; singletons are their own cluster)
    and a keep flag on the cluster representative — so "keep rows where
    keep" is the complete deduplicated corpus, not just the pair members.

    Algorithm: min-label propagation WITH pointer jumping. Each vertex
    starts labeled with its own id; each round, every vertex takes
    min(own label, neighbors' labels, label-of-own-label) — the last
    term is the path-halving jump, fused into the same round plan — so
    label chains collapse exponentially and rounds-to-converge is
    O(log diameter), not O(diameter). Converged when a round changes nothing; if the
    round cap (1 fused + 9) is ever insufficient the query REFUSES
    loudly instead of returning near-converged labels (the r6 edge
    corpus caught exactly that: a chain component whose diameter
    exceeded the cap left 7 docs one hop above the component min, and
    the plain-propagation loop exited silently — found by the f14
    oracle differential the same day it was added).

    Scale notes: the per-round work is two equi joins (edges⋈labels and
    labels⋈labels) plus a min-aggregate — all shuffle-partitioned on
    vertex id. Each round's result is pinned (pinning.pin — mode
    switchable between localCheckpoint / persist(DISK_ONLY) /
    checkpoint table; rounds N-1's pin is released as soon as round N
    materializes): without lineage truncation an iterative loop's plan
    doubles per round and the job dies at plan compile time long before
    data size matters; the pin also makes the labels⋈labels self-join
    read materialized blocks instead of recomputing the round. The
    convergence check is a scalar count per round (a driver-side
    decision, not a data collect)."""
    pairs = f2_minhash_dedup(spark, sf_dir).select("doc_a", "doc_b")
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(
            pairs.select(F.col("doc_b").alias("src"),
                         F.col("doc_a").alias("dst"))
        )
    )
    # consumed every propagation round + the final corpus union; the pin
    # also cuts the f2 lineage out of the loop plans (mode per pinning.py)
    edges = pin(edges, "f14_edges")
    # round 1 fused into initialization: with labels starting equal to
    # ids, the first propagation is exactly min(id, min neighbor id) —
    # one aggregation instead of a full join+aggregate+checkpoint round
    labels = (
        edges.groupBy(F.col("src").alias("id"))
        .agg(F.min("dst").alias("_mn"))
        .select(
            "id", F.least(F.col("id"), F.col("_mn")).alias("label")
        )
    )
    labels = pin(labels, "f14_labels0", eager=False)
    prev_pin = labels
    changed = -1
    for _ in range(9):
        nbr_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        # pointer jump (path halving) fused into the same round plan:
        # the PRE-round labels serve as their own label→label lookup
        # (they are already checkpointed, so the self-reference reads
        # materialized blocks), and the update takes
        #   min(own, min-neighbor, label-of-label)
        # in one pass — label chains still collapse exponentially, but
        # the round costs ONE checkpoint + ONE convergence count, not
        # two of each.
        lookup = labels.select(
            F.col("id").alias("jid"), F.col("label").alias("jlabel")
        )
        new_label = F.least(
            F.col("label"),
            F.coalesce(F.col("nbr_label"), F.col("label")),
            F.coalesce(F.col("jlabel"), F.col("label")),
        )
        # carry the changed flag through the checkpoint so convergence is
        # a filter-count on materialized data, not a second join per round
        stepped = pin(
            labels.join(nbr_min, labels.id == nbr_min.src, "left")
            .join(lookup, labels.label == lookup.jid, "left")
            .select(
                labels.id,
                new_label.alias("label"),
                (new_label < labels.label).alias("_changed"),
            ),
            "f14_round",
            # lazy: the convergence count right below is the round's
            # materializing action, so the pin rides that ONE job
            # instead of running its own (measured: disk_persist mode
            # 6.7 → ~4 s at sf0.1; identical job count in default mode)
            eager=False,
        )
        changed = stepped.filter("_changed").count()
        # round N is materialized: round N-1's pin is dead — release it
        # in the tracked modes so cluster disk footprint stays one round
        # deep (no-op under localCheckpoint, where the ContextCleaner
        # owns block lifetime)
        unpin(prev_pin)
        prev_pin = stepped
        labels = stepped.drop("_changed")
        if changed == 0:
            break
    if changed != 0:
        # the cap is ~2^9 effective diameter with path halving; hitting
        # it means labels may be near-converged-but-wrong — refuse, the
        # repo's fail-fast posture (silent near-answers corrupt dedup)
        raise ValueError(
            "f14: label propagation did not converge within the round "
            "cap — component diameter exceeds the documented bound"
        )
    # cover the WHOLE corpus, not just docs that appear in a pair:
    # singletons are their own (kept) cluster — a consumer keeping
    # keep=true rows must not silently lose every unique document.
    # (Corpus = the documents table ∪ f2's planted synthetic docs, which
    # surface through the edge set.)
    all_docs = (
        table(spark, sf_dir, "documents")
        .select(F.col("doc_id").alias("id"))
        .unionByName(edges.select(F.col("src").alias("id")))
        .distinct()
    )
    return (
        all_docs.join(labels, "id", "left")
        .select(
            F.col("id").alias("doc_id"),
            F.coalesce(F.col("label"), F.col("id")).alias("cluster_id"),
            (F.coalesce(F.col("label"), F.col("id")) == F.col("id"))
            .alias("keep"),
        )
    )


@query(
    "f15_train_val_split",
    oracle="""
    SELECT doc_id, lang,
           CASE WHEN bucket < 90 THEN 'train'
                WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split
    FROM (
        SELECT doc_id, lang,
               ('0x' || substring(md5(text), 1, 8))::BIGINT % 100 AS bucket
        FROM documents
    )
    """,
)
def f15_train_val_split(spark, sf_dir):
    """F15: deterministic train/val/test split (90/5/5) — bucket by a
    content hash (md5 of the text, not the id), so the assignment is
    stable under re-sharding, re-ingestion, and id reassignment, and
    duplicate texts always land in the same split (no train/test leakage
    through near-copies that exact-hash equal). Pure projection: no
    shuffle, fuses with the scan; the md5/hex-prefix construction is the
    cross-engine-reproducible spelling of the bucket hash."""
    bucket = (
        F.conv(F.substring(F.md5("text"), 1, 8), 16, 10).cast("long") % 100
    )
    return table(spark, sf_dir, "documents").select(
        "doc_id", "lang",
        F.when(bucket < 90, "train")
        .when(bucket < 95, "val")
        .otherwise("test")
        .alias("split"),
    )


@query(
    "f16_pack_sequences",
    oracle="""
    SELECT doc_id, lang, n_tokens,
           CAST(FLOOR((cum - n_tokens) / 512.0) AS BIGINT) AS pack_id
    FROM (
        SELECT doc_id, lang,
               len(string_split(text, ' ')) AS n_tokens,
               SUM(len(string_split(text, ' '))) OVER (
                   PARTITION BY lang ORDER BY doc_id
                   ROWS UNBOUNDED PRECEDING) AS cum
        FROM documents
    )
    """,
)
def f16_pack_sequences(spark, sf_dir):
    """F16: sequence packing — assign documents to fixed token-budget
    packs (512 here) for training-batch construction. Deterministic
    cumulative-sum formulation: pack_id = floor(tokens-before / budget)
    within each language stream ordered by doc_id — reproducible across
    runs/partitionings.

    Scale shape: the running sum is TWO-PHASE — a partitionBy(lang)
    window would push each language's whole stream through one sorted
    task, so documents cumulate within (lang, doc_id-range bucket)
    sub-streams (parallel windows) and add the earlier buckets' token
    totals (a per-(lang,bucket) aggregate thousands of times smaller
    than the corpus; its own cumulative window partitions by lang over
    that reduced frame). doc_id-range bucketing — unlike hash — keeps
    the bucket sequence aligned with the stream order, so cum (and
    every pack_id) is IDENTICAL to the single-window form."""
    bucket_w = 1024  # docs per sub-stream bucket
    # fx.nsize: a null document must carry NULL n_tokens, not legacy -1 —
    # a -1 lands in the running prefix sum and shifts EVERY later
    # document's pack_id in that language stream (r6 edge finding; NULL
    # is skipped by SUM on both engines, so the stream packs as if the
    # null doc contributed nothing, and its own pack_id is NULL)
    toks = fx.nsize(_tokens())
    d = table(spark, sf_dir, "documents").select(
        "doc_id", "lang", toks.alias("n_tokens"),
        (F.col("doc_id") / bucket_w).cast("long").alias("_bk"),
    )
    w_in = (
        W.partitionBy("lang", "_bk")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    bucket_offsets = (
        d.groupBy("lang", "_bk").agg(F.sum("n_tokens").alias("_bt"))
        .select(
            "lang", "_bk",
            (F.sum("_bt").over(W.partitionBy("lang").orderBy("_bk"))
             - F.col("_bt")).alias("_off"),
        )
    )
    # no broadcast hint: the offsets frame is ~corpus/1024 × langs rows —
    # thousands of times smaller than the corpus but still CORPUS-SCALING,
    # so the de-hint discipline (SCALE.md §3c) applies; AQE sizes the join
    # at runtime (broadcast while it fits, shuffle join past that).
    # NULL-SAFE on lang (r6 edge finding): a plain equi join silently
    # DROPPED every null-lang document — the two-phase decomposition
    # must not change the single-window form's semantics, and a window's
    # PARTITION BY keeps the null group. The null-lang stream packs like
    # any other language stream.
    offs = (
        bucket_offsets.withColumnRenamed("lang", "_olang")
        .withColumnRenamed("_bk", "_obk")
    )
    return (
        d.join(offs, d["lang"].eqNullSafe(F.col("_olang"))
               & (d["_bk"] == F.col("_obk")))
        .select(
            "doc_id", "lang", "n_tokens",
            F.floor(
                (F.sum("n_tokens").over(w_in) + F.col("_off")
                 - F.col("n_tokens")) / 512.0
            ).alias("pack_id"),
        )
    )


# ------------------------------------------------------ F4: text → TF-IDF
@query(
    "f4_tfidf",
    oracle="""
    WITH tok AS (
        SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents
    ), n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT term,
           COUNT(*) AS doc_freq,
           FLOOR(ln(CAST((SELECT n_docs FROM n) AS DOUBLE) / COUNT(*))
                 * 1000000.0 + 0.5) / 1000000.0 AS idf
    FROM tok GROUP BY term
    """,
)
def f4_tfidf(spark, sf_dir):
    """F4: document frequency + IDF per term (the model-free core of
    TF-IDF; the per-(doc,term) TF join is a composition of this with e5's
    tokenizer). explode → distinct → count: two-stage aggregate, vocab-
    sized output; at 100 TB the distinct is the only shuffle and is
    partial-aggregated map-side."""
    docs = table(spark, sf_dir, "documents")
    n_docs = docs.count()  # scalar dim, not a per-row collect
    tok = docs.select(
        "doc_id", F.explode(F.array_distinct(_tokens())).alias("term")
    )
    return tok.groupBy("term").agg(
        F.count(F.lit(1)).alias("doc_freq"),
        fx.r6(F.log(F.lit(float(n_docs)) / F.count(F.lit(1)))).alias("idf"),
    )


@query("f19_ml_tfidf_pipeline")  # rows-only: ml vectors, no SQL twin
def f19_ml_tfidf_pipeline(spark, sf_dir):
    """F19: the pyspark.ml form of TF-IDF (SURVEY.md §2 F4's named
    primitives): Tokenizer → HashingTF → IDF as a fitted Pipeline. The
    estimator/transformer surface matters for interop with ML tooling;
    the expression-only form (f4) remains the engine-native path. Output
    reduces the vector to deterministic scalars (active term count,
    L2 norm) — hashing and IDF are seed-free and data-deterministic.
    Scale: fit() is one aggregation over the corpus (document
    frequencies); transform() is a map-only pass.

    Null text is filtered at the source (r6 edge finding): pyspark.ml's
    Tokenizer is not null-tolerant — its Scala lambda NPEs on the first
    null document and kills the fit job. A library constraint, made an
    explicit input contract here rather than a 100 TB-run surprise."""
    from pyspark.ml import Pipeline
    from pyspark.ml.feature import IDF, HashingTF, Tokenizer

    docs = (
        table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "text")
    )
    # 1024 features: the vector_to_array bridge densifies, so width sets
    # the Arrow transfer volume (4096-wide measured ~2x slower end-to-end
    # for no demo value — the 31-word test vocab fills nothing either way)
    pipe = Pipeline(stages=[
        Tokenizer(inputCol="text", outputCol="toks"),
        HashingTF(inputCol="toks", outputCol="tf", numFeatures=1 << 10),
        IDF(inputCol="tf", outputCol="tfidf"),
    ])
    from pyspark.ml.functions import vector_to_array

    # IDF.fit treeAggregates document frequencies and raises on an empty
    # dataset (library constraint, like Tokenizer's null intolerance
    # above) — an empty corpus has a defined answer: no documents, no
    # rows. take(1) is the cheapest emptiness probe (stops at the first
    # row of the first non-empty partition).
    if not docs.take(1):
        return spark.createDataFrame(
            [], "doc_id long, n_active_terms int, tfidf_l2 double")
    fitted = pipe.fit(docs)
    # VectorUDT is not Arrow-native; vector_to_array exposes it as a
    # plain double array so the reductions run vectorized per batch
    out = fitted.transform(docs).withColumn(
        "arr", vector_to_array("tfidf")
    )

    @F.pandas_udf("double")
    def vec_norm(v):
        import numpy as np
        import pandas as pd

        return pd.Series(np.sqrt((np.stack(v.values) ** 2).sum(axis=1)))

    @F.pandas_udf("int")
    def vec_active(v):
        import numpy as np
        import pandas as pd

        return pd.Series((np.stack(v.values) != 0).sum(axis=1).astype("int32"))

    return out.select(
        "doc_id",
        vec_active("arr").alias("n_active_terms"),
        fx.r6(vec_norm("arr")).alias("tfidf_l2"),
    )


# ------------------------------------------------- F5/F12: multimodal
@query(
    "f5_binary_cols",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           'text/plain' AS mime,
           sha256(text) AS payload_hash
    FROM documents
    """,
)
def f5_binary_cols(spark, sf_dir):
    """F5: multimodal column pattern — opaque binary payload + typed
    metadata travelling together. The payload here is encoded text (the
    container has no image/audio libs, TESTDATA.md); the schema shape
    (binary + struct metadata) is the real contract."""
    d = table(spark, sf_dir, "documents")
    payload = F.encode("text", "UTF-8")
    meta = F.struct(
        F.length(payload).alias("n_bytes"),
        F.lit("text/plain").alias("mime"),
    )
    return d.select(
        "doc_id",
        payload.alias("payload"),
        meta.alias("meta"),
        F.sha2("text", 256).alias("payload_hash"),
    ).select(
        "doc_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.mime").alias("mime"),
        "payload_hash",
    )


@query(
    "f12_multimodal_decode",
    # the deterministic stub decoder is arithmetic on the payload bytes,
    # so even the mapInPandas plumbing is value-checked cross-engine
    oracle="""
    SELECT doc_id,
           (('0x' || rpad(substring(hex(encode(text)), 1, 16), 16, '0'))
               ::UBIGINT % 2147483648)::BIGINT AS feat_checksum,
           CAST(octet_length(encode(text)) // 64 AS INTEGER)
               AS feat_size_bucket
    FROM documents
    """,
)
def f12_multimodal_decode(spark, sf_dir):
    """F12: multimodal decode/feature-extract plumbing — binary payloads
    stream through an Arrow-batched ``mapInPandas`` extractor. The decode
    itself is a STUB (no image/audio libs in this container —
    deterministic fake: first-8-byte checksum + length buckets standing in
    for real decoded features); the Spark-side contract (binary in, fixed
    feature schema out, batch iteration, partition parallelism) is real.
    """
    import pandas as pd

    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )

    def extract(batches):
        for pdf in batches:
            payloads = pdf["payload"]
            # --- STUB DECODER: replace with real image/audio decode ---
            # null payloads (a null source column encodes to null, and
            # real pipelines carry missing media) yield null features —
            # nullable extension dtypes keep the schema's long/int
            checksum = payloads.map(
                lambda b: None if b is None else
                int.from_bytes(bytes(b)[:8].ljust(8, b"\0"), "big")
                % (2**31)
            )
            size_bucket = payloads.map(
                lambda b: None if b is None else len(b) // 64
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "feat_checksum": checksum.astype("Int64"),
                    "feat_size_bucket": size_bucket.astype("Int32"),
                }
            )

    return d.mapInPandas(
        extract,
        schema="doc_id long, feat_checksum long, feat_size_bucket int",
    )


@query(
    "f17_quality_filter",
    oracle=f"""
    SELECT doc_id,
           CAST(n_tokens BETWEEN 5 AND 1000 AS INTEGER) AS ok_length,
           CAST(distinct_ratio > 0.2 AS INTEGER) AS ok_diversity,
           CAST(avg_token_len BETWEEN 2 AND 12 AS INTEGER) AS ok_token_len,
           CAST(n_tokens BETWEEN 5 AND 1000
                AND distinct_ratio > 0.2
                AND avg_token_len BETWEEN 2 AND 12 AS INTEGER) AS keep
    FROM (
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_tokens,
               CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                   / len(string_split(text, ' ')) AS distinct_ratio,
               (length(text) - len(string_split(text, ' ')) + 1.0)
                   / len(string_split(text, ' ')) AS avg_token_len
        FROM documents
    )
    """,
)
def f17_quality_filter(spark, sf_dir):
    """F17: corpus quality filter — threshold rules over the f6 text
    statistics (length band, lexical diversity, mean token length), each
    surfaced as its own flag so rejected documents carry the reason —
    the auditable form a real pipeline needs (filter-rate monitoring per
    rule, not a silent AND). Pure projection: fuses with the scan."""
    toks = _tokens()
    # fx.nsize: the flags reach the output — a null document must emit
    # NULL flags (unknown), not the legacy -1's confident 0/1 mix
    # (-1/-1 = 1.0 "passes" the diversity rule; r6 edge finding)
    n_tok = fx.nsize(toks).cast("double")
    distinct_ratio = fx.nsize(F.array_distinct(toks)) / n_tok
    avg_len = (F.length("text") - fx.nsize(toks) + 1.0) / n_tok
    ok_length = (fx.nsize(toks) >= 5) & (fx.nsize(toks) <= 1000)
    ok_diversity = distinct_ratio > 0.2
    ok_token_len = (avg_len >= 2) & (avg_len <= 12)
    return table(spark, sf_dir, "documents").select(
        "doc_id",
        ok_length.cast("int").alias("ok_length"),
        ok_diversity.cast("int").alias("ok_diversity"),
        ok_token_len.cast("int").alias("ok_token_len"),
        (ok_length & ok_diversity & ok_token_len).cast("int").alias("keep"),
    )


@query(
    "f18_pii_scrub",
    oracle="""
    SELECT doc_id,
           len(regexp_extract_all(aug,
               '[a-z0-9._]{1,64}@[a-z0-9.]{1,255}[a-z]')) AS n_emails,
           len(regexp_extract_all(aug, 'https?://[^ ]+')) AS n_urls,
           md5(regexp_replace(regexp_replace(aug,
                   '[a-z0-9._]{1,64}@[a-z0-9.]{1,255}[a-z]', '<EMAIL>', 'g'),
                   'https?://[^ ]+', '<URL>', 'g')) AS scrubbed_md5
    FROM (
        SELECT doc_id,
               text || ' contact: user' || CAST(doc_id AS VARCHAR)
                    || '@example.com see http://site.example/'
                    || CAST(doc_id AS VARCHAR) AS aug
        FROM documents
    )
    """,
)
def f18_pii_scrub(spark, sf_dir):
    """F18: PII scrubbing — mask emails and URLs with typed placeholders
    and report per-document match counts (the redaction-rate signal a
    compliance pipeline monitors). The corpus is augmented with planted
    synthetic PII derived from the doc id so the mechanism is actually
    exercised (the word-soup testdata contains none). Pure regex
    projections, codegen'd, no shuffle; the patterns are RE2-compatible
    so Spark (Java regex) and DuckDB (RE2) agree.

    The quantifiers are RFC-bounded ({1,64} local part, {1,255} domain)
    rather than unbounded ``+`` — not just correctness pedantry: under
    Java's backtracking engine an unbounded ``[a-z0-9._]+@`` is
    QUADRATIC on a long alpha run (each start position consumes the
    whole run before failing the ``@``) — a single 1 MB single-token
    document hung the scrub for minutes (caught by
    tests/test_llm_edges.py). Bounded quantifiers cap per-position work
    at 64 chars → linear scan; DuckDB's RE2 is linear either way."""
    aug = F.concat(
        F.col("text"),
        F.lit(" contact: user"), F.col("doc_id").cast("string"),
        F.lit("@example.com see http://site.example/"),
        F.col("doc_id").cast("string"),
    )
    email_re = "[a-z0-9._]{1,64}@[a-z0-9.]{1,255}[a-z]"
    url_re = "https?://[^ ]+"
    scrubbed = F.regexp_replace(
        F.regexp_replace(aug, email_re, "<EMAIL>"), url_re, "<URL>"
    )
    return table(spark, sf_dir, "documents").select(
        "doc_id",
        F.regexp_count(aug, F.lit(email_re)).cast("long").alias("n_emails"),
        F.regexp_count(aug, F.lit(url_re)).cast("long").alias("n_urls"),
        F.md5(scrubbed).alias("scrubbed_md5"),
    )


# ------------------------------------------------- F6-F9: text analysis
@query(
    "f6_text_stats",
    oracle=f"""
    SELECT doc_id,
           length(text) AS n_chars,
           len(string_split(text, ' ')) AS n_tokens,
           FLOOR(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                 / len(string_split(text, ' ')) * 10000.0 + 0.5) / 10000.0
               AS distinct_ratio,
           FLOOR(CAST(len(list_filter(string_split(text, ' '),
                                      x -> x IN {STOPWORDS_EN!r})) AS DOUBLE)
                 / len(string_split(text, ' ')) * 10000.0 + 0.5) / 10000.0
               AS stopword_ratio,
           FLOOR((length(text) - len(string_split(text, ' ')) + 1.0)
                 / len(string_split(text, ' ')) * 10000.0 + 0.5) / 10000.0
               AS avg_token_len
    FROM documents
    """,
)
def f6_text_stats(spark, sf_dir):
    """F6: text quality statistics — length, token count, lexical
    diversity, stopword ratio, mean token length. Pure column expressions:
    the whole profile is one codegen'd projection, no shuffle at all."""
    toks = _tokens()
    # fx.nsize throughout: every count/ratio here reaches the output, and
    # legacy size(NULL) = -1 turns a null document into -1 tokens and
    # -1/-1 = 1.0 ratios under the production ansi=false session (r6
    # edge finding — see fx.nsize)
    n_tok = fx.nsize(toks).cast("double")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS_EN])
    n_stop = fx.nsize(
        F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    return table(spark, sf_dir, "documents").select(
        "doc_id",
        F.length("text").alias("n_chars"),
        fx.nsize(toks).alias("n_tokens"),
        fx.r4(fx.nsize(F.array_distinct(toks)) / n_tok)
        .alias("distinct_ratio"),
        fx.r4(n_stop / n_tok).alias("stopword_ratio"),
        fx.r4((F.length("text") - fx.nsize(toks) + 1.0) / n_tok)
        .alias("avg_token_len"),
    )


@query(
    "f7_lang_id",
    oracle=f"""
    SELECT doc_id, lang AS labeled_lang, s_en, s_es, s_de,
           CASE WHEN s_en >= s_es AND s_en >= s_de THEN 'en'
                WHEN s_es >= s_de THEN 'es' ELSE 'de' END AS predicted_lang
    FROM (
        SELECT doc_id, lang,
               len(list_filter(string_split(text, ' '),
                               x -> x IN {STOPWORDS_EN!r})) AS s_en,
               len(list_filter(string_split(text, ' '),
                               x -> x IN {STOPWORDS_ES!r})) AS s_es,
               len(list_filter(string_split(text, ' '),
                               x -> x IN {STOPWORDS_DE!r})) AS s_de
        FROM documents
    )
    """,
)
def f7_lang_id(spark, sf_dir):
    """F7: heuristic language ID — stopword-hit scoring per language,
    argmax with a fixed tie order. (The synthetic corpus is English-ish
    word soup with random ``lang`` labels, so the *mechanism* is what is
    checked — agreement with the label is not expected.)"""
    toks = _tokens()

    def score(words):
        arr = F.array(*[F.lit(s) for s in words])
        # fx.nsize: null text must score NULL, not -1 — under the legacy
        # -1, (-1 >= -1) satisfies the first argmax branch and mislabels
        # every null document 'en'; NULL scores fall through to the
        # CASE's ELSE exactly like the SQL oracle (r6 edge finding)
        return fx.nsize(F.filter(toks, lambda t: F.array_contains(arr, t)))

    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        score(STOPWORDS_EN).alias("s_en"),
        score(STOPWORDS_ES).alias("s_es"),
        score(STOPWORDS_DE).alias("s_de"),
    )
    return d.withColumn(
        "predicted_lang",
        F.when(
            (F.col("s_en") >= F.col("s_es")) & (F.col("s_en") >= F.col("s_de")),
            "en",
        )
        .when(F.col("s_es") >= F.col("s_de"), "es")
        .otherwise("de"),
    )


@query(
    "f8_fingerprint",
    oracle="""
    SELECT doc_id,
           sha256(array_to_string(list_sort(list_distinct(
               string_split(text, ' '))), ' ')) AS bag_fingerprint
    FROM documents
    """,
)
def f8_fingerprint(spark, sf_dir):
    """F8: order-insensitive document fingerprint — SHA-256 over the
    sorted distinct token bag. Robust to token reordering (the classic
    cheap near-dup pre-filter before MinHash)."""
    toks = _tokens()
    return table(spark, sf_dir, "documents").select(
        "doc_id",
        F.sha2(
            F.array_join(F.sort_array(F.array_distinct(toks)), " "), 256
        ).alias("bag_fingerprint"),
    )


@query(
    "f9_token_count",
    oracle="""
    SELECT doc_id,
           len(string_split_regex(text, '\\s+')) AS ws_tokens,
           len(regexp_extract_all(text, '[a-z]+')) AS alpha_tokens,
           len(regexp_extract_all(text, '[0-9]+')) AS num_tokens
    FROM documents
    """,
)
def f9_token_count(spark, sf_dir):
    """F9: token counting — whitespace tokens plus a BPE-ish regex token
    class count (alpha runs, digit runs). regexp_count is codegen'd; no
    Python in the loop."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        # fx.nsize: output-bound count; legacy size(split(NULL)) = -1
        # under the production ansi=false session (see fx.nsize)
        fx.nsize(F.split("text", r"\s+")).alias("ws_tokens"),
        F.regexp_count("text", F.lit("[a-z]+")).cast("long")
        .alias("alpha_tokens"),
        F.regexp_count("text", F.lit("[0-9]+")).cast("long")
        .alias("num_tokens"),
    )


def _f10_oracle() -> str:
    """DuckDB twin of f10_simhash: same md5-derived 64-bit token hash,
    same ±1 votes, same sign reassembly. The signature's bit 63 cannot be
    built with BIGINT shifts (DuckDB raises on ``1::BIGINT << 63``), so
    the bits sum in HUGEINT and one wraparound subtract maps [2^63, 2^64)
    to the negative longs — exactly Java's signed-64 bit pattern."""
    votes = ", ".join(
        "SUM(CASE WHEN ({src} >> {s}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
        .format(src="lo" if b < 32 else "hi", s=b % 32, b=b)
        for b in range(64)
    )
    bits = " + ".join(
        f"(CASE WHEN v{b} > 0 THEN (1::HUGEINT << {b}) ELSE 0::HUGEINT END)"
        for b in range(64)
    )
    return f"""
    WITH toks AS (
        SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
        FROM documents
    ), h AS (
        SELECT doc_id,
               ('0x' || substring(md5(tok), 1, 8))::BIGINT AS hi,
               ('0x' || substring(md5(tok), 9, 8))::BIGINT AS lo
        FROM toks
    ), votes AS (
        SELECT doc_id, {votes} FROM h GROUP BY doc_id
    )
    SELECT doc_id,
           (CASE WHEN sig >= 9223372036854775808::HUGEINT
                 THEN sig - 18446744073709551616::HUGEINT
                 ELSE sig END)::BIGINT AS simhash64
    FROM (SELECT doc_id, {bits} AS sig FROM votes)
    """


@query("f10_simhash", oracle=_f10_oracle())
def f10_simhash(spark, sf_dir):
    """F10: 64-bit SimHash — per-token 64-bit hash, each bit votes ±1,
    the signature is the sign vector. Shape: explode distinct tokens →
    groupBy(doc_id) with 64 conditional-sum aggregates (one per bit) →
    reassemble the signature from the vote signs. All codegen'd scalar
    arithmetic; the only shuffle is the per-doc partial-aggregated
    groupBy, and partial aggregation collapses each doc map-side (a doc's
    tokens are co-located within its scan partition), so the exchange
    carries ~one row per doc. This deliberately replaces a pure
    higher-order-array formulation (aggregate/zip_with over 64-wide
    arrays), which is evaluated interpreted, not codegen'd — 5× slower
    measured at sf0.1.

    Hash family (r6): the token hash is the first 16 hex chars of
    md5(token), reassembled as a signed long from two 32-bit halves —
    chosen over xxhash64 because BOTH engines compute it bit-identically
    (DuckDB has no xxhash64), which upgrades this key from rows-only to
    value-hash-verified. The construction is ANSI-posture-agnostic: conv
    of 8 hex chars is < 2^32, and shiftleft/bitwiseOR never overflow-
    throw. Measured cost of md5 over xxhash64 at sf0.1: ~0.5 s on this
    key (1.44 → 1.91 s) — the price of cross-engine verifiability,
    documented in BASELINE.md."""
    toks = _tokens()
    # staged projections: md5 and then the reassembled hash materialize
    # as named columns, so the 64 vote expressions all read ONE attribute
    # instead of re-evaluating the hash tree 64× (CollapseProject leaves
    # multiply-referenced non-cheap aliases in their own projection, so
    # the stage survives optimization)
    h = F.shiftleft(
        F.conv(F.substring(F.col("m"), 1, 8), 16, 10).cast("long"), 32
    ).bitwiseOR(
        F.conv(F.substring(F.col("m"), 9, 8), 16, 10).cast("long")
    )
    # r14 optimization: the 64 vote aggregates and the 64-term sign
    # reassembly are built as parsed SQL strings (one py4j call each)
    # instead of 64 chained Column-op loops (~6 py4j round trips per
    # term, ~1.4 s of driver time PER BUILD measured at sf0.1). The
    # parsed trees resolve to the identical expressions — same plan,
    # same codegen, same result; only the construction cost changes.
    votes = [
        F.expr(
            f"sum(CASE WHEN (shiftright(h, {b}) & 1) = 1 "
            f"THEN 1 ELSE -1 END) AS v{b}"
        )
        for b in range(64)
    ]
    per_bit = (
        table(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.array_distinct(toks)).alias("tok"))
        .select("doc_id", F.md5("tok").alias("m"))
        .select("doc_id", h.alias("h"))
        .groupBy("doc_id")
        .agg(*votes)
    )
    sim = F.expr(
        " | ".join(
            f"(CASE WHEN v{b} > 0 THEN shiftleft(CAST(1 AS BIGINT), {b}) "
            f"ELSE CAST(0 AS BIGINT) END)"
            for b in range(64)
        )
    )
    return per_bit.select("doc_id", sim.alias("simhash64"))


@query(
    "f11_ngram_jaccard",
    oracle="""
    WITH sh AS (
        SELECT doc_id,
               list_distinct([string_split(text, ' ')[i] || ' ' ||
                              string_split(text, ' ')[i+1] || ' ' ||
                              string_split(text, ' ')[i+2]
                              FOR i IN generate_series(1, len(string_split(text, ' ')) - 2)])
                   AS grams
        FROM documents
        WHERE len(string_split(text, ' ')) >= 3
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           FLOOR(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.grams, b.grams)))
                 * 1000000.0 + 0.5) / 1000000.0 AS jaccard
    FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
    """,
)
def f11_ngram_jaccard(spark, sf_dir):
    """F11: n-gram Jaccard similarity — exact shingle-set overlap for
    adjacent doc-id pairs (the verify kernel used inside f2's LSH
    pipeline, exposed standalone and oracle-checked). Grams are hashed to
    int64 (xxhash64) before the set ops: intersect/union and the join
    shuffle then move fixed-width longs instead of variable-length
    strings — same Jaccard counts (set semantics preserved; 64-bit
    collisions are negligible), measurably cheaper at scale."""
    sh = _hashed_shingles(table(spark, sf_dir, "documents"))
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("grams").alias("ga"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("grams").alias("gb"))
    jac = (
        F.size(F.array_intersect("ga", "gb")).cast("double")
        / F.size(F.array_union("ga", "gb"))
    )
    return (
        a.join(b, F.col("doc_b") == F.col("doc_a") + 1)
        .select("doc_a", "doc_b", fx.r6(jac).alias("jaccard"))
    )


@query(
    "f22_stratified_sample",
    oracle="""
    SELECT doc_id, lang
    FROM (
        SELECT doc_id, lang,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY md5(text), doc_id) AS rn,
               COUNT(*) OVER (PARTITION BY lang) AS n
        FROM documents WHERE text IS NOT NULL
    )
    WHERE rn <= CEIL(n * 0.1)
    """,
)
def f22_stratified_sample(spark, sf_dir):
    """F22: deterministic stratified sampling — exactly ceil(10%) of each
    language stratum, selected by content-hash order (md5(text), doc_id
    tiebreak). Unlike ``df.sample``/``sampleBy`` (per-row Bernoulli:
    nondeterministic across partitionings, only *expected* fractions),
    hash-rank selection is reproducible on any engine/sharding and hits
    the stratum size exactly — what a training-mix spec needs.

    Scale shape: the per-stratum rank is TWO-PHASE (f31's pattern per
    lang) — a partitionBy(lang) window would serialize each language's
    entire stratum through one sorted task (~corpus/n_langs rows), so
    the rank runs within (lang, hash-prefix bucket) sub-strata and adds
    the bucket's cumulative offset; offsets and stratum totals are a
    langs×256-row metadata frame, broadcast back. Global-per-stratum
    order ≡ (bucket, hash-within-bucket), so the selected set is
    IDENTICAL to the single-window form.

    Null-text docs are EXCLUDED explicitly, on both sides: md5(null) is
    a null sort key, and null ordering is the one place the engines
    disagree (Spark ASC sorts nulls first, DuckDB last) — and a null
    bucket silently falls out of the offset equi-join while still
    inflating the stratum total, eating a sample slot (caught by
    tests/test_llm_edges.py on a corpus with a null text)."""
    docs = (
        table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "lang", F.md5("text").alias("hk"))
    )
    bucketed = docs.withColumn("bk", F.substring("hk", 1, 2))
    counts = bucketed.groupBy("lang", "bk").agg(
        F.count(F.lit(1)).alias("_n")
    )
    offsets = counts.select(
        "lang", "bk",
        (F.sum("_n").over(W.partitionBy("lang").orderBy("bk"))
         - F.col("_n")).alias("_off"),
    )
    totals = counts.groupBy("lang").agg(F.sum("_n").alias("_total"))
    w = W.partitionBy("lang", "bk").orderBy("hk", "doc_id")
    # NULL-SAFE on lang (r6 edge finding, same class as f16): plain
    # equi joins dropped the null-lang stratum that the oracle's
    # PARTITION BY lang keeps — undocumented-language docs are a
    # stratum like any other, not discardable.
    offs = (
        offsets.withColumnRenamed("lang", "_olang")
        .withColumnRenamed("bk", "_obk")
    )
    tot = totals.withColumnRenamed("lang", "_tlang")
    return (
        bucketed.join(
            F.broadcast(offs),
            bucketed["lang"].eqNullSafe(F.col("_olang"))
            & (bucketed["bk"] == F.col("_obk")),
        )
        .join(F.broadcast(tot),
              bucketed["lang"].eqNullSafe(F.col("_tlang")))
        .withColumn(
            "_rank", F.row_number().over(w).cast("long") + F.col("_off")
        )
        .filter(F.col("_rank") <= F.ceil(F.col("_total") * 0.1))
        .select("doc_id", "lang")
    )


@query(
    "f23_repetition_ratio",
    oracle="""
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           FLOOR((1.0 - n_distinct / n_tokens) * 10000.0 + 0.5) / 10000.0
               AS dup_ratio,
           FLOOR((top_count / n_tokens) * 10000.0 + 0.5) / 10000.0
               AS top_token_share
    FROM (
        SELECT doc_id,
               CAST(SUM(cnt) AS DOUBLE) AS n_tokens,
               CAST(COUNT(*) AS DOUBLE) AS n_distinct,
               CAST(MAX(cnt) AS DOUBLE) AS top_count
        FROM (
            SELECT doc_id, tok, COUNT(*) AS cnt
            FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                  FROM documents)
            GROUP BY 1, 2
        )
        GROUP BY 1
    )
    """,
)
def f23_repetition_ratio(spark, sf_dir):
    """F23: within-document repetition signals — duplicate-token fraction
    (1 - distinct/total) and most-common-token share. The standard cheap
    boilerplate/spam detector a corpus quality pipeline runs before
    training (characteristically high on templated/spam pages). Explode → two-level
    hash aggregate, both keyed by doc_id so the exploded shuffle
    co-partitions with the per-doc rollup; no Python in the row path.
    At 100 TB the explode width is bounded by document length, and the
    (doc_id, tok) partial agg combines map-side before the shuffle."""
    toks = (
        table(spark, sf_dir, "documents")
        .select("doc_id", F.explode(_tokens()).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    per_doc = toks.groupBy("doc_id").agg(
        F.sum("cnt").cast("double").alias("nt"),
        F.count(F.lit(1)).cast("double").alias("nd"),
        F.max("cnt").cast("double").alias("tc"),
    )
    return per_doc.select(
        "doc_id",
        F.col("nt").cast("long").alias("n_tokens"),
        fx.r4(1.0 - F.col("nd") / F.col("nt")).alias("dup_ratio"),
        fx.r4(F.col("tc") / F.col("nt")).alias("top_token_share"),
    )


@query(
    "f24_decontaminate",
    oracle="""
    WITH bench AS (
        SELECT DISTINCT md5(lower(trim(text))) AS fp
        FROM documents WHERE doc_id % 97 = 0
    )
    SELECT d.doc_id, d.lang
    FROM documents d
    LEFT JOIN bench b ON md5(lower(trim(d.text))) = b.fp
    WHERE b.fp IS NULL
    """,
)
def f24_decontaminate(spark, sf_dir):
    """F24: benchmark decontamination — drop training documents whose
    normalized content hash appears in an eval/benchmark set (here a
    planted subset, doc_id % 97, standing in for the external benchmark
    corpus). The shape is the one that matters at 100 TB: the
    contamination list is a *small* distinct-fingerprint set, so the
    anti join broadcasts it and the corpus never shuffles; normalization
    (trim/lower) runs inside codegen before the hash. Near-dup
    contamination composes f2's MinHash candidates with the same
    anti-join tail. (The broadcast-smallness argument is about REAL
    benchmark suites — fixed external sets, MBs; the planted doc_id%97
    stand-in grows with the corpus and exists only so the key is
    self-contained on testdata.)"""
    fp = F.md5(F.lower(F.trim(F.col("text"))))
    docs = table(spark, sf_dir, "documents")
    bench = (
        docs.filter(F.col("doc_id") % 97 == 0)
        .select(fp.alias("fp"))
        .distinct()
    )
    return (
        docs.join(F.broadcast(bench), fp == bench.fp, "left_anti")
        .select("doc_id", "lang")
    )


# ------------------------------------------- F25-F27: passage-level ops
def _word_blocks(tok_col, width):
    """Non-overlapping ``width``-word blocks of a token array, joined
    back to strings (the last block may be shorter). The corpus has no
    line structure (single-space word streams), so fixed word blocks are
    the passage unit for line/passage-level ops — the same role
    newline-split lines play in C4-style pipelines. Pure expressions:
    fuses with the scan, no shuffle."""
    starts = F.sequence(
        F.lit(0), F.greatest(F.size(tok_col) - 1, F.lit(0)), F.lit(width)
    )
    return F.transform(
        starts, lambda s: F.array_join(F.slice(tok_col, s + 1, width), " ")
    )


_BOILERPLATE_W = 8


@query(
    "f25_boilerplate_removal",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks
        FROM documents WHERE text IS NOT NULL
    ), b AS (
        SELECT doc_id, start // {_BOILERPLATE_W} AS pos,
               array_to_string(
                   toks[start + 1 : start + {_BOILERPLATE_W}], ' ') AS block
        FROM (SELECT doc_id, toks,
                     unnest(range(0, len(toks), {_BOILERPLATE_W})) AS start
              FROM t)
    ), bp AS (
        SELECT block FROM b GROUP BY block
        HAVING COUNT(DISTINCT doc_id) >= 2
    )
    SELECT doc_id,
           COUNT(*) AS n_blocks,
           COUNT(*) FILTER (WHERE block IN (SELECT block FROM bp))
               AS n_removed,
           COALESCE(string_agg(block, ' ' ORDER BY pos)
                    FILTER (WHERE block NOT IN (SELECT block FROM bp)), '')
               AS clean_text
    FROM b GROUP BY doc_id
    """,
)
def f25_boilerplate_removal(spark, sf_dir):
    """F25: boilerplate removal — drop passages that recur across
    documents (the C4/RefinedWeb line-frequency rule: a passage appearing
    in >= 2 distinct docs is template/boilerplate, not content), then
    reassemble each document from its surviving passages in order.

    Scale posture: passage frequency is one map-side-combined groupBy on
    the block text (count distinct docs per block); the boilerplate set
    it yields is *small* relative to the corpus (by definition — these
    are the few templates shared by many pages), so flagging broadcasts
    it and the corpus never shuffles for the join; reassembly is one
    groupBy(doc_id) whose collect_list carries (pos, block) so the
    order-restoring sort is per-row array_sort, not a global sort.

    A null-text document has no passages and is absent from the output
    on BOTH sides (r6 edge finding: Spark's sequence/slice chain on a
    null token array manufactured one null block per null doc, while
    the oracle's range(NULL) produced none — the explicit filter makes
    the contract visible instead of an expression-evaluation accident).
    """
    docs = (
        table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", _tokens().alias("toks"))
    )
    blocks = docs.select(
        "doc_id",
        F.posexplode(_word_blocks(F.col("toks"), _BOILERPLATE_W))
        .alias("pos", "block"),
    )
    boiler = (
        blocks.groupBy("block")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("block", F.lit(True).alias("bp"))
    )
    # no broadcast hint: template boilerplate is small, but on a dup-
    # heavy crawl every block of every duplicated doc qualifies and the
    # set approaches corpus scale — a forced broadcast is the unbounded-
    # broadcast trap. AQE's runtime stats pick broadcast-when-small
    # (asserted on the executed plan in tests) and shuffle otherwise.
    flagged = blocks.join(boiler, "block", "left")
    kept = F.when(
        ~F.coalesce(F.col("bp"), F.lit(False)), F.struct("pos", "block")
    )
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.sum(F.when(F.col("bp"), 1).otherwise(0)).alias("n_removed"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept)), lambda x: x["block"]
            ),
            " ",
        ).alias("clean_text"),
    )


_PASSAGE_W = 16


@query(
    "f26_passage_dedup",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ), b AS (
        SELECT doc_id, start // {_PASSAGE_W} AS pos,
               array_to_string(
                   toks[start + 1 : start + {_PASSAGE_W}], ' ') AS block
        FROM (SELECT doc_id, toks,
                     unnest(range(0, len(toks), {_PASSAGE_W})) AS start
              FROM t)
    ), k AS (
        SELECT doc_id, pos, block,
               row_number() OVER (
                   PARTITION BY block ORDER BY doc_id, pos) AS rn
        FROM b
    )
    SELECT doc_id,
           COUNT(*) AS n_blocks,
           COUNT(*) FILTER (WHERE rn > 1) AS n_dropped,
           COALESCE(string_agg(block, ' ' ORDER BY pos)
                    FILTER (WHERE rn = 1), '') AS clean_text
    FROM k GROUP BY doc_id
    """,
)
def f26_passage_dedup(spark, sf_dir):
    """F26: repeated-passage dedup — every duplicated passage keeps only
    its globally first occurrence (ordered by doc_id, then position) and
    is dropped everywhere else; documents are reassembled from surviving
    passages. This is passage-granular exact dedup (vs f1's whole-doc
    hash): the unit that catches quoted/syndicated spans whole-doc
    hashing misses.

    Scale posture: first-occurrence is ``min(struct(doc_id, pos))`` per
    block — a map-side-combinable aggregate (no per-key sort, no window
    materialization; a row_number window over block would sort every
    group). The winners table is block-keyed and corpus-sized, so it
    joins back by shuffle on the block hash — equi, AQE-skew-splittable;
    reassembly is the same per-doc collect_list + array_sort as f25."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", _tokens().alias("toks")
    )
    blocks = docs.select(
        "doc_id",
        F.posexplode(_word_blocks(F.col("toks"), _PASSAGE_W))
        .alias("pos", "block"),
    )
    first = blocks.groupBy("block").agg(
        F.min(F.struct("doc_id", "pos")).alias("first")
    )
    flagged = blocks.join(first, "block").withColumn(
        "keep",
        (F.col("doc_id") == F.col("first.doc_id"))
        & (F.col("pos") == F.col("first.pos")),
    )
    kept = F.when(F.col("keep"), F.struct("pos", "block"))
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.sum(F.when(~F.col("keep"), 1).otherwise(0)).alias("n_dropped"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept)), lambda x: x["block"]
            ),
            " ",
        ).alias("clean_text"),
    )


_CHUNK, _STRIDE = 32, 24


@query(
    "f27_chunk_rag",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks,
               len(string_split(text, ' ')) AS n
        FROM documents
    ), s AS (
        SELECT doc_id, toks, n,
               unnest(range(0,
                   CAST(ceil(greatest(n - {_CHUNK}, 0) / {_STRIDE}.0)
                        AS BIGINT) * {_STRIDE} + 1,
                   {_STRIDE})) AS start
        FROM t
    )
    SELECT doc_id, start // {_STRIDE} AS chunk_id,
           array_to_string(toks[start + 1 : start + {_CHUNK}], ' ')
               AS chunk_text,
           least({_CHUNK}, n - start) AS n_tokens
    FROM s
    """,
)
def f27_chunk_rag(spark, sf_dir):
    """F27: overlapping token-window chunking (size 32, stride 24 — the
    retrieval/context-window prep step: every document becomes a set of
    fixed-budget chunks with 8 tokens of overlap so no span falls on a
    boundary). Token unit = whitespace word, consistent with f9.

    Scale posture: pure per-row expression work — sequence() builds the
    start offsets, posexplode fans out (rows × ~n/stride, the inherent
    output size), slice/array_join cut each window; no shuffle at all,
    the whole op fuses with the parquet scan and pushes column pruning
    (only doc_id, text read)."""
    toked = table(spark, sf_dir, "documents").select(
        "doc_id", _tokens().alias("toks")
    )
    # fx.nsize: n feeds the output-bound least(CHUNK, n - start) — legacy
    # size(NULL) = -1 makes a null document's single chunk claim
    # n_tokens = -1 where both ANSI Spark and the oracle agree on
    # least(CHUNK) = CHUNK (greatest/least skip NULLs identically in
    # both engines; r6 edge finding)
    n = fx.nsize(F.col("toks"))
    last = (
        F.ceil(F.greatest(n - _CHUNK, F.lit(0)) / F.lit(float(_STRIDE)))
        * _STRIDE
    ).cast("int")
    chunked = toked.select(
        "doc_id", "toks",
        F.posexplode(F.sequence(F.lit(0), last, F.lit(_STRIDE)))
        .alias("chunk_id", "start"),
    )
    return chunked.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.array_join(F.slice("toks", F.col("start") + 1, F.lit(_CHUNK)), " ")
        .alias("chunk_text"),
        F.least(F.lit(_CHUNK), fx.nsize(F.col("toks")) - F.col("start"))
        .cast("long").alias("n_tokens"),
    )


def _f28_oracle(k: int = 8) -> str:
    """DuckDB twin of f28_doc_clustering: same portable seed centroids,
    same sequential-d² assignment and tie order as _f21_oracle; the
    per-cluster profile is plain SQL aggregation. avg_norm carries the
    one accepted seam of the averaging class — engine summation order
    inside AVG — absorbed by the shared 6-dp floor rounding."""
    h = _seed_hash_sql("vec_id")
    return f"""
    WITH base AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
        FROM embeddings WHERE {_VEC_OK}
    ), seeds AS (
        SELECT se, rn - 1 AS cell FROM (
            SELECT e AS se,
                   ROW_NUMBER() OVER (ORDER BY {h}, vec_id) AS rn
            FROM base) WHERE rn <= {k}
    ), assigned AS (
        SELECT vec_id, label, e, cell FROM (
            SELECT b.vec_id, b.label, b.e, s.cell, ROW_NUMBER() OVER (
                PARTITION BY b.vec_id ORDER BY
                    list_dot_product(s.se, s.se)
                        - 2 * list_dot_product(b.e, s.se),
                    s.cell) AS arn
            FROM base b CROSS JOIN seeds s) WHERE arn = 1
    )
    SELECT CAST(cell AS BIGINT) AS cluster_id,
           COUNT(*) AS n_vecs,
           COUNT(DISTINCT label) AS n_labels,
           FLOOR(AVG(sqrt(list_dot_product(e, e))) * 1000000.0 + 0.5)
               / 1000000.0 AS avg_norm
    FROM assigned GROUP BY 1
    """


@query("f28_doc_clustering", oracle=_f28_oracle())
def f28_doc_clustering(spark, sf_dir, quantizer="seed"):
    """F28: corpus topic clustering — vector quantization over the
    embedding column (the domain-mixture / data-curation view: cluster
    sizes and purity drive up/down-sampling decisions in training-data
    pipelines). Reuses f21's machinery: the portable seed quantizer by
    default (fully oracle-hash-checked — see f21's docstring and the
    _SEED_M block comment for the r8 graduation), the seeded Lloyd fit
    via ``quantizer="kmeans"`` for data-adaptive cells (recall/invariant
    gated in tests).

    Scale posture: quantizer cost is constant in corpus size (k×dim
    driver state); assignment is one map-only Arrow pass; the
    per-cluster profile is a single map-side-combined groupBy on k
    keys. Output: one row per non-empty cluster with its size and
    label mix."""
    k = 8
    emb = _embeddings(spark, sf_dir)
    if quantizer == "seed":
        centers_np = _seed_centroids(emb, k=k)
    else:
        centers_np = _sampled_kmeans(emb, k=k)
    if centers_np is None:  # empty corpus: no clusters to profile
        return spark.createDataFrame(
            [], "cluster_id long, n_vecs long, n_labels long, "
                "avg_norm double")
    assign = _nearest_seed_udf(centers_np)
    return (
        emb.withColumn("cluster_id", assign("emb"))
        .groupBy(F.col("cluster_id").cast("long").alias("cluster_id"))
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.count_distinct("label").alias("n_labels"),
            fx.r6(F.avg("nrm")).alias("avg_norm"),
        )
    )


@query(
    "f29_unigram_logprob",
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents
    ), cnt AS (
        SELECT term, COUNT(*) AS c FROM tok GROUP BY 1
    ), tot AS (SELECT SUM(c) AS t FROM cnt)
    SELECT doc_id,
           FLOOR(AVG(-ln(c / (SELECT t FROM tot))) * 10000.0 + 0.5)
               / 10000.0 AS xent
    FROM tok JOIN cnt USING (term)
    GROUP BY doc_id
    """,
)
def f29_unigram_logprob(spark, sf_dir):
    """F29: unigram cross-entropy score — each document's mean negative
    log-probability under the corpus's own unigram distribution, the
    cheapest member of the perplexity-filter family (documents that
    score far from the corpus mean are outliers: boilerplate, noise,
    wrong-language). A real pipeline swaps the unigram model for a
    KenLM/BPE model scored in the same per-token join shape.

    Scale posture: the model IS a small aggregate (vocab counts — Zipf
    makes the distinct-term table tiny relative to the corpus), so the
    token→probability lookup broadcasts and the corpus never shuffles
    for it; the hot-term skew that would poison a shuffle join is
    irrelevant under a broadcast map-side hash lookup. The vocab total
    is a metadata-cheap scalar (same pattern as f13's sizing count)."""
    tok = (
        table(spark, sf_dir, "documents")
        .select("doc_id", F.explode(_tokens()).alias("term"))
    )
    # pin the vocab before the total collect: the vocab aggregate has two
    # consumers (the scalar total and the broadcast lookup), and an
    # unpinned frame would re-run the full corpus explode+shuffle for
    # each (SCALE.md §5 multi-consumer rule). Vocab-sized → cheap pin.
    cnt = pin(
        tok.groupBy("term").agg(F.count(F.lit(1)).alias("c")),
        "f29_vocab",
    )
    # SUM over an empty vocab is NULL; 1 keeps the log finite and the
    # query's answer on an empty corpus is (correctly) zero rows — the
    # empty-partition case a date-filtered 100 TB run hits routinely
    total = cnt.agg(F.sum("c")).collect()[0][0] or 1
    # no broadcast hint: Zipf bounds mass concentration, not distinct-
    # term cardinality — a raw crawl's vocab (URLs, ids, junk) grows
    # with the corpus. AQE broadcasts the checkpointed vocab while it
    # fits and falls back to a shuffle join when it doesn't (hot terms
    # stay safe: the downstream per-doc agg combines map-side).
    return (
        tok.join(cnt, "term")
        .groupBy("doc_id")
        .agg(
            fx.r4(F.avg(-F.log(F.col("c") / F.lit(float(total)))))
            .alias("xent")
        )
    )


_DECON_W = 5  # gram width for overlap decontamination


@query(
    "f30_ngram_decontaminate",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ), g AS (
        SELECT DISTINCT doc_id,
               md5(array_to_string(toks[i : i + {_DECON_W - 1}], ' ')) AS gh
        FROM (SELECT doc_id, toks,
                     unnest(range(1, len(toks) - {_DECON_W - 2})) AS i
              FROM t)
    ), e AS (
        SELECT DISTINCT gh FROM g WHERE doc_id % 89 = 0
    )
    SELECT g.doc_id,
           COUNT(*) AS n_grams,
           COUNT(*) FILTER (WHERE e.gh IS NOT NULL) AS n_hit,
           (COUNT(*) FILTER (WHERE e.gh IS NOT NULL)) * 10 >= COUNT(*)
               AS contaminated
    FROM g LEFT JOIN e ON g.gh = e.gh
    GROUP BY 1
    """,
)
def f30_ngram_decontaminate(spark, sf_dir):
    """F30: n-gram-overlap decontamination — the stronger form of f24's
    exact-hash check: a training document is contaminated when ≥10% of
    its distinct 5-gram shingles appear in the eval set (planted here as
    doc_id % 89), catching partial/quoted contamination whole-doc
    hashing misses (the GPT-3/PaLM-style overlap rule).

    Scale posture: grams materialize as md5 keys (16 bytes, not gram
    strings) map-side; the eval gram set is small (eval suites are MBs
    against a 100 TB corpus) so membership is a broadcast left join —
    the corpus gram stream never shuffles for it; the per-doc overlap
    count is one map-side-combinable aggregate. Gram explosion is the
    inherent output size (rows × ~n_tokens) and fuses with the scan."""
    # per-doc gram dedup is MAP-SIDE inside gram_hashes: all of a doc's
    # grams live in one row's array, so array_distinct before the
    # explode replaces what would otherwise be a corpus-sized
    # .distinct() shuffle of 16-byte keys with zero-coordination
    # per-row work. ONE gram constructor for f30/f35/build_bloom_filter
    # (r12 review): the exact set and the Bloom sketch must stay
    # bit-identical, so they share the expression.
    grams = gram_hashes(table(spark, sf_dir, "documents"))
    eval_grams = (
        grams.filter(F.col("doc_id") % 89 == 0).select("gh").distinct()
        .withColumn("hit", F.lit(True))
    )
    # no broadcast hint: a REAL eval suite is fixed-size (MBs) and AQE
    # broadcasts it from runtime stats; the planted doc_id%89 stand-in
    # grows with the corpus, and forcing broadcast on a corpus-derived
    # set is exactly the unbounded-broadcast trap. AQE picks
    # broadcast-when-small, shuffle-when-not — both correct.
    return (
        grams.join(eval_grams, "gh", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.when(F.col("hit"), 1).otherwise(0)).alias("n_hit"),
        )
        .select(
            "doc_id", "n_grams", "n_hit",
            (F.col("n_hit") * 10 >= F.col("n_grams")).alias("contaminated"),
        )
    )


@query(
    "f31_training_order",
    oracle="""
    SELECT doc_id, source,
           row_number() OVER (
               ORDER BY md5('seed42:' || CAST(doc_id AS VARCHAR))
           ) AS ord
    FROM documents
    """,
)
def f31_training_order(spark, sf_dir):
    """F31: deterministic global training-data shuffle — every document
    gets a stable pseudo-random position (rank by keyed md5 of its id),
    the order a training run consumes shards in. Seeded hash order, not
    ``rand()``: reproducible across engines, retries, and reshardings.

    Scale posture: a naive ``row_number() OVER (ORDER BY hash)`` plans a
    SINGLE-partition window — the whole corpus through one task. The
    distributed form splits on the hash's leading 12 bits (4096
    buckets; md5 is uniform so buckets are balanced by construction):
    global order ≡ (bucket, hash-within-bucket), so the global rank is
    the bucket's cumulative offset (a 4096-row metadata aggregate,
    broadcast back) plus the within-bucket row_number (a partitioned
    window — parallel). Same two-phase zipWithIndex pattern
    ``io.surrogate_ids`` uses for key assignment."""
    docs = table(spark, sf_dir, "documents")
    hkey = F.md5(F.concat(F.lit("seed42:"), F.col("doc_id").cast("string")))
    keyed = docs.select(
        "doc_id", "source", hkey.alias("hk"),
        F.substring(hkey, 1, 3).alias("bk"),  # 4096-way MSB split: per-
        # bucket sort stays ~corpus/4096 (a 2-char/256-way split caps
        # parallelism at 256 tasks — ~400GB sorts at 100TB); the offsets
        # frame is still metadata-sized (4096 rows)
    )
    # 4096-row frame: the single-partition window here is metadata-sized
    offsets = (
        keyed.groupBy("bk").agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bk",
            (F.sum("n").over(W.orderBy("bk")) - F.col("n")).alias("off"),
        )
    )
    w_in_bucket = W.partitionBy("bk").orderBy("hk")
    return (
        keyed.join(F.broadcast(offsets), "bk")
        .select(
            "doc_id", "source",
            (F.row_number().over(w_in_bucket) + F.col("off"))
            .cast("long").alias("ord"),
        )
    )


@query(
    "f32_keep_best_dedup",
    # packed arg-min: (max n_chars, then min doc_id) per content group,
    # decoded from one BIGINT — identical int64 arithmetic both engines
    oracle="""
    WITH keyed AS (
        SELECT doc_id, n_chars, md5(lower(trim(text))) AS fp,
               (100000 - LEAST(n_chars, 100000)) * 10000000000 + doc_id
                   AS pack
        FROM documents
    )
    SELECT fp, COUNT(*) AS n_dups,
           MIN(pack) % 10000000000 AS keep_doc_id
    FROM keyed GROUP BY fp
    """,
)
def f32_keep_best_dedup(spark, sf_dir):
    """F32: canonical-selection dedup — per exact-content group (f1's
    normalized hash), keep the BEST representative (longest doc, ties to
    the smallest doc_id) instead of an arbitrary first. The selection
    rule real pipelines need when duplicates differ in truncation or
    metadata quality.

    Scale posture: the two-level preference (max length, then min id)
    packs into one BIGINT ((1e5 - n_chars)·1e10 + doc_id), so the winner
    is a plain ``min`` — map-side-combinable partial aggregate, no
    per-group sort, no window, one shuffle on the content hash (same
    discipline as f26's min(struct); the packed form also survives
    engines without struct-ordered aggregates)."""
    docs = table(spark, sf_dir, "documents")
    # clamp keeps the pack in int64 for arbitrarily long docs (≥100k
    # chars tie at the cap and fall to the doc_id tie-break); doc_id is
    # assumed < 1e10 — a corpus beyond that widens the pack to two
    # min(struct) fields instead
    pack = (
        (F.lit(100000) - F.least(F.col("n_chars"), F.lit(100000)))
        * F.lit(10000000000)
        + F.col("doc_id")
    )
    return (
        docs.select(
            F.md5(F.lower(F.trim(F.col("text")))).alias("fp"),
            pack.alias("pack"),
        )
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            (F.min("pack") % 10000000000).alias("keep_doc_id"),
        )
    )


@query(
    "f33_data_quality",
    oracle="""
    SELECT 'null_text' AS expectation,
           CAST(COUNT(*) FILTER (WHERE text IS NULL) AS BIGINT)
               AS violations
    FROM documents
    UNION ALL
    SELECT 'bad_lang',
           COUNT(*) FILTER (WHERE lang NOT IN ('en','de','fr','es','pt'))
    FROM documents
    UNION ALL
    SELECT 'nchars_mismatch',
           COUNT(*) FILTER (WHERE n_chars != len(text))
    FROM documents
    UNION ALL
    SELECT 'dup_doc_id',
           CAST(COUNT(*) - COUNT(DISTINCT doc_id) AS BIGINT)
    FROM documents
    """,
)
def f33_data_quality(spark, sf_dir):
    """F33: data-quality expectations — the Great-Expectations-style
    contract check a training pipeline gates ingests on (null columns,
    enum violations, derived-field consistency, key uniqueness), all
    evaluated in ONE aggregate pass (conditional counts fold into a
    single map-side-combined aggregation; the distinct-count term rides
    the same shuffle). Unpivoted to (expectation, violations) rows so a
    gate reads it as assert-all-zeros."""
    d = table(spark, sf_dir, "documents")
    agg = d.agg(
        F.count(F.when(F.col("text").isNull(), 1)).alias("null_text"),
        F.count(
            F.when(~F.col("lang").isin("en", "de", "fr", "es", "pt"), 1)
        ).alias("bad_lang"),
        F.count(
            F.when(F.col("n_chars") != F.length("text"), 1)
        ).alias("nchars_mismatch"),
        (F.count(F.lit(1)) - F.count_distinct("doc_id")).alias("dup_doc_id"),
    )
    return agg.unpivot(
        [], ["null_text", "bad_lang", "nchars_mismatch", "dup_doc_id"],
        "expectation", "violations",
    )


# ------------------------------------------- F34: count-min heavy hitters
# Sketch geometry: d=4 seeded rows x w=4096 buckets (3 md5 hex chars).
# Error bound e/w ~ 0.066% of the token stream per estimate at
# delta = e^-4 ~ 1.8%; the grid is <= 16384 integer counters no matter
# how many trillions of tokens flow through it.
_CM_D = 4
_CM_W = 4096


def _cm_token_stream(spark, sf_dir):
    """The documents token stream the CM sketch summarizes."""
    return (
        table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(F.explode(_tokens()).alias("token"))
        .filter(F.length("token") > 0)
    )


def _cm_bucketed(toks):
    """(token, ...) -> (token, ..., i, bucket): ONE md5 per token row,
    row i's bucket = hex chars [3i+1, 3i+3] -> 12 bits (r12, verdict
    ask 5: ¼ the hash work of the former per-row md5("i:token"); md5
    bits are independent, so disjoint nibble ranges of one digest act
    as the d seeded hashes)."""
    hashed = toks.withColumn("_h", F.md5(F.col("token")))
    seeded = hashed.select(
        "*",
        F.explode(F.array(*[F.lit(i) for i in range(_CM_D)])).alias("i"),
    )
    return seeded.withColumn(
        "bucket",
        F.conv(F.expr("substring(_h, i * 3 + 1, 3)"), 16, 10).cast("int"),
    ).drop("_h")


def _cm_grid_of(toks):
    """The count-min GRID: per-(row, bucket) occurrence counts —
    <= _CM_D × _CM_W integer counters at any stream size, the whole
    sketch as one map-side-combinable aggregate."""
    return (_cm_bucketed(toks)
            .groupBy("i", "bucket")
            .agg(F.count(F.lit(1)).alias("c")))


def cm_estimate_against(cand_bucketed, grid, complete: bool = False):
    """(token, i, bucket) candidates × grid -> (token, cm_count): the
    INTEGER MIN over the d rows' cells. ``complete=True`` treats a
    NEVER-HIT cell as the true count 0 (left join + coalesce) — needed
    when the queried tokens may not come from the summarized stream;
    f34's candidates ARE the stream vocabulary, so every cell is >= 1
    and the inner join is exact there."""
    joined = cand_bucketed.join(F.broadcast(grid), ["i", "bucket"],
                                "left" if complete else "inner")
    c = F.coalesce(F.col("c"), F.lit(0)) if complete else F.col("c")
    return (joined.groupBy("token")
            .agg(F.min(c).alias("cm_count")))


def _recover_sketch_swap(target: str) -> None:
    """Heal a swap stranded by a crash between _write_sketch_parquet's
    two renames (r12 ADVICE, medium): in that window ``target`` is
    missing while either ``target.tmp`` (complete new cells — its
    ``_manifest.json`` is written strictly AFTER the parquet files, so
    its presence proves completeness) or ``target.old`` (the pre-swap
    cells) still exists. Roll FORWARD to a complete tmp — for a
    streaming grid the tmp carries the batch's ``last_batch_id``, so
    the replayed epoch is then the designed no-op; otherwise roll BACK
    to ``.old`` and let the replay re-merge. Either way the cells and
    the replay guard move together, preserving exactly-once. Called
    ONLY by writer entry points (_write_sketch_parquet /
    _load_inner_manifest) — each sketch path has a single maintainer,
    and a READER that renamed directories here would race a LIVE
    writer mid-swap (r13 review); readers go through
    :func:`_read_sketch_parquet`, which retries the brief window and
    raises on a genuinely stranded swap instead of mutating."""
    import os as _os
    import shutil as _shutil

    tmp, old = target + ".tmp", target + ".old"
    if _os.path.exists(target):
        return
    if _os.path.exists(_os.path.join(tmp, "_manifest.json")):
        _os.rename(tmp, target)
        _shutil.rmtree(old, ignore_errors=True)
    elif _os.path.exists(old):
        _os.rename(old, target)
        _shutil.rmtree(tmp, ignore_errors=True)


def _read_sketch_parquet(spark, target: str):
    """Reader-side counterpart of :func:`_write_sketch_parquet` (r13
    review): readers NEVER mutate the store — healing a stranded swap
    is the single maintainer's job, and a reader that renamed
    directories would race a live writer between its two renames (the
    reader's rename(tmp→target) makes the writer's own rename throw
    and can tear a healthy streaming query down). A reader that lands
    in the brief missing-path window retries; a genuinely stranded
    swap (crashed writer: .tmp/.old present, target still missing)
    raises with the recovery named.

    r13 ADVICE: the retry covers the READ itself, not just the
    exists() probe — a writer swapping between our probe and
    ``spark.read.parquet`` surfaces a missing-path AnalysisException,
    which is the exact window this helper absorbs, so that exception
    is retryable too. The budget backs off to ~1 s total (0.2/0.3/
    0.4 s BETWEEN the four attempts — no sleep after the last try,
    r14 self-review) so a slow filesystem mid-swap isn't misdiagnosed
    as a stranded writer, and after composing the stranded-swap error
    we re-check ``target`` one final time (the writer may have
    completed while we were deciding)."""
    import os as _os
    import time as _time

    last_exc = None
    for attempt in range(4):
        if attempt:  # back off BETWEEN attempts; no dead tail sleep
            _time.sleep(0.1 * (attempt + 1))
        if _os.path.exists(target):
            try:
                return spark.read.parquet(target)
            except Exception as exc:  # missing-path race mid-swap
                if "PATH_NOT_FOUND" not in str(exc) and \
                        "Path does not exist" not in str(exc):
                    raise
                last_exc = exc
    tmp, old = target + ".tmp", target + ".old"
    if (_os.path.exists(_os.path.join(tmp, "_manifest.json"))
            or _os.path.exists(old)):
        if _os.path.exists(target):  # writer finished while we decided
            return spark.read.parquet(target)
        raise ValueError(
            f"sketch at {target} has a stranded swap (crashed writer: "
            f".tmp/.old present, target missing). Re-run its "
            f"maintainer (build_*/stream_* heal the swap on entry); "
            f"readers never mutate the store.") from last_exc
    return spark.read.parquet(target)  # normal missing-path error


def _write_sketch_parquet(df, target: str, inner_manifest=None) -> None:
    """Write a (sketch-sized) frame as single-file parquet at
    ``target`` with tmp+rename-swap semantics (the _compact_one
    posture): no reader ever observes PARTIAL contents — Spark's own
    overwrite deletes the old tree BEFORE the new files land, which is
    exactly the window a rebuild-while-serving deployment hits (r12
    review). Honesty note (r12 ADVICE): the two renames are not one —
    a concurrent reader can see ``target`` briefly MISSING between
    them (:func:`_read_sketch_parquet` retries that window); a crash
    inside it strands the swap, which the next WRITER call heals via
    :func:`_recover_sketch_swap` — readers raise rather than heal, so
    they can never race a live writer's rename (r13 review).
    ``inner_manifest`` (a dict) is staged
    as ``_manifest.json`` INSIDE the directory (parquet readers skip
    underscore files) after the cells and before the swap, so manifest
    and cells publish in the same rename — the streaming replay
    guard's atomicity contract."""
    import json as _json
    import os as _os
    import shutil as _shutil

    from ..crashpoints import crash_point

    _recover_sketch_swap(target)
    tmp, old = target + ".tmp", target + ".old"
    _shutil.rmtree(tmp, ignore_errors=True)
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    if inner_manifest is not None:
        with open(_os.path.join(tmp, "_manifest.json"), "w") as fh:
            _json.dump(inner_manifest, fh)
    _shutil.rmtree(old, ignore_errors=True)
    if _os.path.exists(target):
        _os.rename(target, old)
    crash_point("sketch_swap_between_renames")  # r14 ask 2: kill -9 seam
    _os.rename(tmp, target)
    _shutil.rmtree(old, ignore_errors=True)


def build_cm_grid(spark, sf_dir: str, path: str) -> dict:
    """Productized count-min deployment, step 1 (r11 verdict ask 3):
    summarize the documents token stream into a PERSISTED grid at
    ``path`` — f34's exact geometry (d=4 × w=4096, one-md5 split) —
    so a later session estimates any queried token without touching
    the corpus again. This is the API f34's docstring promises: "a
    100 TB deployment estimates only QUERIED tokens against the same
    stored grid". One pass over the stream builds the grid; the stream
    total falls out of the grid itself (every occurrence lands in
    exactly one row-0 cell), so no second scan. Returns the manifest
    {d, w, total, source}, also written atomically next to the data
    (the io.py temp+rename posture)."""
    import json as _json
    import os as _os

    toks = _cm_token_stream(spark, sf_dir)
    grid = _cm_grid_of(toks)
    _os.makedirs(path, exist_ok=True)
    # inner manifest ships WITH the cells (r12 ADVICE): a later
    # stream_cm_grid onto this path sees geometry + last_batch_id=-1
    # and FOLDS the stored counts in instead of silently replacing them
    _write_sketch_parquet(
        grid, _os.path.join(path, "grid.parquet"),
        inner_manifest={"d": _CM_D, "w": _CM_W, "last_batch_id": -1,
                        "stream_id": None})
    stored = spark.read.parquet(_os.path.join(path, "grid.parquet"))
    total = (stored.filter(F.col("i") == 0)
             .agg(F.sum("c")).collect()[0][0]) or 0
    manifest = {"d": _CM_D, "w": _CM_W, "total": int(total),
                "source": sf_dir}
    tmp = _os.path.join(path, ".manifest.json.tmp")
    with open(tmp, "w") as fh:
        _json.dump(manifest, fh)
    _os.replace(tmp, _os.path.join(path, "manifest.json"))
    return manifest


def cm_estimate(spark, path: str, tokens):
    """Productized count-min deployment, step 2: estimate the stream
    frequency of ``tokens`` (a list of strings, or any DataFrame with
    a ``token`` column) against the grid stored by
    :func:`build_cm_grid` — (token, cm_count), never under the true
    count (CM's one-sided guarantee; a token absent from the
    summarized stream estimates its true 0 unless it collides on all
    d rows). Refuses loudly if the stored geometry differs from the
    engine's — estimating at the wrong width would silently return
    garbage, the catalog's stale-layout posture."""
    import json as _json
    import os as _os

    with open(_os.path.join(path, "manifest.json")) as fh:
        manifest = _json.load(fh)
    if manifest.get("d") != _CM_D or manifest.get("w") != _CM_W:
        raise ValueError(
            f"stored CM grid at {path} was built at geometry "
            f"d={manifest.get('d')} w={manifest.get('w')}, but this "
            f"engine estimates at d={_CM_D} w={_CM_W}; rebuild the "
            f"grid (build_cm_grid) or use the matching engine version."
        )
    if not hasattr(tokens, "columns"):
        tokens = spark.createDataFrame(
            [(t,) for t in tokens], "token string")
    grid = _read_sketch_parquet(spark, _os.path.join(path,
                                                     "grid.parquet"))
    return cm_estimate_against(
        _cm_bucketed(tokens.select("token").distinct()), grid,
        complete=True)


def _load_inner_manifest(target: str, kind: str, geometry: dict):
    """Shared replay-guard preamble for the streaming sketch writers:
    heal a stranded swap, then load + validate the inner manifest that
    travels with the cells. Returns the manifest dict, or None when no
    sketch exists yet. Raises on geometry drift and — r12 ADVICE — on
    a stored sketch that predates the inner manifest (streaming onto
    it would silently discard the stored state)."""
    import json as _json
    import os as _os

    _recover_sketch_swap(target)
    inner = _os.path.join(target, "_manifest.json")
    if _os.path.exists(inner):
        with open(inner) as fh:
            manifest = _json.load(fh)
        drift = {k: (manifest.get(k), v) for k, v in geometry.items()
                 if manifest.get(k) != v}
        if drift:
            raise ValueError(
                f"streaming {kind} at {target} has geometry "
                + ", ".join(f"{k}={got} != engine {k}={want}"
                            for k, (got, want) in drift.items()))
        return manifest
    if _os.path.exists(target):
        raise ValueError(
            f"{kind} at {target} exists without an inner _manifest.json "
            f"(pre-r13 build, or foreign data): streaming onto it would "
            f"silently replace the stored state with the first batch. "
            f"Rebuild it with this engine (the builders now write the "
            f"inner manifest) or move it aside.")
    return None


def _check_stream_identity(manifest, stream_id, batch_id: int,
                           target: str) -> bool:
    """Replay-guard decision shared by the streaming sketch writers
    (r12 ADVICE: batch_id alone is ambiguous ACROSS checkpoints — a
    fresh/deleted checkpoint restarts foreachBatch ids at 0, and
    treating those as replays silently drops genuinely new data).
    Since r13 the DECISION itself lives in one place —
    ``catalog.check_stream_identity`` — shared with the layout's
    streaming ingest, so the exactly-once rule cannot drift between
    stores; this wrapper supplies the sketch wording (last_batch_id=-1
    marks a batch-built sketch any stream may adopt)."""
    from ..catalog import check_stream_identity

    return check_stream_identity(
        manifest.get("stream_id"),
        int(manifest.get("last_batch_id", -1)),
        stream_id, batch_id, f"sketch at {target}",
        "build the new stream into its own path and merge the "
        "sketches (they are linear).")


def cm_update_writer(path: str, stream_id=None):
    """Per-batch maintainer for a STREAMING count-min grid (r12,
    self-initiated — the sketch-product line meets D-group streaming):
    each micro-batch of documents folds into the stored grid by
    linearity (cell-wise sum, the merge_cm_grids property), so the grid
    at ``path`` is always the exact grid of every document streamed so
    far.

    Exactly-once under replay: ``foreachBatch`` re-runs a batch when a
    crash lands between sink write and checkpoint commit, and a grid
    MERGE is not idempotent — so the authoritative manifest (geometry +
    ``last_batch_id`` + ``stream_id``) travels INSIDE the grid
    directory (parquet readers ignore underscore-prefixed files) and
    publishes in the SAME rename as the cells in _write_sketch_parquet.
    A replayed batch_id <= last_batch_id from the SAME ``stream_id`` is
    a no-op; a crash stranded between the swap's two renames is healed
    by _recover_sketch_swap on the next call (roll-forward keeps the
    guard and cells together, r12 ADVICE); a DIFFERENT stream_id
    presenting a non-monotonic batch_id REFUSES instead of silently
    dropping data (fresh-checkpoint hazard, r12 ADVICE); and a grid
    batch-built by :func:`build_cm_grid` is adopted by FOLDING its
    cells in, never replaced (its inner manifest carries
    last_batch_id=-1). ``path/manifest.json`` is mirrored after the
    swap for :func:`cm_estimate` (geometry-only reader); ``total`` is
    never accounted separately — it falls out of the stored row-0
    cells, so it cannot drift from the data. Module-level factory so
    crash tests wrap the exact production writer (the
    epoch_overwrite_writer posture, streaming.py)."""
    import json as _json
    import os as _os

    grid_path = _os.path.join(path, "grid.parquet")

    def _update(batch_df, batch_id: int) -> None:
        spark = batch_df.sparkSession
        manifest = _load_inner_manifest(
            grid_path, "CM grid", {"d": _CM_D, "w": _CM_W})
        if manifest is not None and _check_stream_identity(
                manifest, stream_id, batch_id, grid_path):
            return  # replayed epoch: already folded into the cells
        toks = (batch_df.filter(F.col("text").isNotNull())
                .select(F.explode(_tokens()).alias("token"))
                .filter(F.length("token") > 0))
        merged = _cm_grid_of(toks)
        if manifest is not None:
            merged = (spark.read.parquet(grid_path)
                      .unionByName(merged)
                      .groupBy("i", "bucket").agg(F.sum("c").alias("c")))
        _write_sketch_parquet(
            merged, grid_path,
            inner_manifest={"d": _CM_D, "w": _CM_W,
                            "last_batch_id": int(batch_id),
                            "stream_id": stream_id})
        # best-effort mirror for cm_estimate; total from the cells
        total = (spark.read.parquet(grid_path)
                 .filter(F.col("i") == 0)
                 .agg(F.sum("c")).collect()[0][0]) or 0
        mirror_tmp = _os.path.join(path, ".manifest.json.tmp")
        with open(mirror_tmp, "w") as fh:
            _json.dump({"d": _CM_D, "w": _CM_W, "total": int(total),
                        "source": "stream",
                        "last_batch_id": int(batch_id)}, fh)
        _os.replace(mirror_tmp, _os.path.join(path, "manifest.json"))

    return _update


def stream_cm_grid(docs_stream, path: str, checkpoint: str) -> None:
    """Drain a streaming documents frame (``text`` column) into the
    stored grid at ``path``: foreachBatch + checkpoint (source offset
    tracking) + :func:`cm_update_writer` (replay-guarded atomic merge)
    = exactly-once grid maintenance. availableNow trigger — call again
    as new files land, or swap the trigger for a continuous cadence.
    The checkpoint's absolute path doubles as the grid's stream
    identity (r12 ADVICE): batch ids are only monotonic WITHIN one
    checkpoint, so the replay guard is keyed on both — a run against a
    fresh/relocated checkpoint refuses loudly instead of silently
    dropping batches 0..last as replays."""
    import os as _os

    _os.makedirs(path, exist_ok=True)
    writer = cm_update_writer(path, stream_id=_os.path.abspath(checkpoint))
    q = (docs_stream.writeStream.foreachBatch(writer)
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()


def merge_cm_grids(spark, paths, out_path: str) -> dict:
    """Productized count-min deployment, step 1b (r12): MERGE
    shard-built grids into one. The grid is a linear sketch — each
    cell is a plain count, so the grid of a union of streams is the
    cell-wise SUM of the shards' grids, exactly (no approximation is
    introduced by sharding; pinned cell-for-cell against the
    whole-corpus build in test_llm_ops.py). This is how a 100 TB
    deployment builds the structure: every ingest shard summarizes its
    own slice with :func:`build_cm_grid`, the ≤ d×w-row grids merge
    here (driver-light — the inputs are already sketch-sized), and
    :func:`cm_estimate` probes the merged result. Refuses geometry
    drift across shards, the cm_estimate posture."""
    import json as _json
    import os as _os
    from functools import reduce

    totals = 0
    sources = []
    for p in paths:
        with open(_os.path.join(p, "manifest.json")) as fh:
            m = _json.load(fh)
        if m.get("d") != _CM_D or m.get("w") != _CM_W:
            raise ValueError(
                f"CM grid at {p} has geometry d={m.get('d')} "
                f"w={m.get('w')} != engine d={_CM_D} w={_CM_W}; "
                f"grids merge only at one geometry."
            )
        totals += int(m["total"])
        sources.append(m.get("source"))
    merged = reduce(
        lambda a, b: a.unionByName(b),
        [_read_sketch_parquet(spark, _os.path.join(p, "grid.parquet"))
         for p in paths],
    ).groupBy("i", "bucket").agg(F.sum("c").alias("c"))
    _os.makedirs(out_path, exist_ok=True)
    _write_sketch_parquet(
        merged, _os.path.join(out_path, "grid.parquet"),
        inner_manifest={"d": _CM_D, "w": _CM_W, "last_batch_id": -1,
                        "stream_id": None})
    manifest = {"d": _CM_D, "w": _CM_W, "total": totals,
                "source": sources}
    tmp = _os.path.join(out_path, ".manifest.json.tmp")
    with open(tmp, "w") as fh:
        _json.dump(manifest, fh)
    _os.replace(tmp, _os.path.join(out_path, "manifest.json"))
    return manifest


_F34_SQL = f"""
    WITH toks AS (
        SELECT t.token FROM (
            SELECT unnest(string_split(text, ' ')) AS token
            FROM documents WHERE text IS NOT NULL
        ) t WHERE length(t.token) > 0
    ), bucketed AS (
        SELECT token, i,
               (POSITION(substr(h, i * 3 + 1, 1) IN '0123456789abcdef') - 1)
                   * 256
             + (POSITION(substr(h, i * 3 + 2, 1) IN '0123456789abcdef') - 1)
                   * 16
             + (POSITION(substr(h, i * 3 + 3, 1) IN '0123456789abcdef') - 1)
                   AS bucket
        FROM (
            SELECT token, i, h
            FROM (SELECT token, md5(token) AS h FROM toks),
                 (SELECT unnest([0, 1, 2, 3]) AS i)
        )
    ), grid AS (
        SELECT i, bucket, COUNT(*) AS c FROM bucketed GROUP BY 1, 2
    ), est AS (
        SELECT b.token, MIN(g.c) AS cm_count
        FROM (SELECT DISTINCT token, i, bucket FROM bucketed) b
        JOIN grid g ON b.i = g.i AND b.bucket = g.bucket
        GROUP BY 1
    )
    SELECT token, cm_count FROM est
    WHERE cm_count * 200 > (SELECT COUNT(*) FROM toks)
"""


@query("f34_heavy_hitters", oracle=_F34_SQL)
def f34_heavy_hitters(spark, sf_dir):
    """F34 (r11, self-initiated): heavy-hitter tokens via a PORTABLE
    count-min sketch — the c38_portable_hll playbook applied to the
    frequency-sketch class. Every step is computed bit-identically by
    both engines: ONE md5(token) per occurrence, split into d=4
    disjoint 3-hex-char fields — field i is row i's bucket (4096
    buckets, the POSITION string-ops trick from the portable HLL;
    md5's bits are independent, so disjoint nibble ranges of one
    digest serve as the d seeded hashes at ¼ the hash work — the r11
    verdict's ask 5, was md5("i:token") × 4). The grid is per-(row,
    bucket) COUNT(*), the estimate is the INTEGER MIN over the 4 rows,
    and a token is reported when cm_count exceeds 0.5% of the stream
    (the comparison stays in integers: cm_count * 200 > total — no
    float anywhere, so the twin is exact, not tolerance-gated).

    Scale posture — why a sketch and not a groupBy(token): the GRID is
    the aggregate. Per-(row,bucket) counts partial-aggregate map-side
    into <= 16 384 counters per partition regardless of corpus size,
    so the shuffle moves constant-size state where an exact
    top-frequency query shuffles the full vocabulary; the estimate
    join broadcasts the tiny grid. Candidate enumeration here scans
    the corpus vocabulary (right for a self-contained key — and the
    distinct is vocabulary-sized, not stream-sized); a 100 TB
    deployment estimates only QUERIED tokens against the same stored
    grid, which is the point of the structure — and is now product
    surface: :func:`build_cm_grid` persists the grid once,
    :func:`cm_estimate` probes it later (r12, verdict ask 3; pinned
    estimate-for-estimate against this key in test_llm_ops.py). CM never
    under-estimates, so no truly-heavy token can be missed; the
    one-sided error is pinned in tests/test_llm_ops.py.

    Reference anchor: the frequency/monitoring class of the
    reference's analytical corpus (SURVEY §2 group F); sketch is
    public Cormode-Muthukrishnan count-min."""
    toks = _cm_token_stream(spark, sf_dir)
    grid = _cm_grid_of(toks)
    # candidates: the VOCABULARY (distinct before the d-way explode —
    # 4× less state into the distinct than distinct(token,i,bucket);
    # bucket is a pure function of (token, i) so nothing is lost)
    cand = _cm_bucketed(toks.distinct())
    est = cm_estimate_against(cand, grid)
    total = toks.agg(F.count(F.lit(1)).alias("_total"))
    return (
        est.join(F.broadcast(total))
        .filter(F.col("cm_count") * 200 > F.col("_total"))
        .select("token", "cm_count")
    )


# ------------------------------------- F35: Bloom-filter decontamination
# Completes the portable-sketch taxonomy (r11): HLL = cardinality
# (c38_portable_hll), histogram = quantile (c11_portable_quantile),
# count-min = frequency (f34), BLOOM = membership. k=3 seeded
# positions per gram over m=2^16 bits: the whole filter is <= 3x|eval
# grams| DISTINCT 16-bit integers — ~8 KB as a bitmap — against a
# corpus-sized gram stream.
_BLOOM_K = 3
_BLOOM_M = 1 << 16  # bit-space: 4 hex chars per position


def _bloom_positions(grams):
    """(…, gh) -> (…, gh, j, pos): the k seeded bit positions of each
    gram hash. gh IS ALREADY an md5 hex digest, so the positions are
    its disjoint 4-hex-char nibble ranges — ZERO additional hashing
    (r12, verdict ask 5: was md5("j:gh") × k; md5 bits are independent
    across disjoint ranges)."""
    return grams.select(
        "*",
        F.explode(F.array(*[F.lit(j) for j in range(_BLOOM_K)])).alias("j"),
    ).withColumn(
        "pos",
        F.conv(F.expr("substring(gh, j * 4 + 1, 4)"), 16, 10).cast("int"))


def gram_hashes(docs, width: int = _DECON_W):
    """(doc_id, text) -> (doc_id, gh): per-doc DISTINCT rolling
    ``width``-gram md5s — f30/f35's gram construction as reusable
    surface (dedup happens map-side inside the array before the
    explode)."""
    toked = docs.select("doc_id", _tokens().alias("toks"))
    return toked.filter(F.size("toks") >= width).select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size("toks") - (width - 1)),
                    lambda i: F.md5(F.array_join(
                        F.slice("toks", i, width), " ")),
                )
            )
        ).alias("gh"),
    )


def build_bloom_filter(spark, grams, path: str) -> dict:
    """Productized Bloom deployment, step 1 (r12, self-initiated — the
    build_cm_grid playbook applied to the membership sketch f35
    demonstrates): compress an eval-gram set into the persisted
    DISTINCT-position set at ``path``. ``grams`` is any DataFrame with
    a ``gh`` md5-hex column (:func:`gram_hashes` builds one from
    (doc_id, text) docs). The stored filter is <= 2^16 positions
    (~8 KB as a bitmap, a few hundred KB as parquet ints at worst) at
    ANY eval-set size — the structure a 1000-executor decontamination
    broadcasts to every task. Returns + persists the manifest
    {k, m, n_positions}."""
    import json as _json
    import os as _os

    bits = _bloom_positions(grams.select("gh")).select("pos").distinct()
    _os.makedirs(path, exist_ok=True)
    # inner manifest ships with the bits (the build_cm_grid posture):
    # a later stream_bloom_filter onto this path ORs into the stored
    # positions instead of silently replacing them
    _write_sketch_parquet(
        bits, _os.path.join(path, "bits.parquet"),
        inner_manifest={"k": _BLOOM_K, "m": _BLOOM_M,
                        "last_batch_id": -1, "stream_id": None})
    n = spark.read.parquet(_os.path.join(path, "bits.parquet")).count()
    manifest = {"k": _BLOOM_K, "m": _BLOOM_M, "n_positions": int(n)}
    tmp = _os.path.join(path, ".manifest.json.tmp")
    with open(tmp, "w") as fh:
        _json.dump(manifest, fh)
    _os.replace(tmp, _os.path.join(path, "manifest.json"))
    return manifest


def bloom_probe(spark, path: str, grams):
    """Productized Bloom deployment, step 2: tag every distinct row of
    ``grams`` (any DataFrame with a ``gh`` md5-hex column; duplicate
    rows collapse to one tagged row, and hits are counted over
    DISTINCT positions so duplicates can never flip the verdict) with
    ``bloom_hit`` — true iff ALL k positions are set in the filter
    stored by :func:`build_bloom_filter`. One-sided: a gram that WAS
    in the eval set always hits (membership cannot be missed); a miss
    is definitive. Refuses a filter stored under a different geometry,
    the cm_estimate posture."""
    import json as _json
    import os as _os

    with open(_os.path.join(path, "manifest.json")) as fh:
        manifest = _json.load(fh)
    if manifest.get("k") != _BLOOM_K or manifest.get("m") != _BLOOM_M:
        raise ValueError(
            f"stored Bloom filter at {path} was built at geometry "
            f"k={manifest.get('k')} m={manifest.get('m')}, but this "
            f"engine probes at k={_BLOOM_K} m={_BLOOM_M}; rebuild it "
            f"(build_bloom_filter) or use the matching engine version."
        )
    reserved = {"j", "pos", "_set", "_k_hit", "bloom_hit"}
    clash = reserved & set(grams.columns)
    if clash:
        raise ValueError(
            f"bloom_probe input carries reserved column(s) "
            f"{sorted(clash)} — the probe adds these internally; "
            f"rename them first.")
    bits = (_read_sketch_parquet(spark,
                                 _os.path.join(path, "bits.parquet"))
            .withColumn("_set", F.lit(True)))
    khit = (
        _bloom_positions(grams)
        .join(F.broadcast(bits), "pos", "left")
        .groupBy(*grams.columns)
        # DISTINCT j, not row count: duplicate input rows (per-
        # occurrence grams) multiply the group's rows, and a plain sum
        # would report k×dups ≠ k — a false MISS on a gram genuinely
        # in the filter, breaking the one-sided guarantee
        .agg(F.count_distinct(F.when(F.col("_set"), F.col("j")))
             .alias("_k_hit"))
    )
    return khit.select(
        *grams.columns,
        (F.col("_k_hit") == _BLOOM_K).alias("bloom_hit"))


def merge_bloom_filters(spark, paths, out_path: str) -> dict:
    """Productized Bloom deployment, step 1b (r13, verdict ask 4 —
    lifecycle symmetry with the CM grid): MERGE shard-built filters
    into one. A Bloom filter is OR-linear — the filter of a union of
    gram sets is the bitwise OR of the shards' bitmaps, i.e. the
    DISTINCT UNION of their position sets, exactly (no approximation
    is introduced by sharding; pinned position-for-position against
    the whole-corpus build in test_llm_ops.py). This is the 100 TB
    build: every ingest shard compresses its slice with
    :func:`build_bloom_filter`, the ≤ 2^16-row position sets merge
    here (driver-light — inputs are already sketch-sized), and
    :func:`bloom_probe` serves the merged result. Refuses geometry
    drift across shards, the merge_cm_grids posture."""
    import json as _json
    import os as _os
    from functools import reduce

    for p in paths:
        with open(_os.path.join(p, "manifest.json")) as fh:
            m = _json.load(fh)
        if m.get("k") != _BLOOM_K or m.get("m") != _BLOOM_M:
            raise ValueError(
                f"Bloom filter at {p} has geometry k={m.get('k')} "
                f"m={m.get('m')} != engine k={_BLOOM_K} m={_BLOOM_M}; "
                f"filters merge only at one geometry."
            )
    merged = reduce(
        lambda a, b: a.unionByName(b),
        [_read_sketch_parquet(spark, _os.path.join(p, "bits.parquet"))
         for p in paths],
    ).distinct()
    _os.makedirs(out_path, exist_ok=True)
    _write_sketch_parquet(
        merged, _os.path.join(out_path, "bits.parquet"),
        inner_manifest={"k": _BLOOM_K, "m": _BLOOM_M,
                        "last_batch_id": -1, "stream_id": None})
    n = spark.read.parquet(_os.path.join(out_path, "bits.parquet")).count()
    manifest = {"k": _BLOOM_K, "m": _BLOOM_M, "n_positions": int(n)}
    tmp = _os.path.join(out_path, ".manifest.json.tmp")
    with open(tmp, "w") as fh:
        _json.dump(manifest, fh)
    _os.replace(tmp, _os.path.join(out_path, "manifest.json"))
    return manifest


def bloom_update_writer(path: str, stream_id=None):
    """Per-batch maintainer for a STREAMING Bloom filter (r13, verdict
    ask 4): each micro-batch of documents (``doc_id``, ``text``) grams
    via :func:`gram_hashes` and ORs into the stored position set — the
    merge_bloom_filters property per batch — so the filter at ``path``
    always covers every document streamed so far. The exactly-once
    machinery is cm_update_writer's, shared verbatim: the inner
    manifest (geometry + last_batch_id + stream_id) publishes in the
    same rename as the bits; a same-stream replayed epoch no-ops; a
    different stream presenting a non-monotonic batch_id refuses; a
    batch-built filter is adopted by folding, never replaced; a
    stranded swap heals on entry. (Unlike the CM merge, an OR-merge IS
    idempotent — but the guard still matters: without it a replayed
    batch would pay the gram/shuffle cost again, and the stream_id
    check still protects against the fresh-checkpoint drop.)"""
    import json as _json
    import os as _os

    bits_path = _os.path.join(path, "bits.parquet")

    def _update(batch_df, batch_id: int) -> None:
        spark = batch_df.sparkSession
        manifest = _load_inner_manifest(
            bits_path, "Bloom filter", {"k": _BLOOM_K, "m": _BLOOM_M})
        if manifest is not None and _check_stream_identity(
                manifest, stream_id, batch_id, bits_path):
            return  # replayed epoch: already ORed into the bits
        merged = (_bloom_positions(gram_hashes(batch_df).select("gh"))
                  .select("pos").distinct())
        if manifest is not None:
            merged = (spark.read.parquet(bits_path)
                      .unionByName(merged).distinct())
        _write_sketch_parquet(
            merged, bits_path,
            inner_manifest={"k": _BLOOM_K, "m": _BLOOM_M,
                            "last_batch_id": int(batch_id),
                            "stream_id": stream_id})
        n = spark.read.parquet(bits_path).count()
        mirror_tmp = _os.path.join(path, ".manifest.json.tmp")
        with open(mirror_tmp, "w") as fh:
            _json.dump({"k": _BLOOM_K, "m": _BLOOM_M,
                        "n_positions": int(n), "source": "stream",
                        "last_batch_id": int(batch_id)}, fh)
        _os.replace(mirror_tmp, _os.path.join(path, "manifest.json"))

    return _update


def stream_bloom_filter(docs_stream, path: str, checkpoint: str) -> None:
    """Drain a streaming documents frame (``doc_id``, ``text``) into
    the stored Bloom filter at ``path``: foreachBatch + checkpoint +
    :func:`bloom_update_writer` = exactly-once filter maintenance,
    stream_cm_grid's shape on the membership sketch. The checkpoint's
    absolute path is the stream identity (batch ids are only monotonic
    within one checkpoint)."""
    import os as _os

    _os.makedirs(path, exist_ok=True)
    writer = bloom_update_writer(
        path, stream_id=_os.path.abspath(checkpoint))
    q = (docs_stream.writeStream.foreachBatch(writer)
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()


_F35_SQL = f"""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ), g AS (
        SELECT DISTINCT doc_id,
               md5(array_to_string(toks[i : i + {_DECON_W - 1}], ' ')) AS gh
        FROM (SELECT doc_id, toks,
                     unnest(range(1, len(toks) - {_DECON_W - 2})) AS i
              FROM t)
    ), gp AS (
        SELECT doc_id, gh,
               (POSITION(substr(gh, j * 4 + 1, 1) IN '0123456789abcdef') - 1)
                   * 4096
             + (POSITION(substr(gh, j * 4 + 2, 1) IN '0123456789abcdef') - 1)
                   * 256
             + (POSITION(substr(gh, j * 4 + 3, 1) IN '0123456789abcdef') - 1)
                   * 16
             + (POSITION(substr(gh, j * 4 + 4, 1) IN '0123456789abcdef') - 1)
                   AS pos
        FROM g, (SELECT unnest([0, 1, 2]) AS j)
    ), bits AS (
        SELECT DISTINCT pos FROM gp WHERE doc_id % 89 = 0
    ), khit AS (
        SELECT doc_id, gh,
               COUNT(*) FILTER (WHERE b.pos IS NOT NULL) AS k_hit
        FROM gp LEFT JOIN bits b ON gp.pos = b.pos
        GROUP BY 1, 2
    )
    SELECT doc_id,
           COUNT(*) AS n_grams,
           COUNT(*) FILTER (WHERE k_hit = {_BLOOM_K}) AS n_bloom_hit,
           (COUNT(*) FILTER (WHERE k_hit = {_BLOOM_K})) * 10 >= COUNT(*)
               AS contaminated
    FROM khit GROUP BY 1
"""


@query("f35_bloom_decontaminate", oracle=_F35_SQL)
def f35_bloom_decontaminate(spark, sf_dir):
    """F35 (r11, self-initiated): f30's n-gram decontamination with the
    eval-gram set compressed into a PORTABLE BLOOM FILTER — the
    membership sketch, oracle-exact because every step is integer/string
    ops both engines compute identically: each distinct 5-gram md5 maps
    to k=3 seeded positions (its own disjoint 4-hex-char nibble ranges
    -> 2^16 bits; the gram hash is already an md5 digest, so the
    positions cost no additional hashing — r12), the filter is the
    DISTINCT position set of
    the planted eval grams (doc_id % 89, f30's stand-in), a gram
    bloom-hits iff ALL k positions are set, and a doc is contaminated
    at >= 10% bloom-hit grams (f30's overlap rule, integer
    comparison).

    Why a Bloom filter when f30 broadcasts exact gram hashes: the
    exact set costs 16 bytes per eval gram; the filter is m = 2^16
    BITS TOTAL (~8 KB serialized) at any eval-set size up to its
    capacity — the structure a 1000-executor decontamination ships to
    every task when even the hash set is too big to broadcast. The
    price is one-sided false positives (over-flagging, never
    under-flagging — bloom membership cannot miss), pinned against
    f30's exact answer in tests/test_llm_ops.py.

    Scale posture mirrors f30: per-doc gram dedup map-side
    (array_distinct before the explode), positions join the tiny bits
    set (AQE broadcast-when-small — the planted set grows with the
    corpus, a REAL eval suite is fixed KBs), per-doc rollup is one
    map-side-combinable aggregate."""
    grams = gram_hashes(table(spark, sf_dir, "documents"))
    # r14 optimization (guide §2.3/§2.4): a gram's k=3 positions are
    # nibble ranges of the SAME md5 digest, i.e. derivable as three
    # COLUMNS of one row — the previous explode-to-3-rows +
    # groupBy(doc_id, gh) re-aggregation shuffled every corpus gram
    # (10.1 MB at sf0.1, corpus-sized at tier) merely to count set
    # positions that were co-located all along. Column form: k_hit is
    # a per-row expression over three membership joins against the
    # bits set, which is ≤ 2^16 rows BY CONSTRUCTION (m = 2^16 bits)
    # and therefore always broadcastable — made explicit per guide
    # §3.1 instead of trusting AQE's estimate. The only exchanges left
    # are the tiny eval-side distinct and the map-side-combinable
    # per-doc rollup: the corpus truly never shuffles now (2 Exchange
    # → 1 on the corpus path; same rows, pinned by the oracle).
    #
    # r15 (verdict ask 6 / r14 ADVICE): the r14 form renamed the bits
    # columns PER JOIN (_p{j}/_s{j}), so the three BroadcastExchange
    # subplans canonicalized differently and ReuseExchange could not
    # dedupe them — the eval-side scan+gram+distinct pipeline executed
    # 3× (Scan parquet 4, not 2). Renaming on the PROBE side instead
    # (each _p{j} becomes ``pos`` for its join, the shared ``bits``
    # frame is broadcast verbatim) makes the three broadcast subplans
    # plan-identical: ONE BroadcastExchange built, two ReusedExchange
    # nodes, eval pipeline executed once (Scan parquet 4 → 2). Join
    # semantics unchanged (left equi join per position column), rows
    # pinned by the oracle.
    pos_cols = [
        F.conv(F.expr(f"substring(gh, {j * 4 + 1}, 4)"), 16, 10)
        .cast("int").alias(f"_p{j}")
        for j in range(_BLOOM_K)
    ]
    pg = grams.select("doc_id", "gh", *pos_cols)
    bits = (
        pg.filter(F.col("doc_id") % 89 == 0)
        .select(F.explode(F.array(*[F.col(f"_p{j}")
                                    for j in range(_BLOOM_K)])).alias("pos"))
        .distinct()
        .withColumn("_set", F.lit(True))
    )
    bits_b = F.broadcast(bits)
    khit = pg
    for j in range(_BLOOM_K):
        khit = (
            khit.withColumnRenamed(f"_p{j}", "pos")
            .join(bits_b, "pos", "left")
            .withColumnRenamed("_set", f"_s{j}")
            .drop("pos")
        )
    k_hit = sum(
        F.when(F.col(f"_s{j}"), 1).otherwise(0) for j in range(_BLOOM_K)
    )
    khit = khit.select("doc_id", k_hit.alias("k_hit"))
    return (
        khit.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.when(F.col("k_hit") == _BLOOM_K, 1).otherwise(0))
            .alias("n_bloom_hit"),
        )
        .select(
            "doc_id", "n_grams", "n_bloom_hit",
            (F.col("n_bloom_hit") * 10 >= F.col("n_grams"))
            .alias("contaminated"),
        )
    )


# ------------------------------------------------- F36: semantic dedup
def _f36_oracle() -> str:
    """DuckDB twin of f36_semdedup: same inlined plane literals, same
    size->plane-count rule (expected cluster width 256), same min-id
    prototype, same rounded-cosine keep rule. Cross-engine seams are
    f13's two knowns: Python banker's round vs DuckDB half-away in the
    plane-count rule (differs only at an exact .5 log2, unreachable for
    real counts) and float ulp at the 0.3 threshold, absorbed by
    rounding to 6 dp before comparing (f3's proven pattern)."""
    bits = ", ".join(
        f"(CASE WHEN list_dot_product(e, [{', '.join(repr(v) for v in p)}])"
        f" > 0 THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(F36_PLANES)
    )
    cent = fx.sql_round("list_cosine_similarity(t.e, p.pe)", 6)
    return f"""
    WITH params AS (
        SELECT GREATEST(2, CAST(round(log2(GREATEST(COUNT(*), 1) / 256.0
                                           + 1)) AS INTEGER)) AS k
        FROM embeddings WHERE {_VEC_OK}
    ), base AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
        FROM embeddings WHERE {_VEC_OK}
    ), tagged AS (
        SELECT vec_id, e,
               CAST(list_sum(([{bits}])[1:k]) AS BIGINT) AS bucket
        FROM base, params
    ), proto AS (
        SELECT bucket, MIN(vec_id) AS pid, arg_min(e, vec_id) AS pe
        FROM tagged GROUP BY 1
    ), scored AS (
        SELECT t.vec_id, t.bucket, p.pid, {cent} AS centrality
        FROM tagged t JOIN proto p USING (bucket)
    )
    SELECT vec_id, bucket, centrality
    FROM scored WHERE vec_id = pid OR centrality < 0.3
    """


@query("f36_semdedup", oracle=_f36_oracle())
def f36_semdedup(spark, sf_dir):
    """F36: SemDeDup-style cluster-prototype pruning — the ORACLE-GRADE
    member of the semantic-dedup/clustering class (f28's k-means demo
    stays the library-parity rows-only key, exactly as the portable
    sketch twins did for c38/c11).

    SemDeDup (Abbas et al. 2023, public) clusters an embedding corpus
    and drops members too close to their cluster's representative. Two
    deterministic substitutions make that semantic oracle-exact:

    - the quantizer is the seeded sign-bit hyperplane partition
      (F36_PLANES — an independent prefix-stable stream) instead of
      k-means, sized to an expected cluster width of 256 by the same
      log2 rule as f13;
    - the representative is the cluster's MIN-vec_id member instead of
      the floating-point centroid (a cross-member mean aggregates in
      engine-chosen order — fp-nondeterministic across engines; the
      arg-min is exact, and the k-means+centroid variant remains f28).

    Keep rule: the prototype always survives; any other member survives
    iff its rounded cosine to the prototype is < 0.3 (f13's synthetic
    near-dup threshold). Work is LINEAR in the corpus: one map pass to
    tag, a map-side-combinable arg-min per cluster (n/256 rows), one
    equi-join on the cluster id (AQE broadcasts the prototype side at
    test SF; at 100 TB, n/256 prototypes * 64 dims can exceed broadcast
    - the join then shuffles BOTH sides on the bucket key, still one
    star comparison per member, never a pairwise expansion), and one
    codegen'd 64-dim dot per member (`_dot_unrolled` — bit-identical to
    the oracle's loop). The pairwise member (quadratic within buckets,
    split-capped) is f13; this operator is its linear complement: a
    corpus-shrinking PRUNE, not a pair report."""
    # r15 (the f13 fold, verdict ask 7's pattern): the plane-count
    # count() was a separate full corpus pass before the tagged pin's
    # second one. The source is pinned ONCE with an Observation riding
    # the pin's own materialization (observed n == count() exactly),
    # and the bucket tag derives LAZILY from the pinned blocks — its
    # two consumers (prototype arg-min, member join) re-derive only
    # the k·64-dim sign dots, linear expression work, instead of
    # forcing a second corpus materialization.
    obs = Observation()
    emb = pin(
        _embeddings(spark, sf_dir)
        .observe(obs, F.count(F.lit(1)).alias("n")),
        "f36_emb",
    )
    n = int(obs.get["n"])
    k = max(2, round(math.log2(max(n, 1) / 256 + 1)))
    _f36_planes(k)  # fail-fast guard past the inlined-oracle envelope
    tagged = (
        emb.withColumn("bucket",
                       bucket_expr("f36", k, "emb").cast("long"))
        .select("vec_id", "emb", "nrm", "bucket")
    )
    proto = tagged.groupBy("bucket").agg(
        F.min("vec_id").alias("pid"),
        F.min_by("emb", "vec_id").alias("p_emb"),
        F.min_by("nrm", "vec_id").alias("p_nrm"),
    )
    cos = _dot_unrolled("emb", "p_emb") / (F.col("nrm") * F.col("p_nrm"))
    # Pin the RAW cosine before rounding: fround's total-safety branches
    # reference their operand ~5 times, and with the 300-node unrolled
    # dot inlined at each reference (CollapseProject re-merges any
    # intermediate select) the fused join stage blows janino's 64 KB
    # method limit and the whole stage falls back to interpretation —
    # the exact _dot_unrolled scope-discipline failure its docstring
    # warns about. Behind the pin the rounding references a plain
    # 8-byte column and the keep-filter stage codegens; the pinned
    # frame is 4 narrow columns, an order of magnitude smaller than
    # the tagged pin above.
    scored = pin(
        tagged.join(proto, "bucket").select(
            "vec_id", "bucket", "pid", cos.alias("_cos"),
        ),
        "f36_scored",
    )
    out = (
        scored.withColumn("centrality", fx.r6(F.col("_cos")))
        .filter((F.col("vec_id") == F.col("pid"))
                | (F.col("centrality") < 0.3))
        .select("vec_id", "bucket", "centrality")
    )
    unpin(emb)  # scored is materialized; the wide source pin can go now
    return out

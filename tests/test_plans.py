"""Physical-plan assertions (SURVEY.md §4) — the scale-posture guardrails.

Correctness tests prove the answers match; these prove the *plans* are the
ones that survive a 100 TB scale-up: filters reach the parquet scan,
scans prune columns, small dims broadcast, top-k avoids global sorts,
aggregates combine map-side, and nothing silently degenerates into a
cartesian product. Plans are inspected without executing (driver-side
only), so the whole registry can be swept cheaply.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from conftest import SF_DIR
from nyc_taxi_data_engineering_project_spark import registry

registry.load_all()


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_b1_filter_pushdown_and_column_pruning(spark):
    p = plan_of(registry.QUERIES["b1_date_range"](spark, SF_DIR))
    # the date-range predicate must reach the parquet scan
    assert "PushedFilters: [" in p
    pushed = p.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert "l_shipdate" in pushed, f"no shipdate pushdown: {pushed}"
    # and the scan must not read columns the query never touches
    read = p.split("ReadSchema: ", 1)[1].splitlines()[0]
    assert "l_shipdate" in read
    for unused in ("l_tax", "l_returnflag", "l_suppkey"):
        assert unused not in read, f"unpruned column {unused}: {read}"


def test_b2_dim_join_is_broadcast(spark):
    p = plan_of(registry.QUERIES["b2_join_pickup_zone"](spark, SF_DIR))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p  # the fact side must not shuffle


def test_flagship_broadcasts_small_dims(spark):
    p = plan_of(registry.QUERIES["flagship_daily_region_revenue"](spark, SF_DIR))
    assert p.count("BroadcastHashJoin") >= 2  # nation and region at least
    assert "CartesianProduct" not in p
    # the date filter reaches the orders scan
    assert "PushedFilters: [" in p and "o_orderdate" in p.split(
        "PushedFilters: [", 1
    )[1].split("]", 1)[0]


def test_c1_large_large_join_is_shuffle_based(spark):
    p = plan_of(registry.QUERIES["c1_smj_selfjoin"](spark, SF_DIR))
    assert ("SortMergeJoin" in p) or ("ShuffledHashJoin" in p)


def test_b9_topk_avoids_global_sort(spark):
    p = plan_of(registry.QUERIES["b9_topk"](spark, SF_DIR))
    assert "TakeOrderedAndProject" in p


def test_b6_aggregate_is_partial(spark):
    p = plan_of(registry.QUERIES["b6_groupby_count"](spark, SF_DIR))
    # two-stage hash aggregate: map-side partial + reduce-side final
    assert "partial_count" in p or p.count("HashAggregate") >= 2


def test_f1_dedup_aggregate_is_partial(spark):
    p = plan_of(registry.QUERIES["f1_exact_dedup"](spark, SF_DIR))
    assert p.count("HashAggregate") >= 2


# ops whose semantics genuinely require a non-equi/nested-loop strategy:
# c6 is the cross-join operator itself; c7 is a broadcast band lookup;
# f3's exact baseline is a deliberate broadcast all-pairs (its scale path
# f3_lsh_ann joins equi on bucket id and is asserted below).
NON_EQUI_ALLOWED = {
    "c6_cross_join", "c7_range_join", "f3_cosine_topk",
    # r11: f34's nested-loop is the ONE-ROW scalar total (the
    # threshold) broadcast onto the estimate frame — the accepted
    # scalar-broadcast spelling (cf. advanced.py's c6 helper), not an
    # unbounded cross product (same allowlist as test_plan_signatures)
    "f34_heavy_hitters",
}

# streaming keys exercise readStream plumbing in their rows-only form and
# are planned separately by the streaming engine
SWEEP_KEYS = sorted(
    k for k in registry.QUERIES if not k.startswith("d")
)


@pytest.mark.parametrize("key", SWEEP_KEYS)
def test_no_accidental_cartesian(spark, key):
    p = plan_of(registry.QUERIES[key](spark, SF_DIR), mode="simple")
    if key in NON_EQUI_ALLOWED:
        return
    assert "CartesianProduct" not in p, f"{key} degenerated to cartesian"
    assert "BroadcastNestedLoopJoin" not in p, f"{key} uses nested loop"


def test_lsh_paths_join_equi_on_bucket(spark):
    """The scale paths of similarity search must be equi joins (shuffle-
    partitionable by bucket), never all-pairs."""
    for key in ("f3_lsh_ann", "f13_embedding_neardup", "f2_minhash_dedup"):
        p = plan_of(registry.QUERIES[key](spark, SF_DIR), mode="simple")
        assert "CartesianProduct" not in p, key
        assert "BroadcastNestedLoopJoin" not in p, key


def test_exists_and_in_subqueries_plan_as_semi_joins(spark):
    """Q4's EXISTS and Q18's IN-over-HAVING must compile to LeftSemi —
    one probe per outer row, no multi-match row duplication. The build
    side may be broadcast or shuffled (AQE decides by size); the join
    *type* is the scale-critical property."""
    for key in ("tpch_q4", "tpch_q18"):
        p = plan_of(registry.QUERIES[key](spark, SF_DIR), mode="simple")
        assert "LeftSemi" in p, f"{key} lost the semi-join shape"


def executed_plan_of(df) -> str:
    """Drive the frame's own QueryExecution to its FINAL adaptive plan.
    The size-dependent joins below deliberately carry no broadcast hint
    (a forced broadcast on a corpus-derived set is the unbounded-
    broadcast trap); what we assert is that AQE's runtime stats pick
    broadcast when the build side is actually small — visible only in
    the executed plan, not the static one."""
    df.write.format("noop").mode("overwrite").save()
    return df._jdf.queryExecution().executedPlan().toString()


def test_f25_boilerplate_set_broadcasts_when_small(spark):
    """Template-boilerplate sets are small → AQE must convert the flag
    join to broadcast at runtime (no static hint: on a dup-heavy corpus
    the set is corpus-scale and must fall back to shuffle)."""
    p = executed_plan_of(
        registry.QUERIES["f25_boilerplate_removal"](spark, SF_DIR)
    )
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_f26_first_occurrence_is_partial_aggregate(spark):
    """First-occurrence winner must be min(struct) — map-side-combinable
    partial aggregate — not a row_number window (which sorts every block
    group and cannot combine map-side)."""
    p = plan_of(registry.QUERIES["f26_passage_dedup"](spark, SF_DIR))
    assert p.count("HashAggregate") >= 2 or "partial_min" in p
    assert "Window" not in p


def test_f27_chunking_has_no_shuffle(spark):
    """Chunking is pure per-row expression work — sequence/posexplode/
    slice must fuse with the scan; any Exchange means a rewrite broke the
    map-only property."""
    p = plan_of(registry.QUERIES["f27_chunk_rag"](spark, SF_DIR))
    assert "Exchange" not in p
    # column pruning: only doc_id + text read
    read = p.split("ReadSchema: ", 1)[1].splitlines()[0]
    assert "lang" not in read and "quality" not in read


def test_f29_vocab_lookup_broadcasts_when_small(spark):
    """A small vocab must reach the corpus as a runtime broadcast (AQE
    conversion — no static hint, since crawl vocabularies grow with the
    corpus and would eventually need the shuffle-join fallback)."""
    p = executed_plan_of(registry.QUERIES["f29_unigram_logprob"](spark, SF_DIR))
    assert "BroadcastHashJoin" in p


def test_c33_salt_reaches_join_keys_and_join_is_shuffled(spark):
    """The salted join must (a) carry the salt in its join keys — that IS
    the skew fan-out — (b) run as a shuffle join, since salting a
    broadcast join would be dead weight (broadcast never partitions by
    key at all), and (c) be SORT-MERGE specifically: a shuffled-hash
    build side cannot spill, and the 16×-replicated dim OOMed exactly
    that way at the 100× stress run (SCALE.md §10) — this pin keeps the
    hint from being reintroduced."""
    p = plan_of(registry.QUERIES["c33_salted_join"](spark, SF_DIR))
    assert "_salt" in p, "salt column never reached the physical plan"
    assert "SortMergeJoin" in p
    assert "ShuffledHashJoin" not in p, (
        "shuffled-hash build side cannot spill — OOMs at scale"
    )
    assert "BroadcastHashJoin" not in p


def test_f30_eval_gram_membership_broadcasts_when_small(spark):
    """A real eval suite's gram set is fixed-size-small → AQE must pick
    broadcast at runtime; and the corpus gram stream must carry NO
    .distinct() shuffle (per-doc dedup happens map-side via
    array_distinct before the explode)."""
    df = registry.QUERIES["f30_ngram_decontaminate"](spark, SF_DIR)
    static = plan_of(df, mode="simple")
    # one Exchange for the final per-doc agg, one for eval_grams'
    # distinct (a tiny side); the corpus-sized (doc_id, gh) stream
    # itself must not hash-shuffle for dedup
    assert static.count("Exchange") <= 3, static
    assert "BroadcastHashJoin" in executed_plan_of(df)


def test_f31_rank_avoids_corpus_sized_global_window(spark):
    """Global training order must come from the two-phase rank: the only
    unpartitioned window runs over the 4096-row bucket-offset frame, and
    the corpus-sized window is partitioned by bucket. A naive global
    row_number would put the whole corpus through one task."""
    df = registry.QUERIES["f31_training_order"](spark, SF_DIR)
    p = plan_of(df)
    # the row_number window spec must carry the bucket partition key
    rn = [ln for ln in p.splitlines() if "row_number()" in ln]
    assert rn, "no row_number window found"
    assert all("bk" in ln for ln in rn), (
        "within-bucket window lost its partition key:\n" + "\n".join(rn)
    )


def test_c36_windows_and_agg_share_one_exchange(spark):
    """Sessionization must shuffle ONCE on user_id: both windows and the
    final per-session aggregate reuse the same hash partitioning."""
    p = plan_of(registry.QUERIES["c36_sessionize"](spark, SF_DIR), mode="simple")
    assert p.count("Exchange") == 1, p[:1500]


def test_q17_decorrelates_to_preaggregate(spark):
    """Q17's correlated per-part AVG must run as one pre-aggregate joined
    back on partkey — a per-row subquery re-execution would show up as a
    Subquery/CartesianProduct node and is quadratic at scale."""
    p = plan_of(registry.QUERIES["tpch_q17"](spark, SF_DIR), mode="simple")
    assert p.count("HashAggregate") >= 2  # partial+final of the avg
    assert "CartesianProduct" not in p


def test_f24_corpus_side_never_shuffles(spark):
    """Decontamination's scale contract: the benchmark-fingerprint side
    broadcasts (it is the small side by construction) and the CORPUS side
    reaches the anti join with zero Exchange — a corpus shuffle here is
    the difference between a map-only pass and re-moving 100 TB."""
    p = plan_of(registry.QUERIES["f24_decontaminate"](spark, SF_DIR),
                mode="simple")
    assert "BroadcastHashJoin" in p and "LeftAnti" in p, p[:1500]
    # everything above/before the BroadcastExchange is the corpus branch
    # (the build side renders under it): no shuffle allowed there. The
    # fingerprint-set distinct MAY shuffle — it is small by contract.
    corpus_side = p.split("BroadcastExchange", 1)[0]
    assert "Exchange hashpartitioning" not in corpus_side, p[:1500]
    assert "Exchange rangepartitioning" not in corpus_side, p[:1500]

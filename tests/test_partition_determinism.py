"""Partition-determinism gate for the rows-only keys (r6).

The 127 oracle keys are value-hash-checked against DuckDB, which is
partitioning-blind — any partition-dependent nondeterminism in them
would surface as a hash mismatch at some SF. The 11 rows-only keys have
no such check: until now nothing proved their output doesn't depend on
how the input happens to be sharded or how many shuffle partitions the
session uses. At 100 TB those are exactly the knobs that differ from
run to run (part-file counts change with every compaction; AQE re-plans
shuffle counts at runtime), so "same data, different physical layout →
same answer" is a correctness property of the operator, not a nicety.

Method: each deterministic rows-only key runs twice in the same
session —
  baseline: the driver's single-file-per-table sf0.001 layout, session
      default ``spark.sql.shuffle.partitions`` (8);
  perturbed: every source table rewritten as 7 part files (changes scan
      partitioning, hence map-side combine grouping and merge order in
      every downstream exchange) AND ``spark.sql.shuffle.partitions=5``
      for the duration of the run —
and the two outputs must be multiset-identical under the shared canon
(6-dp float collapse, the same tolerance the oracle gate uses).

Why each key is CLAIMED deterministic (the test pins the claim):
  c10/c38 — HLL register merge is commutative/associative/idempotent;
  f10 — pure per-row hash arithmetic (md5-derived since r6, when
      f2/f10/f14 also gained DuckDB oracles; kept here as a second,
      layout-focused angle on the same determinism claim);
  f2/f14 — deterministic hash bands; min-label propagation converges to
      the component minimum regardless of visit order;
  f19/f20 — hashingTF counts are exact integers, IDF derives from them,
      MinHashLSH's hash family is seeded;
  f21/f28 — the k-means fit samples by hash-ordered TakeOrdered (layout
      independent) with a seeded numpy Lloyd loop; assignment is a
      per-row matmul.

Excluded by documented design (their docstrings own the claim):
  c29_sample — the per-partition Bernoulli sampler's output SET is
      partition-dependent by construction; its check is the rate
      tolerance gate in test_approx_ops.py.
  c11_approx_percentile — the GK-sketch estimate may legitimately move
      within its accuracy bound when merge order changes; the bound (not
      bit-equality) is the claim, gated in test_approx_ops.py.
"""

from __future__ import annotations

import os

import pytest

from canon import canon_rows

import __spark_entry__ as entry_mod

DETERMINISTIC_ROWS_ONLY = [
    "c10_approx_distinct",
    "c38_hll_sketch_union",
    "f2_minhash_dedup",
    "f10_simhash",
    "f14_dedup_clusters",
    "f19_ml_tfidf_pipeline",
    "f20_ml_minhash_lsh",
    "f21_ivf_ann",
    "f28_doc_clustering",
]

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def resharded_sf(spark, tmp_path_factory):
    """Every source table rewritten as a 7-part directory — same rows,
    different physical layout. Written through Spark so the catalog's
    directory dispatch (footer peek across all parts) is exercised too.
    Read through catalog.table(), NOT bare spark.read.parquet: the
    catalog owns the nanos-timestamp dispatch, and a bare read would
    either crash on a nanos-typed driver file (the documented r3/r5
    incident class) or reshard it un-normalized into a corpus whose
    schema differs from the baseline the test compares against."""
    from nyc_taxi_data_engineering_project_spark.catalog import (
        TESTDATA_TABLES, table,
    )

    out = str(tmp_path_factory.mktemp("reshard"))
    for name in TESTDATA_TABLES:
        (table(spark, SF_DIR, name)
         .repartition(7)
         .write.mode("overwrite")
         .parquet(os.path.join(out, f"{name}.parquet")))
    return out


def _canon_rows(df):
    return canon_rows(df.collect())


@pytest.mark.parametrize("key", DETERMINISTIC_ROWS_ONLY)
def test_rows_only_key_is_partition_deterministic(spark, resharded_sf, key):
    qs = entry_mod.queries()
    baseline = _canon_rows(qs[key](spark, SF_DIR))

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "5")
    try:
        perturbed = _canon_rows(qs[key](spark, resharded_sf))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)

    assert baseline == perturbed, (
        f"{key}: output depends on physical layout — "
        f"{len(baseline)} baseline rows vs {len(perturbed)} perturbed; "
        f"first diff: "
        f"{next(((a, b) for a, b in zip(baseline, perturbed) if a != b), None)}"
    )

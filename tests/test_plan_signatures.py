"""Full-surface plan-regression gate (scripts/plan_audit.py's contract).

test_plans.py pins the handful of 100 TB-critical plan properties by
hand; this gate freezes the physical-plan *signature* of every
registry key (operator counts, per-scan pushdown + read-width, Python
eval ops) against the committed PLAN_SIGNATURES.json, so any silent
plan change anywhere on the surface — a broadcast that became a
shuffle, a filter that stopped reaching the scan, a join that
degenerated into a cartesian, a new row-at-a-time Python eval — fails
with a per-key diff. Regenerate deliberately with
``python scripts/plan_audit.py --write`` and review the diff in the
commit; the contract is meant to change only when a plan change is
intended.

The cross-cutting invariants below assert properties no future
regeneration may silently relax: they run on the freshly-derived
signatures (not the committed file), so rewriting the contract cannot
bless a cartesian product or a stray row-Python eval.
"""

from __future__ import annotations

import json

import pytest

from conftest import SF_DIR

import plan_audit


@pytest.fixture(scope="module")
def derived(spark):
    from nyc_taxi_data_engineering_project_spark import registry

    registry.load_all()
    old_sf = plan_audit.SF_DIR
    plan_audit.SF_DIR = SF_DIR
    try:
        return plan_audit.derive_all(spark)
    finally:
        plan_audit.SF_DIR = old_sf


def test_signatures_match_committed_contract(derived):
    if not SF_DIR.rstrip("/").endswith("sf0.001"):
        pytest.skip(
            "contract captured at sf0.001; stats-based join choices may "
            "legitimately differ at other SFs (invariant tests still run)"
        )
    with open(plan_audit.SIG_PATH) as f:
        committed = json.load(f)
    diffs = plan_audit.diff_signatures(committed, derived)
    assert not diffs, "plan drift vs PLAN_SIGNATURES.json:\n" + "\n".join(diffs)


def test_every_key_constructs(derived):
    errs = {k: v for k, v in derived.items() if isinstance(v, str)}
    assert not errs, f"keys failed to construct a plan: {errs}"


def test_no_cartesian_products_anywhere(derived):
    offenders = [
        k for k, v in derived.items()
        if isinstance(v, dict) and v["ops"].get("CartesianProduct")
    ]
    assert not offenders, offenders


# BroadcastNestedLoopJoin is the *broadcast* non-equi form — fine when
# one side is provably tiny, a 100 TB disaster otherwise. Allowlist the
# three keys whose small side is bounded by construction:
#   c6_cross_join      — deliberate small×small cross (5×25 dims)
#   c7_range_join      — non-equi band join, broadcast band table
#   f3_cosine_topk     — one broadcast query vector vs the corpus
_BNLJ_OK = {
    "c6_cross_join", "c7_range_join", "f3_cosine_topk",
    # r11: f34's BNL is the ONE-ROW scalar total (the 0.5%-of-stream
    # threshold) broadcast onto the vocabulary-sized estimate frame —
    # the bounded-scalar-join spelling, not an unbounded cross product
    "f34_heavy_hitters",
}


def test_nested_loop_joins_only_on_bounded_small_sides(derived):
    offenders = [
        k for k, v in derived.items()
        if isinstance(v, dict)
        and v["ops"].get("BroadcastNestedLoopJoin")
        and k not in _BNLJ_OK
    ]
    assert not offenders, offenders


def test_row_at_a_time_python_only_in_the_e1_demo(derived):
    offenders = [
        k for k, v in derived.items()
        if isinstance(v, dict)
        and v["ops"].get("BatchEvalPython")
        and k != "e1_py_udf"
    ]
    assert not offenders, offenders


def test_no_scan_reads_more_than_12_columns(derived):
    # widest legitimate read on this surface is tpch_q1's 7-of-16
    # lineitem columns; a 13+-column scan means pruning broke somewhere
    offenders = {
        k: v["scans"]
        for k, v in derived.items()
        if isinstance(v, dict) and any(s.get("cols", 0) > 12 for s in v["scans"])
    }
    assert not offenders, offenders

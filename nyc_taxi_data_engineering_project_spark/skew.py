"""Skew-mitigated joins — explicit salting (SCALE.md §5c).

A shuffle join hashes each key to exactly one reducer, so one hot key
(a celebrity user, an empty-string default, a null-like sentinel) lands
its entire row volume on a single task and the stage runs at the speed
of that straggler. AQE's skew-join split handles this adaptively at
runtime when it can; salting is the plan-level form that is explicit,
testable, and independent of runtime statistics.

Mechanics: the fact side gets a deterministic salt in ``[0, n_salt)``;
the dim side is replicated ``n_salt`` times (one copy per salt value);
the join runs equi on ``(key, salt)``, so a hot key's rows spread over
``n_salt`` reducers while every fact row still meets its dim match.
Cost: the dim side shuffles ``n_salt``× its size — worth it exactly
when the dim is too big to broadcast and the fact is skewed (a
broadcast join is always the first choice when the dim fits;
``relational.py`` b2/flagship assert that path).

AQE-vs-salting decision rule (r9, measured at 60 M rows with 50% of
the fact on one key — scripts/aqe_vs_salting_probe.py,
stress100_results/aqe_vs_salting_60m.json; SCALE.md §17):

1. **Dim fits broadcast → broadcast.** No shuffle, no skew possible.
2. **Shuffle join → AQE skew split first, but VERIFY it fires.** The
   default gate is (partition > 5× median AND > 256 MB): a 30 M-row
   hot partition compressed under 256 MB and was silently left whole —
   "AQE on" ran at the straggler's speed (10.9 s vs 11.4 s off) while
   the split never fired. With the byte thresholds scaled to the
   actual shuffle (32 MB threshold / 16 MB advisory) the split fired
   and AQE won outright: 2.9 s — 2× faster than salting (5.6 s),
   because salting pays the n_salt× dim replication AQE doesn't.
   Operationally: check ``skew=true`` on the SMJ node of the executed
   plan (the probe's sampled-twin trick), not just the conf.
   **Operationalized in r10** (verdict ask 1): a plain
   ``get_session(sf_dir=...)`` now derives the byte gates from the
   input walk (``session.aqe_skew_conf_for``) and the probe's
   ``--materialized`` mode proves the split fires with NO per-query
   tuning — 4.9 s vs 21.2 s under the default gate in the same
   session (SCALE.md §19a, ``aqe_session_gate_60m.json``).
3. **Salting remains the tool when AQE structurally cannot act**: a
   plan that must not depend on runtime statistics (regression-gated
   plans, this module's tests), joins over bucketed layouts (a
   bucketed scan has NO Exchange for AQE to re-split — the §15c
   32-bucket starvation finding), and replication-safe join types
   outside AQE's split support.
4. **Never salt a combinable aggregate.** Partial aggregation absorbs
   hot keys map-side (each task emits one row per key before the
   shuffle); the measured two-level salted sum/count ran 1.7× SLOWER
   than the plain aggregate (3.2 s vs 1.9 s). Aggregate skew is real
   only where partial state can't combine — exact per-key windows
   (use the two-phase rank, io.surrogate_ids / f31) or giant
   collect_list state (redesign the aggregate).
5. **There is no hot-fraction crossover that rescues salting** (r14,
   hot ∈ {5,10,25,50}% at 60 M rows — SCALE.md §24c,
   aqe_salting_crossover.json). Exchange-present: AQE wins every
   fraction its gate trips (1.8–1.9× over salting at 50% hot); under
   the gate (≤5%) all strategies tie within noise — untripped gates
   mean untreatable-and-harmless skew. Exchange-free (bucketed):
   plain beats salted at EVERY fraction (2.4× at 5%, 1.3× at 50%) —
   salting re-introduces the two-sided exchange the layout exists to
   avoid, and that costs more than the hot bucket's straggler at
   this tier. Salting a bucketed join is a last resort for a key so
   hot that ONE bucket's single-task time exceeds a full reshuffle
   (unreached at 50%/60 M); for durably hot keys, re-build the
   layout at a higher bucket count instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_SALT = "_salt"

# join types whose semantics survive dim-side replication: every fact row
# carries exactly one salt, so it meets exactly one dim copy (inner/left/
# semi) or confirms absence against the one copy holding its salt (anti).
# right/full would emit each UNMATCHED dim row once per replica — wrong.
_SALTABLE = {"inner", "left", "leftouter", "left_outer", "semi",
             "leftsemi", "left_semi", "anti", "leftanti", "left_anti"}


def salted_join(fact: DataFrame, dim: DataFrame, on: list[str],
                n_salt: int = 16, how: str = "inner") -> DataFrame:
    """Equi join ``fact ⋈ dim`` on ``on``, salted ``n_salt`` ways.

    The salt is ``monotonically_increasing_id() % n_salt`` — round-robin
    within each scan partition, so a hot key spreads evenly EVEN WHEN its
    rows are byte-identical (a content-hash salt would collapse identical
    rows — the empty-string/sentinel hot key is exactly the row that
    repeats verbatim). Still deterministic where it matters: the id is
    (partition << 33) + row-offset, a pure function of the input split
    and row order, so a speculative/retried task re-derives the same
    salts (a ``rand()`` salt would not). The dim replication is an
    inline ``explode`` of a literal salt array — map-side, no extra job.
    """
    if how.lower() not in _SALTABLE:
        raise ValueError(
            f"salted_join supports {sorted(_SALTABLE)}, not {how!r}: "
            "replicating the dim side breaks unmatched-dim-row semantics"
        )
    salted_fact = fact.withColumn(
        _SALT,
        F.pmod(F.monotonically_increasing_id(), F.lit(n_salt)).cast("int"),
    )
    salted_dim = dim.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    # merge hint: the point is the shuffle-join case (dim too big to
    # broadcast; without a hint Spark would broadcast a small dim and
    # the salt would be dead weight) — and it must be SORT-MERGE, not
    # shuffle_hash: a shuffled-hash build side cannot spill, so one fat
    # post-salt partition OOMs the task. Observed at the 100x stress run
    # (scripts/stress100.py): the 16x-replicated orders side left
    # ~7.5M-row per-task hash maps — "not enough memory to build hash
    # map" — while sort-merge spills and still gets the salt's fan-out.
    joined = salted_fact.join(
        salted_dim.hint("merge"), on=[*on, _SALT], how=how
    )
    return joined.drop(_SALT)

"""Subprocess probe for salted_join's retry-determinism claim (r5
verdict ask 4): skew.py's docstring argues the
``monotonically_increasing_id() % n_salt`` salt re-derives identically
when a task is retried — a ``rand()`` salt would re-roll and rows could
change salt between the attempt that failed and the attempt that wins,
corrupting the join. Prose until now; this probe makes it observable.

Runs in its own process because task retries need ``local[N, maxFailures]``
— the shared test session's plain ``local[N]`` master treats the first
task failure as fatal, and a SparkContext's master cannot change
in-session.

Mechanics: a pass-through ``mapInPandas`` on the fact side raises on the
FIRST attempt of partition 0 (``TaskContext.attemptNumber() == 0``), so
the stage that derives the salts provably executes once, fails, and is
re-run. A marker file written just before the raise proves the injection
fired (accumulator updates from failed transformation tasks are not
guaranteed, a filesystem touch in local mode is). The salted join over
the flaky fact must equal both the salted join without injection and the
plain unsalted join.

Invoked by tests/test_skew.py::test_salted_join_deterministic_under_task_retry.
Usage: python retry_determinism_probe.py <sf_dir> <marker_path>
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark import TaskContext  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

from nyc_taxi_data_engineering_project_spark.skew import salted_join  # noqa: E402

SF_DIR = sys.argv[1]
MARKER = sys.argv[2]


def main() -> None:
    spark = (
        SparkSession.builder
        # local[cores, maxFailures]: allow ONE retry per task
        .master("local[4,2]")
        .appName("retry-determinism-probe")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    fact = (
        spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
        .select("l_orderkey", "l_quantity")
    )
    dim = (
        spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
        .select("o_orderkey", "o_orderpriority")
        .withColumnRenamed("o_orderkey", "l_orderkey")
    )

    def flaky_passthrough(batches):
        tc = TaskContext.get()
        if tc.partitionId() == 0 and tc.attemptNumber() == 0:
            # prove the injection fired, then die: the winning attempt
            # (attemptNumber 1) re-reads the same split and passes rows
            # through untouched
            with open(MARKER, "w") as fh:
                fh.write(f"partition=0 attempt={tc.attemptNumber()}\n")
            raise RuntimeError("injected first-attempt task failure")
        yield from batches

    flaky_fact = fact.mapInPandas(flaky_passthrough, fact.schema)

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    got = rows(salted_join(flaky_fact, dim, on=["l_orderkey"], n_salt=7))
    clean = rows(salted_join(fact, dim, on=["l_orderkey"], n_salt=7))
    plain = rows(fact.join(dim, on=["l_orderkey"], how="inner"))

    # The discriminating check: an inner join's RESULT is salt-invariant
    # (every salt value has a dim replica), so also compare the salt
    # ASSIGNMENTS themselves — skew.py:55's exact expression — between
    # the retried run and the clean run. A non-re-derivable salt (e.g.
    # driver-side randomness per attempt) would shift rows between salt
    # values here even though the join above still matched.
    from pyspark.sql import functions as F

    def salt_assignments(df):
        return rows(df.withColumn(
            "_salt",
            F.pmod(F.monotonically_increasing_id(), F.lit(7)).cast("int"),
        ))

    salts_flaky = salt_assignments(flaky_fact)
    salts_clean = salt_assignments(fact)

    out = {
        "injection_fired": os.path.exists(MARKER),
        "rows": len(got),
        "matches_clean_salted": got == clean,
        "matches_plain_join": got == plain,
        "salt_assignments_identical": salts_flaky == salts_clean,
    }
    print(json.dumps(out))
    spark.stop()
    ok = all(out.values()) and out["rows"] > 0
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()

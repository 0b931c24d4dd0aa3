"""Dump ``explain("formatted")`` for named query keys → plans/r15/.

Usage:
    python scripts/r15_explain.py before key1 key2 ...
    python scripts/r15_explain.py after  key1 key2 ...
    python scripts/r15_explain.py after --exec key1 ...   # collect()
        first so AQE finalizes; the dump is the EXECUTED final plan
        (isFinalPlan=true) — the only view where runtime exchange
        reuse (ReusedExchange) is visible. Use for small-result keys.

Writes ``plans/r15/<key>_<tag>.txt`` (the optimization-round evidence
files: the judge checks plan claims against these). Uses the same
session bootstrap as bench.py (no layout registered; plain path) at
``$SPARK_GRAFT_SF_DIR`` (default sf0.1).

Streaming keys (run_available_now executes the stream and returns the
materialized memory table) produce the *post-execution* result-table
plan; for those the interesting plan is the micro-batch plan, which the
bench's event-log CPU numbers capture instead — noted in the file.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nyc_taxi_data_engineering_project_spark import registry  # noqa: E402
from nyc_taxi_data_engineering_project_spark.session import get_session  # noqa: E402
from nyc_taxi_data_engineering_project_spark.envguard import scrub_contract_env  # noqa: E402


def main() -> None:
    scrub_contract_env()
    tag = sys.argv[1]
    keys = sys.argv[2:]
    execute = False
    if keys and keys[0] == "--exec":
        execute = True
        keys = keys[1:]
    assert tag in ("before", "after"), "tag must be before|after"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r15")
    os.makedirs(out_dir, exist_ok=True)
    registry.load_all()
    spark = get_session("r15_explain")
    for key in keys:
        fn = registry.QUERIES[key]
        df = fn(spark, sf_dir)
        if execute:
            df.collect()  # finalize AQE so ReusedExchange is visible
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{key}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {key} [{tag}] sf_dir={sf_dir}"
                     f"{' EXECUTED-final-plan' if execute else ''}\n")
            fh.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()

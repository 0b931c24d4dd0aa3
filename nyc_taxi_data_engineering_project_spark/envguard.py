"""Contract-surface environment guard (r10 ADVICE).

The oracle contract, the frozen plan signatures, and the bench board
are all pinned to the DEFAULT engine posture — but some engine knobs
are env vars (``SPARK_GRAFT_LSH_PLANES`` widens f3's LSH signature at
query time). An override inherited from a parent shell would make a
correctness or plan-gate run false-FAIL with no hint that the
environment, not the engine, changed. Harnesses that assert the
default contract call :func:`scrub_contract_env` first: it unsets any
non-default override LOUDLY, so a leaked env var can never masquerade
as an engine regression, while probe scripts that *intend* the
override simply don't call it.
"""

from __future__ import annotations

import os
import sys

def _lsh_default() -> tuple[str, ...]:
    # derived from the single source of truth, lazily (llm pulls
    # pyspark; every caller of the guard imports it anyway) — a
    # hardcoded "4" here would silently diverge if the oracle-contract
    # width ever moved (r11 review)
    from .queries.llm import _N_LSH_PLANES

    return (str(_N_LSH_PLANES),)


# knob -> thunk returning default-equivalent values (unset = default)
_CONTRACT_KNOBS = {
    "SPARK_GRAFT_LSH_PLANES": _lsh_default,
}


def scrub_contract_env() -> list[str]:
    """Unset contract-affecting env overrides; return what was scrubbed."""
    scrubbed = []
    for var, defaults_fn in _CONTRACT_KNOBS.items():
        defaults = defaults_fn()
        val = os.environ.get(var)
        if val is not None and val not in defaults:
            del os.environ[var]
            scrubbed.append(f"{var}={val}")
            print(f"[envguard] WARNING: {var}={val} inherited from the "
                  f"environment but this is a default-contract run — "
                  f"unset (the oracle/plan gates are pinned to the "
                  f"default; use a probe script for override modes)",
                  file=sys.stderr, flush=True)
    return scrubbed

"""Adversarial oracle-differential gate (r6): every oracle-paired key
runs on a HOSTILE corpus (scripts/make_edge_corpus.py — nulls in every
nullable column, duplicate/orphan keys, empty/unicode/whitespace
strings, extreme dates, malformed JSON, null embeddings) and must agree
with DuckDB exactly — under BOTH ANSI postures — except one adjudicated
inherent engine seam.

This sweep found and drove 16 real fixes in r6: null ordering in
windows (Spark ASC=NULLS FIRST vs DuckDB=NULLS LAST), null-key equi
joins silently dropping the null-lang stratum in two-phase
decompositions (f16/f22), window-partition vs join semantics for null
keys (c8), the silent CASE-ELSE null trap (e1), parse_json aborting on
the first malformed record (c39), DuckDB concat skipping nulls
(c20/c26), epoch rounding vs truncation (c21), ML Tokenizer NPE on
null text (f19), numpy/DuckDB crashes on null embeddings, and more.
Runs as a subprocess so the drive sees the repo exactly as the round
driver does.

The inherent-seam allowlist is EMPTY since r8: c20's levenshtein
(codepoint-based in Spark, byte-based in DuckDB, visible only on
multibyte input) was the last adjudicated divergence; both sides now
compute the distance over an ASCII projection where byte ≡ codepoint,
so the engines agree by construction (see c20's docstring). b3's
float-sum rounding boundary was likewise allowlisted once, then
eliminated by exact decimal accumulation in r6. The set stays in the
harness so any FUTURE adjudication is a deliberate, reviewed entry.

Second r6 pass (found by adversarial self-review of the first): the
gate's bare SparkSession inherited Spark 4's ansi=true default while
session.py pins ansi=false, so everything above was certified under a
posture the product never runs. Under the REAL posture, legacy
``size(NULL) = -1`` diverged seven more keys (c24, f6, f7, f9, f16,
f17, f27) — null documents got -1 token counts, -1/-1 = 1.0 "perfect"
diversity ratios, an 'en' language label, and pack_id prefix sums
shifted for every later document in the stream. Fixed via fx.nsize
(nullif(size, -1) — exact null-propagation under legacy, no-op under
ANSI); the sweep now drives BOTH postures so the surface is proven
posture-agnostic, not just correct under whichever session built it.
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Adjudicated inherent seams. The allowlist excuses MISMATCH ONLY —
# never SPARK ERROR / ORACLE ERROR. Empty since r8 (c20's levenshtein
# seam was engineered away, module docstring); any future entry is a
# deliberate, documented adjudication.
INHERENT_SEAMS: set[str] = set()


@pytest.fixture(scope="module")
def edge_corpus(tmp_path_factory):
    corpus = str(tmp_path_factory.mktemp("edge") / "edge_sf")
    gen = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "make_edge_corpus.py"),
         corpus],
        capture_output=True, text=True, timeout=120, cwd=REPO,
    )
    assert gen.returncode == 0, gen.stdout + gen.stderr
    return corpus


@pytest.mark.parametrize("ansi", ["false", "true"])
def test_edge_corpus_oracle_sweep(edge_corpus, ansi):
    """The hostile-corpus oracle differential, under BOTH engine
    postures: ansi=false is what session.py pins (the product), ansi=true
    is what a bare Spark 4 builder defaults to (and what this gate
    silently certified before r6 — hiding seven legacy size(NULL) = -1
    divergences the production posture actually had). A key is only
    hardened when the two postures and the oracle all agree.

    cwd is pinned to the repo root: Spark's Python workers resolve the
    package from the process cwd, so a pytest invocation from elsewhere
    would fail a21/d13 with ModuleNotFoundError instead of testing them.
    """
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "drive_contract.py"),
         edge_corpus],
        capture_output=True, text=True, timeout=900, cwd=REPO,
        env={**os.environ, "SPARK_GRAFT_ANSI": ansi},
    )
    hard_fail = {
        m.group(1)
        for m in re.finditer(
            r"^  (\S+): (?:SPARK ERROR|ORACLE ERROR)", proc.stdout, re.M)
    }
    mismatch = {
        m.group(1)
        for m in re.finditer(r"^  (\S+): MISMATCH", proc.stdout, re.M)
    }
    unexpected = hard_fail | (mismatch - INHERENT_SEAMS)
    assert not unexpected, (
        f"[ansi={ansi}] edge-corpus divergence beyond the adjudicated "
        f"seams: {sorted(unexpected)}\n"
        + "\n".join(line for line in proc.stdout.splitlines()
                    if any(k in line for k in unexpected))[:3000]
    )
    # the sweep must actually have run the surface, not die early
    n_ok = len(re.findall(r": OK ", proc.stdout))
    assert n_ok >= 120, f"only {n_ok} keys passed — drive died early?\n" + \
        proc.stdout[-2000:]


# Spark emits NO rows for rollup/cube/grouping-sets over empty input;
# the SQL standard (DuckDB) still emits the () grand-total group. This
# engine keeps native Spark semantics (adjudicated; see c9_rollup's
# docstring). MISMATCH only — these keys still must RUN clean.
EMPTY_INPUT_SEAMS = {"c9_rollup", "c9_cube", "c34_grouping_sets"}


def test_empty_corpus_oracle_sweep(tmp_path):
    """Zero-row corpus (scripts/make_empty_corpus.py): every key must
    produce its correct empty/zero answer, never a driver-side crash.
    This is the routine 100 TB edge — an empty partition of a
    date-partitioned table, a filter selecting an empty month, a
    backfill from nothing. First run of this sweep found four crash
    classes: rng.choice on an empty k-means sample (f21/f28),
    float(None) from a SUM-over-empty scalar collect (f29), and
    IDF.fit raising on an empty dataset (f19)."""
    corpus = str(tmp_path / "empty_sf")
    gen = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts",
                                      "make_empty_corpus.py"), corpus],
        capture_output=True, text=True, timeout=120, cwd=REPO,
    )
    assert gen.returncode == 0, gen.stdout + gen.stderr

    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "drive_contract.py"),
         corpus],
        capture_output=True, text=True, timeout=900, cwd=REPO,
        # pin the production posture explicitly: a stray
        # SPARK_GRAFT_ANSI=true in the developer's shell (the sibling
        # posture sweep encourages exporting it) must not silently
        # re-point this gate at a session the product never runs
        env={**os.environ, "SPARK_GRAFT_ANSI": "false"},
    )
    hard_fail = {
        m.group(1)
        for m in re.finditer(
            r"^  (\S+): (?:SPARK ERROR|ORACLE ERROR)", proc.stdout, re.M)
    }
    mismatch = {
        m.group(1)
        for m in re.finditer(r"^  (\S+): MISMATCH", proc.stdout, re.M)
    }
    unexpected = hard_fail | (mismatch - EMPTY_INPUT_SEAMS)
    assert not unexpected, (
        f"empty-corpus divergence beyond the adjudicated grouping "
        f"seams: {sorted(unexpected)}\n"
        + "\n".join(line for line in proc.stdout.splitlines()
                    if any(k in line for k in unexpected))[:3000]
    )
    n_ran = len(re.findall(r": (?:OK|rows-only)", proc.stdout))
    assert n_ran >= 120, f"only {n_ran} keys ran — drive died early?\n" + \
        proc.stdout[-2000:]

"""Adversarial oracle-differential gate (r6): every oracle-paired key
runs on a HOSTILE corpus (scripts/make_edge_corpus.py — nulls in every
nullable column, duplicate/orphan keys, empty/unicode/whitespace
strings, extreme dates, malformed JSON, null embeddings) and must agree
with DuckDB exactly, except two adjudicated inherent engine seams.

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

Allowlisted inherent seam (adjudicated non-bug, documented in the
query docstring + SWEEPS_r06.md):
- c20_string_funcs: levenshtein is codepoint-based in Spark,
  byte-based in DuckDB; visible only on multibyte input.

(b3's float-sum rounding boundary was initially allowlisted too, then
ELIMINATED by accumulating the money sum in exact decimal on both
sides — the correct ledger posture regardless.)
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

INHERENT_SEAMS = {"c20_string_funcs"}


def test_edge_corpus_oracle_sweep(tmp_path):
    corpus = str(tmp_path / "edge_sf")
    gen = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "make_edge_corpus.py"),
         corpus],
        capture_output=True, text=True, timeout=120,
    )
    assert gen.returncode == 0, gen.stdout + gen.stderr

    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "drive_contract.py"),
         corpus],
        capture_output=True, text=True, timeout=900,
    )
    failing = {
        m.group(1)
        for m in re.finditer(
            r"^  (\S+): (?:MISMATCH|SPARK ERROR|ORACLE ERROR)",
            proc.stdout, re.M)
    }
    unexpected = failing - INHERENT_SEAMS
    assert not unexpected, (
        f"edge-corpus divergence beyond the adjudicated seams: "
        f"{sorted(unexpected)}\n"
        + "\n".join(line for line in proc.stdout.splitlines()
                    if any(k in line for k in unexpected))[:3000]
    )
    # the sweep must actually have run the surface, not die early
    n_ok = len(re.findall(r": OK ", proc.stdout))
    assert n_ok >= 120, f"only {n_ok} keys passed — drive died early?\n" + \
        proc.stdout[-2000:]

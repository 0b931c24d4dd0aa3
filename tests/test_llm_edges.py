"""Adversarial text-edge suite for the F-group LLM-pipeline operators
(VERDICT r4 ask 4).

The driver corpus is synthetic single-space ASCII; the tokenizers,
shinglers, and regex token classes in queries/llm.py had never seen
unicode, empty strings, null text, a 1 MB single-token document, or
whitespace-only text. This suite builds a small hostile documents table
covering those and drives F1/F2/F6-F11/F24-F27 end-to-end over it,
asserting no exceptions AND the operators' semantic invariants (dedup
soundness, first-occurrence uniqueness, chunk reassembly identity) —
not just survival."""

from __future__ import annotations

import math
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from nyc_taxi_data_engineering_project_spark.queries import llm

BIG = "x" * 1_000_000  # one 1 MB token, no whitespace
SHARED_PASSAGE = " ".join(f"w{i}" for i in range(16))  # one f26 block
SHARED_LINE = " ".join(f"b{i}" for i in range(8))      # one f25 block
BENCH_TEXT = "  The Benchmark Question ABOUT physics  "  # trim/lower seam

_DOCS = [
    # (doc_id, text) — lang/source/n_chars filled mechanically below
    (0, None),                                     # null text
    (1, ""),                                       # empty string
    (2, "   "),                                    # whitespace-only
    (3, "héllo wörld 你好 世界 🙂 🙂 مرحبا بالعالم"),   # unicode soup
    (4, "café cafè café"),         # combining vs precomposed
    (5, BIG),                                      # 1 MB single token
    (6, "the quick brown fox jumps over the lazy dog again and again"),
    (7, "the quick brown fox jumps over the lazy dog again and again"),
    (8, "the quick brown fox jumps over the lazy dog again and"),
    (9, "!!! ??? ... ,,, ;;;"),                    # punctuation only
    (10, "a"),                                     # single char
    # 16-token unique prefixes keep the shared spans on both the 8- and
    # 16-token block grids, so f25/f26 actually see recurring blocks
    (11, " ".join(f"p{i}" for i in range(16)) + " " + SHARED_PASSAGE
         + " " + SHARED_LINE + " " + " ".join(f"t{i}" for i in range(8))),
    (12, " ".join(f"q{i}" for i in range(16)) + " " + SHARED_PASSAGE
         + " " + SHARED_LINE + " " + " ".join(f"u{i}" for i in range(8))),
    (13, "line1\nline2\ttab  doublespace end"),    # non-space whitespace
    (14, "reach me at alice.smith@corp.example or visit"
         " https://site.example/path?q=1 thanks"),  # organic PII
    (20, BENCH_TEXT.strip().lower()),              # contaminated twin of 97
    (21, " ".join(f"tok{i}" for i in range(100))), # plain long-ish doc
    (97, BENCH_TEXT),                              # planted benchmark doc
]


@pytest.fixture(scope="module")
def edge_sf_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("edge_sf"))
    ids = [i for i, _ in _DOCS]
    texts = [t for _, t in _DOCS]
    t = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(ids), pa.string()),
            "source": pa.array(["edge"] * len(ids), pa.string()),
            "n_chars": pa.array(
                [len(t) if t is not None else None for t in texts], pa.int64()
            ),
        }
    )
    pq.write_table(t, os.path.join(d, "documents.parquet"))
    return d


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_f1_exact_dedup_edges(spark, edge_sf_dir):
    """Soundness: hashing partitions the corpus — copy counts sum to the
    corpus size, the planted exact-dup pair collapses to one group
    keeping the min id, and null text forms its own (null-hash) group."""
    out = _rows(llm.f1_exact_dedup(spark, edge_sf_dir))
    assert sum(n for _, _, n in out) == len(_DOCS)
    dup_groups = {keep: n for _, keep, n in out if n > 1}
    assert dup_groups == {6: 2}  # docs 6/7 identical; min id kept
    assert sum(1 for h, _, _ in out if h is None) == 1  # the null-text doc


def test_f2_minhash_soundness_edges(spark, edge_sf_dir):
    """Every emitted pair must be a true >= 0.6 Jaccard pair of 3-gram
    shingle sets (soundness gate — recall is corpus-dependent and not
    asserted here). Exercises the shingler over unicode, the 1 MB token,
    and the planted-mutation path (docs 0-19 with >= 3 tokens)."""
    out = llm.f2_minhash_dedup(spark, edge_sf_dir)
    pairs = _rows(out)

    def grams(text):
        toks = text.split(" ")
        return {
            " ".join(toks[i:i + 3]) for i in range(len(toks) - 2)
        } if len(toks) >= 3 else set()

    texts = {i: t for i, t in _DOCS}
    offset = max(texts) + 1
    for i, t in list(texts.items()):
        if i < 20 and t is not None and len(t.split(" ")) >= 3:
            texts[i + offset] = " ".join(t.split(" ")[:-2])
    for doc_a, doc_b, jac in pairs:
        ga, gb = grams(texts[doc_a]), grams(texts[doc_b])
        exact = len(ga & gb) / len(ga | gb)
        assert exact >= 0.6, (doc_a, doc_b, exact)
        assert math.isclose(jac, exact, abs_tol=1e-4)  # f2 reports 4 dp
    # the exact-dup pair 6/7 is an obligatory catch: identical shingle
    # sets collide in every band, so missing it would be a bug, not
    # banding recall
    assert any({a, b} == {6, 7} for a, b, _ in pairs)


def test_f6_f7_f8_f9_no_rows_lost(spark, edge_sf_dir):
    """The per-doc profile ops must emit exactly one row per document —
    including null/empty/whitespace/unicode — and agree with Python on
    the hostile rows they were never tested on."""
    f6 = {r[0]: r for r in _rows(llm.f6_text_stats(spark, edge_sf_dir))}
    f7 = _rows(llm.f7_lang_id(spark, edge_sf_dir))
    f8 = {r[0]: r[1] for r in _rows(llm.f8_fingerprint(spark, edge_sf_dir))}
    f9 = {r[0]: r for r in _rows(llm.f9_token_count(spark, edge_sf_dir))}
    for out in (f6, f7, f8, f9):
        assert len(out) == len(_DOCS)
    # n_chars counts CODEPOINTS (python len), not bytes, on unicode
    assert f6[3][1] == len(dict(_DOCS)[3])
    assert f6[5][1] == 1_000_000
    # 1 MB doc: one whitespace token, one alpha run, no digits
    assert f9[5][1:] == (1, 1, 0)
    # whitespace-only: split(" ") yields 4 empty tokens; no alpha/num
    assert f9[2][1:] == (2, 0, 0)  # \s+ split → ['', ''] per regex
    # null text: fingerprint of null is null, not a crash
    assert f8[0] is None
    # exact dups share a bag fingerprint; the near-dup (dropped suffix
    # "again and" keeps the token BAG minus nothing new) may too — only
    # assert the exact pair
    assert f8[6] == f8[7]


def test_f10_f11_edges_run_sound(spark, edge_sf_dir):
    """f10: one signature per doc with >= 1 explodable token; f11: the
    adjacent-id pairs both having >= 3 tokens, with exact Jaccard."""
    sims = _rows(llm.f10_simhash(spark, edge_sf_dir))
    ids = sorted(i for i, _ in sims)
    # null text drops (explode of null); everything else signs
    assert ids == sorted(i for i, t in _DOCS if t is not None)
    assert len(set(i for i, _ in sims)) == len(sims)
    # identical docs → identical simhash
    by_id = dict(sims)
    assert by_id[6] == by_id[7]

    jac = {(a, b): j for a, b, j in _rows(llm.f11_ngram_jaccard(spark, edge_sf_dir))}
    # docs 6,7 identical and adjacent → jaccard exactly 1
    assert jac[(6, 7)] == 1.0
    # docs 7,8: 8 shared grams of 9∪8=9 distinct... compute in python
    texts = dict(_DOCS)

    def grams(t):
        toks = t.split(" ")
        return {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}

    g7, g8 = grams(texts[7]), grams(texts[8])
    assert jac[(7, 8)] == round(len(g7 & g8) / len(g7 | g8), 6)


def test_f24_decontaminate_edges(spark, edge_sf_dir):
    """The planted benchmark doc (97) and its trim/lower-normalized twin
    (20) must BOTH drop; the null-text doc must survive (null fingerprint
    never equals anything, including itself)."""
    kept = {r[0] for r in _rows(llm.f24_decontaminate(spark, edge_sf_dir))}
    assert 97 not in kept and 20 not in kept
    assert 0 in kept
    assert kept == {i for i, _ in _DOCS} - {97, 20}


def test_f25_boilerplate_edges(spark, edge_sf_dir):
    """Any 8-word block recurring across >= 2 docs is removed EVERYWHERE;
    surviving clean_text blocks are unique to one document (plus the
    degenerate duplicate-doc pair, whose every block recurs)."""
    out = {r[0]: r for r in _rows(llm.f25_boilerplate_removal(spark, edge_sf_dir))}
    # docs 6 and 7 are identical → all their blocks recur → fully removed
    for d in (6, 7):
        assert out[d][2] == out[d][1]  # n_removed == n_blocks
        assert out[d][3] == ""
    # the shared 16-word passage spans two 8-word blocks and the shared
    # line is one; all three recur in docs 11 and 12 and must be gone
    # from BOTH clean texts (recurrence removes every occurrence)
    for d in (11, 12):
        for blk in (SHARED_PASSAGE.split(" ")[:8],
                    SHARED_PASSAGE.split(" ")[8:],
                    SHARED_LINE.split(" ")):
            assert " ".join(blk) not in out[d][3]
        assert out[d][2] == 3  # exactly those three blocks removed
    # unique docs keep everything, reassembled in order
    assert out[21][3] == dict(_DOCS)[21]
    assert out[5][3] == BIG


def test_f26_passage_dedup_first_occurrence_unique(spark, edge_sf_dir):
    """Global invariant: across the whole corpus each distinct 16-word
    block survives exactly once (its first (doc_id, pos) occurrence)."""
    rows = _rows(llm.f26_passage_dedup(spark, edge_sf_dir))
    out = {r[0]: r for r in rows}
    texts = dict(_DOCS)

    def blocks(t):
        toks = t.split(" ")
        return [
            " ".join(toks[s:s + 16]) for s in range(0, max(len(toks), 1), 16)
        ]

    n_distinct = len({b for _, t in _DOCS if t is not None for b in blocks(t)})
    survivors = sum(r[1] - r[2] for r in rows if r[1] is not None)
    assert survivors == n_distinct
    # doc 7 (full dup of 6) contributes nothing; doc 6 keeps everything
    assert out[7][3] == "" and out[6][3] == texts[6]
    # doc 12's copy of the shared passage drops, doc 11's survives
    assert SHARED_PASSAGE in out[11][3]
    assert SHARED_PASSAGE not in out[12][3]


def test_f27_chunk_reassembly_identity(spark, edge_sf_dir):
    """Sliding 32/24 chunks must reassemble to the original token stream:
    chunk 0 verbatim, then each subsequent chunk minus its 8-token
    overlap — for EVERY non-null doc including the 1 MB token and
    unicode. This is the lossless-coverage contract of RAG chunking."""
    rows = _rows(llm.f27_chunk_rag(spark, edge_sf_dir))
    by_doc = {}
    for doc_id, chunk_id, chunk_text, n_tokens in rows:
        by_doc.setdefault(doc_id, []).append((chunk_id, chunk_text, n_tokens))
    for doc_id, text in _DOCS:
        if text is None:
            continue
        toks = text.split(" ")
        chunks = sorted(by_doc[doc_id])
        first = chunks[0][1]
        if first == "":
            # '' splits to [''] — the empty-text degenerate case, once:
            # an empty first chunk rebuilds [""] only if the doc IS ""
            rebuilt = [""] if toks == [""] else []
        else:
            rebuilt = first.split(" ")
        for _, ctext, _ in chunks[1:]:
            ctoks = ctext.split(" ")
            rebuilt.extend(ctoks[32 - 24:] if len(ctoks) > 8 else [])
        assert rebuilt == toks, f"doc {doc_id} reassembly mismatch"
        # n_tokens bookkeeping agrees with the chunk text
        for _, ctext, n in chunks:
            if ctext:
                assert len(ctext.split(" ")) == n


# ---- second batch: the remaining text-consuming F ops over the same
# hostile corpus (beyond the r4 verdict's asked set — cheap insurance)

def test_f15_f16_f17_split_pack_filter_edges(spark, edge_sf_dir):
    """f15: every doc lands in exactly one split and exact dups share it
    (content-hash property — the no-leakage guarantee). f16: pack_id
    reproduces the cumulative-sum identity over Spark's own token
    counts. f17: the keep flag is exactly the AND of its reason flags."""
    split = {r[0]: r[2] for r in _rows(llm.f15_train_val_split(spark, edge_sf_dir))}
    assert len(split) == len(_DOCS)
    assert set(split.values()) <= {"train", "val", "test"}
    assert split[6] == split[7]  # identical text → identical split

    packs = sorted(_rows(llm.f16_pack_sequences(spark, edge_sf_dir)))
    assert len(packs) == len(_DOCS)
    cum = 0
    for doc_id, lang, n_tokens, pack_id in packs:  # one lang, id-ordered
        if n_tokens is None:
            # null text (fx.nsize): no tokens, no pack — and it must NOT
            # shift any later document's pack (the legacy -1 did)
            assert pack_id is None, (doc_id, pack_id)
            continue
        assert pack_id == cum // 512, (doc_id, cum, pack_id)
        cum += n_tokens

    f17 = _rows(llm.f17_quality_filter(spark, edge_sf_dir))
    assert len(f17) == len(_DOCS)
    for doc_id, ok_l, ok_d, ok_t, keep in f17:
        if keep is not None:
            assert keep == (ok_l and ok_d and ok_t)
    keep_by_id = {r[0]: r[4] for r in f17}
    assert keep_by_id[5] == 0  # the 1 MB single-token doc must not pass


def test_f18_pii_scrub_edges(spark, edge_sf_dir):
    """Planted PII (1 email + 1 URL per doc) plus doc 14's organic pair
    must both be counted; null text propagates to null, not a crash."""
    out = {r[0]: r for r in _rows(llm.f18_pii_scrub(spark, edge_sf_dir))}
    assert len(out) == len(_DOCS)
    assert out[21][1:3] == (1, 1)   # plain doc: planted only
    assert out[14][1:3] == (2, 2)   # organic + planted
    assert out[0][1] is None and out[0][3] is None  # null text → null


def test_f22_f23_sample_repetition_edges(spark, edge_sf_dir):
    """f22: exactly ceil(10%) of the single 'en' stratum, drawn from the
    corpus. f23: exact repetition stats on the degenerate docs."""
    nonnull_ids = {i for i, t in _DOCS if t is not None}
    sampled = _rows(llm.f22_stratified_sample(spark, edge_sf_dir))
    # null-text docs are excluded from universe AND stratum total
    assert len(sampled) == -(-len(nonnull_ids) // 10)  # ceil
    assert {r[0] for r in sampled} <= nonnull_ids

    f23 = {r[0]: r[1:] for r in _rows(llm.f23_repetition_ratio(spark, edge_sf_dir))}
    assert set(f23) == {i for i, t in _DOCS if t is not None}
    assert f23[5] == (1, 0.0, 1.0)   # 1 MB single token
    assert f23[2] == (4, 0.75, 1.0)  # "   " → 4 empty tokens, 1 distinct


def test_f29_f30_lm_decontaminate_edges(spark, edge_sf_dir):
    """f29: cross-entropy is positive and finite for every doc with
    tokens. f30: the planted eval set (doc_id%89==0) is the NULL-text
    doc here, so the gram set is empty and nothing may be flagged —
    the null-benchmark degenerate case must behave as no-op."""
    f29 = _rows(llm.f29_unigram_logprob(spark, edge_sf_dir))
    assert {r[0] for r in f29} == {i for i, t in _DOCS if t is not None}
    for _, xent in f29:
        assert xent is not None and xent >= 0 and math.isfinite(xent)

    f30 = _rows(llm.f30_ngram_decontaminate(spark, edge_sf_dir))
    for _doc, _n_grams, n_hit, contaminated in [
        (r[0], r[1], r[2], r[3]) if len(r) == 4 else (r[0], None, None, r[-1])
        for r in f30
    ]:
        assert not contaminated


def test_f32_f33_keepbest_quality_edges(spark, edge_sf_dir):
    """f32: groups partition the corpus; the dup pair keeps the packed
    arg-min winner (equal length → min doc_id). f33: the expectation
    report counts exactly the planted violations (one null text) and
    nothing else."""
    f32 = _rows(llm.f32_keep_best_dedup(spark, edge_sf_dir))
    assert sum(r[1] for r in f32) == len(_DOCS)
    # lower(trim()) normalization collapses three groups, each keeping
    # the LONGEST raw variant (ties → min doc_id):
    #   6/7 identical → 6; bench 97 vs its stripped twin 20 → 97
    #   (97's raw text is longer); "" (1) vs "   " (2) → 2 (3 chars > 0)
    dups = sorted((r[2], r[1]) for r in f32 if r[1] > 1)
    assert dups == [(2, 2), (6, 2), (97, 2)]

    f33 = {r[0]: r[1] for r in _rows(llm.f33_data_quality(spark, edge_sf_dir))}
    assert f33 == {
        "null_text": 1, "bad_lang": 0, "nchars_mismatch": 0, "dup_doc_id": 0,
    }

"""Group E query keys — the UDF/UDAF/UDTF surface (SURVEY.md §2 group E).

The reference's transformation logic is driver-side pandas
(``python/ingest_data.py:110-149`` is morally a map-partitions function);
here the same shapes run distributed. Engine guidance (SURVEY.md §4):
UDFs are the slow path — every key below that *can* be a built-in
expression is also written as one elsewhere; these keys exist to prove the
extension surface, with Arrow-vectorized (pandas) variants preferred over
row-at-a-time everywhere it matters.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from .. import fx
from ..catalog import table
from ..registry import query


@query(
    "e1_py_udf",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_discount IS NULL THEN NULL
                WHEN l_discount < 0.03 THEN 'low'
                WHEN l_discount < 0.07 THEN 'mid'
                ELSE 'high' END AS disc_band
    FROM lineitem
    """,
)
def e1_py_udf(spark, sf_dir):
    """E1: row-at-a-time Python UDF (banding). Kept deliberately trivial:
    this is the ~100× slower path vs the equivalent CASE expression
    (b5) — present for surface parity, not for use in hot paths.

    The oracle's CASE carries an explicit IS NULL branch (r6 edge
    finding): a bare CASE's ELSE swallows NULL — ``NULL < 0.03`` is
    unknown, so every null-discount row fell to 'high' in SQL while the
    null-safe UDF returned NULL. The classic silent-ELSE trap; the
    explicit branch states the intended three-valued semantics."""

    @F.udf("string")
    def band(d: float) -> str:
        if d is None:  # NULL-safe like the CASE expression twin
            return None
        if d < 0.03:
            return "low"
        if d < 0.07:
            return "mid"
        return "high"

    return table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", band("l_discount").alias("disc_band")
    )


@query(
    "e2_pandas_udf",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS revenue
    FROM lineitem
    """,
)
def e2_pandas_udf(spark, sf_dir):
    """E2: Arrow-vectorized Series→Series pandas UDF. numpy double
    arithmetic is IEEE-identical to the JVM's, so the unrounded product
    matches the oracle bit-for-bit."""

    @F.pandas_udf("double")
    def revenue(price: pd.Series, disc: pd.Series) -> pd.Series:
        return price * (1.0 - disc)

    return table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber",
        revenue("l_extendedprice", "l_discount").alias("revenue"),
    )


@query(
    "e3_apply_in_pandas",
    oracle="""
    SELECT o_orderkey AS orderkey, o_custkey AS custkey,
           FLOOR((o_totalprice - AVG(o_totalprice) OVER w)
                 / (CASE WHEN stddev_samp(o_totalprice) OVER w = 0 THEN NULL
                         ELSE stddev_samp(o_totalprice) OVER w END)
                 * 10000.0 + 0.5) / 10000.0 AS price_z
    FROM orders WHERE o_custkey < 500
    WINDOW w AS (PARTITION BY o_custkey)
    """,
)
def e3_apply_in_pandas(spark, sf_dir):
    """E3: grouped-map applyInPandas — per-customer z-score of order
    totals. SQL-expressible (the oracle uses window aggregates), which is
    exactly the point: grouped-map is for logic that is NOT expressible;
    the z-score form keeps it oracle-checkable. Scoped to a bounded
    customer segment: grouped-map pays a per-group Python round-trip, so
    running it over 15k ten-row groups is the anti-pattern the engine
    docs warn about — the realistic use is an expensive custom kernel on
    a targeted slice, with window functions (the oracle's own form)
    serving the full-table case."""

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["o_totalprice"].mean()
        sd = pdf["o_totalprice"].std(ddof=1)
        z = (pdf["o_totalprice"] - mu) / sd if sd and sd > 0 else pd.Series(
            [None] * len(pdf), dtype="float64"
        )
        import numpy as np

        return pd.DataFrame(
            {
                "orderkey": pdf["o_orderkey"],
                "custkey": pdf["o_custkey"],
                "price_z": np.floor(z * 10000.0 + 0.5) / 10000.0,
            }
        )

    # r14 optimization (guide §4.1 + §2.5): project to the three columns
    # the kernel reads BEFORE the Python boundary (grouped-map is opaque
    # — Spark would otherwise ship every column through Arrow), and pin
    # the grouped-map exchange at core-scaled width. Without the
    # explicit repartition, AQE's parallelism-first coalescing folds
    # this byte-tiny exchange into ONE partition and every group runs
    # serially through a single Python worker (measured at sf0.1: one
    # 1.9-2.4 s task); the same hash partitioning satisfies the
    # grouped-map's required distribution, so no second exchange
    # appears. defaultParallelism tracks the driver's lower-core runs.
    return (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 500)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .repartition(spark.sparkContext.defaultParallelism, "o_custkey")
        .groupBy("o_custkey")
        .applyInPandas(
            zscore, schema="orderkey long, custkey long, price_z double"
        )
    )


@query(
    "e4_udaf",
    oracle="""
    SELECT l_returnflag AS returnflag,
           FLOOR(SUM(l_extendedprice * l_quantity) / SUM(l_quantity)
                 * 10000.0 + 0.5) / 10000.0 AS wavg_price
    FROM lineitem GROUP BY 1
    """,
)
def e4_udaf(spark, sf_dir):
    """E4: grouped-agg pandas UDF (a UDAF) — quantity-weighted mean price.
    Arrow-batched reduction per group; for genuine scale an algebraic
    (partial+merge) form via two built-in sums is preferred — shown in the
    oracle itself."""

    @F.pandas_udf("double")
    def wavg(price: pd.Series, qty: pd.Series) -> float:
        import numpy as np

        return float(
            np.floor((price * qty).sum() / qty.sum() * 10000.0 + 0.5) / 10000.0
        )

    return (
        table(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_returnflag").alias("returnflag"))
        .agg(wavg("l_extendedprice", "l_quantity").alias("wavg_price"))
    )


@query(
    "e5_udtf",
    oracle="""
    SELECT doc_id, pos, string_split(text, ' ')[pos] AS token
    FROM (
        SELECT doc_id, text,
               CAST(unnest(generate_series(1, len(string_split(text, ' '))))
                    AS INTEGER) AS pos
        FROM documents WHERE doc_id < 50
    )
    """,
)
def e5_udtf(spark, sf_dir):
    """E5: Python UDTF — one input row → N output rows (tokenizer with
    positions), consumed via LATERAL join. The built-in equivalent is
    posexplode(split(...)); the UDTF form proves the table-function
    surface."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, token string")
    class Tokenize:
        def eval(self, text: str):
            if text is None:  # LATERAL over a null doc = zero rows,
                return  # matching generate_series(1, NULL) in the oracle
            for i, tok in enumerate(text.split(" ")):
                yield i + 1, tok

    spark.udtf.register("tokenize_udtf", Tokenize)
    table(spark, sf_dir, "documents").createOrReplaceTempView("docs_for_udtf")
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.token
        FROM docs_for_udtf d, LATERAL tokenize_udtf(d.text) t
        WHERE d.doc_id < 50
        """
    )


@query(
    "e6_map_in_pandas",
    oracle="""
    SELECT doc_id, length(text) AS computed_chars,
           CAST(length(text) = n_chars AS INTEGER) AS len_matches,
           upper(lang) AS lang_uc
    FROM documents
    """,
)
def e6_map_in_pandas(spark, sf_dir):
    """E6: mapInPandas — per-partition Arrow-batch iterator, the idiom for
    porting the reference's ``_map_columns`` batch logic when column
    expressions don't suffice (SURVEY.md §2 E6). Batches stream through
    without materializing a partition at once."""

    def normalize(batches):
        for pdf in batches:
            # null-safe like the SQL it twins (r6 edge finding): null
            # text/lang/n_chars must yield NULL, but pandas renders
            # string nulls as NaN — a plain astype("int64") throws and
            # NaN == x is False where SQL says NULL. Nullable extension
            # dtypes + explicit masks restore three-valued logic.
            tl = pdf["text"].str.len()
            eq = pd.Series((tl == pdf["n_chars"]).astype("int32"),
                           dtype="Int32").mask(tl.isna()
                                               | pdf["n_chars"].isna())
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "computed_chars": tl.astype("Int64"),
                    "len_matches": eq,
                    "lang_uc": pdf["lang"].str.upper()
                    .where(pdf["lang"].notna(), None),
                }
            )
            yield out

    return table(spark, sf_dir, "documents").mapInPandas(
        normalize,
        schema="doc_id long, computed_chars long, len_matches int, "
               "lang_uc string",
    )

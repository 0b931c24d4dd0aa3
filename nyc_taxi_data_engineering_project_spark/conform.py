"""Schema conformance layer — the reference's one nontrivial algorithm
(``python/ingest_data.py:110-149``, ``_map_columns``) re-expressed as pure
DataFrame operations (SURVEY.md §1.3, §2 rows A4-A9).

Semantics preserved exactly:

- case-insensitive, first-match-wins resolution of each contract column
  from an ordered candidate list (``python/ingest_data.py:117-124``);
- a contract column with no matching source becomes an all-null column of
  the contract type (``:124``);
- timestamp columns parse tolerantly — unparseable strings become null,
  never errors (``pd.to_datetime(errors="coerce")``, ``:128-129``) — via
  ``try_to_timestamp`` / null-on-failure casts (ANSI off);
- rows with null ``pickup_datetime`` are dropped AFTER the coerce
  (``:147-148``) — order matters and is kept.

Everything is column-level expression logic: zero shuffles, fully
pipelined into the scan, whole-stage-codegen'd. At 100 TB this layer adds
no stage boundary — it fuses with the read and the write repartition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F, types as T

from .schemas import CANDIDATES, TRIPS_SCHEMA, ZONES_RENAMES, ZONES_SCHEMA


def _resolve(df_columns: list[str], candidates: list[str]) -> str | None:
    """First candidate present in ``df_columns`` (case-insensitive), the
    ``pick()`` of ``python/ingest_data.py:119-124``."""
    # later columns overwrite earlier ones so the LAST duplicate-cased
    # column wins — the dict-comprehension tie-break of the reference's
    # src_cols index (python/ingest_data.py:117)
    index = {c.lower(): c for c in df_columns}
    for cand in candidates:
        hit = index.get(cand.lower())
        if hit is not None:
            return hit
    return None


def _conformed_column(df: DataFrame, src: str | None,
                      dtype: T.DataType) -> Column:
    """Cast/parse a resolved source column to the contract type; absent
    source → typed null literal (A7)."""
    if src is None:
        return F.lit(None).cast(dtype)
    col = F.col(src)
    src_type = df.schema[src].dataType
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)) and isinstance(
        src_type, T.StringType
    ):
        # tolerant parse (A6): unparseable strings null out instead of
        # failing the job — pd.to_datetime(errors="coerce") parity
        return F.try_to_timestamp(col).cast(dtype)
    # try_cast, not cast: the coerce-to-null contract must hold on ANY
    # session — plain cast under Spark 4's default ANSI mode throws on
    # the first malformed value instead of nulling it
    return col.try_cast(dtype)


def _dedupe_case_collisions(df: DataFrame) -> DataFrame:
    """Positionally rename all but the LAST of any case-duplicate column
    set (``VendorID`` + ``vendorid``) before name-based resolution:
    selecting either name with case-insensitive analysis would raise
    AMBIGUOUS_REFERENCE, and positional ``toDF`` is the only
    rename that can separate them. Implements the documented last-wins
    tie-break for real."""
    last = {c.lower(): i for i, c in enumerate(df.columns)}
    new = [
        c if last[c.lower()] == i else f"{c}__shadowed{i}"
        for i, c in enumerate(df.columns)
    ]
    return df.toDF(*new) if new != df.columns else df


def conform_trips(df: DataFrame,
                  drop_null_pickup: bool = True) -> DataFrame:
    """Normalize any green/yellow/pre-normalized trips frame to the
    TRIPS_SCHEMA contract (A4-A9). ``drop_null_pickup`` applies the A9
    filter after the tolerant parse, matching reference order."""
    df = _dedupe_case_collisions(df)
    cols = []
    for field in TRIPS_SCHEMA.fields:
        src = _resolve(df.columns, CANDIDATES[field.name])
        cols.append(
            _conformed_column(df, src, field.dataType).alias(field.name)
        )
    out = df.select(*cols)
    if drop_null_pickup:
        out = out.filter(F.col("pickup_datetime").isNotNull())
    return out


def conform_zones(df: DataFrame) -> DataFrame:
    """Normalize the zones lookup (A3/A4/A8): case-insensitive rename to
    the contract + integer cast of the key (``python/ingest_data.py:96-102``).
    """
    cols = []
    for field in ZONES_SCHEMA.fields:
        src = _resolve(
            df.columns,
            [s for s, d in ZONES_RENAMES.items() if d == field.name]
            + [field.name],
        )
        cols.append(
            _conformed_column(df, src, field.dataType).alias(field.name)
        )
    return df.select(*cols)

"""Mergeable distinct-count sketches: the materialized-rollup pattern.

The reference's dialect family ``uniqState / uniqMerge`` (ClickHouse
aggregate-state combinators — SURVEY §2.9's approx-uniq row) exists
so a 100 TB table can be pre-aggregated ONCE into per-partition
sketch states and every later query answers by MERGING states
instead of rescanning raw rows. The SQL dialect already ships those
spellings with EXACT array-valued states (dialect/functions.py
-State/-Merge combinator algebra) — correct at sf-test sizes but
state grows with cardinality; this module is the bounded-size
counterpart for the 100 TB regime: This module re-expresses that
pattern Spark-first with the built-in Apache DataSketches HLL
aggregates (``hll_sketch_agg`` / ``hll_union_agg`` /
``hll_sketch_estimate`` — JVM-side, codegen'd, no UDF):

- ``hll_presketch``   — raw rows → one BINARY sketch per fine group
  (e.g. per day x lang). Run once per ingest batch; the output is
  thousands of rows where the input was billions.
- ``hll_rollup``      — sketch table → distinct-count estimates at
  any COARSER grouping (day x lang → lang, or the global total) by
  unioning states. Never touches raw data; cost is sketch-table
  sized. Empty ``group_cols`` gives the grand total as one row.

Mergeability does NOT compound error: the sketch hash stream is
deterministic (no RNG) and a union stays within the single sketch's
error bounds. It is, however, not bit-stable across PLANS — the
HLL_4 encoding's sparse→dense promotions and the union gadget's
internal representation depend on what each partial aggregate saw,
so re-partitioning the input (or merging fine sketches vs sketching
raw) moves the estimate by a few registers' worth, always inside
the envelope. Asserted in tests/test_sketches.py: repeatability for
a fixed plan, cross-partitioning and merged-vs-direct agreement
within 2%, and accuracy vs exact COUNT(DISTINCT) (lgConfigK=12 →
~1.6% relative standard error).

No DuckDB-oracle registry row: DuckDB's approx_count_distinct is a
different HLL implementation with different estimates, so the lane
is suite-verified (exact-merge identity + tolerance vs exact), the
same convention as the dialect's ``uniq`` tolerance lane.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_presketch(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """One HLL sketch of ``value_col``'s distinct set per fine group.

    Returns (group_cols..., sketch BINARY). ONE map-side-combinable
    aggregate: partial sketches build per task, the exchange carries
    one ~2^lg_k-byte state per (task, group), never raw values.
    """
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias("sketch")
    )


def hll_rollup(
    sketches: DataFrame,
    group_cols: Sequence[str],
    sketch_col: str = "sketch",
) -> DataFrame:
    """Distinct-count estimates at a coarser grouping, from sketches
    alone. ``group_cols`` must be a subset of the presketch keys;
    empty means the grand total (one row, key columns omitted).

    Returns (group_cols..., approx_distinct BIGINT).
    """
    merged = F.hll_union_agg(F.col(sketch_col), F.lit(True)).alias("_m")
    if group_cols:
        agg = sketches.groupBy(*group_cols).agg(merged)
    else:
        agg = sketches.agg(merged)
    return agg.select(
        *group_cols,
        F.hll_sketch_estimate(F.col("_m")).alias("approx_distinct"),
    )


def hll_estimate(
    sketches: DataFrame, sketch_col: str = "sketch"
) -> DataFrame:
    """Per-row estimates for an existing sketch table (no merge) —
    the fine-grained readout of a materialized sketch rollup."""
    return sketches.withColumn(
        "approx_distinct", F.hll_sketch_estimate(F.col(sketch_col))
    )

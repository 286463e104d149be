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


# ---------------------------------------------------------------------------
# Fixed-range histogram sketches (r9): the EXACTLY-mergeable companion
# to the HLL lane. An HLL union is estimate-grade and engine-specific;
# a fixed-bin histogram is a plain vector of longs — element-wise sums
# merge it losslessly, any engine replicates it bit-for-bit (full
# DuckDB oracle, t54), and it answers the distribution questions a
# corpus pipeline asks at 100 TB (token-length profiles per source,
# quality-score drift per ingest day) from a sketch table thousands of
# rows long instead of a raw rescan. Bucket boundaries are fixed at
# presketch time — the price of exactness (a KLL/t-digest adapts its
# boundaries but merges approximately and isn't engine-portable).
# ---------------------------------------------------------------------------


def hist_presketch(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    lo: float,
    hi: float,
    bins: int = 64,
) -> DataFrame:
    """One fixed-range histogram of ``value_col`` per fine group.

    Returns (group_cols..., hist array<long>) where ``hist`` has
    ``bins + 2`` buckets: [0] underflow (v < lo), [1..bins] the
    equal-width in-range buckets, [bins+1] overflow (v >= hi). NULL
    values are not counted. The bucket index is
    ``least(floor((v - lo) * bins / (hi - lo)), bins - 1) + 1`` —
    plain IEEE double arithmetic in a fixed operand order, so any
    engine computes the identical bucket for the identical value.

    Scale shape: ONE map-side-combinable count aggregate keyed
    (group, bucket) — the exchange carries at most
    groups x (bins + 2) rows — then a tiny per-group reassembly agg
    (≤ bins + 2 rows each) densifies the array.
    """
    if hi <= lo:
        raise ValueError(f"hist_presketch: hi {hi} must exceed lo {lo}")
    if bins < 1:
        raise ValueError("hist_presketch: bins must be >= 1")
    v = F.col(value_col).cast("double")
    idx = (
        F.when(v < F.lit(float(lo)), F.lit(0))
        .when(v >= F.lit(float(hi)), F.lit(bins + 1))
        .otherwise(
            F.least(
                F.floor(
                    (v - F.lit(float(lo)))
                    * F.lit(float(bins))
                    / F.lit(float(hi) - float(lo))
                ),
                F.lit(bins - 1).cast("bigint"),
            ).cast("int")
            + F.lit(1)
        )
    )
    counts = (
        df.filter(v.isNotNull())
        .groupBy(*group_cols, idx.alias("_b"))
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    assembled = counts.groupBy(*group_cols).agg(
        F.map_from_arrays(
            F.collect_list("_b"), F.collect_list("_c")
        ).alias("_m")
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(bins + 1)),
        lambda i: F.coalesce(F.element_at(F.col("_m"), i), F.lit(0).cast("bigint")),
    )
    return assembled.select(*group_cols, dense.alias("hist"))


def hist_rollup(
    sketches: DataFrame,
    group_cols: Sequence[str],
    hist_col: str = "hist",
) -> DataFrame:
    """Histograms at a coarser grouping by EXACT element-wise sums of
    fine-group sketches — never touches raw rows. ``group_cols`` must
    be a subset of the presketch keys; empty gives the grand total.

    Bounded state like the presketch: the sketch table explodes to
    (group, bucket, count) rows — (bins + 2) x fine-groups, still
    sketch-table-sized — partial-aggregates the sums, and reassembles.
    (A collect_list-of-arrays fold would hold every fine sketch of a
    group in one aggregation buffer; this shape never does.)
    """
    ex = sketches.select(
        *group_cols, F.posexplode(hist_col).alias("_b", "_c")
    )
    counts = ex.groupBy(*group_cols, "_b").agg(F.sum("_c").alias("_s"))
    assembled = counts.groupBy(*group_cols).agg(
        F.map_from_arrays(
            F.collect_list("_b"), F.collect_list("_s")
        ).alias("_m"),
        F.max("_b").alias("_hi"),
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.col("_hi")),
        lambda i: F.coalesce(F.element_at(F.col("_m"), i), F.lit(0).cast("bigint")),
    )
    return assembled.select(*group_cols, dense.alias(hist_col))


def hist_quantiles(
    sketches: DataFrame,
    probs: Sequence[float],
    lo: float,
    hi: float,
    hist_col: str = "hist",
) -> DataFrame:
    """Quantile ESTIMATES from a histogram sketch row: for each p in
    ``probs``, walk the cumulative counts to the bucket containing
    rank ceil(p·n) and interpolate linearly inside it (underflow and
    overflow buckets clamp to lo / hi — the honest answer a
    fixed-range sketch can give for mass outside its range). Error is
    bounded by one bucket width. Adds ``q_<p>`` double columns.

    Pure higher-order-function projection over the sketch table —
    zero shuffle; suite-verified against exact percentiles within a
    bucket width (the estimate is derived state; the STATE itself is
    what the t54 oracle checks exactly).
    """
    out = sketches
    n = F.aggregate(F.col(hist_col), F.lit(0).cast("bigint"), lambda a, x: a + x)
    for p in probs:
        if not 0.0 <= p <= 1.0:
            raise ValueError(f"hist_quantiles: p {p} outside [0, 1]")
        rank = F.greatest(
            F.ceil(F.lit(float(p)) * n).cast("bigint"), F.lit(1).cast("bigint")
        )
        # cumulative counts per bucket boundary; the target bucket is
        # the first whose cumulative count reaches the rank. O(bins²)
        # slice-sums, fine for a per-row array of ≤ a few hundred
        # buckets (a running-sum struct fold trips Spark's exact
        # zero-type check on the empty-array accumulator)
        cum = F.expr(
            f"transform(sequence(1, size({hist_col})), i -> "
            f"aggregate(slice({hist_col}, 1, i), CAST(0 AS BIGINT), "
            "(a, x) -> a + x))"
        )
        nb = F.size(F.col(hist_col)) - F.lit(2)  # in-range bucket count
        width = (F.lit(float(hi)) - F.lit(float(lo))) / nb
        b = F.array_position(
            F.transform(cum, lambda c: c >= rank), F.lit(True)
        )  # 1-based bucket holding the rank
        prev_cum = F.coalesce(
            F.element_at(cum, (b - 1).cast("int")), F.lit(0).cast("bigint")
        )
        in_bucket = F.element_at(F.col(hist_col), b.cast("int"))
        frac = (rank - prev_cum).cast("double") / in_bucket.cast("double")
        est = (
            F.when(b == 1, F.lit(float(lo)))  # underflow bucket: clamp
            .when(b == F.size(F.col(hist_col)), F.lit(float(hi)))
            .otherwise(
                F.lit(float(lo)) + ((b - 2).cast("double") + frac) * width
            )
        )
        out = out.withColumn(
            f"q_{str(p).replace('.', '_')}",
            F.when(n > 0, est),
        )
    return out


# ---------------------------------------------------------------------------
# Count-min sketches (r9): the FREQUENCY member of the sketch family
# (HLL = distinct counts, fixed-range histograms = value distribution,
# CMS = per-item occurrence counts). Cormode & Muthukrishnan 2005: a
# depth x width counter grid; each item increments one counter per
# row (independent hashes); a point query reads the MINIMUM of its
# depth counters — always >= the true count, over by at most
# ~2N/width with probability 1 - 2^-depth. Element-wise sums merge
# sketches EXACTLY (same hash functions), so per-ingest-batch
# presketches roll up to any coarser grouping without rescanning raw
# rows — "how often does this token/url/hash appear per source, this
# month" from a sketch table at 100 TB. hash_fn='md5' derives buckets
# from the top 60 bits of md5 (the dedup.py oracle lane), making the
# whole grid engine-portable and DuckDB-replicable (t55).
# ---------------------------------------------------------------------------


def _cms_bucket(value, j: int, width: int, hash_fn: str):
    """Bucket of ``value`` under hash row ``j``: pmod(hash(salted), w).
    The salt uses the package's \\x1f separator convention so values
    containing 'cms<j>' cannot collide with the salting itself."""
    salted = F.concat(value.cast("string"), F.lit(f"\x1fcms{j}"))
    if hash_fn == "md5":
        h = F.conv(F.substring(F.md5(salted), 1, 15), 16, 10).cast("long")
    else:
        h = F.xxhash64(salted)
    return F.pmod(h, F.lit(width))


def cms_presketch(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    width: int = 1024,
    depth: int = 4,
    hash_fn: str = "xxhash64",
    weight_col: str | None = None,
) -> DataFrame:
    """One count-min grid per fine group, flattened row-major:
    (group_cols..., cms array<long> of depth*width counters; counter
    for hash row j, bucket b sits at index j*width + b). NULL values
    are not counted.

    Same scale shape as hist_presketch: each row explodes to its
    ``depth`` counter indices, ONE map-side-combinable count
    aggregate keyed (group, index) — the exchange carries at most
    groups x depth x width rows — then a tiny per-group reassembly.

    ``weight_col`` (r9): each row adds its weight instead of 1 — so a
    caller can pre-aggregate occurrences to (group, value, count) and
    hash each DISTINCT value ``depth`` times instead of every
    occurrence (identical grids by the distributive law; the hash —
    the expensive part in the md5 oracle lane — then costs
    O(distinct), not O(rows)).
    """
    if width < 1 or depth < 1:
        raise ValueError("cms_presketch: width and depth must be >= 1")
    v = F.col(value_col)
    idxs = F.array(
        *[
            (_cms_bucket(v, j, width, hash_fn) + F.lit(j * width)).cast("int")
            for j in range(depth)
        ]
    )
    w = F.lit(1).cast("long") if weight_col is None else F.col(weight_col)
    counts = (
        df.filter(v.isNotNull())
        .select(*group_cols, w.alias("_w"), F.explode(idxs).alias("_b"))
        .groupBy(*group_cols, "_b")
        .agg(F.sum("_w").alias("_c"))
    )
    assembled = counts.groupBy(*group_cols).agg(
        F.map_from_arrays(
            F.collect_list("_b"), F.collect_list("_c")
        ).alias("_m")
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(depth * width - 1)),
        lambda i: F.coalesce(F.element_at(F.col("_m"), i), F.lit(0).cast("bigint")),
    )
    return assembled.select(*group_cols, dense.alias("cms"))


def cms_rollup(
    sketches: DataFrame,
    group_cols: Sequence[str],
    cms_col: str = "cms",
) -> DataFrame:
    """Count-min grids at a coarser grouping by EXACT element-wise
    sums — identical algebra to hist_rollup (both sketches are plain
    counter vectors), so it IS hist_rollup on the cms column."""
    return hist_rollup(sketches, group_cols, hist_col=cms_col)


def cms_estimate(
    sketches: DataFrame,
    probes: DataFrame,
    probe_col: str,
    width: int = 1024,
    depth: int = 4,
    hash_fn: str = "xxhash64",
    cms_col: str = "cms",
) -> DataFrame:
    """Point-frequency estimates: every sketch row x every probe value
    → (sketch group cols..., probe_col, est), est = min over the
    ``depth`` counters, always >= the true count. ``probes`` is a
    SMALL frame (broadcast); width/depth/hash_fn must match the
    presketch."""
    est = F.least(
        *[
            F.element_at(
                F.col(cms_col),
                (
                    _cms_bucket(F.col(probe_col), j, width, hash_fn)
                    + F.lit(j * width + 1)
                ).cast("int"),
            )
            for j in range(depth)
        ]
    )
    return sketches.crossJoin(F.broadcast(probes)).select(
        *[c for c in sketches.columns if c != cms_col],
        probe_col,
        est.alias("est"),
    )

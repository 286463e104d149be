"""Behavioral-analytics aggregates: retention, windowFunnel,
sequenceMatch (ClickHouse parametric-aggregate surface; delegated-only
in the reference — supported because chDB is ClickHouse, delegation
point main.py:190; no in-tree exercise, SURVEY.md §2 tier [D]).

Spark-first design notes (100 TB):

- ``retention`` is a pure composition of built-in conditional
  aggregates — one shuffle on the group key, map-side partial
  aggregation, whole-stage codegen end to end. No Python.
- ``window_funnel`` / ``sequence_match`` need an ordered per-key scan
  (inherently sequential within a key). They stay entirely JVM-side:
  non-matching events are dropped map-side, matching events are
  gathered per key with ``sort_array(collect_list(...))`` (one
  shuffle, map-side partial aggregation), and the sequential scan is
  a SQL higher-order ``aggregate`` fold over the sorted array —
  whole-stage codegen, no Python workers, no Arrow hop. Per-key
  state is O(events of one key that match any condition); keys
  parallelize across executors. An earlier ``applyInPandas``
  version was ~6× slower at sf0.1 purely on Python-worker and
  per-group pandas overhead.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def retention(
    df: DataFrame,
    key: str,
    conds: Sequence[Column],
) -> DataFrame:
    """CH ``retention(cond1, …, condN)`` grouped by *key*.

    Returns one row per key with integer columns ``r1..rN``:
    ``r1 = max(cond1)``; ``ri = max(cond1) AND max(condi)`` for i>1
    (CH semantics: the first condition gates all later ones).
    Pure built-in aggregates — map-side combine + one shuffle.
    """
    aggs = [
        F.max(F.when(c, F.lit(1)).otherwise(F.lit(0))).alias(f"__m{i}")
        for i, c in enumerate(conds, 1)
    ]
    out = df.groupBy(key).agg(*aggs)
    cols = [F.col(key)]
    for i in range(1, len(conds) + 1):
        if i == 1:
            cols.append(F.col("__m1").cast("int").alias("r1"))
        else:
            cols.append(
                (F.col("__m1").cast("boolean") & F.col(f"__m{i}").cast("boolean"))
                .cast("int")
                .alias(f"r{i}")
            )
    return out.select(*cols)


_NEG = "-1.0E308"  # -inf sentinel (double), "level not reached"


def _funnel_fold(n_conds: int, window: float | None, arr: str = "__evs") -> str:
    """SQL expression folding the sorted (ts, cond) array into the
    deepest funnel level reached.

    DP over events in ts order, state per level k = the maximum
    start-timestamp among chains cond_1→…→cond_k already completed
    (max start dominates: extension feasibility depends only on the
    window measured from the start). Strictly-increasing-ts chains
    are enforced by two-phase state: ``com`` is the state as of
    events with ts strictly below the current one (the only state
    extensions may read), ``pen`` additionally has the updates at
    the current ts; ``com`` catches up whenever ts advances. The
    fold is O(events × levels), entirely inside whole-stage codegen.
    """
    init = (
        f"struct(CAST({_NEG} AS DOUBLE) AS cur, "
        f"array_repeat(CAST({_NEG} AS DOUBLE), {n_conds}) AS com, "
        f"array_repeat(CAST({_NEG} AS DOUBLE), {n_conds}) AS pen)"
    )
    # state readable by extensions at the current event: committed
    # array if ts advanced, else the already-committed snapshot
    # (expression-inlined — SQL lambdas have no let-binding)
    com2 = "IF(e.ts > acc.cur, acc.pen, acc.com)"
    prev = f"element_at({com2}, e.lab - 1)"
    win_ok = (
        "true" if window is None
        else f"e.ts <= {prev} + CAST({window!r} AS DOUBLE)"
    )
    merge = f"""(acc, e) -> named_struct(
      'cur', IF(e.ts > acc.cur, e.ts, acc.cur),
      'com', {com2},
      'pen', CASE
        WHEN e.lab = 1 THEN
          transform(acc.pen, (v, i) -> IF(i = 0, greatest(v, e.ts), v))
        WHEN {prev} > {_NEG} / 10 AND {win_ok} THEN
          transform(acc.pen, (v, i) ->
            IF(i = e.lab - 1, greatest(v, {prev}), v))
        ELSE acc.pen
      END)"""
    finish = f"acc -> CAST(size(filter(acc.pen, v -> v > {_NEG} / 10)) AS INT)"
    return f"aggregate({arr}, {init}, {merge}, {finish})"


def _seq_fold(n_conds: int, arr: str = "__evs") -> str:
    """SQL expression folding the sorted (ts, cond) array into the
    sequenceMatch 0/1 flag — greedy earliest-match (optimal for
    subsequence existence): state = (level reached, ts of its last
    event); an event advances the level when it carries the next
    wanted label strictly later in time."""
    return f"""aggregate(
      {arr},
      struct(0 AS lvl, CAST({_NEG} AS DOUBLE) AS last),
      (acc, e) -> IF(
        acc.lvl < {n_conds} AND e.lab = acc.lvl + 1
          AND (acc.lvl = 0 OR e.ts > acc.last),
        named_struct('lvl', acc.lvl + 1, 'last', e.ts),
        acc),
      acc -> CAST(IF(acc.lvl = {n_conds}, 1, 0) AS INT))"""


def _label_expr(conds: Sequence[Column]) -> Column:
    """First matching condition index per event (1-based; 0 = matches
    none)."""
    lab = F.lit(0)
    for i in range(len(conds), 0, -1):
        lab = F.when(conds[i - 1], F.lit(i)).otherwise(lab)
    return lab


def _ts_double(df: DataFrame, ts_col: str) -> Column:
    """Epoch-seconds double image of the event timestamp.

    NTZ-proof: TIMESTAMP_NTZ can't numeric-cast directly (Spark 4);
    route timestamps through `timestamp` first (session TZ is UTC, so
    the epoch value matches CH/DuckDB semantics)."""
    ts_type = df.schema[ts_col].dataType
    ts_num = F.col(ts_col)
    if isinstance(ts_type, (T.TimestampType, T.TimestampNTZType)):
        ts_num = ts_num.cast("timestamp")
    return ts_num.cast("double")


def _with_cond_label(
    df: DataFrame, key: str, ts_col: str, conds: Sequence[Column]
) -> DataFrame:
    """Label each event with the first matching condition index
    (1-based; 0 = matches none) and drop non-matching events before
    the shuffle — the map-side filter is the big win at scale."""
    out = df.select(
        F.col(key),
        _ts_double(df, ts_col).alias(ts_col),
        _label_expr(conds).alias("__cond"),
    )
    return out.filter(F.col("__cond") > 0)


def window_funnel(
    df: DataFrame,
    key: str,
    ts_col: str,
    window_seconds: float,
    conds: Sequence[Column],
    out_name: str = "level",
) -> DataFrame:
    """CH ``windowFunnel(window)(ts, cond1, …, condN)`` grouped by
    *key*: the deepest prefix cond_1→…→cond_k completed as a strictly
    ts-increasing chain starting at a cond_1 event, with the whole
    chain inside ``window_seconds`` of that start."""
    ev = _with_cond_label(df, key, ts_col, conds)
    gathered = ev.groupBy(key).agg(
        F.expr(f"sort_array(collect_list(struct({ts_col} AS ts, __cond AS lab)))")
        .alias("__evs")
    )
    return gathered.select(
        key,
        F.expr(_funnel_fold(len(conds), window_seconds)).alias(out_name),
    )


def sequence_match(
    df: DataFrame,
    key: str,
    ts_col: str,
    conds: Sequence[Column],
    out_name: str = "matched",
) -> DataFrame:
    """CH ``sequenceMatch('(?1).*(?2)…')(ts, cond1, …)`` for the
    ordered-existence pattern family (conditions separated by ``.*``):
    1 when events matching cond_1 … cond_N occur in strict ts order.

    Greedy earliest-match fold (optimal for subsequence existence) —
    see ``_seq_fold``. Ties in ts sort adjacently and are rejected by
    the strict comparison, matching the unwindowed funnel semantics."""
    ev = _with_cond_label(df, key, ts_col, conds)
    gathered = ev.groupBy(key).agg(
        F.expr(f"sort_array(collect_list(struct({ts_col} AS ts, __cond AS lab)))")
        .alias("__evs")
    )
    return gathered.select(
        key, F.expr(_seq_fold(len(conds))).alias(out_name)
    )


def behavioral_profile(
    df: DataFrame,
    key: str,
    ts_col: str,
    retention_conds: Sequence[Column],
    funnel_window: float,
    funnel_conds: Sequence[Column],
    seq_conds: Sequence[Column],
) -> DataFrame:
    """``retention`` + ``window_funnel`` + ``sequence_match`` fused
    into ONE groupBy pass over the event table (r9, guide §2.1/§2.4 —
    the t11 ``direction="all"`` pattern): the three-operator
    composition scans the corpus three times, shuffles three times
    and re-joins the per-key results twice, all keyed on the SAME
    column. One pass computes them together.

    Row-for-row identical to the composition
    ``retention(...) LEFT JOIN window_funnel(...) LEFT JOIN
    sequence_match(...)`` with NULL level/matched coalesced to 0:

    - the retention flags are the same ``max(IF(cond,1,0))``
      aggregates, computed from a pre-projected 0/1 flag;
    - the funnel/sequence event lists are gathered by the same
      ``sort_array(collect_list(struct(ts, lab)))`` (``collect_list``
      skips the NULL the CASE yields for non-matching events — the
      same rows ``_with_cond_label`` keeps) and folded by the
      IDENTICAL fold expressions (``_funnel_fold`` / ``_seq_fold``);
    - a key with no matching funnel/sequence events folds an EMPTY
      list, which both folds finish as 0 — exactly the value the old
      left joins coalesced in (asserted per-row in
      tests/test_operators.py::TestBehavioralProfile).

    Shuffle bytes are the same labeled (ts, lab) structs the separate
    operators shipped (partial collect_list drops NULLs map-side),
    plus N tiny partial maxes — for three fewer corpus scans, two
    fewer exchanges and two fewer joins."""
    staged = df.select(
        F.col(key),
        _ts_double(df, ts_col).alias("__ts"),
        _label_expr(funnel_conds).alias("__flab"),
        _label_expr(seq_conds).alias("__slab"),
        *[
            F.when(c, F.lit(1)).otherwise(F.lit(0)).alias(f"__r{i}")
            for i, c in enumerate(retention_conds, 1)
        ],
    )
    n_r = len(retention_conds)
    gathered = staged.groupBy(key).agg(
        *[F.max(f"__r{i}").alias(f"__m{i}") for i in range(1, n_r + 1)],
        F.expr(
            "sort_array(collect_list("
            "CASE WHEN __flab > 0 THEN struct(__ts AS ts, __flab AS lab) END))"
        ).alias("__fevs"),
        F.expr(
            "sort_array(collect_list("
            "CASE WHEN __slab > 0 THEN struct(__ts AS ts, __slab AS lab) END))"
        ).alias("__sevs"),
    )
    cols: list[Column] = [F.col(key)]
    for i in range(1, n_r + 1):
        if i == 1:
            cols.append(F.col("__m1").cast("int").alias("r1"))
        else:
            cols.append(
                (F.col("__m1").cast("boolean") & F.col(f"__m{i}").cast("boolean"))
                .cast("int")
                .alias(f"r{i}")
            )
    cols.append(
        F.expr(
            _funnel_fold(len(funnel_conds), funnel_window, "__fevs")
        ).alias("level")
    )
    cols.append(F.expr(_seq_fold(len(seq_conds), "__sevs")).alias("matched"))
    return gathered.select(*cols)

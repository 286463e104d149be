"""Behavioral-analytics aggregates: retention, windowFunnel,
sequenceMatch (ClickHouse parametric-aggregate surface; delegated-only
in the reference — supported because chDB is ClickHouse, delegation
point main.py:190; no in-tree exercise, SURVEY.md §2 tier [D]).

Spark-first design notes (100 TB):

- ``retention`` is a pure composition of built-in conditional
  aggregates — one shuffle on the group key, map-side partial
  aggregation, whole-stage codegen end to end. No Python.
- ``window_funnel`` / ``sequence_match`` need an ordered per-key scan
  (inherently sequential within a key), so they use
  ``applyInPandas`` partitioned by the entity key: the shuffle is on
  the same key an aggregation would use, per-group state is O(events
  of one user), and groups parallelize across executors. This is the
  documented pattern for custom stateful per-key operators; a
  row-at-a-time Python UDF or a driver-side collect would not scale.
"""

from __future__ import annotations

from typing import Optional, Sequence

import pandas as pd

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


def _chain_level(
    ts: list,
    labels: list[int],
    n_conds: int,
    window: Optional[float],
) -> int:
    """Max chain length: events e1<e2<…<ek with e_i matching cond_i
    (strictly increasing ts) and, if *window* is set, ek.ts - e1.ts
    <= window. Greedy earliest-next extension per chain start is
    optimal for a fixed start; we try every cond_1 event as start.
    """
    best = 0
    n = len(ts)
    for s in range(n):
        if labels[s] != 1:
            continue
        level, t_prev = 1, ts[s]
        limit = None if window is None else ts[s] + window
        want = 2
        for j in range(s + 1, n):
            if want > n_conds:
                break
            if limit is not None and ts[j] > limit:
                break
            if labels[j] == want and ts[j] > t_prev:
                level, t_prev = want, ts[j]
                want += 1
        best = max(best, level)
        if best == n_conds:
            return best
    return best


def _funnel_apply(
    key: str,
    ts_col: str,
    n_conds: int,
    window: Optional[float],
    out_name: str,
):
    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col, kind="mergesort")
        lvl = _chain_level(
            pdf[ts_col].tolist(), pdf["__cond"].tolist(), n_conds, window
        )
        return pd.DataFrame({key: [pdf[key].iloc[0]], out_name: [lvl]})

    return fn


def _with_cond_label(
    df: DataFrame, key: str, ts_col: str, conds: Sequence[Column]
) -> DataFrame:
    """Label each event with the first matching condition index
    (1-based; 0 = matches none) and drop non-matching events before
    the shuffle — the map-side filter is the big win at scale."""
    lab = F.lit(0)
    for i in range(len(conds), 0, -1):
        lab = F.when(conds[i - 1], F.lit(i)).otherwise(lab)
    out = df.select(
        F.col(key),
        F.col(ts_col).cast("double").alias(ts_col),
        lab.alias("__cond"),
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
    schema = T.StructType(
        [
            df.schema[key],
            T.StructField(out_name, T.IntegerType()),
        ]
    )
    ev = _with_cond_label(df, key, ts_col, conds)
    return ev.groupBy(key).applyInPandas(
        _funnel_apply(key, ts_col, len(conds), window_seconds, out_name), schema
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
    1 when events matching cond_1 … cond_N occur in strict ts order."""
    schema = T.StructType(
        [
            df.schema[key],
            T.StructField("__lvl", T.IntegerType()),
        ]
    )
    ev = _with_cond_label(df, key, ts_col, conds)
    lvl = ev.groupBy(key).applyInPandas(
        _funnel_apply(key, ts_col, len(conds), None, "__lvl"), schema
    )
    return lvl.select(
        key, (F.col("__lvl") == len(conds)).cast("int").alias(out_name)
    )

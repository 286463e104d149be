"""Fast small local DataFrames.

``spark.createDataFrame(python_list)`` in classic PySpark parallelizes
the rows as a pickled PythonRDD over ``defaultParallelism`` slices —
EVERY evaluation of the plan then spins one Python worker per slice
just to unpickle a handful of rows (~150 ms each; ~5 s per execution
at local[32], measured on this container). The pandas → Arrow path
instead ships the data as JVM-side Arrow batches once: evaluations
never touch a Python worker (~0.35 s → dominated by the actual query).

Use ``local_df`` for any small driver-side table that participates in
a query plan (dimension literals, block-pair tables, result rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def local_df(spark: SparkSession, rows, schema) -> DataFrame:
    """createDataFrame via pandas/Arrow when possible.

    *rows*: list of tuples. *schema*: DDL string or StructType. Falls
    back to the classic path for data pandas/Arrow can't represent.
    """
    try:
        import pandas as pd

        from pyspark.sql.types import StructType

        if isinstance(schema, StructType):
            names = [f.name for f in schema.fields]
        else:
            names = [part.strip().split()[0] for part in str(schema).split(",")]
        pdf = pd.DataFrame(list(rows), columns=names)
        return spark.createDataFrame(pdf, schema)
    except Exception:  # pragma: no cover — arrow-incompatible payloads
        return spark.createDataFrame(rows, schema)

"""Driver-local literal tables as LocalTableScan, not a Python RDD.

`SparkSession.createDataFrame(rows, schema)` on a plain Python list
takes the pickled-RDD path: the rows become a `Scan ExistingRDD` whose
every materialization (including the build side of a broadcast) spins
Python executor workers — measured ~0.8-1.1 s per query even warm, and
it denies Catalyst a size estimate for the relation. Routing the same
rows through a `pyarrow.Table` instead yields a pure-JVM
`LocalTableScan` (~0.1 s warm): no executor job, broadcast without a
Python stage, exact size known to the planner.

Value fidelity is exact: pyarrow arrays are built with the Arrow type
of each declared field (None stays null — no pandas NaN coercion), so
`local_df(spark, rows, schema)` produces identical values and an
identical schema to `spark.createDataFrame(rows, schema)` for the flat
and array-typed schemas used in the query paths. Exotic rows that
pyarrow cannot convert fall back to the classic path.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import DataType, StructType


def local_df(
    spark: SparkSession, rows: Sequence, schema: str | StructType
) -> DataFrame:
    """Build a small driver-side DataFrame as a LocalTableScan."""
    try:
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_schema
        from pyspark.sql.types import _parse_datatype_string

        st = (
            schema
            if isinstance(schema, StructType)
            else _parse_datatype_string(schema)
        )
        if not isinstance(st, StructType):
            raise TypeError(f"need a struct schema, got {st}")
        asch = to_arrow_schema(st)
        cols = (
            [list(c) for c in zip(*rows)]
            if rows
            else [[] for _ in st.fields]
        )
        tbl = pa.Table.from_arrays(
            [
                pa.array(c, type=f.type, from_pandas=False)
                for c, f in zip(cols, asch)
            ],
            schema=asch,
        )
        return spark.createDataFrame(tbl)
    except Exception:
        # fidelity over speed: anything pyarrow cannot represent takes
        # the classic pickled-RDD path unchanged
        return spark.createDataFrame(list(rows), schema)

"""Lakehouse table-format connectors, gated behind import/classpath probes.

Delta / Iceberg / Hudi need their jars on the Spark classpath; the v1 image
ships none (environment constraint, SURVEY.md §7), so these readers raise a
clear NotImplementedError instead of a Py4J class-not-found stack. The API
shape is final — dropping the jars in makes them work unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_FORMATS = {
    "delta": "io.delta.sql.DeltaSparkSessionExtension",
    "iceberg": "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
    "hudi": "org.apache.hudi.DefaultSource",
}


def _classpath_has(spark: SparkSession, klass: str) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(klass)
        return True
    except Exception:
        return False


def read_table_format(spark: SparkSession, fmt: str, path: str) -> DataFrame:
    """Read a Delta/Iceberg/Hudi table, or fail with a clear message when
    the format's jars are absent from the cluster image."""
    if fmt not in _FORMATS:
        raise ValueError(f"unknown table format: {fmt!r} (know {sorted(_FORMATS)})")
    if not _classpath_has(spark, _FORMATS[fmt]):
        raise NotImplementedError(
            f"{fmt} support requires its jars on the Spark classpath; the "
            f"current image does not ship {_FORMATS[fmt]}. Add the package "
            f"via spark.jars.packages and re-run — the reader path below is "
            f"already wired."
        )
    return spark.read.format(fmt).load(path)

"""Audit Spark-vs-DuckDB OUTPUT dtypes for every oracled registry key.

The driver hashes values as materialized by each engine's pandas
conversion. DuckDB maps HUGEINT -> float64 and DECIMAL -> object, so an
oracle whose output column is HUGEINT (e.g. `BIGINT - sum(BIGINT) OVER`)
hash-diverges from a Spark int64 even when every VALUE is identical —
the exact failure mode behind the stats_kaplan_meier /
stats_nelson_aalen driver-only reds (rounds 6-8). This audit catches it
WITHOUT executing queries: DuckDB `DESCRIBE (sql)` + Spark's lazy
DataFrame .schema, mapped to the pandas dtype KIND each produces.

Usage: python tools/oracle_dtype_audit.py [--sf DIR]
Prints one line per mismatched key; exit 1 if any mismatch.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from go_batch_processor_spark.catalog import TABLE_NAMES
from go_batch_processor_spark.registry import REGISTRY, _ensure_loaded
from go_batch_processor_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def duck_kind(t: str) -> str:
    """pandas dtype KIND duckdb's .df() produces for a DuckDB type."""
    u = t.upper()
    if u in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "UTINYINT",
             "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if u == "HUGEINT":
        return "float"  # duckdb.df() maps HUGEINT -> float64
    if u in ("FLOAT", "DOUBLE"):
        return "float"
    if u.startswith("DECIMAL"):
        return "decimal"  # -> object of Decimal
    if u == "BOOLEAN":
        return "bool"
    if u in ("VARCHAR", "UUID"):
        return "str"
    if u.startswith("TIMESTAMP") or u == "DATE":
        return "datetime"
    if u.endswith("[]") or u.startswith("STRUCT") or u.startswith("MAP"):
        return "object"
    return f"?{u}"


def spark_kind(dt) -> str:
    from pyspark.sql import types as T

    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dt, T.DecimalType):
        return "decimal"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.StringType):
        return "str"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return "datetime"
    if isinstance(dt, (T.ArrayType, T.StructType, T.MapType, T.BinaryType)):
        return "object"
    return f"?{dt}"


def audit(spark, con, sf_dir: str = SF_DIR) -> list[str]:
    """Return one message per dtype-kind mismatch across the whole
    registry (empty list = clean). Importable so the default pytest
    suite can run the audit as a gate (r9 verdict item 3)."""
    _ensure_loaded()
    problems: list[str] = []
    checked = 0
    for name, spec in sorted(REGISTRY.items()):
        if spec.oracle is None:
            continue
        try:
            desc = con.sql(f"DESCRIBE ({spec.oracle})").fetchall()
            dkinds = {r[0]: duck_kind(r[1]) for r in desc}
        except Exception as e:  # pragma: no cover
            problems.append(f"{name}: DESCRIBE failed: {e}")
            continue
        try:
            sch = spec.fn(spark, sf_dir).schema
        except Exception as e:  # pragma: no cover
            problems.append(f"{name}: spark plan build failed: {e}")
            continue
        skinds = {f.name: spark_kind(f.dataType) for f in sch.fields}
        checked += 1
        for c in sorted(set(dkinds) | set(skinds)):
            dk, sk = dkinds.get(c), skinds.get(c)
            if dk != sk:
                problems.append(f"{name}: column {c!r} spark={sk} duck={dk}")
    print(f"audited {checked} oracled keys; {len(problems)} problems",
          file=sys.stderr)
    return problems


def main() -> int:
    spark = get_spark(app_name="gbp-dtype-audit", master="local[4]",
                      shuffle_partitions=4)
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    problems = audit(spark, con)
    for p in problems:
        print(p)
    return 1 if problems else 0


if __name__ == "__main__":
    sys.exit(main())

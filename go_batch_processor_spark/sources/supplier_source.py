"""Custom Python DataSource: the reference's pull-Supplier as a first-class
Spark source.

The reference models a source as an opaque pull interface producing batches
(`Supplier.FetchNextBatch`, /root/reference/batch_processor.go:16-18). Spark
4's Python DataSource API lets that concept register as a real table
provider: `spark.read.format("supplier_batches")` yields the batch stream as
a partitioned DataFrame — each batch becomes one input partition, so Spark's
scheduler replaces the reference's hand-rolled worker pool (R6/R10).

The generator here is deterministic (seeded per batch via a hash recurrence)
so results are oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

DEFAULT_BATCHES = 8
DEFAULT_BATCH_SIZE = 100
SCHEMA_DDL = "batch_id bigint, item_id bigint, payload bigint"


def _item_payload(batch_id: int, i: int) -> int:
    # Deterministic integer recurrence (same closed form in the SQL oracle).
    return (batch_id * 1_000_003 + i * 7919) % 1_000_000


class _BatchPartition(InputPartition):
    def __init__(self, batch_id: int, batch_size: int):
        self.batch_id = batch_id
        self.batch_size = batch_size


class _SupplierReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_batches = int(options.get("batches", DEFAULT_BATCHES))
        self.batch_size = int(options.get("batch_size", DEFAULT_BATCH_SIZE))

    def partitions(self):
        # One fetchable batch == one Spark input partition (the reference's
        # worker-per-batch concurrency, scheduled by Spark instead).
        return [_BatchPartition(b, self.batch_size) for b in range(self.n_batches)]

    def read(self, partition: _BatchPartition):
        b = partition.batch_id
        for i in range(partition.batch_size):
            yield (b, i, _item_payload(b, i))


class _SupplierStreamReader(SimpleDataSourceStreamReader):
    """Unbounded pull source: the reference's poll loop with exactly-once
    offset tracking (offset = next batch id) instead of the reference's
    at-most-once fetch (its fetch errors drop batches, batch_processor.go
    :127-130 — Spark's offset log upgrades that delivery contract)."""

    def __init__(self, options: dict):
        self.batch_size = int(options.get("batch_size", DEFAULT_BATCH_SIZE))
        self.max_batches = int(options.get("batches", DEFAULT_BATCHES))

    def initialOffset(self) -> dict:
        return {"batch": 0}

    def read(self, start: dict):
        b = start["batch"]
        if b >= self.max_batches:  # bounded fixture: source drained
            return iter([]), {"batch": b}
        rows = [(b, i, _item_payload(b, i)) for i in range(self.batch_size)]
        return iter(rows), {"batch": b + 1}

    def readBetweenOffsets(self, start: dict, end: dict):
        for b in range(start["batch"], end["batch"]):
            for i in range(self.batch_size):
                yield (b, i, _item_payload(b, i))


class SupplierDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "supplier_batches"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema: StructType) -> DataSourceReader:
        return _SupplierReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> SimpleDataSourceStreamReader:
        return _SupplierStreamReader(self.options)

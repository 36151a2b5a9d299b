"""Scan / source / sink operators (SURVEY.md §2.2.a).

The reference's only source/sink surface is the opaque pull interface pair
``Supplier.FetchNextBatch`` / ``Finalizer.OnBatchProcessed``
(/root/reference/batch_processor.go:16-18,26-28); columnar file scans are
extension inventory. Scans here are plain ``spark.read.parquet`` with
explicit schemas: Catalyst pushes projections and predicates into the
parquet reader (verify with .explain: ``ReadSchema`` / ``PushedFilters``).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_batch_processor_spark.catalog import load_table
from go_batch_processor_spark.registry import register


def _sink_path(spark: SparkSession, name: str) -> str:
    """Temp sink path keyed by the Spark application id: two concurrent
    sessions running the registry must not overwrite each other's sink and
    read back half-written output."""
    app_id = spark.sparkContext.applicationId
    return os.path.join(tempfile.gettempdir(), f"{name}_{app_id}")


@register(
    "scan_parquet",
    oracle="""
    SELECT count(*)                         AS n_rows,
           round(sum(l_extendedprice), 2)   AS sum_price,
           CAST(sum(l_orderkey) AS BIGINT)  AS sum_orderkey,
           CAST(sum(l_linenumber) AS BIGINT) AS sum_linenumber
    FROM lineitem
    """,
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full fact-table scan with checksum aggregates over key columns."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.sum("l_orderkey").alias("sum_orderkey"),
        F.sum("l_linenumber").cast("long").alias("sum_linenumber"),
    )


@register(
    "scan_projection_pushdown",
    oracle="SELECT o_orderkey, o_totalprice FROM orders",
)
def scan_projection_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Project 2 of 6 columns — parquet reads only those column chunks.

    Plan check: ReadSchema must list exactly o_orderkey, o_totalprice.
    """
    return load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")


@register(
    "sink_parquet_roundtrip",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
    FROM lineitem WHERE l_returnflag = 'R'
    """,
)
def sink_parquet_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write a filtered projection to parquet, read it back (sink + source).

    At scale the write would be partitioned (``partitionBy``) and sized via
    ``spark.sql.files.maxRecordsPerFile``; the roundtrip proves the sink
    preserves schema and values exactly.
    """
    out = _sink_path(spark, "gbp_spark_sink_roundtrip")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag"
    ).filter(F.col("l_returnflag") == "R")
    li.write.mode("overwrite").parquet(out)
    return spark.read.schema(li.schema).parquet(out)


@register(
    "sink_partitioned_pruned",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           CAST(year(o_orderdate) AS BIGINT) AS order_year
    FROM orders
    WHERE year(o_orderdate) = 1997
    """,
)
def sink_partitioned_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned write + partition-pruned read.

    ``partitionBy(order_year)`` lays the sink out as order_year=YYYY/
    directories; the filtered read-back touches only the 1997 directory
    (PartitionFilters in the plan, zero I/O on other years) — THE layout
    lever for time-organized 100 TB tables."""
    o = load_table(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate").cast("long")
    )
    out = _sink_path(spark, "gbp_sink_partitioned")
    (
        o.select("o_orderkey", "o_custkey", "o_totalprice", "order_year")
        .write.mode("overwrite")
        .partitionBy("order_year")
        .parquet(out)
    )
    back = spark.read.parquet(out).filter(F.col("order_year") == 1997)
    return back.select(
        "o_orderkey", "o_custkey", "o_totalprice", F.col("order_year").cast("long")
    )


@register(
    "source_custom_supplier",
    oracle="""
    SELECT b.batch_id, i.item_id,
           (b.batch_id * 1000003 + i.item_id * 7919) % 1000000 AS payload
    FROM range(8) b(batch_id), range(100) i(item_id)
    """,
)
def source_custom_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python DataSource: the reference's pull-Supplier registered as
    a Spark table provider (one fetched batch == one input partition). The
    deterministic payload recurrence makes it oracle-checkable via
    range()-generated rows."""
    from go_batch_processor_spark.sources import SupplierDataSource

    spark.dataSource.register(SupplierDataSource)
    return (
        spark.read.format("supplier_batches")
        .option("batches", 8)
        .option("batch_size", 100)
        .load()
    )


@register(
    "source_csv_roundtrip",
    oracle="SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM customer",
)
def source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink+source with an explicit read schema (never inferSchema —
    at scale that is a second full pass over the data). Timestamp columns
    are deliberately absent: CSV text round-trips sub-millisecond precision
    lossily; columnar formats are the engine's timestamp carriers."""
    c = load_table(spark, sf_dir, "customer")
    out = _sink_path(spark, "gbp_src_csv")
    c.write.mode("overwrite").option("header", True).csv(out)
    return spark.read.schema(c.schema).option("header", True).csv(out)


@register(
    "source_json_roundtrip",
    oracle="SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier",
)
def source_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink+source with explicit schema on read."""
    s = load_table(spark, sf_dir, "supplier")
    out = _sink_path(spark, "gbp_src_json")
    s.write.mode("overwrite").json(out)
    return spark.read.schema(s.schema).json(out)


@register(
    "source_orc_roundtrip",
    oracle="SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority FROM orders",
)
def source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink+source — the second columnar format, full timestamp
    fidelity, same pushdown machinery as parquet."""
    o = load_table(spark, sf_dir, "orders")
    out = _sink_path(spark, "gbp_src_orc")
    o.write.mode("overwrite").orc(out)
    return spark.read.schema(o.schema).orc(out)


Z_BITS = 16  # bits interleaved per dimension in the z-order key


def _zvalue(x, y):
    """Morton/z-order interleave of two 16-bit columns, pure JVM bit ops
    (shiftleft/bitwiseOR) — no UDF. Bit i of x lands at 2i+1, bit i of y
    at 2i."""
    z = F.lit(0)
    for i in range(Z_BITS):
        xb = F.shiftright(x, i).bitwiseAND(F.lit(1))
        yb = F.shiftright(y, i).bitwiseAND(F.lit(1))
        z = z.bitwiseOR(F.shiftleft(xb, 2 * i + 1)).bitwiseOR(
            F.shiftleft(yb, 2 * i)
        )
    return z


@register(
    "sink_zorder_clustered",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    """,
)
def sink_zorder_clustered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustered write: range-partition + sort the sink files by the
    Morton interleave of (o_custkey, price bucket), then read back.

    Why at 100 TB: parquet keeps per-file/rowgroup min-max stats on BOTH
    source columns; z-ordering makes those ranges narrow simultaneously, so
    selective filters on EITHER column (or both) skip most files — the
    multi-dimensional generalization of sorting by one key, and the same
    layout trick Delta's OPTIMIZE ZORDER applies. The interleave itself is
    ~100 JVM bit-ops per row, no shuffle beyond the range partitioner.
    Roundtrip oracle certifies the re-layout loses no rows/values.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    z = _zvalue(
        F.col("o_custkey").bitwiseAND(F.lit((1 << Z_BITS) - 1)),
        F.floor(F.col("o_totalprice") / 32).cast("long").bitwiseAND(
            F.lit((1 << Z_BITS) - 1)
        ),
    )
    out = _sink_path(spark, "gbp_sink_zorder")
    (
        o.withColumn("_z", z)
        .repartitionByRange(8, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(out)
    )
    return spark.read.schema(o.schema).parquet(out)


@register(
    "source_schema_evolution",
    oracle="""
    SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
           CAST(NULL AS BIGINT) AS o_custkey
    FROM orders WHERE o_orderkey % 2 = 0
    UNION ALL
    SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT), o_custkey
    FROM orders WHERE o_orderkey % 2 = 1
    """,
)
def source_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on read (mergeSchema): epoch 1 writes a 2-column
    parquet table, epoch 2 appends files that carry an ADDED column, and
    a single mergeSchema read returns the unified schema with NULLs where
    the old files lack the column — how a long-lived 100 TB table absorbs
    new fields without rewriting history (the Delta/Iceberg evolution
    semantics, available on raw parquet).

    Scale note: mergeSchema reconciles footers at planning time (driver
    cost O(files); production bounds it by reconciling per-partition
    manifests or pinning the merged schema in a metastore) — the DATA
    path stays an ordinary pruned columnar scan.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        "o_custkey",
    )
    out = _sink_path(spark, "gbp_src_evolve")
    v1 = o.filter(F.col("o_orderkey") % 2 == 0).drop("o_custkey")
    v2 = o.filter(F.col("o_orderkey") % 2 == 1)
    v1.write.mode("overwrite").parquet(out)
    v2.write.mode("append").parquet(out)
    return spark.read.option("mergeSchema", True).parquet(out).select(
        "o_orderkey", "cents", "o_custkey"
    )


@register(
    "source_csv_malformed",
    oracle="""
    SELECT CAST(8 AS BIGINT) AS good_rows, CAST(3 AS BIGINT) AS corrupt_rows
    """,
)
def source_csv_malformed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-record handling on a text source: PERMISSIVE mode parses
    what it can and routes unparseable lines to _corrupt_record instead
    of failing the job — the ingestion posture for dirty 100 TB feeds
    (DROPMALFORMED silently loses data; FAILFAST dies on row one).

    The fixture is a deterministic 11-line CSV written in-function (8
    clean rows, 3 malformed: wrong arity is NOT malformed for CSV —
    missing trailing columns become nulls — so the bad rows are type
    errors and an unclosed quote). The oracle pins the exact good/corrupt
    split as literals; the assertion is the SPLIT ITSELF, which is the
    operator's contract.
    """
    import os

    out = _sink_path(spark, "gbp_src_malformed")
    os.makedirs(out, exist_ok=True)
    lines = [
        "id,price,qty",
        "1,10.5,3",
        "2,20.0,4",
        "3,abc,5",        # type error: price not a double
        "4,40.25,6",
        "5,50.0,xyz",     # type error: qty not an int
        "6,60.75,7",
        "7,70.0,8",
        '8,"unclosed,9',  # unclosed quote
        "9,90.5,10",
        "10,100.0,11",
        "11,110.25,12",
    ]
    with open(os.path.join(out, "part-0.csv"), "w") as fh:
        fh.write("\n".join(lines) + "\n")
    schema = (
        "id long, price double, qty int, _corrupt_record string"
    )
    df = (
        spark.read.schema(schema)
        .option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(out)
        .cache()  # SPARK-21610: corrupt-record column needs materialization
    )
    return df.agg(
        F.sum(F.when(F.col("_corrupt_record").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("good_rows"),
        F.sum(F.when(F.col("_corrupt_record").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("corrupt_rows"),
    )


COMPACT_TARGET_FILES = 4


@register(
    "sink_compact_small_files",
    oracle="""
    SELECT doc_id, lang, source, n_chars FROM documents
    """,
)
def sink_compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction — the OPTIMIZE / bin-packing maintenance job
    every lakehouse runs: a fragmented table (here: written with
    maxRecordsPerFile=50, the streaming-ingest failure mode — hundreds of
    tiny files per partition) is rewritten into a handful of right-sized
    files, preserving content exactly (the oracle checks the rows; the
    file-count collapse is pinned in tests/test_bucketing.py).

    Scale: the rewrite is repartition(N) by range on the sort key — at
    100 TB, N comes from target_size / avg_row_size and the job runs
    per-partition-directory so each OPTIMIZE batch is bounded. Range
    (not hash) partitioning keeps each output file a contiguous key
    range, preserving min/max row-group pruning on doc_id after the
    rewrite — hash placement would destroy file-skipping.
    """
    frag = _sink_path(spark, "gbp_spark_sink_fragmented")
    compact = _sink_path(spark, "gbp_spark_sink_compacted")
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    d.write.mode("overwrite").option("maxRecordsPerFile", 50).parquet(frag)
    frag_df = spark.read.schema(d.schema).parquet(frag)
    frag_df.repartitionByRange(COMPACT_TARGET_FILES, "doc_id").write.mode(
        "overwrite"
    ).parquet(compact)
    return spark.read.schema(d.schema).parquet(compact)


BINFILE_DOCS = 200  # bounded corpus slice written as individual .bin files


@register(
    "source_binaryfile_scan",
    oracle=f"""
    WITH take AS (
      SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT {BINFILE_DOCS}
    )
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           md5(text)                          AS content_md5
    FROM take
    """,
)
def source_binaryfile_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`binaryFile` source — the ingestion path for opaque media blobs
    (images/audio/video) that the multimodal operators consume: every
    file becomes one row of (path, modificationTime, length, content).
    Here the first {BINFILE_DOCS} documents are materialized as real
    .bin files (UTF-8 bytes), scanned back through the binaryFile
    reader, and verified byte-for-byte via length + md5 against the
    originating table — which makes a binary ingestion path
    DuckDB-oracle-checkable.

    Scale shape: binaryFile is a standard FileScan — distributed,
    partition-balanced by file size, column-pruned (dropping `content`
    prunes actual I/O via the PathFilter). The write side here is a
    bounded {BINFILE_DOCS}-doc driver artifact (test harness only);
    production blobs land via their own writers. For millions of small
    blobs prefer fewer, larger containers (parquet binary columns —
    see the multimodal family) — binaryFile listing is O(files) on the
    driver, the documented small-files hazard.
    """
    import shutil

    d = load_table(spark, sf_dir, "documents")
    take = d.orderBy("doc_id").limit(BINFILE_DOCS).select("doc_id", "text")
    out = _sink_path(spark, "gbp_src_binfile")
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    for row in take.collect():  # bounded: BINFILE_DOCS small docs
        with open(os.path.join(out, f"doc_{row['doc_id']}.bin"), "wb") as f:
            f.write(row["text"].encode("utf-8"))
    back = spark.read.format("binaryFile").load(out)
    return back.select(
        F.regexp_extract(
            F.col("path"), r"doc_(\d+)\.bin$", 1
        ).cast("bigint").alias("doc_id"),
        F.col("length").cast("bigint").alias("byte_len"),
        F.md5("content").alias("content_md5"),
    )

"""CDC / upsert emulation (MERGE INTO without a table format).

Delta/Iceberg jars are not in the image (SURVEY.md §7 env constraints), so
MERGE is emulated with the standard anti-join + union pattern — the exact
plan a format-backed MERGE lowers to, minus the transactional commit. At
100 TB both sides hash-shuffle once on the merge key; the change set is
usually small enough to broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_batch_processor_spark.catalog import load_table
from go_batch_processor_spark.registry import register


def upsert(base: DataFrame, changes: DataFrame, key: str) -> DataFrame:
    """MERGE semantics: rows of ``changes`` replace same-key rows of
    ``base``; unmatched change rows are inserts. Schemas must align."""
    kept = base.join(changes.select(key), on=key, how="left_anti")
    return kept.unionByName(changes)


@register(
    "cdc_upsert_customers",
    oracle="""
    WITH changes AS (
      SELECT o_custkey AS c_custkey,
             round(sum(o_totalprice), 2) AS c_acctbal
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '2000-01-01'
      GROUP BY o_custkey
    )
    SELECT c.c_custkey,
           coalesce(ch.c_acctbal, c.c_acctbal) AS c_acctbal,
           (ch.c_custkey IS NOT NULL)          AS was_updated
    FROM customer c
    LEFT JOIN changes ch ON c.c_custkey = ch.c_custkey
    """,
)
def cdc_upsert_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upsert a derived change set (recent-order spend per customer) into
    the customer balances: anti-join keeps untouched rows, union applies
    updates — then project to the oracle's LEFT JOIN + coalesce shape.

    The change set derives deterministically from orders, so the whole
    merge is DuckDB-checkable. (No inserts in this fixture: every change
    key exists in base — insert behavior is covered by upsert()'s
    unionByName and the pipeline tests.)
    """
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    changes = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(F.round(F.sum("o_totalprice"), 2).alias("c_acctbal"))
        .withColumn("was_updated", F.lit(True))
    )
    base = c.withColumn("was_updated", F.lit(False))
    return upsert(base, changes, "c_custkey")


@register(
    "docs_enrichment_pipeline",
    oracle="""
    WITH q AS (
      SELECT doc_id, lang, n_chars, string_split(text, ' ') AS w,
             md5(text) AS content_hash
      FROM documents
    ),
    scored AS (
      SELECT doc_id, lang, n_chars, content_hash,
             CAST(len(w) AS BIGINT) AS n_words,
             round(len(list_filter(w, x -> x IN ('the','a','of','and','to','in','is')))
                   * 1.0 / len(w), 4) AS stopword_ratio
      FROM q
    ),
    dups AS (
      SELECT doc_id, min(doc_id) OVER (PARTITION BY content_hash) AS canonical
      FROM scored
    )
    SELECT s.doc_id, s.lang, s.n_words, s.stopword_ratio,
           (s.n_words >= 20 AND s.stopword_ratio >= 0.05) AS keep_for_training,
           (d.canonical <> s.doc_id)                      AS is_exact_dup
    FROM scored s JOIN dups d ON s.doc_id = d.doc_id
    """,
)
def docs_enrichment_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end LLM-corpus enrichment: tokenize -> quality features ->
    exact-dup canonicalization -> keep/drop decision, in one composed plan
    (the per-operator building blocks as a user would chain them)."""
    from go_batch_processor_spark.operators.text import STOPWORDS

    d = load_table(spark, sf_dir, "documents")
    w = F.split("text", " ")
    nw = F.size(w)
    scored = d.select(
        "doc_id",
        "lang",
        nw.cast("long").alias("n_words"),
        F.round(
            F.size(F.filter(w, lambda x: x.isin(*STOPWORDS))).cast("double")
            / nw.cast("double"),
            4,
        ).alias("stopword_ratio"),
        F.md5("text").alias("content_hash"),
    )
    from pyspark.sql import Window

    canonical = F.min("doc_id").over(Window.partitionBy("content_hash"))
    return scored.select(
        "doc_id",
        "lang",
        "n_words",
        "stopword_ratio",
        ((F.col("n_words") >= 20) & (F.col("stopword_ratio") >= 0.05)).alias(
            "keep_for_training"
        ),
        (canonical != F.col("doc_id")).alias("is_exact_dup"),
    )


@register(
    "mv_incremental_agg",
    oracle="""
    SELECT o_custkey,
           CAST(count(*) AS BIGINT)    AS n_orders,
           round(sum(o_totalprice), 2) AS total_spend
    FROM orders
    GROUP BY o_custkey
    """,
)
def mv_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: a per-customer order
    aggregate is kept as MERGEABLE PARTIAL STATE (count + raw sum) and
    refreshed by combining it with the aggregate of just the delta batch —
    never recomputing over the full history. Here the "existing" view is
    the aggregate of pre-2000 orders and the delta is everything after;
    the oracle recomputes the whole aggregate from scratch and must match
    the merged result exactly.

    This is the warehouse pattern that makes 100 TB rollups cheap: sums
    and counts are associative, so the stored view + delta-agg outer-join
    touches O(|keys|) state rows while the delta scan touches only new
    data. Rounding happens ONLY at the final merge (rounding partial sums
    would break associativity). avg/min/max extend the same way; distinct
    needs a sketch (see agg_hll_partitioned_merge) or bitmap
    (agg_bitmap_distinct)."""
    o = load_table(spark, sf_dir, "orders")
    cut = F.lit("2000-01-01").cast("timestamp")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("o_custkey").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_totalprice").alias("total_spend"),
        )

    state = partial(o.filter(F.col("o_orderdate") < cut))
    delta = partial(o.filter(F.col("o_orderdate") >= cut))
    merged = (
        state.select(
            "o_custkey",
            F.col("n_orders").alias("n_a"),
            F.col("total_spend").alias("s_a"),
        )
        .join(
            delta.select(
                "o_custkey",
                F.col("n_orders").alias("n_b"),
                F.col("total_spend").alias("s_b"),
            ),
            "o_custkey",
            "full_outer",
        )
        .select(
            "o_custkey",
            (F.coalesce("n_a", F.lit(0)) + F.coalesce("n_b", F.lit(0))).alias(
                "n_orders"
            ),
            F.round(
                F.coalesce("s_a", F.lit(0.0)) + F.coalesce("s_b", F.lit(0.0)), 2
            ).alias("total_spend"),
        )
    )
    return merged


@register(
    "cdc_scd2_history",
    oracle="""
    SELECT user_id,
           value AS attr_value,
           ts AS valid_from,
           lead(ts) OVER w AS valid_to,
           (lead(ts) OVER w IS NULL) AS is_current,
           row_number() OVER w AS version
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    """,
)
def cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension TYPE 2 build from a change stream: each
    per-key change becomes a version row with a [valid_from, valid_to)
    validity interval (valid_to = next change's timestamp, open for the
    current version) and a monotone version number — the standard
    warehouse history table, built with ONE keyed window (single shuffle
    on the business key, no self-join). Deterministic event_id tiebreak
    per the repo's ts-ordering rule."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    nxt = F.lead("ts").over(w)
    return ev.select(
        "user_id",
        F.col("value").alias("attr_value"),
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
        F.row_number().over(w).alias("version"),
    )


@register(
    "mv_incremental_join",
    oracle="""
    SELECT c.c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def mv_incremental_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a JOIN view — the delta-join algebra
    (classic IVM, e.g. Griffin/Libkin SIGMOD'95; also what Materialize /
    Delta Live Tables do under the hood):

        J_t = J_{t-1}  ∪  (ΔA ⋈ B_{t-1})  ∪  (A_{t-1} ⋈ ΔB)  ∪  (ΔA ⋈ ΔB)

    Both sides change here: epoch 1 loads half the orders and half the
    customers and materializes J_1 = A_1 ⋈ B_1; epoch 2 delivers deltas
    to BOTH sides and refreshes with the three delta joins only — the
    (A_1 ⋈ B_1) full recompute never reruns. The oracle recomputes the
    view from scratch over the union and must match exactly (exact
    integer cents in the check aggregate: order-dependent double sums
    are not cross-engine stable — registry parity rules).

    Scale shape: each delta join is delta-sized on one side, so refresh
    cost is O(|ΔA|·sel + |ΔB|·sel + |ΔA⋈ΔB|), not O(|A|·|B|); partition
    both stored sides by the join key (bucketed layout, see
    join_bucketed_colocated) and every delta join co-locates. The final
    check-aggregate here keeps the contract result segment-sized.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    # epoch split on stable keys: both sides change across epochs
    a1 = o.filter(F.col("o_orderkey") % 2 == 0)
    da = o.filter(F.col("o_orderkey") % 2 == 1)  # ΔA
    b1 = c.filter(F.col("c_custkey") % 2 == 0)
    db = c.filter(F.col("c_custkey") % 2 == 1)  # ΔB

    def j(left: DataFrame, right: DataFrame) -> DataFrame:
        return left.join(
            right, left.o_custkey == right.c_custkey, "inner"
        ).select("o_orderkey", "cents", "c_mktsegment")

    j1 = j(a1, b1).localCheckpoint(eager=False)  # the materialized view
    delta = j(da, b1).unionAll(j(a1, db)).unionAll(j(da, db))
    j2 = j1.unionAll(delta)
    return j2.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("cents").cast("long").alias("total_cents"),
    )


@register(
    "cdc_deletes_apply",
    oracle="""
    WITH feed AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
             value
      FROM events
    ),
    latest AS (
      SELECT user_id, op, round(value, 2) AS value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM feed
    )
    SELECT user_id, value AS current_value
    FROM latest WHERE rn = 1 AND op = 'U'
    ORDER BY user_id
    """,
)
def cdc_deletes_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changefeed apply with DELETE tombstones — the missing third of the
    CDC triptych (upsert = cdc_upsert_customers, history = scd2): a keyed
    change stream where each record is an UPSERT or a DELETE ('error'
    events model tombstones), compacted to current state. A key whose
    LATEST change is a delete vanishes from the snapshot; earlier deletes
    are overridden by later upserts.

    Scale shape: one keyed window (ts DESC, event_id DESC tiebreak per
    the repo determinism rule), rank-1 filter, tombstone filter — the
    same single-shuffle compaction as window_dedup_latest; this is
    exactly how Delta/Hudi merge-on-read compacts a changefeed. At
    100 TB: partition the feed by key-hash, compact per partition,
    periodically checkpoint the snapshot so the window only replays the
    tail.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    feed = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
        F.round("value", 2).alias("value"),
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        feed.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") == "U"))
        .select("user_id", F.col("value").alias("current_value"))
        .orderBy("user_id")
    )


SNAP_CUT_A = "1997-01-01"
SNAP_CUT_B = "1998-01-01"


@register(
    "cdc_snapshot_diff",
    oracle=f"""
    WITH snap_a AS (
      SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS price
      FROM orders WHERE o_orderdate < DATE '{SNAP_CUT_A}'
    ),
    snap_b AS (
      SELECT o_orderkey, o_orderstatus,
             CASE WHEN o_orderdate < DATE '{SNAP_CUT_A}'
                       AND substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) = '0'
                  THEN round(o_totalprice + 1, 2)
                  ELSE round(o_totalprice, 2) END AS price
      FROM orders
      WHERE o_orderdate < DATE '{SNAP_CUT_B}'
        AND NOT (o_orderdate < DATE '{SNAP_CUT_A}'
                 AND substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) = 'f')
    )
    SELECT coalesce(a.o_orderkey, b.o_orderkey) AS o_orderkey,
           CASE WHEN a.o_orderkey IS NULL THEN 'added'
                WHEN b.o_orderkey IS NULL THEN 'removed'
                ELSE 'changed' END AS change_type,
           a.price AS old_price, b.price AS new_price
    FROM snap_a a
    FULL OUTER JOIN snap_b b ON a.o_orderkey = b.o_orderkey
    WHERE a.o_orderkey IS NULL OR b.o_orderkey IS NULL
       OR a.price <> b.price OR a.o_orderstatus <> b.o_orderstatus
    """,
)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot differencing — the change set between two table versions
    (what Delta's CDF / Iceberg's changelog scan computes when the log is
    unavailable): full outer join on the key, classify added / removed /
    changed, keep only actual changes. Snapshot B is derived
    deterministically from orders (rows past the first cutoff are inserts,
    an md5-nibble slice of old rows gets a price bump = updates, another
    slice disappears = deletes) so the diff is oracle-checkable.

    Scale: one hash shuffle per side on the join key — at 100 TB both
    snapshot scans push their date filters into parquet, and the WHERE
    keeps only changed rows, so the diff output (usually <<1% of rows)
    never materializes unchanged pairs downstream. This is the fallback
    plan when storage-level change feeds don't exist; cdc_upsert /
    cdc_deletes_apply consume the change set this op produces.
    """
    o = load_table(spark, sf_dir, "orders")
    nib = F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1)
    old = F.col("o_orderdate") < F.lit(SNAP_CUT_A).cast("date")
    snap_a = o.filter(old).select(
        "o_orderkey",
        "o_orderstatus",
        F.round("o_totalprice", 2).alias("price"),
    )
    snap_b = (
        o.filter(F.col("o_orderdate") < F.lit(SNAP_CUT_B).cast("date"))
        .filter(~(old & (nib == "f")))
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.when(old & (nib == "0"), F.round(F.col("o_totalprice") + 1, 2))
            .otherwise(F.round("o_totalprice", 2))
            .alias("price"),
        )
    )
    a = snap_a.alias("a")
    b = snap_b.alias("b")
    joined = a.join(b, F.col("a.o_orderkey") == F.col("b.o_orderkey"), "full_outer")
    return joined.filter(
        F.col("a.o_orderkey").isNull()
        | F.col("b.o_orderkey").isNull()
        | (F.col("a.price") != F.col("b.price"))
        | (F.col("a.o_orderstatus") != F.col("b.o_orderstatus"))
    ).select(
        F.coalesce(F.col("a.o_orderkey"), F.col("b.o_orderkey")).alias("o_orderkey"),
        F.when(F.col("a.o_orderkey").isNull(), "added")
        .when(F.col("b.o_orderkey").isNull(), "removed")
        .otherwise("changed")
        .alias("change_type"),
        F.col("a.price").alias("old_price"),
        F.col("b.price").alias("new_price"),
    )

"""Lakehouse table-maintenance operators: snapshot diff (CDC between two
table versions) and small-file compaction planning — the jobs an Iceberg
warehouse at 10^12 files runs continuously beside its query load, expressed
as ordinary distributed queries.

Spark-first shape, 100-TB story:

* the snapshot diff is ONE full-outer equi-join on the table key plus a
  map-only change classifier; with a real Iceberg catalog the two inputs
  would be changed-data-file scans selected by MANIFEST diff (so the join
  touches only files whose partition stats admit changes) — the query
  shape below is exactly what sits on top of that pruned scan, and at
  sandbox scale we synthesize the two versions deterministically from the
  orders table so the result is oracle-checkable;
* the compaction planner never does true first-fit-decreasing bin packing
  (FFD is inherently sequential); it uses the distributable cumulative-
  mass form — per partition, files sorted by (size DESC, file_id) and cut
  into bins of TARGET bytes by a running total — which bounds per-bin
  overfill by one file and is a pure key-local window (one partition-keyed
  exchange, no global sort).  This is the planning half of Iceberg's
  ``rewrite_data_files(strategy => 'binpack')``; the manifest frame it
  consumes is tiny relative to the data it describes (one row per file),
  which is why planning over 10^12 files is itself a distributed query.

Determinism discipline: all sizes/ids/bins are integers; the only float
column is the diff's price pair, where the synthetic update adds exactly
1.0 (exact in IEEE doubles) so cross-engine equality comparisons are safe.

Reference contact: none (the reference is a per-document NER engine);
these extend the relational/lakehouse family next to io/icetable.py's
snapshot-manifest layer (same snapshot concepts, query-side view).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# synthetic-version knobs (shared with the DuckDB twin)
INS_MOD = 10     # keys absent from v1 (inserted in v2)
DEL_MOD = 13     # keys absent from v2 (deleted since v1)
UPD_MOD = 7      # keys whose price moved by +1.0 in v2

# compaction knobs
N_FILES_PER_PART = 50      # synthetic manifest: files per month partition
FILE_ROW_BYTES = 512       # per-row byte estimate in the synthetic sizes
BIN_TARGET_BYTES = 16384   # compaction target size per output file


# ---------------------------------------------------------------------------
# snapshot diff (CDC)
# ---------------------------------------------------------------------------

def snapshot_versions(orders: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Two deterministic versions of the orders table: v1 lacks the
    INS_MOD keys, v2 lacks the DEL_MOD keys and bumps UPD_MOD prices."""
    v1 = orders.where(F.col("o_orderkey") % INS_MOD != 0).select(
        "o_orderkey", F.col("o_totalprice").alias("old_price")
    )
    v2 = orders.where(F.col("o_orderkey") % DEL_MOD != 0).select(
        "o_orderkey",
        (
            F.col("o_totalprice")
            + F.when(F.col("o_orderkey") % UPD_MOD == 0, F.lit(1.0))
            .otherwise(F.lit(0.0))
        ).alias("new_price"),
    )
    return v1, v2


def snapshot_diff(orders: DataFrame) -> DataFrame:
    """Changelog between the two synthetic snapshots: one row per key that
    was inserted, deleted, or updated (unchanged rows are not emitted —
    the changelog is small even when the table is not).  ONE full-outer
    equi-join on the table key; classification is map-only."""
    v1, v2 = snapshot_versions(orders)
    joined = v1.join(v2, "o_orderkey", "full_outer")
    change = (
        F.when(F.col("old_price").isNull(), F.lit("insert"))
        .when(F.col("new_price").isNull(), F.lit("delete"))
        .when(F.col("old_price") != F.col("new_price"), F.lit("update"))
    )
    return (
        joined.select("o_orderkey", change.alias("change"),
                      "old_price", "new_price")
        .where(F.col("change").isNotNull())
    )


def snapshot_diff_sql() -> str:
    """DuckDB twin: identical version synthesis + full-outer classify."""
    return f"""
    WITH v1 AS (
      SELECT o_orderkey, o_totalprice AS old_price
      FROM orders WHERE o_orderkey % {INS_MOD} <> 0),
    v2 AS (
      SELECT o_orderkey,
             o_totalprice
               + CASE WHEN o_orderkey % {UPD_MOD} = 0
                      THEN 1.0 ELSE 0.0 END AS new_price
      FROM orders WHERE o_orderkey % {DEL_MOD} <> 0)
    SELECT COALESCE(v1.o_orderkey, v2.o_orderkey) AS o_orderkey,
           CASE WHEN v1.o_orderkey IS NULL THEN 'insert'
                WHEN v2.o_orderkey IS NULL THEN 'delete'
                ELSE 'update' END AS change,
           v1.old_price, v2.new_price
    FROM v1 FULL OUTER JOIN v2 ON v1.o_orderkey = v2.o_orderkey
    WHERE v1.o_orderkey IS NULL OR v2.o_orderkey IS NULL
       OR v1.old_price <> v2.new_price
    """


# ---------------------------------------------------------------------------
# compaction planning
# ---------------------------------------------------------------------------

def file_manifest(orders: DataFrame) -> DataFrame:
    """Manifest-shaped frame synthesized from orders: one row per
    (month partition, file) with an integer byte size — the shape an
    Iceberg manifest scan yields (one row per data file, sizes from
    footer stats).  Map-side-combined agg; output is bounded by
    partitions x N_FILES_PER_PART, never by row count."""
    return (
        orders.groupBy(
            (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
            .cast("long").alias("part_month"),
            (F.col("o_orderkey") % N_FILES_PER_PART).alias("file_id"),
        )
        .agg(
            (
                F.count(F.lit(1)) * FILE_ROW_BYTES
                + F.sum(F.length("o_orderpriority"))
            ).cast("long").alias("size_bytes")
        )
    )


def compaction_plan(orders: DataFrame,
                    target: int = BIN_TARGET_BYTES) -> DataFrame:
    """Bin-pack the manifest into compaction groups of ~``target`` bytes:
    within each partition, files sorted by (size DESC, file_id) are cut
    by running byte mass, so every bin except possibly the last holds at
    least ``target`` - max_file + 1 bytes and overfills by at most one
    file.  Both windows are keyed by the partition column (and bin) —
    key-local exchanges only, no global sort anywhere."""
    files = file_manifest(orders)
    w = (
        Window.partitionBy("part_month")
        .orderBy(F.desc("size_bytes"), "file_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    binned = (
        files.withColumn("_cum", F.sum("size_bytes").over(w))
        # integer DIV: a double quotient would lose exactness once a
        # partition's cumulative byte mass passes 2^53 (plausible at
        # warehouse scale); positive ints make DIV == floor on both engines
        .withColumn("bin", F.expr(f"(_cum - 1) DIV {target}").cast("long"))
        .drop("_cum")
    )
    w2 = Window.partitionBy("part_month", "bin")
    return binned.select(
        "part_month", "file_id", "size_bytes", "bin",
        F.sum("size_bytes").over(w2).cast("long").alias("bin_bytes"),
        F.count(F.lit(1)).over(w2).cast("long").alias("bin_files"),
    )


def compaction_plan_sql(target: int = BIN_TARGET_BYTES) -> str:
    """DuckDB twin: same manifest synthesis, same explicit ROWS frame."""
    return f"""
    WITH files AS (
      SELECT (EXTRACT(year FROM o_orderdate) * 12
              + EXTRACT(month FROM o_orderdate) - 1)::BIGINT AS part_month,
             o_orderkey % {N_FILES_PER_PART} AS file_id,
             (COUNT(*) * {FILE_ROW_BYTES}
              + SUM(LENGTH(o_orderpriority)))::BIGINT AS size_bytes
      FROM orders GROUP BY 1, 2),
    binned AS (
      SELECT part_month, file_id, size_bytes,
             ((SUM(size_bytes) OVER (
                 PARTITION BY part_month
                 ORDER BY size_bytes DESC, file_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - 1) // {target})::BIGINT AS bin
      FROM files)
    SELECT part_month, file_id, size_bytes, bin,
           SUM(size_bytes) OVER (PARTITION BY part_month, bin)::BIGINT
             AS bin_bytes,
           COUNT(*) OVER (PARTITION BY part_month, bin)::BIGINT AS bin_files
    FROM binned
    """


# ---------------------------------------------------------------------------
# zone maps (min/max data skipping)
# ---------------------------------------------------------------------------

ZONE_ORDERKEYS = 512    # orderkeys per zone (file granule in a real layout)
ZONE_PRED_LO = "1995-01-01"
ZONE_PRED_HI = "1995-06-15"   # mid-month so the clustered June zone is partial


def zone_maps(lineitem: DataFrame,
              lo: str = ZONE_PRED_LO, hi: str = ZONE_PRED_HI) -> DataFrame:
    """Zone-map (min/max data-skipping) audit — the footer-stats primitive
    every 100-TB scan lives or dies by — evaluated over TWO physical
    layouts of the same rows:

    - ``write_order``: zones are orderkey-range granules (the file layout
      ingestion order produces).  Shipdates are uncorrelated with
      orderkey, so every zone's min/max straddles the predicate — all
      ``partial``, 0% skipped: the false-scan pathology.
    - ``date_clustered``: zones are shipdate months (the layout a
      partitioned/Z-ordered write produces; ``rel_zorder_layout`` is the
      write-side companion).  Months disjoint from the predicate are
      ``skip``, contained months ``full``, the mid-month boundary zone
      ``partial`` — the audit shows exactly what clustering buys.

    Per zone: min/max footer stats, exact ``n_match`` (matching rows —
    a ``partial`` zone with ``n_match = 0`` is pure false-scan cost), and
    the skip/full/partial class for predicate ``lo <= l_shipdate <= hi``.
    Two map-side-combined aggregates (one per layout) unioned; output is
    bounded by zone counts, never row count.  Output: (layout, zone_id,
    n_rows, min_ship, max_ship, scan_class, n_match)."""
    d_lo = F.lit(lo).cast("timestamp")
    d_hi = F.lit(hi + " 23:59:59").cast("timestamp")
    in_pred = F.col("l_shipdate").between(d_lo, d_hi)

    def stats(zoned, layout):
        z = zoned.groupBy("zone_id").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.date_format(F.min("l_shipdate"), "yyyy-MM-dd").alias("min_ship"),
            F.date_format(F.max("l_shipdate"), "yyyy-MM-dd").alias("max_ship"),
            F.sum(in_pred.cast("long")).alias("n_match"),
        )
        cls = (
            F.when(
                (F.col("max_ship") < F.lit(lo)) | (F.col("min_ship") > F.lit(hi)),
                F.lit("skip"),
            )
            .when(
                (F.col("min_ship") >= F.lit(lo)) & (F.col("max_ship") <= F.lit(hi)),
                F.lit("full"),
            )
            .otherwise(F.lit("partial"))
        )
        return z.select(
            F.lit(layout).alias("layout"), "zone_id", "n_rows",
            "min_ship", "max_ship", cls.alias("scan_class"), "n_match",
        )

    by_write = lineitem.withColumn(
        "zone_id", F.expr(f"l_orderkey DIV {ZONE_ORDERKEYS}")
    )
    by_date = lineitem.withColumn(
        "zone_id",
        (F.year("l_shipdate") * 12 + F.month("l_shipdate") - 1).cast("long"),
    )
    return stats(by_write, "write_order").unionByName(
        stats(by_date, "date_clustered")
    )


def zone_maps_sql(lo: str = ZONE_PRED_LO, hi: str = ZONE_PRED_HI) -> str:
    """DuckDB twin: same zone assignments, footer stats, and classifier.
    min/max travel as 'yyyy-MM-dd' strings so the class comparison is the
    SAME lexicographic test on both engines."""
    return f"""
    WITH zoned AS (
      SELECT 'write_order' AS layout,
             l_orderkey // {ZONE_ORDERKEYS} AS zone_id, l_shipdate
      FROM lineitem
      UNION ALL
      SELECT 'date_clustered' AS layout,
             (EXTRACT(year FROM l_shipdate) * 12
              + EXTRACT(month FROM l_shipdate) - 1)::BIGINT AS zone_id,
             l_shipdate
      FROM lineitem),
    z AS (
      SELECT layout, zone_id,
             COUNT(*)::BIGINT AS n_rows,
             strftime(MIN(l_shipdate), '%Y-%m-%d') AS min_ship,
             strftime(MAX(l_shipdate), '%Y-%m-%d') AS max_ship,
             SUM(CASE WHEN l_shipdate >= TIMESTAMP '{lo} 00:00:00'
                       AND l_shipdate <= TIMESTAMP '{hi} 23:59:59'
                      THEN 1 ELSE 0 END)::BIGINT AS n_match
      FROM zoned GROUP BY 1, 2)
    SELECT layout, zone_id, n_rows, min_ship, max_ship,
           CASE WHEN max_ship < '{lo}' OR min_ship > '{hi}' THEN 'skip'
                WHEN min_ship >= '{lo}' AND max_ship <= '{hi}' THEN 'full'
                ELSE 'partial' END AS scan_class,
           n_match
    FROM z
    """

"""CSR adjacency export of the entity co-occurrence graph.

A KG that leaves the engine has to land somewhere: graph stores and GNN
trainers ingest compressed-sparse-row adjacency — per node, its degree,
its sorted neighbor list, and the EXCLUSIVE global prefix sum of degrees
(the CSR row-pointer).  The prefix sum is the interesting part at scale:
the naive expression is a single global window (``SUM OVER (ORDER BY
node)``), which serializes the whole graph through ONE task.  This module
implements the standard two-level distributed prefix sum instead:

1. range-partition the nodes by name and sort within partitions — a
   normal distributed sort, every partition a contiguous key range;
2. each partition computes its LOCAL running total (a window partitioned
   by the partition id — parallel, never global);
3. the per-partition totals (one row per partition — bounded by cluster
   width, not by data) are prefix-summed in a tiny window and broadcast
   back as additive bases.

``offset = base[pid] + local_run - degree`` is then exact and identical
at ANY parallelism, because the bases absorb whatever the range sampler
chose as boundaries.  The same decomposition is how every distributed
sort-based rank/offset assignment works at 100 TB.

Reference parity: the reference exports flat prediction files
(results/*.json via predict.py); a CSR manifest is the graph-shaped
equivalent for the KG-construction tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

CSR_PARTITIONS = 16


def adjacency_csr(edges: DataFrame,
                  num_partitions: int = CSR_PARTITIONS) -> DataFrame:
    """Undirected (ent_a, ent_b) edges -> CSR rows
    ``(node, degree, csr_offset, neighbors)``.

    ``csr_offset`` is the exclusive prefix sum of ``degree`` in global
    lexicographic node order; ``neighbors`` is the sorted neighbor array.
    The result is partitioning-invariant: the two-level prefix sum makes
    the offsets a pure function of the data.
    """
    from ..cache import tracked_persist

    bidir = edges.select(
        F.col("ent_a").alias("src"), F.col("ent_b").alias("dst")
    ).unionByName(
        edges.select(F.col("ent_b").alias("src"), F.col("ent_a").alias("dst"))
    )
    adj = bidir.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("degree"),
        F.sort_array(F.collect_list("dst")).alias("neighbors"),
    )
    # contiguous key ranges + a materialized partition id; persisted so the
    # local-run and totals consumers see the SAME pid assignment
    parts = tracked_persist(
        adj.repartitionByRange(num_partitions, "node")
        .sortWithinPartitions("node")
        .withColumn("_pid", F.spark_partition_id())
    )
    w_local = (
        Window.partitionBy("_pid")
        .orderBy("node")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = parts.withColumn("_run", F.sum("degree").over(w_local))
    totals = parts.groupBy("_pid").agg(F.sum("degree").alias("_tot"))
    # ONE row per partition: this window is bounded by cluster width (16
    # rows here, ~thousands on a real cluster), never by data volume
    w_base = (
        Window.orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bases = totals.withColumn(
        "_base", F.coalesce(F.sum("_tot").over(w_base), F.lit(0))
    ).select("_pid", "_base")
    return (
        local.join(F.broadcast(bases), "_pid")
        .select(
            "node",
            "degree",
            (F.col("_base") + F.col("_run") - F.col("degree"))
            .cast("long")
            .alias("csr_offset"),
            "neighbors",
        )
    )


def adjacency_csr_sql(mentions_sql: str) -> str:
    """DuckDB twin: the same CSR rows via the single-node global window
    the distributed path deliberately avoids."""
    from .graph_sql import edges_prelude

    return edges_prelude(mentions_sql) + """,
    deg AS (
      SELECT src AS node, COUNT(*)::BIGINT AS degree,
             LIST(dst ORDER BY dst) AS neighbors
      FROM bidir GROUP BY src)
    SELECT node, degree,
           COALESCE(SUM(degree) OVER (
             ORDER BY node
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
             AS csr_offset,
           neighbors
    FROM deg
    """

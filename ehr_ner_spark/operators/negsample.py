"""Deterministic negative sampling over the knowledge-graph triple
stream — the data-prep step every KG-embedding trainer (TransE/DistMult
family) runs at scale: for each positive (subj, pred, obj) triple, emit K
corrupted triples whose object is drawn pseudo-randomly from the entity
dictionary.

Spark-first shape, 100-TB story:

* the entity dictionary gets a GLOBAL dense index WITHOUT a global
  window: entities are hashed into 256 buckets, ranked inside each bucket
  by a distributed (bucket-partitioned) window, and bucket offsets come
  from a running sum over the 256-row count frame — the standard
  two-level zipWithIndex pattern, so no single partition ever holds the
  dictionary;
* the sample index for (triple, k) is the first 15 hex chars of
  ``md5(subj|pred|obj|k)`` mod N — a pure column expression, then ONE
  equi-join against the indexed dictionary fetches the replacement.
  Draws are uniform over the dictionary and reproducible run-to-run,
  which is exactly what a resumable training pipeline needs (re-running
  the job regenerates byte-identical negatives, so shards can be
  re-materialized independently);
* accidental positives (draw == original object) are filtered, the
  standard "filtered" negative-sampling protocol.

Oracle exactness: md5 of UTF-8 text is identical across engines (the
ds_fingerprint discipline), 15 hex chars < 2^60 fit a BIGINT exactly on
both sides, and the dictionary order (bucket, entity) is replayed in
DuckDB as one ROW_NUMBER — every emitted row is integer/string-exact.

Reference contact: none (the reference stops at per-document mentions);
this is the training-data extension over the triples the linking stage
emits (operators/linking.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NEG_K = 2
_BUCKETS = 256


def _hex15_long(col):
    """First 15 hex chars of an md5 hex column -> non-negative BIGINT."""
    return F.conv(F.substring(col, 1, 15), 16, 10).cast("long")


def entity_dictionary(triples: DataFrame) -> DataFrame:
    """Distinct objects -> (ent, idx) with a dense 0..N-1 index assigned
    by the two-level (bucket-window + offset) rank, ordered by
    (md5-bucket, entity)."""
    from pyspark.sql.window import Window

    ents = triples.select(F.col("obj").alias("ent")).distinct().withColumn(
        "bucket",
        F.conv(F.substring(F.md5(F.col("ent")), 1, 2), 16, 10).cast("int"),
    )
    local = ents.withColumn(
        "lrank",
        F.row_number().over(Window.partitionBy("bucket").orderBy("ent")),
    )
    # 256-row frame: running-sum offsets, then broadcast back
    offs = (
        ents.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn(
            "off",
            F.coalesce(
                F.sum("n").over(
                    Window.orderBy("bucket").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("bucket", "off")
    )
    return local.join(F.broadcast(offs), "bucket").select(
        "ent", (F.col("off") + F.col("lrank") - 1).cast("long").alias("idx")
    )


def negative_samples(triples: DataFrame, k: int = NEG_K) -> DataFrame:
    """(subj, pred, obj) positives -> (subj, pred, obj, neg_obj, k)
    corrupted triples, ``k`` filtered draws per positive."""
    from ..cache import tracked_persist

    pos = triples.select("subj", "pred", "obj").distinct()
    dic = tracked_persist(entity_dictionary(triples))
    n_ents_df = dic.agg(F.count(F.lit(1)).alias("n_ents"))
    draws = (
        pos.crossJoin(F.broadcast(n_ents_df))
        .select(
            "subj", "pred", "obj",
            F.explode(
                F.sequence(F.lit(1), F.lit(int(k)))
            ).alias("k"),
            "n_ents",
        )
        .withColumn(
            "neg_idx",
            _hex15_long(
                F.md5(
                    F.concat_ws("|", F.col("subj"), F.col("pred"),
                                F.col("obj"), F.col("k"))
                )
            ) % F.col("n_ents"),
        )
    )
    return (
        draws.join(dic, draws["neg_idx"] == dic["idx"])
        .where(F.col("ent") != F.col("obj"))
        .select("subj", "pred", "obj",
                F.col("ent").alias("neg_obj"),
                F.col("k").cast("long").alias("k"))
    )


def negative_samples_sql(triples_sql: str, k: int = NEG_K) -> str:
    """DuckDB twin: ROW_NUMBER over (md5-bucket, entity) replays the
    two-level index; same md5/15-hex/mod draw, same filter."""
    return f"""
    WITH tri AS MATERIALIZED (SELECT * FROM ({triples_sql}) t),
    pos AS (SELECT DISTINCT subj, pred, obj FROM tri),
    dic AS MATERIALIZED (
      SELECT ent,
             ROW_NUMBER() OVER (
               ORDER BY ('0x' || substr(md5(ent), 1, 2))::INT, ent
             ) - 1 AS idx
      FROM (SELECT DISTINCT obj AS ent FROM tri)),
    nn AS (SELECT COUNT(*) AS n_ents FROM dic),
    draws AS (
      SELECT p.subj, p.pred, p.obj, ks.k,
             ('0x' || substr(
                md5(p.subj || '|' || p.pred || '|' || p.obj || '|'
                    || ks.k::VARCHAR), 1, 15))::BIGINT % nn.n_ents AS neg_idx
      FROM pos p
      CROSS JOIN (SELECT UNNEST(range(1, {int(k) + 1})) AS k) ks
      CROSS JOIN nn)
    SELECT d.subj, d.pred, d.obj, dic.ent AS neg_obj, d.k::BIGINT AS k
    FROM draws d JOIN dic ON dic.idx = d.neg_idx
    WHERE dic.ent <> d.obj
    """

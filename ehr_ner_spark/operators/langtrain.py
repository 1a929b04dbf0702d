"""Distributed language-ID trainer — the SECOND trained model family,
proving the engine's training loop (class-weighted batch perceptron,
operators/train.py) generalizes beyond the QASL tagger: a multiclass
batch perceptron over hashed character-trigram counts, trained against
the documents table's language labels.

All-integer discipline (the kernel/train.py contract): features are
trigram COUNTS, weights are mistake-count sums, scores are BIGINT dot
products, and the argmax tie-break is (score DESC, lang ASC) — so the
epoch-unrolled DuckDB oracle is bit-exact with no float anywhere.

Scale shape per epoch: ONE feature-frame join against the (dim x
n_langs)-bounded weight frame, map-side-combined score aggregation, a
doc-keyed argmax (min-of-struct, no window), and a mistake-join update
aggregated to the weight frame's size.  The weight frame localCheckpoints
per epoch (the LPA iterative-loop discipline) so the plan stays flat.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..hashing import md5_60_expr

LANGID_DIM = 256
LANGID_EPOCHS = 3


def _trigram_features(docs: DataFrame, dim: int) -> DataFrame:
    """(doc_id, lang, f, x): hashed char-trigram counts per document."""
    tri = F.when(
        F.length("text") >= 3,
        F.expr("transform(sequence(1, length(text) - 2),"
               " i -> substring(text, i, 3))"),
    ).otherwise(F.array().cast("array<string>"))
    return (
        docs.select("doc_id", "lang", F.explode(tri).alias("tri"))
        .select(
            "doc_id", "lang", (md5_60_expr(F.col("tri")) % dim).alias("f")
        )
        .groupBy("doc_id", "lang", "f")
        .agg(F.count(F.lit(1)).alias("x"))
    )


def train_langid(docs: DataFrame, dim: int = LANGID_DIM,
                 epochs: int = LANGID_EPOCHS) -> DataFrame:
    """Batch multiclass POCKET perceptron (Gallant 1990): full-batch
    simultaneous updates oscillate on non-separable data, so the model
    that ships is the best-so-far snapshot — ``pocket_mistakes`` is
    monotone non-increasing by construction while ``n_mistakes`` shows
    the raw batch dynamics.  Mistakes are counted with each epoch's
    PRE-update weights (epoch 1 is the zero model, whose argmax is the
    lexicographically-first language).  Output: (epoch, n_mistakes,
    pocket_mistakes, n_docs)."""
    from ..cache import tracked_persist

    feats = tracked_persist(_trigram_features(docs, dim))
    spine = tracked_persist(docs.select("doc_id", "lang").distinct())
    langs = spine.select(F.col("lang").alias("cand")).distinct()
    n_docs = spine.count()
    cand_grid = tracked_persist(spine.crossJoin(langs))

    weights = None   # None == all-zero W
    curve = []
    for epoch in range(1, epochs + 1):
        if weights is None:
            scored = cand_grid.withColumn("s", F.lit(0).cast("long"))
        else:
            s = (
                feats.join(weights, "f")
                .groupBy("doc_id", F.col("wl").alias("cand"))
                .agg(F.sum(F.col("x") * F.col("w")).alias("s"))
            )
            scored = (
                cand_grid.join(s, ["doc_id", "cand"], "left")
                .select(
                    "doc_id", "lang", "cand",
                    F.coalesce("s", F.lit(0)).alias("s"),
                )
            )
        pred = (
            scored.groupBy("doc_id", "lang")
            .agg(
                F.min(
                    F.struct((-F.col("s")).alias("ns"),
                             F.col("cand").alias("cand"))
                ).alias("m")
            )
            .select("doc_id", "lang", F.col("m.cand").alias("pred"))
        )
        mistakes = tracked_persist(pred.where(F.col("pred") != F.col("lang")))
        n_mist = mistakes.count()
        pocket = min(n_mist, curve[-1][2]) if curve else n_mist
        curve.append((epoch, n_mist, pocket, n_docs))
        upd = (
            mistakes.join(feats.drop("lang"), "doc_id")
            .select("f", F.col("lang").alias("wl"), F.col("x").alias("dw"))
            .unionByName(
                mistakes.join(feats.drop("lang"), "doc_id")
                .select("f", F.col("pred").alias("wl"),
                        (-F.col("x")).alias("dw"))
            )
        )
        base = weights.select("f", "wl", F.col("w").alias("dw")) \
            if weights is not None else None
        allw = upd if base is None else base.unionByName(upd)
        weights = (
            allw.groupBy("f", "wl").agg(F.sum("dw").alias("w"))
            .where(F.col("w") != 0)
            .localCheckpoint(eager=True)
        )
    spark = docs.sparkSession
    return spark.createDataFrame(
        curve,
        "epoch long, n_mistakes long, pocket_mistakes long, n_docs long",
    )


def train_langid_sql(dim: int = LANGID_DIM, epochs: int = LANGID_EPOCHS,
                     max_len: int = 600) -> str:
    """DuckDB twin: the epochs unrolled as CTEs with identical integer
    arithmetic and the same (score DESC, lang ASC) argmax."""
    parts = [f"""
    WITH chars AS (
      SELECT doc_id, lang, substring(text, g.range + 1, 3) AS tri
      FROM documents CROSS JOIN range({max_len}) g
      WHERE g.range + 3 <= len(text)),
    feats AS MATERIALIZED (
      SELECT doc_id, lang,
             ('0x' || substr(md5(tri), 1, 15))::BIGINT % {dim} AS f,
             COUNT(*)::BIGINT AS x
      FROM chars GROUP BY 1, 2, 3),
    spine AS MATERIALIZED (SELECT DISTINCT doc_id, lang FROM documents),
    langs AS (SELECT DISTINCT lang AS cand FROM documents),
    grid AS MATERIALIZED (
      SELECT s.doc_id, s.lang, l.cand FROM spine s CROSS JOIN langs l)"""]
    prev_w = None
    selects = []
    for e in range(1, epochs + 1):
        if prev_w is None:
            parts.append(f""",
    p{e} AS MATERIALIZED (
      SELECT doc_id, lang, MIN(cand) AS pred FROM grid GROUP BY 1, 2)""")
        else:
            parts.append(f""",
    s{e} AS (
      SELECT g.doc_id, g.lang, g.cand,
             COALESCE(SUM(f.x * w.w), 0)::BIGINT AS s
      FROM grid g
      LEFT JOIN feats f ON f.doc_id = g.doc_id
      LEFT JOIN {prev_w} w ON w.f = f.f AND w.wl = g.cand
      GROUP BY 1, 2, 3),
    p{e} AS MATERIALIZED (
      SELECT doc_id, lang, pred FROM (
        SELECT doc_id, lang, cand AS pred,
               row_number() OVER (
                 PARTITION BY doc_id ORDER BY s DESC, cand ASC) AS rn
        FROM s{e})
      WHERE rn = 1)""")
        parts.append(f""",
    m{e} AS MATERIALIZED (
      SELECT * FROM p{e} WHERE pred <> lang),
    u{e} AS (
      SELECT f.f, m.lang AS wl, SUM(f.x)::BIGINT AS dw
      FROM m{e} m JOIN feats f ON f.doc_id = m.doc_id GROUP BY 1, 2
      UNION ALL
      SELECT f.f, m.pred AS wl, (-SUM(f.x))::BIGINT AS dw
      FROM m{e} m JOIN feats f ON f.doc_id = m.doc_id GROUP BY 1, 2),
    w{e} AS MATERIALIZED (
      SELECT f, wl, SUM(dw)::BIGINT AS w FROM (
        SELECT f, wl, dw FROM u{e}
        {f'UNION ALL SELECT f, wl, w AS dw FROM {prev_w}' if prev_w else ''})
      GROUP BY 1, 2 HAVING SUM(dw) <> 0)""")
        selects.append(
            f"SELECT {e}::BIGINT AS epoch,"
            f" (SELECT COUNT(*) FROM m{e})::BIGINT AS n_mistakes,"
            f" (SELECT COUNT(*) FROM spine)::BIGINT AS n_docs"
        )
        prev_w = f"w{e}"
    parts.append(f""",
    curve AS ({'    UNION ALL '.join(selects)})
    SELECT epoch, n_mistakes,
           MIN(n_mistakes) OVER (
             ORDER BY epoch ROWS BETWEEN UNBOUNDED PRECEDING
             AND CURRENT ROW)::BIGINT AS pocket_mistakes,
           n_docs
    FROM curve""")
    return "".join(parts)

"""Multi-pass sorted-neighborhood blocking (Hernández & Stolfo, SIGMOD'95)
— the third candidate-generation family in the engine's entity-resolution
stack, next to hash/band blocking (operators/linking.py, dedup.py) and
edit-distance blocking (operators/fuzzy.py).

Where hash blocking needs a good equality key and band blocking needs a
set signature, SNM only needs a SORT: records are ordered by a blocking
key, and every record is paired with its ``w`` sorted neighbors.  Typos
that break a hash key (``widgey`` vs ``widget``) usually leave the sort
neighborhood intact under at least one key, so the classic remedy for
single-key misses is MULTI-PASS SNM — run several cheap passes with
different keys and union the candidates.  Here: pass 1 sorts by the
surface itself, pass 2 by its reversal (suffix-grouping, so records
sharing a head noun land adjacent even when their leading adjective
differs).

Scale shape (100 TB): the sort is Spark's distributed range sort, and the
windowed pairing runs per (pass, 1-char-prefix block) — a partitioned
Window, never a global single-partition one.  Pairs-per-record is bounded
by ``2 * SNM_WINDOW`` BY CONSTRUCTION (the property that makes SNM linear
where a self-join is quadratic); prefix-block boundary pairs are the
documented SNM loss that multi-pass recovers.  Candidates are verified
with exact char-trigram Jaccard — candidates only, never all pairs.

This operator works on distinct SURFACES with record counts (the
fuzzy_alias_pairs granularity): at corpus scale the distinct-surface
frame is orders of magnitude smaller than the record stream, and the
surface->record fan-back is an equi-join on the surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SNM_WINDOW = 3        # each record meets w sorted neighbors per pass
SNM_TAU = 0.35        # exact trigram-Jaccard acceptance threshold


def _grams(df: DataFrame, name_col: str, out_id: str) -> DataFrame:
    """Distinct char-trigrams per surface — JVM-side transform/explode.

    Surfaces shorter than 3 chars emit NO grams: unguarded,
    ``sequence(1, length - 2)`` counts DOWN for them (sequence(1,0) =
    [1,0]) and would emit bogus sub-trigram grams the DuckDB twin never
    produces."""
    return df.select(
        F.col(name_col).alias(out_id),
        F.explode(
            F.array_distinct(
                F.expr(
                    f"CASE WHEN length({name_col}) < 3 THEN array() "
                    f"ELSE transform(sequence(1, length({name_col}) - 2),"
                    f" i -> substring({name_col}, i, 3)) END"
                )
            )
        ).alias("gram"),
    )


def snm_pairs(
    part: DataFrame,
    window: int = SNM_WINDOW,
    tau: float = SNM_TAU,
) -> DataFrame:
    """(name_a, name_b, n_a, n_b, sim) near-duplicate surface pairs from
    two SNM passes over part names, trigram-Jaccard verified.

    ``sim`` is rounded half-away at 6 dp from exact integer
    intersection/union counts; the threshold compares the ROUNDED value
    so the boundary decision is engine-identical."""
    surfaces = part.groupBy(F.col("p_name").alias("name")).agg(
        F.count(F.lit(1)).alias("n_recs")
    )
    passes = surfaces.select(
        "name",
        F.explode(
            F.array(
                F.struct(F.lit(1).alias("pass"), F.col("name").alias("skey")),
                F.struct(F.lit(2).alias("pass"),
                         F.reverse(F.col("name")).alias("skey")),
            )
        ).alias("p"),
    ).select("name", "p.pass", "p.skey",
             F.substring("p.skey", 1, 1).alias("prefix"))
    w = Window.partitionBy("pass", "prefix").orderBy("skey", "name")
    neighbor_cols = [
        F.lead("name", k).over(w).alias(f"_nb{k}")
        for k in range(1, window + 1)
    ]
    cands = (
        passes.select("name", *neighbor_cols)
        .select(
            "name",
            F.explode(
                F.array(*[F.col(f"_nb{k}") for k in range(1, window + 1)])
            ).alias("nb"),
        )
        .where(F.col("nb").isNotNull())
        .select(
            F.least("name", "nb").alias("name_a"),
            F.greatest("name", "nb").alias("name_b"),
        )
        .distinct()
    )
    ga = _grams(surfaces, "name", "name_a")
    gb = _grams(surfaces, "name", "name_b")
    gn = (
        _grams(surfaces, "name", "name")
        .groupBy("name")
        .agg(F.count(F.lit(1)).alias("n_grams"))
    )
    inter = (
        cands.join(ga, "name_a")
        .join(gb, ["name_b", "gram"])
        .groupBy("name_a", "name_b")
        .agg(F.count(F.lit(1)).alias("_inter"))
    )
    sim = (
        inter.join(gn.select(F.col("name").alias("name_a"),
                             F.col("n_grams").alias("_la")), "name_a")
        .join(gn.select(F.col("name").alias("name_b"),
                        F.col("n_grams").alias("_lb")), "name_b")
        .withColumn(
            "sim",
            F.floor(
                F.col("_inter").cast("double")
                / (F.col("_la") + F.col("_lb") - F.col("_inter"))
                  .cast("double")
                * F.lit(1e6) + F.lit(0.5)
            ) / F.lit(1e6),
        )
        .where(F.col("sim") >= F.lit(tau))
    )
    na = surfaces.select(F.col("name").alias("name_a"),
                         F.col("n_recs").alias("n_a"))
    nb = surfaces.select(F.col("name").alias("name_b"),
                         F.col("n_recs").alias("n_b"))
    return sim.join(na, "name_a").join(nb, "name_b").select(
        "name_a", "name_b", "n_a", "n_b", "sim"
    )


def snm_pairs_sql(window: int = SNM_WINDOW, tau: float = SNM_TAU) -> str:
    """DuckDB twin: ROW_NUMBER per (pass, prefix) + self-join on rank
    distance 1..w — the textbook SNM formulation, equal to the engine's
    lead() pairing by construction."""
    return f"""
    WITH surfaces AS (
      SELECT p_name AS name, COUNT(*)::BIGINT AS n_recs
      FROM part GROUP BY 1),
    passes AS (
      SELECT name, 1 AS pass, name AS skey FROM surfaces
      UNION ALL
      SELECT name, 2 AS pass, reverse(name) AS skey FROM surfaces),
    ranked AS (
      SELECT name, pass, substr(skey, 1, 1) AS prefix,
             ROW_NUMBER() OVER (PARTITION BY pass, substr(skey, 1, 1)
                                ORDER BY skey, name) AS rn
      FROM passes),
    cands AS (
      SELECT DISTINCT LEAST(a.name, b.name) AS name_a,
                      GREATEST(a.name, b.name) AS name_b
      FROM ranked a JOIN ranked b
        ON a.pass = b.pass AND a.prefix = b.prefix
       AND b.rn - a.rn BETWEEN 1 AND {window}),
    grams AS (
      -- per-row exact bound (no literal cap: a >66-char name would lose
      -- grams the engine keeps); <3-char names emit none, like the engine
      SELECT DISTINCT name, substr(name, t.i::INT + 1, 3) AS gram
      FROM surfaces,
           UNNEST(range(greatest(length(name) - 2, 0))) AS t(i)),
    gn AS (
      SELECT name, COUNT(*)::BIGINT AS n_grams FROM grams GROUP BY 1),
    inter AS (
      SELECT c.name_a, c.name_b, COUNT(*)::BIGINT AS i
      FROM cands c
      JOIN grams ga ON ga.name = c.name_a
      JOIN grams gb ON gb.name = c.name_b AND gb.gram = ga.gram
      GROUP BY 1, 2),
    sims AS (
      SELECT i.name_a, i.name_b,
             FLOOR(i.i::DOUBLE / (la.n_grams + lb.n_grams - i.i)::DOUBLE
                   * 1e6 + 0.5) / 1e6 AS sim
      FROM inter i
      JOIN gn la ON la.name = i.name_a
      JOIN gn lb ON lb.name = i.name_b)
    SELECT s.name_a, s.name_b, na.n_recs AS n_a, nb.n_recs AS n_b, s.sim
    FROM sims s
    JOIN surfaces na ON na.name = s.name_a
    JOIN surfaces nb ON nb.name = s.name_b
    WHERE s.sim >= {tau}
    """

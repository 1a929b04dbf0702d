"""Deterministic random-walk corpus generation over the entity
co-occurrence graph — the DeepWalk/node2vec data stage of a KG pipeline:
emit fixed-length walks from every node, then window them into
(center, context) skip-gram pairs, the training corpus for graph
embeddings (Perozzi et al. 2014, "DeepWalk: Online Learning of Social
Representations").

Spark-first shape, same discipline as the rest of the graph family
(communities.py / paths.py — fixed unrolled round count, zero driver
round-trips, no window or sort anywhere):

* one walk starts at every node (walk_id = the start entity);
* each step is ONE equi-join of the walker frame onto the doubled edge
  frame + a map-side-combined MIN — the "randomness" is a hash-greedy
  choice: from node v at step t the walk moves to
  ``argmin_w md5(walk_id | t | w)`` over v's neighbors.  md5 makes the
  choice uniform-ish over neighbors yet fully deterministic, so the
  unrolled-CTE DuckDB twin is bit-exact (same trick as the md5 draws in
  operators/negsample.py); the argmin itself is evaluated by MIN over
  the concatenation ``md5hex | dst`` (md5 hex is fixed-width 32, so the
  lexicographic MIN orders by (hash, dst) — deterministic even on a
  hash collision) and the winner is recovered with substring, keeping
  the whole step a combinable aggregation;
* shuffle volume per step is O(edges) (each walker joins its current
  node's adjacency list); the walker frame stays exactly one row per
  walk — bounded by node count at any scale;
* skip-gram pairs are a walk-local self-join on walk_id with a step-band
  predicate (|Δstep| <= window, bounded fan-out per walk) + one
  map-side-combined count.

Reference contact: none (corpus-level graph analytics); extension in the
family of operators/communities.py / operators/paths.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WALK_STEPS = 4
SKIPGRAM_WINDOW = 2


def _step_key(t: int):
    """md5(walk_id | t | dst) || '|' || dst — MIN of this picks the
    hash-argmin neighbor; dst = substring(key, 34)."""
    h = F.md5(F.concat_ws("|", F.col("walk_id"), F.lit(str(t)), F.col("dst")))
    return F.concat_ws("|", h, F.col("dst"))


def random_walks(edges: DataFrame, steps: int = WALK_STEPS,
                 checkpoint: bool = True) -> DataFrame:
    """Undirected distinct (ent_a < ent_b) edges ->
    (walk_id, step, node): one ``steps``-step hash-greedy walk per node.

    ``checkpoint=False`` skips the per-step lineage truncation so plan
    tests can inspect the declarative round body; production callers keep
    the default."""
    from ..cache import tracked_persist

    _ckpt = ((lambda df: df.localCheckpoint(eager=True)) if checkpoint
             else (lambda df: df))

    edges = edges.select("ent_a", "ent_b")
    bidir = tracked_persist(
        edges.select(F.col("ent_a").alias("src"), F.col("ent_b").alias("dst"))
        .unionByName(
            edges.select(F.col("ent_b").alias("src"),
                         F.col("ent_a").alias("dst"))
        )
    )
    # each walker frame is consumed twice (next step's join + the output
    # union) — without per-step lineage truncation the step aggregations
    # re-execute a triangular number of times through the unioned output
    # (and twice again across the skip-gram self-join).  localCheckpoint
    # flattens each step to a leaf: ONE row per walk, steps is a fixed
    # small constant.
    cur = _ckpt(
        bidir.select(F.col("src").alias("node")).distinct()
        .select(F.col("node").alias("walk_id"), "node")
    )
    out = cur.select("walk_id", F.lit(0).alias("step"), "node")
    for t in range(1, steps + 1):
        cur = _ckpt(
            cur.join(bidir, cur["node"] == bidir["src"])
            .select("walk_id", _step_key(t).alias("k"))
            .groupBy("walk_id")
            .agg(F.min("k").alias("k"))
            .select("walk_id", F.expr("substring(k, 34)").alias("node"))
        )
        out = out.unionByName(
            cur.select("walk_id", F.lit(t).alias("step"), "node")
        )
    return out.select("walk_id", F.col("step").cast("long").alias("step"),
                      "node")


def walk_skipgrams(walks: DataFrame,
                   window: int = SKIPGRAM_WINDOW) -> DataFrame:
    """(walk_id, step, node) walks -> (center, context, n_pairs): counts
    of ordered skip-gram pairs within ``window`` steps, the word2vec-style
    training corpus.  Self-pairs (center = context) are dropped even when
    the walk revisits a node at another step."""
    a = walks.select("walk_id", F.col("step").alias("s_a"),
                     F.col("node").alias("center"))
    b = walks.select("walk_id", F.col("step").alias("s_b"),
                     F.col("node").alias("context"))
    return (
        a.join(b, "walk_id")
        .where(
            (F.col("s_a") != F.col("s_b"))
            & (F.abs(F.col("s_a") - F.col("s_b")) <= window)
            & (F.col("center") != F.col("context"))
        )
        .groupBy("center", "context")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


def _walks_ctes(mentions_sql: str, min_pair: int, steps: int) -> str:
    """Shared CTE chain ending in ``walks`` (walk_id, step, node)."""
    from .graph_sql import edges_prelude

    parts = [edges_prelude(mentions_sql, min_pair), """,
    w0 AS MATERIALIZED (
      SELECT DISTINCT src AS walk_id, src AS node FROM bidir)"""]
    for t in range(1, steps + 1):
        parts.append(f""",
    w{t} AS MATERIALIZED (
      SELECT walk_id, substring(MIN(k), 34) AS node FROM (
        SELECT w.walk_id,
               concat_ws('|', md5(concat_ws('|', w.walk_id, '{t}', e.dst)),
                         e.dst) AS k
        FROM w{t - 1} w JOIN bidir e ON e.src = w.node)
      GROUP BY walk_id)""")
    parts.append(",\n    walks AS MATERIALIZED (")
    parts.append("\n      UNION ALL ".join(
        f"SELECT walk_id, {t} AS step, node FROM w{t}"
        for t in range(steps + 1)
    ))
    parts.append(")")
    return "".join(parts)


def random_walks_sql(mentions_sql: str, min_pair: int = 2,
                     steps: int = WALK_STEPS) -> str:
    """DuckDB twin: the identical hash-greedy fold, rounds unrolled."""
    return (_walks_ctes(mentions_sql, min_pair, steps)
            + "\n    SELECT walk_id, step::BIGINT AS step, node FROM walks")


def walk_skipgrams_sql(mentions_sql: str, min_pair: int = 2,
                       steps: int = WALK_STEPS,
                       window: int = SKIPGRAM_WINDOW) -> str:
    """DuckDB twin of walks -> skip-gram pair counts."""
    return _walks_ctes(mentions_sql, min_pair, steps) + f"""
    SELECT a.node AS center, b.node AS context, COUNT(*) AS n_pairs
    FROM walks a JOIN walks b ON a.walk_id = b.walk_id
      AND a.step <> b.step AND abs(a.step - b.step) <= {window}
      AND a.node <> b.node
    GROUP BY a.node, b.node"""


# ---------------------------------------------------------------------------
# Ego-network (2-hop neighborhood) sampling
# ---------------------------------------------------------------------------

EGO_MOD = 20  # ~5% of nodes become seeds, by the shared md5 discipline


def ego_networks(edges: DataFrame, mod: int = EGO_MOD) -> DataFrame:
    """GNN-style 2-hop neighborhood extraction around deterministic seed
    entities: seeds are nodes with ``md5_60('ego:' || node) % mod == 0``
    (a reproducible sample, no RNG), output is (seed, node, hop) with each
    node recorded at its MINIMUM hop (hop-1 neighbors never reappear at
    hop 2, and the seed itself is excluded).

    Scale shape: hop-1 is a broadcast-friendly semi-filter of the doubled
    adjacency on the seed set; hop-2 is ONE frontier-to-adjacency
    equi-join (fan-out = frontier node degree — the support>=min_pair
    edge filter has already thinned hubs) followed by a seed-keyed
    left-anti dedup against hop-1.  No iteration state, no windows;
    everything shuffles on seed or node keys."""
    from ..cache import tracked_persist
    from ..hashing import md5_60_expr

    # bidir feeds the hop-1 seed filter AND the hop-2 expansion join —
    # persist the (tiny, distinct-edge-sized) adjacency or everything
    # upstream of `edges` (for the registered query: the whole scorer
    # pipeline) executes once per consumer
    bidir = tracked_persist(
        edges.select(
            F.col("ent_a").alias("src"), F.col("ent_b").alias("dst")
        ).unionByName(
            edges.select(F.col("ent_b").alias("src"), F.col("ent_a").alias("dst"))
        )
    )
    is_seed = (
        F.pmod(md5_60_expr(F.concat(F.lit("ego:"), F.col("src"))), F.lit(mod))
        == 0
    )
    # h1 feeds the hop-2 expansion AND the anti-join AND the output
    h1 = tracked_persist(
        bidir.where(is_seed).select(
            F.col("src").alias("seed"), F.col("dst").alias("node")
        )
    )
    h2 = (
        h1.join(bidir, h1.node == bidir.src)
        .select("seed", F.col("dst").alias("node2"))
        .where(F.col("node2") != F.col("seed"))
        .distinct()
        .withColumnRenamed("node2", "node")
        .join(h1, ["seed", "node"], "left_anti")
    )
    return (
        h1.select("seed", "node", F.lit(1).cast("long").alias("hop"))
        .unionByName(
            h2.select("seed", "node", F.lit(2).cast("long").alias("hop"))
        )
    )


def ego_networks_sql(mentions_sql: str, min_pair: int = 2,
                     mod: int = EGO_MOD) -> str:
    """DuckDB twin of :func:`ego_networks` over the shared edge prelude."""
    from .graph_sql import edges_prelude

    return edges_prelude(mentions_sql, min_pair, with_bidir=True) + f""",
    seeds AS (
      SELECT DISTINCT src AS seed FROM bidir
      WHERE ('0x' || substr(md5('ego:' || src), 1, 15))::BIGINT % {mod} = 0),
    h1 AS (
      SELECT b.src AS seed, b.dst AS node
      FROM bidir b JOIN seeds s ON b.src = s.seed),
    h2 AS (
      SELECT DISTINCT h.seed, b.dst AS node
      FROM h1 h JOIN bidir b ON h.node = b.src
      WHERE b.dst <> h.seed
        AND NOT EXISTS (SELECT 1 FROM h1 x
                        WHERE x.seed = h.seed AND x.node = b.dst))
    SELECT seed, node, 1::BIGINT AS hop FROM h1
    UNION ALL
    SELECT seed, node, 2::BIGINT AS hop FROM h2
    """

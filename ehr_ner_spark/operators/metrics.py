"""seqeval-semantics span metrics as DataFrame aggregations.

Reference semantics (/root/reference/utils/seqhelper/src/eval.py):

* entities are SETS of ``(pid, type, start_pos, end_pos, text)`` tuples
  (eval.py:124-143 ``_toSet``) — so both sides are deduped before counting;
* micro: ``nb_correct = |true ∩ pred|``, ``p = correct/pred``,
  ``r = correct/true``, ``f1 = 2pr/(p+r)``, zero-denominator -> 0
  (eval.py:16-36, 94-99);
* per-type report + micro/macro rollup (eval.py:50-92 ``classification_report``;
  macro = unweighted mean over types present in either side).

The set intersection is an inner equi-join on the full span tuple (J2);
Spark's partial+final hash aggregation replaces the Python set machinery.
Zero-division handling deviates from NumPy nan-propagation deliberately:
0/0 -> 0 on BOTH the Spark and oracle side (documented; the reference's
published test values are unaffected, see tests/test_metrics.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SPAN_KEY = ["pid", "type", "start_pos", "end_pos", "text"]


def _as_sets(gold: DataFrame, pred: DataFrame):
    """Deduped span sets, persisted: every caller consumes each set at
    least twice (its own count agg + the intersection join), so without
    the persist the upstream gold/detect pipeline re-executes per
    consumer (released via cache.release_all between registry queries)."""
    from ..cache import tracked_persist

    g = tracked_persist(gold.select(*SPAN_KEY).dropDuplicates(SPAN_KEY))
    p = tracked_persist(pred.select(*SPAN_KEY).dropDuplicates(SPAN_KEY))
    return g, p


def micro_prf(gold: DataFrame, pred: DataFrame, digits: int = 6) -> DataFrame:
    """A1: corpus micro precision/recall/F1 (eval.py:16-36)."""
    g, p = _as_sets(gold, pred)
    correct = p.join(g, SPAN_KEY, "inner")
    counts = (
        g.agg(F.count(F.lit(1)).alias("nb_true"))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("nb_pred")))
        .crossJoin(correct.agg(F.count(F.lit(1)).alias("nb_correct")))
    )
    pr = F.when(F.col("nb_pred") > 0, F.col("nb_correct") / F.col("nb_pred")).otherwise(F.lit(0.0))
    rc = F.when(F.col("nb_true") > 0, F.col("nb_correct") / F.col("nb_true")).otherwise(F.lit(0.0))
    out = counts.select(
        "nb_correct", "nb_pred", "nb_true",
        pr.alias("p_raw"), rc.alias("r_raw"),
    ).select(
        "nb_correct", "nb_pred", "nb_true",
        F.round("p_raw", digits).alias("precision"),
        F.round("r_raw", digits).alias("recall"),
        F.round(
            F.when(
                (F.col("p_raw") + F.col("r_raw")) > 0,
                2 * F.col("p_raw") * F.col("r_raw") / (F.col("p_raw") + F.col("r_raw")),
            ).otherwise(F.lit(0.0)),
            digits,
        ).alias("f1"),
    )
    return out


def classification_report(gold: DataFrame, pred: DataFrame, digits: int = 6) -> DataFrame:
    """A2: per-type rows + 'micro avg' + 'macro avg' rollup rows
    (eval.py:50-92).  Types are the union of gold/pred types; support is the
    gold count (eval.py:64)."""
    g, p = _as_sets(gold, pred)
    correct = p.join(g, SPAN_KEY, "inner")

    per = (
        g.groupBy("type").agg(F.count(F.lit(1)).alias("nb_true"))
        .join(p.groupBy("type").agg(F.count(F.lit(1)).alias("nb_pred")), "type", "full")
        .join(correct.groupBy("type").agg(F.count(F.lit(1)).alias("nb_correct")), "type", "left")
        .na.fill(0, ["nb_true", "nb_pred", "nb_correct"])
    )
    pr = F.when(F.col("nb_pred") > 0, F.col("nb_correct") / F.col("nb_pred")).otherwise(F.lit(0.0))
    rc = F.when(F.col("nb_true") > 0, F.col("nb_correct") / F.col("nb_true")).otherwise(F.lit(0.0))
    per = per.select(
        "type", "nb_correct", "nb_pred", "nb_true",
        pr.alias("p_raw"), rc.alias("r_raw"),
    ).withColumn(
        "f_raw",
        F.when(
            (F.col("p_raw") + F.col("r_raw")) > 0,
            2 * F.col("p_raw") * F.col("r_raw") / (F.col("p_raw") + F.col("r_raw")),
        ).otherwise(F.lit(0.0)),
    )

    type_rows = per.select(
        F.col("type").alias("label"),
        F.round("p_raw", digits).alias("precision"),
        F.round("r_raw", digits).alias("recall"),
        F.round("f_raw", digits).alias("f1"),
        F.col("nb_true").alias("support"),
    )

    from ..cache import tracked_persist

    per = tracked_persist(per)  # feeds the type rows AND both rollups
    totals = per.agg(
        F.sum("nb_correct").alias("c"),
        F.sum("nb_pred").alias("pn"),
        F.sum("nb_true").alias("tn"),
        F.avg("p_raw").alias("mp"),
        F.avg("r_raw").alias("mr"),
        F.avg("f_raw").alias("mf"),
    )
    mp = F.when(F.col("pn") > 0, F.col("c") / F.col("pn")).otherwise(F.lit(0.0))
    mr = F.when(F.col("tn") > 0, F.col("c") / F.col("tn")).otherwise(F.lit(0.0))
    micro = totals.select(
        F.lit("micro avg").alias("label"),
        F.round(mp, digits).alias("precision"),
        F.round(mr, digits).alias("recall"),
        F.round(
            F.when((mp + mr) > 0, 2 * mp * mr / (mp + mr)).otherwise(F.lit(0.0)), digits
        ).alias("f1"),
        F.col("tn").alias("support"),
    )
    macro = totals.select(
        F.lit("macro avg").alias("label"),
        F.round("mp", digits).alias("precision"),
        F.round("mr", digits).alias("recall"),
        F.round("mf", digits).alias("f1"),
        F.col("tn").alias("support"),
    )
    return type_rows.unionByName(micro).unionByName(macro)


def token_confusion(gold_tokens: DataFrame, pred_tokens: DataFrame) -> DataFrame:
    """A4 (metrics_sl.py:243-270 ``performance_measure``): token-level
    TP/FP/FN/TN with the reference's exact predicates (TP counts equal
    non-O-involved pairs; FP any wrong non-O prediction; FN gold non-O
    predicted O; TN both O).  Inputs: (pid, pos, label) frames."""
    j = gold_tokens.alias("g").join(pred_tokens.alias("p"), ["pid", "pos"], "inner")
    gt, pr = F.col("g.label"), F.col("p.label")
    return j.agg(
        F.sum(((gt == pr) & ((gt != "O") | (pr != "O"))).cast("long")).alias("TP"),
        F.sum(((gt != pr) & (pr != "O")).cast("long")).alias("FP"),
        F.sum(((gt != "O") & (pr == "O")).cast("long")).alias("FN"),
        F.sum(((gt == "O") & (pr == "O")).cast("long")).alias("TN"),
    )


def paint_flat_labels(positions: DataFrame, flat_spans: DataFrame) -> DataFrame:
    """Paint a NON-OVERLAPPING span set onto a (pid, pos) token-position
    frame as BIO labels (P1's painting direction, run distributedly): B-type
    at a span's start, I-type inside, O elsewhere.  The join is a plain
    pid-hash equi-join with the BETWEEN as residual condition — spans per
    pid are few, no broadcast of the (corpus-sized at 100 TB) span frame."""
    p, s = positions.alias("p"), flat_spans.alias("s")
    cond = (
        (F.col("p.pid") == F.col("s.pid"))
        & (F.col("p.pos") >= F.col("s.start_pos"))
        & (F.col("p.pos") <= F.col("s.end_pos"))
    )
    # pass every positions column through (e.g. the token text for the S9
    # sink) and append the painted label
    keep = [F.col(f"p.{c}").alias(c) for c in positions.columns]
    return p.join(s, cond, "left").select(
        *keep,
        F.when(F.col("s.type").isNull(), F.lit("O"))
        .when(
            F.col("p.pos") == F.col("s.start_pos"),
            F.concat(F.lit("B-"), F.col("s.type")),
        )
        .otherwise(F.concat(F.lit("I-"), F.col("s.type")))
        .alias("label"),
    )


def token_accuracy(gold_tokens: DataFrame, pred_tokens: DataFrame) -> DataFrame:
    """A3 (eval.py:39-47): elementwise label equality ratio after explode.
    Inputs: (pid, pos, label) frames."""
    j = gold_tokens.alias("g").join(
        pred_tokens.alias("p"), ["pid", "pos"], "inner"
    )
    return j.agg(
        F.round(F.avg((F.col("g.label") == F.col("p.label")).cast("double")), 6).alias("accuracy"),
        F.count(F.lit(1)).alias("nb_tokens"),
    )


def micro_prf_by_group(gold: DataFrame, pred: DataFrame,
                       doc_groups: DataFrame,
                       digits: int = 6) -> DataFrame:
    """Sliced evaluation: micro P/R/F1 per document group (A1 stratified
    by `doc_groups` (pid, grp) — e.g. per source repo), the slice-based
    error analysis a corpus-scale evaluation needs (a 0.95 corpus micro
    can hide a 0.50 slice).

    Same set semantics as :func:`micro_prf`; per-group counts are three
    map-side-combined aggregations over the pid-keyed join with the
    group map, met by full outer joins on the group key so slices with
    zero predictions (or zero gold) still report.  At scale the group
    map is doc-count-sized and the per-group frame is |groups| rows."""
    g, p = _as_sets(gold, pred)
    correct = p.join(g, SPAN_KEY, "inner")

    def _cnt(df: DataFrame, name: str) -> DataFrame:
        return (
            df.join(doc_groups, "pid")
            .groupBy("grp")
            .agg(F.count(F.lit(1)).alias(name))
        )

    counts = (
        _cnt(g, "nb_true")
        .join(_cnt(p, "nb_pred"), "grp", "full")
        .join(_cnt(correct, "nb_correct"), "grp", "full")
        .select(
            "grp",
            F.coalesce("nb_correct", F.lit(0)).alias("nb_correct"),
            F.coalesce("nb_pred", F.lit(0)).alias("nb_pred"),
            F.coalesce("nb_true", F.lit(0)).alias("nb_true"),
        )
    )
    pr = F.when(F.col("nb_pred") > 0,
                F.col("nb_correct") / F.col("nb_pred")).otherwise(F.lit(0.0))
    rc = F.when(F.col("nb_true") > 0,
                F.col("nb_correct") / F.col("nb_true")).otherwise(F.lit(0.0))
    return counts.select(
        "grp", "nb_correct", "nb_pred", "nb_true",
        pr.alias("p_raw"), rc.alias("r_raw"),
    ).select(
        "grp", "nb_correct", "nb_pred", "nb_true",
        F.round("p_raw", digits).alias("precision"),
        F.round("r_raw", digits).alias("recall"),
        F.round(
            F.when(
                (F.col("p_raw") + F.col("r_raw")) > 0,
                2 * F.col("p_raw") * F.col("r_raw")
                / (F.col("p_raw") + F.col("r_raw")),
            ).otherwise(F.lit(0.0)),
            digits,
        ).alias("f1"),
    )


CALIB_BIN_FLOOR = -10


def confidence_calibration(conf: DataFrame, gold_spans: DataFrame,
                           bin_floor: int = CALIB_BIN_FLOOR) -> DataFrame:
    """Reliability diagram for the CRF path confidence: bucket the
    per-(doc, type) confidence into 1-log-unit bins and measure, per bin,
    how often the doc REALLY contains a gold mention of that type — the
    calibration check behind every "trust scores above X" triage rule
    (and the ingredient of expected calibration error).

    The bin edge is FLOOR of the already-6-rounded confidence (identical
    double on both engines, so the floor cannot diverge), clamped at
    ``bin_floor``; observed precision is integer basis points.  Shuffle
    profile: one (doc, type) distinct over the gold spans, one equi-join
    on (doc, type), one bounded-key bin aggregate — all map-side
    combinable.

    Output: (bin, n, n_hit, observed_bp).
    Reference contact: consumes W4/W5's confidence (crf_confidence.py)
    and the gold annotator; the reference never calibrates its scores.
    """
    flags = gold_spans.select(
        F.col("pid").alias("doc_id"), "type"
    ).distinct()
    binned = (
        conf.join(flags.withColumn("_hit", F.lit(1)),
                  ["doc_id", "type"], "left")
        .select(
            F.greatest(
                F.lit(bin_floor).cast("long"),
                F.floor(F.col("confidence")).cast("long"),
            ).alias("bin"),
            F.coalesce(F.col("_hit"), F.lit(0)).alias("hit"),
        )
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("hit").cast("long").alias("n_hit"),
        F.expr("(10000 * SUM(hit)) DIV COUNT(*)").alias("observed_bp"),
    )


def confidence_calibration_sql(conf_sql: str, gold_flags_sql: str,
                               bin_floor: int = CALIB_BIN_FLOOR) -> str:
    """DuckDB twin of :func:`confidence_calibration`; ``conf_sql`` and
    ``gold_flags_sql`` are complete queries (own WITHs), nested as
    subqueries."""
    return f"""
    WITH conf AS ({conf_sql}),
    g AS ({gold_flags_sql}),
    binned AS (
      SELECT GREATEST({bin_floor}, FLOOR(c.confidence))::BIGINT AS bin,
             CASE WHEN g.pid IS NOT NULL THEN 1 ELSE 0 END AS hit
      FROM conf c LEFT JOIN g ON g.pid = c.doc_id AND g.type = c.type)
    SELECT bin, COUNT(*)::BIGINT AS n, SUM(hit)::BIGINT AS n_hit,
           ((10000 * SUM(hit)) // COUNT(*))::BIGINT AS observed_bp
    FROM binned GROUP BY bin
    """

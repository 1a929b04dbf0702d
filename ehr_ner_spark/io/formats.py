"""Additional source/sink formats: newline-delimited JSON with
PERMISSIVE corrupt-record auditing, and an ORC round-trip.

1. ``jsonl_ingest_audit``: the ingestion-robustness path every web-scale
   pipeline needs — read JSONL with an EXPLICIT schema (never inference:
   a schema-inference pass is a second full scan of 100 TB) in PERMISSIVE
   mode, so malformed lines land in ``_corrupt_record`` instead of
   failing the job, and emit the per-language parse audit.  The fixture
   is self-contained and deterministic: the documents table is serialized
   to JSONL with ``to_json`` (JVM-side, handles embedded newlines by JSON
   escaping) and every 10th document's line is truncated to 20 chars —
   guaranteed-invalid JSON since ``doc_id`` is the first key.  The DuckDB
   twin never sees the file: it predicts the audit straight from the
   documents view (parsed = doc_id % 10 != 0), which is exactly the
   round-trip-identity claim under test.

2. ``orc_roundtrip``: write a lineitem projection as ORC, read it back,
   aggregate — the column-pruned scan works against the ORC reader just
   as it does against parquet (both are Spark-native columnar sources).

Reference contact: the reference's readers are file formats too
(utils/loader.py CoNLL, MRC JSON — both implemented in io/tagfiles.py and
io/mrc.py); these two extend the engine's source matrix the way a user
switching corpora would need.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_EVERY = 10
TRUNC_CHARS = 20


def jsonl_ingest_audit(docs: DataFrame) -> DataFrame:
    """documents -> per-language ``(lang, n_rows, sum_chars)`` parse audit
    of a JSONL round-trip where every CORRUPT_EVERY-th line is truncated;
    corrupt lines are audited under lang='_corrupt'."""
    spark = docs.sparkSession
    line = F.to_json(F.struct("doc_id", "text", "lang"))
    jsonl = docs.select(
        F.when(
            F.col("doc_id") % CORRUPT_EVERY == 0,
            F.substring(line, 1, TRUNC_CHARS),
        )
        .otherwise(line)
        .alias("value")
    )
    root = tempfile.mkdtemp(prefix="jsonl_ingest_")
    jsonl.write.mode("overwrite").text(root)
    parsed = (
        spark.read.schema(
            "doc_id LONG, text STRING, lang STRING, _corrupt_record STRING"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(root)
    )
    return (
        parsed.select(
            F.when(F.col("_corrupt_record").isNotNull(), F.lit("_corrupt"))
            .otherwise(F.col("lang"))
            .alias("lang"),
            F.coalesce(F.length("text"), F.lit(0)).alias("n_chars"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("n_chars").alias("sum_chars"),
        )
    )


def jsonl_ingest_audit_sql() -> str:
    """DuckDB twin — predicts the audit from the documents view (the
    round-trip-identity claim): parsed rows are exactly the untruncated
    documents, corrupt rows are the truncated ones with NULL fields."""
    return f"""
    WITH audited AS (
      SELECT CASE WHEN doc_id % {CORRUPT_EVERY} = 0 THEN '_corrupt'
                  ELSE lang END AS lang,
             CASE WHEN doc_id % {CORRUPT_EVERY} = 0 THEN 0
                  ELSE LENGTH(text) END AS n_chars
      FROM documents)
    SELECT lang, COUNT(*)::BIGINT AS n_rows, SUM(n_chars)::BIGINT AS sum_chars
    FROM audited GROUP BY lang
    """


def orc_roundtrip(lineitem: DataFrame) -> DataFrame:
    """lineitem -> ORC sink -> ORC source -> per-flag/status profile in
    exact cents (the same integer-cents discipline as the parquet
    queries)."""
    spark = lineitem.sparkSession
    root = tempfile.mkdtemp(prefix="orc_roundtrip_")
    lineitem.select(
        "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"
    ).write.mode("overwrite").orc(root)
    back = spark.read.orc(root)
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    return (
        back.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            F.sum(cents).alias("sum_price_cents"),
        )
    )


def orc_roundtrip_sql() -> str:
    """DuckDB twin — the same profile straight off the lineitem view
    (round-trip identity: ORC write+read must not change a value)."""
    return """
    SELECT l_returnflag, l_linestatus,
           COUNT(*)::BIGINT AS n_rows,
           SUM(l_quantity::BIGINT)::BIGINT AS sum_qty,
           SUM(ROUND(l_extendedprice * 100)::BIGINT)::BIGINT
             AS sum_price_cents
    FROM lineitem GROUP BY 1, 2
    """


# ---------------------------------------------------------------------------
# N-Triples KG export (W3C RDF line serialization)
# ---------------------------------------------------------------------------

def ntriples_lines(triples: DataFrame) -> DataFrame:
    """Serialize a (subj, pred, obj) triples frame into W3C N-Triples
    lines — the interchange sink that makes the constructed KG loadable
    by any RDF store:

        ``<urn:{subj}> <urn:rel:{pred}> "{escaped obj}" .``

    String-literal escaping follows the N-Triples grammar (backslash
    FIRST, then double-quote, LF, CR, TAB), entirely with the shared
    ``replace()`` built-in so both engines produce byte-identical lines
    inside whole-stage codegen.  Map-only: serialization adds no shuffle
    on top of the triples plan; at 100 TB the lines stream straight to
    the text sink with the upstream partitioning.
    Output: (line)."""
    esc = (
        "replace(replace(replace(replace(replace(obj,"
        " '\\\\', '\\\\\\\\'),"
        " '\"', '\\\\\"'),"
        " chr(10), '\\\\n'),"
        " chr(13), '\\\\r'),"
        " chr(9), '\\\\t')"
    )
    return triples.select(
        F.expr(
            "concat('<urn:', subj, '> <urn:rel:', pred, '> \"',"
            f" {esc}, '\" .')"
        ).alias("line")
    )


def ntriples_lines_sql(triples_sql: str) -> str:
    """DuckDB twin: the SAME replace() escape chain and concatenation
    over the given triples subquery."""
    return f"""
    WITH t AS ({triples_sql})
    SELECT '<urn:' || subj || '> <urn:rel:' || pred || '> "'
           || replace(replace(replace(replace(replace(obj,
                '\\', '\\\\'),
                '"', '\\"'),
                chr(10), '\\n'),
                chr(13), '\\r'),
                chr(9), '\\t')
           || '" .' AS line
    FROM t
    """

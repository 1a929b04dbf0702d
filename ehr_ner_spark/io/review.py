"""S8: the human-review round-trip (the reference's squad2df / df2squad,
/root/reference/data_process/dataTransformer.py:82-189).

The reference serializes each passage's answers as ``[TYPE][text][s-e]``
strings joined with ``",\\n"`` into one spreadsheet row per passage, hands
the sheet to a human, and parses the (possibly edited) sheet back with the
greedy regex ``\\[(.+)\\]\\[(.+)\\]\\[(\\d+)-(\\d+)\\]``.  Both directions
are reproduced here as DataFrame transforms with the exact same formats —
including the greedy regex, so texts containing ``][`` parse identically
(ambiguously) in both systems.

Format note: the sandbox has no openpyxl, so the sheet itself is written
as CSV (quoted multiline cells carry the ",\\n" joins losslessly);
``write_review_sheet`` upgrades to ``.xlsx`` automatically when openpyxl
is importable.  The xlsx-vs-csv byte format is the ONLY substitution — the
row/column/serialization contract is the reference's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ANSWER_RE = r"\[(.+)\]\[(.+)\]\[(\d+)-(\d+)\]"  # dataTransformer.py:155 (greedy)


def _fmt(c_type, c_text, c_s, c_e):
    return F.concat(
        F.lit("["), c_type, F.lit("]["), c_text, F.lit("]["),
        c_s.cast("string"), F.lit("-"), c_e.cast("string"), F.lit("]"),
    )


def spans_to_review(spans: DataFrame, answers_col: str = "flat_ne_answers") -> DataFrame:
    """(pid, type, start_pos, end_pos, text) spans -> one row per pid with
    the ``",\\n"``-joined ``[TYPE][text][s-e]`` cell (squad2df,
    dataTransformer.py:105-128).  Answers are ordered canonically
    (start_pos, end_pos, type — D2) so the sheet is deterministic under
    repartitioning (the reference emits Python-list order)."""
    return (
        spans.groupBy("pid")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("start_pos", "end_pos", "type", "text")
                        )
                    ),
                    lambda s: _fmt(s["type"], s["text"], s["start_pos"], s["end_pos"]),
                ),
                ",\n",
            ).alias(answers_col)
        )
    )


def review_to_spans(review: DataFrame, answers_col: str = "flat_ne_answers") -> DataFrame:
    """Parse a review sheet back to span rows (df2squad,
    dataTransformer.py:150-175): split on ``",\\n"``, then the reference's
    greedy regex.  Unparseable cells (a human mangled a row) yield no span
    instead of crashing the batch."""
    exploded = review.select(
        "pid", F.explode(F.split(F.col(answers_col), ",\n")).alias("ans")
    ).where(F.col("ans") != "")
    return exploded.select(
        "pid",
        F.regexp_extract("ans", ANSWER_RE, 1).alias("type"),
        F.regexp_extract("ans", ANSWER_RE, 2).alias("text"),
        F.regexp_extract("ans", ANSWER_RE, 3).alias("s_raw"),
        F.regexp_extract("ans", ANSWER_RE, 4).alias("e_raw"),
    ).where(
        (F.col("type") != "") & (F.col("s_raw") != "")
    ).select(
        "pid", "type",
        F.col("s_raw").cast("int").alias("start_pos"),
        F.col("e_raw").cast("int").alias("end_pos"),
        "text",
    )


def write_review_sheet(review: DataFrame, path: str,
                       max_rows: int = 100_000) -> str:
    """Materialize the review sheet for the human loop.  xlsx when openpyxl
    exists (the reference's format), CSV otherwise — one driver-side file
    either way: review sheets are per-batch human artifacts, not corpus-
    sized data (the distributed form is the DataFrame itself).

    ``max_rows`` guards the driver: a review sheet a human will read is
    thousands of rows, so routing a corpus-sized frame through this sink is
    a caller bug — fail loudly instead of OOMing the driver.  Raise the cap
    explicitly if a genuinely larger sheet is intended."""
    # one job, not two: limit(cap+1).toPandas() both detects overflow and
    # collects the sheet, and the collect itself is bounded by the cap —
    # a separate count() would re-execute the full upstream DAG (a battery
    # scoring run for mention-derived sheets) just to throw its rows away
    pdf = review.limit(max_rows + 1).toPandas()
    if len(pdf) > max_rows:
        raise ValueError(
            f"review sheet exceeds max_rows={max_rows}: this is a "
            "driver-side human artifact — write the DataFrame to parquet "
            "for corpus-sized data, or raise max_rows explicitly"
        )
    try:
        import openpyxl  # noqa: F401

        out = path if path.endswith(".xlsx") else path + ".xlsx"
        pdf.to_excel(out, index=False)
    except ImportError:
        out = path if path.endswith(".csv") else path + ".csv"
        pdf.to_csv(out, index=False)
    return out


def read_review_sheet(spark, path: str) -> DataFrame:
    """Read a sheet back (CSV multiline-quoted; xlsx via pandas when
    openpyxl exists)."""
    if path.endswith(".xlsx"):
        import pandas as pd

        return spark.createDataFrame(pd.read_excel(path))
    return (
        spark.read.option("header", True).option("multiLine", True)
        .option("escape", '"').csv(path)
        .withColumn("pid", F.col("pid").cast("long"))
    )

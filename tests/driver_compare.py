"""Local replica of the driver's correctness gate: run a registered query in
Spark AND its DuckDB oracle at a given sf, canonicalize (sort columns by
name, sort rows), and compare row counts, schemas and value hashes.

Usage: python tests/driver_compare.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _canon(pdf):
    import numpy as np

    pdf = pdf[sorted(pdf.columns)].copy()
    if os.environ.get("DRIVER_COMPARE_LENIENT") == "1":
        # array cells (Spark ArrayType / DuckDB LIST reach pandas as
        # ndarray or list) are unorderable for sort_values: canonicalize
        # to a string form — per-element so float reprs stay identical.
        # OFF by default: the DRIVER's comparator has no such fallback
        # (it raises TypeError: unhashable type 'list'), so the strict
        # default makes this harness fail exactly where the driver would.
        for col in pdf.columns:
            if pdf[col].map(lambda v: isinstance(v, (list, np.ndarray))).any():
                pdf[col] = pdf[col].map(
                    lambda v: "[" + ",".join(
                        repr(round(float(x), 9))
                        if isinstance(x, (float, np.floating)) else str(x)
                        for x in v
                    ) + "]"
                    if isinstance(v, (list, np.ndarray)) else str(v)
                )
    pdf = pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)
    return pdf


def _hash(pdf) -> str:
    h = hashlib.sha256()
    for col in pdf.columns:
        for v in pdf[col].tolist():
            if isinstance(v, float):
                v = repr(round(v, 9))
            h.update(str(v).encode())
            h.update(b"\x00")
    return h.hexdigest()


def main() -> None:
    import duckdb

    from ehr_ner_spark import entrypoints
    from ehr_ner_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or list(entrypoints.QUERIES_REGISTRY)

    spark = get_spark(app_name="driver-compare", master="local[8]",
                      shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    failures = []
    for name in names:
        fn = entrypoints.QUERIES_REGISTRY[name]
        if name not in entrypoints.ORACLE_REGISTRY:
            print(f"{name}: NO-ORACLE (rows-only)")
            continue
        try:
            from ehr_ner_spark.cache import release_all

            sdf = fn(spark, sf_dir).toPandas()
            release_all()  # tracked persists don't accumulate across queries
            odf = con.execute(entrypoints.ORACLE_REGISTRY[name]).fetchdf()
            s, o = _canon(sdf), _canon(odf)
            rows = len(s) == len(o)
            schema = list(s.columns) == list(o.columns)
            hmatch = rows and schema and _hash(s) == _hash(o)
            status = "OK" if (rows and schema and hmatch) else "FAIL"
            print(f"{name}: {status} rows={len(s)}/{len(o)} schema={schema} hash={hmatch}")
            if status != "OK":
                failures.append(name)
                if rows and schema:
                    for col in s.columns:
                        if not (s[col].astype(str) == o[col].astype(str)).all():
                            bad = (s[col].astype(str) != o[col].astype(str))
                            i = bad.idxmax()
                            print(f"  first diff col={col} row={i}: "
                                  f"spark={s[col][i]!r} oracle={o[col][i]!r} "
                                  f"({int(bad.sum())} rows differ)")
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"{name}: ERR {type(e).__name__}: {e}")
    spark.stop()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("ALL OK")


if __name__ == "__main__":
    main()

"""Registry-wide invariants: every registered query has a DuckDB oracle and
every oracle at least PLANS in DuckDB against empty tables — a fast gate
that stops a syntactically broken oracle from ever reaching the driver's
correctness run."""

from __future__ import annotations

import duckdb
import pytest

from ehr_ner_spark import entrypoints

_EMPTY_TABLES = {
    "region": "(r_regionkey BIGINT, r_name VARCHAR, r_comment VARCHAR)",
    "nation": "(n_nationkey BIGINT, n_name VARCHAR, n_regionkey BIGINT, n_comment VARCHAR)",
    "customer": "(c_custkey BIGINT, c_name VARCHAR, c_address VARCHAR, c_nationkey BIGINT,"
                " c_phone VARCHAR, c_acctbal DOUBLE, c_mktsegment VARCHAR, c_comment VARCHAR)",
    "supplier": "(s_suppkey BIGINT, s_name VARCHAR, s_address VARCHAR, s_nationkey BIGINT,"
                " s_phone VARCHAR, s_acctbal DOUBLE, s_comment VARCHAR)",
    "part": "(p_partkey BIGINT, p_name VARCHAR, p_mfgr VARCHAR, p_brand VARCHAR,"
            " p_type VARCHAR, p_size INTEGER, p_container VARCHAR,"
            " p_retailprice DOUBLE, p_comment VARCHAR)",
    "orders": "(o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus VARCHAR,"
              " o_totalprice DOUBLE, o_orderdate TIMESTAMP, o_orderpriority VARCHAR,"
              " o_clerk VARCHAR, o_shippriority INTEGER, o_comment VARCHAR)",
    "lineitem": "(l_orderkey BIGINT, l_partkey BIGINT, l_suppkey BIGINT,"
                " l_linenumber INTEGER, l_quantity DOUBLE, l_extendedprice DOUBLE,"
                " l_discount DOUBLE, l_tax DOUBLE, l_returnflag VARCHAR,"
                " l_linestatus VARCHAR, l_shipdate TIMESTAMP, l_commitdate TIMESTAMP,"
                " l_receiptdate TIMESTAMP, l_shipinstruct VARCHAR, l_shipmode VARCHAR,"
                " l_comment VARCHAR)",
    "events": "(event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type VARCHAR,"
              " value DOUBLE, props VARCHAR)",
    "documents": "(doc_id BIGINT, text VARCHAR, lang VARCHAR, source VARCHAR, n_chars BIGINT)",
    "embeddings": "(vec_id BIGINT, embedding FLOAT[], label INTEGER, norm DOUBLE)",
}


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t, schema in _EMPTY_TABLES.items():
        c.execute(f"CREATE TABLE {t} {schema}")
    return c


def test_every_query_has_an_oracle():
    missing = [n for n in entrypoints.QUERIES_REGISTRY
               if n not in entrypoints.ORACLE_REGISTRY]
    assert not missing, missing


def test_every_oracle_plans_in_duckdb(con):
    failures = []
    for name in entrypoints.ORACLE_REGISTRY:
        sql = entrypoints.ORACLE_REGISTRY[name]
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as e:  # noqa: BLE001
            failures.append((name, str(e).splitlines()[0]))
    assert not failures, failures


def test_no_list_typed_oracle_outputs(con):
    """The driver's row canonicalizer (pandas sort_values -> factorize)
    raises ``TypeError: unhashable type: 'list'`` on LIST-typed result
    columns — this burned ``kg_featurize`` in round 1 and
    ``ds_inverted_index`` in round 3.  Gate: no registered oracle may
    emit a LIST/ARRAY/STRUCT/MAP-typed column; serialize to CSV strings
    at the registry boundary instead (array_join / array_to_string)."""
    failures = []
    for name, sql in entrypoints.ORACLE_REGISTRY.items():
        if name.startswith("mm_"):
            continue  # synth_media oracles build their own input via range()
        try:
            desc = con.execute(f"SELECT * FROM ({sql}) LIMIT 0").description
        except Exception:  # noqa: BLE001
            continue  # empty-table execution gate reports this one
        for col, type_code, *_ in desc:
            t = str(type_code).upper()
            if "[]" in t or any(k in t for k in ("LIST", "STRUCT", "MAP(")):
                failures.append((name, col, str(type_code)))
    assert not failures, failures


def test_every_oracle_executes_on_empty_tables(con):
    """Empty-input degeneracy: oracles must RUN (not just plan) on empty
    tables — catches e.g. list-type unification and recursion-anchor bugs
    the synthetic corpus can't reach."""
    failures = []
    for name in entrypoints.ORACLE_REGISTRY:
        if name.startswith("mm_"):
            continue  # synth_media oracles build their own input via range()
        sql = entrypoints.ORACLE_REGISTRY[name]
        try:
            con.execute(sql).fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append((name, str(e).splitlines()[0]))
    assert not failures, failures

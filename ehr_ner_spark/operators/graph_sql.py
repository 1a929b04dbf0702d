"""Shared DuckDB CTE prelude for the entity co-occurrence graph twins.

Single source of truth for the edge construction every graph-family
oracle replays (the SQL mirror of communities.py::entity_edges):
mentions -> distinct (doc, entity) -> a<b doc-keyed self-join with
support >= min_pair -> optionally the doubled (src, dst) adjacency.
A change to edge semantics lands here once and every twin follows.
"""

from __future__ import annotations


def edges_prelude(mentions_sql: str, min_pair: int = 2,
                  with_bidir: bool = True) -> str:
    """``WITH mentions/ents/ed[/bidir]`` — no trailing comma; callers
    append their own CTEs with a leading ``,``."""
    head = f"""
    WITH mentions AS ({mentions_sql}),
    ents AS (SELECT DISTINCT doc_id, text FROM mentions),
    ed AS MATERIALIZED (
      SELECT a.text AS ent_a, b.text AS ent_b
      FROM ents a JOIN ents b ON a.doc_id = b.doc_id AND a.text < b.text
      GROUP BY a.text, b.text
      HAVING COUNT(*) >= {min_pair})"""
    if not with_bidir:
        return head
    return head + """,
    bidir AS MATERIALIZED (
      SELECT ent_a AS src, ent_b AS dst FROM ed
      UNION ALL SELECT ent_b AS src, ent_a AS dst FROM ed)"""

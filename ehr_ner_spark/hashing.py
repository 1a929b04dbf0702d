"""The engine's single hash discipline, shared by every kernel AND every
DuckDB oracle twin.

* ``md5_60``      — first 60 bits of md5 as a non-negative int
                    (Python / NumPy kernels)
* ``md5_60_expr`` — the same value as a Spark built-in expression
                    (``conv(substr(md5(x), 1, 15), 16, 10)``)
* ``MD5_60_SQL``  — the same value as DuckDB SQL
                    (``('0x' || substr(md5(x), 1, 15))::BIGINT``)
* ``P31`` + ``universal_coeffs`` — the (a*x + b) mod 2^31-1 permutation
  family used by both MinHash stacks.  2^31-1 is deliberate: a*x fits in
  int64 AND the modulo genuinely wraps; a larger prime whose products
  cannot wrap would be order-preserving, which makes every "permutation"
  pick the same min shingle and destroys LSH banding amplification.

Changing the family means changing THIS module — the engine and its SQL
oracles cannot silently fork.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

MD5_60_SQL = "('0x' || substr(md5({x}), 1, 15))::BIGINT"

P31 = (1 << 31) - 1


def md5_60(s: str) -> int:
    """First 60 bits of md5 of the UTF-8 encoding of ``s``."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def md5_60_expr(col):
    """Spark-expression twin of :func:`md5_60` (JVM built-ins, codegen)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def universal_coeffs(salt: str, i: int) -> tuple[int, int]:
    """Deterministic (a, b) for permutation i of family ``salt``:
    seeded from md5 so oracles can embed the same literals."""
    seed = int(hashlib.md5(f"{salt}{i}".encode()).hexdigest(), 16)
    return (seed % (P31 - 1)) + 1, (seed >> 40) % P31

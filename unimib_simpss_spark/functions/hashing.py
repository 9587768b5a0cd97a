"""Portable, engine-agnostic hashing column expressions.

These produce IDENTICAL values in Spark and DuckDB (both expose md5),
which lets hash-based operators (exact dedup, MinHash, fingerprints) be
verified against the DuckDB oracle bit-for-bit. Spark's native
``xxhash64``/``hash`` would be faster but engine-specific; md5 via
whole-stage codegen is still JVM-side and vectorized — fine for the
correctness path, and the operators accept a swap-in hash for production.

DuckDB equivalent of ``hash64(c)``::

    ('0x' || substring(md5(c), 1, 15))::BIGINT

15 hex digits = 60 bits, always non-negative, fits BIGINT in both.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Mersenne prime 2^31-1: universal-hash modulus. a*h+b stays < 2^62.
MERSENNE_31 = 2_147_483_647

# Shingle-hash composition base (Horner over per-token hashes mod P31).
# Every intermediate stays < P31*B ≈ 2^51 — safe in Spark longs AND
# DuckDB BIGINT (which errors on overflow instead of wrapping).
COMBO_BASE = 1_000_003


def hash64(col: Column | str) -> Column:
    """60-bit non-negative integer hash of a string column (md5-based)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def hash64_sql(expr: str) -> str:
    """DuckDB SQL text equivalent of :func:`hash64`."""
    return f"(('0x' || substring(md5({expr}), 1, 15))::BIGINT)"

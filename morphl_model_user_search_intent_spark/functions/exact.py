"""Deterministic float aggregation helpers for cross-engine parity.

Double sums are order-dependent; Spark's partial/final aggregation and
DuckDB's parallel aggregation sum in different orders, so raw
``SUM(double)`` can differ in the last ulps — enough to break the
driver's exact value-hash.  Two exact disciplines are used engine-wide,
each mirrored verbatim in the DuckDB oracle SQL so both engines produce
bit-identical doubles:

1. **Scaled-long (fast path)** — :func:`units` / :func:`lsum`: a
   fixed-point column (money in cents, 2-dp rates) is converted to
   exact integer units (``round(x·scale)`` as BIGINT), summed as a
   plain long — Spark's fastest aggregation path, measured ~3.5×
   faster than decimal accumulation at sf0.1 — and divided back once
   (one exact-integer→double conversion + one division, both
   deterministic).  Used in the hot/headline aggregates.  Headroom:
   a per-GROUP total must stay under 2^63 units; with cent units of
   magnitude ≤1e7 that is ~1e11 rows per group, and product terms
   (1e-4/1e-6 units) proportionally fewer — when a single group can
   exceed that at extreme scale, promote that query to :func:`dsum`.

2. **Decimal (general path)** — :func:`dsum` / :func:`davg`: cast
   each value to DECIMAL(27,6), sum exactly, cast back to DOUBLE.
   No overflow in practice (21 integer digits), works for any ≤6-dp
   value, costs ~1 µs-class decimal add per row — the default
   everywhere throughput is not critical.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# decimal(27,6): 21 integer digits — sums of 1e15 values of magnitude
# ~1e6 cannot overflow; 6 fractional digits cover every fixture column.
DEC = "decimal(27,6)"


def dsum(col: Column | str, alias: str | None = None) -> Column:
    """Exact (decimal-accumulated) sum, returned as DOUBLE.

    Oracle twin: ``CAST(SUM(CAST(x AS DECIMAL(27,6))) AS DOUBLE)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(DEC)).cast("double")
    return out.alias(alias) if alias else out


def davg(col: Column | str, alias: str | None = None) -> Column:
    """Deterministic average: exact decimal sum / count, in DOUBLE.

    Oracle twin:
    ``CAST(SUM(CAST(x AS DECIMAL(27,6))) AS DOUBLE) / COUNT(x)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(DEC)).cast("double") / F.count(c)
    return out.alias(alias) if alias else out


def units(col: Column | str, scale: int) -> Column:
    """Fixed-point column → exact integer units (BIGINT).

    ``round(x · scale)`` recovers the exact integer a ≤`scale`-dp
    value encodes (the double is within ~1e-9 of it, never near .5,
    so HALF_UP vs HALF_EVEN cannot diverge).  Oracle twin:
    :func:`SQL_UNITS`.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * scale if scale != 1 else c).cast("bigint")


def lsum(u: Column, divisor: int, alias: str | None = None) -> Column:
    """Exact scaled-long sum: SUM(integer units) / divisor → DOUBLE.

    The long total is exact; the single division is the only float op
    (deterministic in both engines).  Oracle twin: :func:`SQL_LSUM`.
    """
    out = F.sum(u) / F.lit(float(divisor))
    return out.alias(alias) if alias else out


def units_nn(col: Column | str, scale: int) -> Column:
    """Non-negative fixed-point column → exact integer units (BIGINT),
    via ``floor(x·scale + 0.5)``.

    Semantically identical to :func:`units` for x ≥ 0 (for exact
    ≤`scale`-dp values the double sits within ~1e-9 of the integer, so
    +0.5 can never cross a boundary), but ~40% faster on the scan
    stage: Spark's ``round(double)`` routes through a per-value
    BigDecimal ``setScale`` while ``floor`` is a JIT-intrinsic
    ``Math.floor`` (measured on B1 at sf0.1: 0.47 s vs 0.68 s warm
    collect).  PRECONDITION: x ≥ 0 — for negatives floor(x+0.5) is
    round-half-UP while round() is half-away-from-zero; use
    :func:`units` for signed columns (acctbal).  Oracle twin:
    :func:`SQL_UNITS_NN`.
    """
    c = F.col(col) if isinstance(col, str) else col
    inner = c * scale if scale != 1 else c
    return F.floor(inner + F.lit(0.5)).cast("bigint")


def SQL_UNITS(expr: str, scale: int) -> str:
    """DuckDB-side twin of :func:`units`."""
    inner = f"({expr}) * {scale}" if scale != 1 else f"({expr})"
    return f"CAST(round({inner}) AS BIGINT)"


def SQL_UNITS_NN(expr: str, scale: int) -> str:
    """DuckDB-side twin of :func:`units_nn` (identical floor form, so
    both engines quantize the same doubles to the same longs)."""
    inner = f"({expr}) * {scale}" if scale != 1 else f"({expr})"
    return f"CAST(floor({inner} + 0.5) AS BIGINT)"


def SQL_LSUM(units_expr: str, divisor: int) -> str:
    """DuckDB-side twin of :func:`lsum`."""
    return f"(SUM({units_expr}) / {divisor}.0)"


def SQL_DSUM(expr: str) -> str:
    """DuckDB-side twin of :func:`dsum` for building oracle strings."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(27,6))) AS DOUBLE)"


def SQL_DAVG(expr: str) -> str:
    """DuckDB-side twin of :func:`davg`."""
    return f"{SQL_DSUM(expr)} / COUNT({expr})"

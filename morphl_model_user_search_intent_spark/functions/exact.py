"""Deterministic float aggregation helpers for cross-engine parity.

Double sums are order-dependent; Spark's partial/final aggregation and
DuckDB's parallel aggregation sum in different orders, so raw
``SUM(double)`` can differ in the last ulps — enough to break the
driver's exact value-hash.  The fix used engine-wide: cast each value
to DECIMAL (exact for ≤6-dp inputs, deterministic rounding for derived
products), sum exactly, then cast the total back to DOUBLE.  The same
pattern is expressed in the DuckDB oracle SQL, so both engines produce
bit-identical doubles with no "round to N places and hope" fragility.

At 100 TB this costs one decimal add per row inside whole-stage codegen
(partial+final hash agg unchanged, same shuffle shape) — negligible
next to the scan.
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


def SQL_DSUM(expr: str) -> str:
    """DuckDB-side twin of :func:`dsum` for building oracle strings."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(27,6))) AS DOUBLE)"


def SQL_DAVG(expr: str) -> str:
    """DuckDB-side twin of :func:`davg`."""
    return f"{SQL_DSUM(expr)} / COUNT({expr})"

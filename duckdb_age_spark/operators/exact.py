"""Exact integer-unit money arithmetic (determinism playbook).

Floating-point ``sum()`` over doubles is order-dependent: Spark's shuffle
partitioning changes the reduction tree run-to-run, so
``round(sum(<double expr>), 2)`` can flip a half-cent boundary between runs
(the CORRECTNESS_r05 ``tpch_q9`` flake) or between engines.  The fixture
money columns are all 2-decimal (TESTDATA: max |x*100 - round(x*100)| <
4e-9) and quantities integer-valued, so every revenue expression can be
restated exactly:

* per row, convert each factor to integer units (``round(x*100)`` — both
  engines compute the identical IEEE double ``x*100`` from the identical
  parquet value, nowhere near a .5 tie);
* multiply integer factors (exact — e.g. cents × (100-disc_pct) ×
  (100+tax_pct) is 1e-6-dollar units);
* sum in decimal(38,0) (Spark) / BIGINT→HUGEINT (DuckDB) — exact in any
  order, so partitioning can't matter;
* ONE terminal int→double conversion + division by the unit scale.  Both
  conversions are correctly rounded IEEE ops on identical operands, hence
  bit-identical across engines — no final ``round()`` needed (and none is
  applied: a final round() re-introduces a cross-engine half-way hazard).

At 100 TB the decimal(38,0) partial aggregate is still map-side combinable
and overflow-safe (sf100 lineitem ≈ 6e8 rows × ~1e12 units/row ≈ 6e20 ≪
1e38); int64 sums would overflow, which is why the cast happens BEFORE the
sum.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def units(col: Column | str, scale: int = 100) -> Column:
    """Per-row exact integer units: ``round(col*scale)`` as BIGINT.

    ``scale=100`` turns 2-decimal money doubles into exact cents.  The
    double product is identical on both engines; round-half-away-from-zero
    matches Spark/DuckDB (values sit within 4e-9 of an integer anyway).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * F.lit(scale)).cast("long")


def exact_sum(unit_expr: Column, divisor: float, alias: str | None = None) -> Column:
    """Order-independent money sum: decimal(38,0) sum of integer units,
    then one int→double conversion and one division by ``divisor``."""
    out = F.sum(unit_expr.cast("decimal(38,0)")).cast("double") / F.lit(float(divisor))
    return out.alias(alias) if alias else out


def sql_units(expr: str, scale: int = 100) -> str:
    """DuckDB twin of :func:`units` for oracle SQL strings."""
    return f"CAST(round(({expr}) * {scale}) AS BIGINT)"


def sql_exact_sum(unit_expr: str, divisor: float) -> str:
    """DuckDB twin of :func:`exact_sum` (sum(BIGINT) is HUGEINT — exact)."""
    return f"(CAST(sum({unit_expr}) AS DOUBLE) / {divisor})"

"""Cross-engine exact-arithmetic fragments shared by queries and oracles.

Engine round() disagrees at decimal half boundaries (Spark rounds the
shortest decimal repr of a double, DuckDB the exact binary), and the
engines' ulp-different float aggregates can land on opposite sides of a
boundary. For the fixture's 2-decimal money/value columns the airtight
form is exact arithmetic — DECIMAL casts or integer cents — applied
IDENTICALLY on both sides. These fragments are that single source of
truth: every spelling of the charge product and the 4dp half-up mean
must come from here so the engines can never drift apart one call site
at a time.
"""

from __future__ import annotations

# the TPC-H charge product in exact decimal (inputs are 2-decimal money);
# identical text works in DuckDB and Spark SQL
CHARGE_DECIMAL_SQL = """CAST(round(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2)))
                      * (1 + CAST(l_tax AS DECIMAL(18,2))), 2) AS DOUBLE)"""


def exact_avg_cents(cents_expr: str, cnt_expr: str, dp: int, engine: str) -> str:
    """Half-up mean at ``dp`` decimals of values whose EXACT total in
    cents is ``cents_expr``, via exact integer division (DuckDB ``//``
    floors, Spark ``div`` truncates — identical for the non-negative
    operands used here). dp >= 2 because the inputs carry 2 decimals."""
    if dp < 2:
        raise ValueError("dp must be >= 2 (inputs are cent-scaled)")
    op = "//" if engine == "duckdb" else "div"
    k = 10**dp // 100  # lift cents to the output scale
    return (
        f"CAST((2 * ({cents_expr}) * {k} + ({cnt_expr}))"
        f" {op} (2 * ({cnt_expr})) AS DOUBLE) / {10**dp}"
    )


def exact_avg4_duckdb(sum_expr: str, cnt_expr: str) -> str:
    """4dp half-up mean of 2-decimal values summed as double (drift-safe
    cents recovery via round(sum*100))."""
    return exact_avg_cents(f"CAST(round(({sum_expr}) * 100) AS BIGINT)", cnt_expr, 4, "duckdb")


def exact_avg4_spark(sum_expr: str, cnt_expr: str) -> str:
    """Spark-SQL twin of exact_avg4_duckdb."""
    return exact_avg_cents(f"CAST(round(({sum_expr}) * 100) AS BIGINT)", cnt_expr, 4, "spark")


def exact_avg4(cents_sum: int, n: int) -> float:
    """Python spelling for pandas kernels: mean of n values whose exact
    cent total is cents_sum, rounded half-up at 4dp."""
    return ((2 * cents_sum * 100 + n) // (2 * n)) / 10000.0


def revenue_decimal_sql(price: str = "l_extendedprice", disc: str = "l_discount") -> str:
    """Exact-decimal discounted-revenue aggregate (both engines):
    sum(price * (1 - disc)) over 2-decimal money, rounded at 2dp in
    decimal, surfaced as DOUBLE."""
    return (
        f"CAST(round(sum(CAST({price} AS DECIMAL(18,2))"
        f" * (1 - CAST({disc} AS DECIMAL(18,2)))), 2) AS DOUBLE)"
    )


def revenue_decimal_col():
    """Spark Column twin of revenue_decimal_sql (aggregate expression)."""
    from pyspark.sql import functions as F

    return (
        F.round(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
            ),
            2,
        ).cast("double")
    )

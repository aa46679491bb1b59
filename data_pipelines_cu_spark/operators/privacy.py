"""Privacy-audit operators: k-anonymity / l-diversity over quasi-identifiers.

Complements the PII scrub (text.scrub_pii): scrubbing removes direct
identifiers; k-anonymity measures RE-identification risk from the attribute
combinations that remain. A row is k-anonymous when at least k rows share its
quasi-identifier (QI) tuple; l-diversity additionally requires >= l distinct
sensitive values inside each QI group (Sweeney 2002; Machanavajjhala 2007).

Distributed shape: one shuffle keyed on the QI tuple produces the group
table; everything after runs over that (group-count-sized) table — the
histogram re-aggregation is a second tiny shuffle keyed on group size.
Integer-exact end to end, so the audit report itself hash-gates.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def k_anonymity_histogram(
    df: DataFrame,
    qi_cols: Sequence[Column | str],
    sensitive: Column | str,
    k: int = 5,
) -> DataFrame:
    """Group-size histogram of the QI partition: one row per group size
    with (grp_size, n_groups, n_rows, min_l, violates_k) where min_l is
    the weakest l-diversity of any group at that size and violates_k flags
    sizes below the k threshold. The whole-table audit a release gate
    reads: 'how many rows sit in groups smaller than k, and how diverse
    are the sensitive values where they do'."""
    qis = [c if isinstance(c, Column) else F.col(c) for c in qi_cols]
    named = [q.alias(f"_qi{i}") for i, q in enumerate(qis)]
    sens = sensitive if isinstance(sensitive, Column) else F.col(sensitive)
    groups = (
        df.select(*named, sens.alias("_sv"))
        .groupBy(*[f"_qi{i}" for i in range(len(qis))])
        .agg(
            F.count(F.lit(1)).alias("grp_size"),
            F.count_distinct("_sv").alias("_l"),
        )
    )
    return (
        groups.groupBy("grp_size")
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum("grp_size").alias("n_rows"),
            F.min("_l").alias("min_l"),
        )
        .select(
            "grp_size",
            "n_groups",
            "n_rows",
            "min_l",
            (F.col("grp_size") < k).alias("violates_k"),
        )
    )


def k_anonymity_oracle_sql(
    table: str,
    qi_exprs: Sequence[str],
    sensitive_expr: str,
    k: int = 5,
) -> str:
    """DuckDB twin of k_anonymity_histogram."""
    qs = ", ".join(qi_exprs)
    return f"""
    WITH groups AS (
        SELECT {qs}, CAST(COUNT(*) AS BIGINT) AS grp_size,
               CAST(COUNT(DISTINCT {sensitive_expr}) AS BIGINT) AS l
        FROM {table} GROUP BY {qs}
    )
    SELECT grp_size,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(grp_size) AS BIGINT) AS n_rows,
           CAST(MIN(l) AS BIGINT) AS min_l,
           grp_size < {k} AS violates_k
    FROM groups GROUP BY grp_size
    """

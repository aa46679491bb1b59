"""Declarative data-quality expectations (dbt-test / Great-Expectations
shape, Spark-first).

The reference course gates pipelines on hand-rolled validation predicates
(SURVEY §2.2 P10/P12: split-and-quarantine, go/no-go thresholds). This
module generalizes that into a declared expectation SUITE evaluated in as
few passes as the rule mix allows:

- row-local rules (not-null, accepted-values, range, custom predicate)
  fold into ONE aggregate over the table — a single scan with map-side
  partials regardless of how many rules are declared;
- uniqueness is one groupBy on the key;
- referential integrity is one left-anti join against the (usually
  broadcastable) parent keys.

Every check emits (check, n_violations, n_checked, passed) with exact
integer arithmetic, so a suite's full report hash-matches a SQL oracle —
quality gates become gated queries themselves.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_REPORT_COLS = ("check", "n_violations", "n_checked", "passed")


def _finish(per_check: DataFrame) -> DataFrame:
    return per_check.select(
        "check",
        F.col("n_violations").cast("long").alias("n_violations"),
        F.col("n_checked").cast("long").alias("n_checked"),
        (F.col("n_violations") == 0).cast("int").alias("passed"),
    )


def rowwise_expectations(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Evaluate row-local violation predicates in ONE aggregate pass.
    ``rules`` maps check name -> boolean Column that is true WHEN VIOLATED.
    """
    aggs = [F.count(F.lit(1)).alias("_n")]
    for name, cond in rules.items():
        aggs.append(
            F.sum(F.when(cond, 1).otherwise(0)).alias(f"_v_{name}")
        )
    row = df.agg(*aggs)
    stacked = row.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("check"),
                        F.col(f"_v_{name}").alias("n_violations"),
                        F.col("_n").alias("n_checked"),
                    )
                    for name in rules
                ]
            )
        ).alias("r")
    ).select("r.*")
    return _finish(stacked)


def unique_expectation(df: DataFrame, cols: list[str], name: str) -> DataFrame:
    """Uniqueness check: violations = rows carrying a duplicated key (all
    members of a >1 group count, matching dbt's unique test semantics)."""
    grouped = df.groupBy(*cols).agg(F.count(F.lit(1)).alias("_c"))
    stats = grouped.agg(
        F.sum(F.when(F.col("_c") > 1, F.col("_c")).otherwise(0)).alias(
            "n_violations"
        ),
        F.sum("_c").alias("n_checked"),
    )
    return _finish(stats.select(F.lit(name).alias("check"), "n_violations", "n_checked"))


def fk_expectation(
    child: DataFrame,
    child_key: str,
    parent: DataFrame,
    parent_key: str,
    name: str,
) -> DataFrame:
    """Referential integrity: child rows whose key has no parent. The
    anti-join shuffles only keys; at star-schema scale the parent key set
    broadcasts.

    NULL child keys count as orphans HERE (a null never matches a parent,
    on either engine) — deliberately stricter than dbt's relationships
    test, which skips nulls. Declare a not_null rule alongside when the
    two violation classes must be reported separately; the counts then
    overlap by exactly the null count."""
    orphans = child.select(F.col(child_key)).join(
        parent.select(F.col(parent_key).alias(child_key)).distinct(),
        child_key,
        "left_anti",
    )
    n = child.select(F.count(F.lit(1)).alias("n_checked"))
    v = orphans.agg(F.count(F.lit(1)).alias("n_violations"))
    return _finish(
        v.crossJoin(n).select(F.lit(name).alias("check"), "n_violations", "n_checked")
    )


def expectations_report(parts: list[DataFrame]) -> DataFrame:
    """Union the suite's check frames into one report (check ASC gives a
    deterministic presentation order; the gate compares order-free)."""
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out

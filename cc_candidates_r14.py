"""Round-14 dedup_clusters candidates, measured by cc_harness_r14.py
before any of them touches the repo."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_pipelines_cu_spark.operators.materialize import lineage_cut


def cc_prepartitioned(
    pairs: DataFrame,
    id_col_a: str = "id_a",
    id_col_b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Current algorithm, but the adjacency (WITH identity edges folded in)
    is stored hash-partitioned on the per-round join key ``b`` — every
    round's adj-side exchange disappears (the E-sized shuffle; labels, the
    V-sized side, still moves). Self-loops ride the same explode/distinct
    pass, and the initial label table is a narrow filter of the cut."""
    spark = pairs.sparkSession
    npart = spark.sparkContext.defaultParallelism
    adj = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col(id_col_a).alias("a"), F.col(id_col_b).alias("b")
                    ),
                    F.struct(
                        F.col(id_col_b).alias("a"), F.col(id_col_a).alias("b")
                    ),
                    F.struct(
                        F.col(id_col_a).alias("a"), F.col(id_col_a).alias("b")
                    ),
                    F.struct(
                        F.col(id_col_b).alias("a"), F.col(id_col_b).alias("b")
                    ),
                )
            ).alias("_e")
        )
        .select("_e.a", "_e.b")
        .distinct()
        .repartition(npart, "b")
        .transform(lineage_cut)
    )
    labels = adj.filter(F.col("a") == F.col("b")).select(
        F.col("a").alias("node"), F.col("a").alias("label")
    )

    def _label_sum(frame):
        return frame.agg(
            F.sum(F.col("label").cast("decimal(38,0)"))
        ).collect()[0][0]

    prev_sum = _label_sum(labels)
    for _ in range(max_iter):
        new_labels = (
            adj.join(labels, adj.b == labels.node)
            .groupBy("a")
            .agg(F.min("label").alias("label"))
            .withColumnRenamed("a", "node")
        )
        lab2 = new_labels.select(
            F.col("node").alias("_ln"), F.col("label").alias("_ll")
        )
        new_labels = new_labels.join(
            lab2, new_labels.label == lab2._ln, "left"
        ).select(
            "node",
            F.least(
                F.col("label"), F.coalesce(F.col("_ll"), F.col("label"))
            ).alias("label"),
        )
        new_labels = new_labels.transform(lambda d: lineage_cut(d, eager=False))
        new_sum = _label_sum(new_labels)
        labels = new_labels
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("canonical_id")
    )


def cc_two_phase_star(
    pairs: DataFrame,
    id_col_a: str = "id_a",
    id_col_b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Alternating large-star / small-star (Kiveris et al. 2014). Stop rule:
    exact — a round that leaves the canonical oriented edge set unchanged
    (checked with exceptAll on both sides, two extra jobs per round)."""

    def sym(e):
        return e.unionByName(
            e.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )

    def large_star(e):
        s = sym(e)
        w = Window.partitionBy("a")
        m = F.least(F.min("b").over(w), F.col("a"))
        return (
            s.withColumn("_m", m)
            .filter(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), F.col("_m").alias("b"))
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )

    def small_star(e):
        o = e.select(
            F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
        ).distinct()
        w = Window.partitionBy("a")
        m = F.min("b").over(w)
        pointed = o.withColumn("_m", m)
        return (
            pointed.select(F.col("b").alias("a"), F.col("_m").alias("b"))
            .unionByName(
                pointed.select(F.col("a").alias("a"), F.col("_m").alias("b"))
            )
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )

    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col(id_col_a).alias("a"), F.col(id_col_b).alias("b")
                    ),
                    F.struct(
                        F.col(id_col_b).alias("a"), F.col(id_col_a).alias("b")
                    ),
                )
            ).alias("_e")
        )
        .select("_e.a", "_e.b")
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .transform(lineage_cut)
    )
    e = edges
    for _ in range(max_iter):
        e2 = small_star(large_star(e)).transform(lineage_cut)
        changed = (
            e2.exceptAll(e).limit(1).count() > 0
            or e.exceptAll(e2).limit(1).count() > 0
        )
        e = e2
        if not changed:
            break
    # e is (child, root) stars; roots label themselves; nodes appearing
    # ONLY in self-pairs never entered the edge set and label themselves
    roots = e.select(F.col("b").alias("a")).distinct()
    labeled_nodes = e.select("a").unionByName(roots).distinct()
    selfies = (
        pairs.filter(F.col(id_col_a) == F.col(id_col_b))
        .select(F.col(id_col_a).alias("a"))
        .distinct()
        .join(labeled_nodes, "a", "left_anti")
    )
    return (
        e.select(F.col("a").alias("doc_id"), F.col("b").alias("canonical_id"))
        .unionByName(
            roots.select(
                F.col("a").alias("doc_id"), F.col("a").alias("canonical_id")
            )
        )
        .unionByName(
            selfies.select(
                F.col("a").alias("doc_id"), F.col("a").alias("canonical_id")
            )
        )
        .distinct()
    )

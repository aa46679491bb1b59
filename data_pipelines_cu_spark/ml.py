"""ML train/score stages (SURVEY.md §2.10 U5).

Reference: Solutions/gold_war_etl_dag.py:158-181 trains a RandomForest on the
gold×war-news training table and lecture6/test_model.py:26-52 re-scores the
saved model and recomputes accuracy. Spark restatement: the training table is
a DataFrame (pipelines/goldwar.py), the model is a ``pyspark.ml`` Pipeline
(VectorAssembler → RandomForestClassifier) trained with a fixed seed, and
scoring is an ordinary DataFrame transformation — so at scale the scoring
pass is embarrassingly parallel over executors while the (small, per-series)
fit happens once.

``logistic_score`` is the oracle-expressible scoring stage: applying a FIXED
weight vector is pure column algebra (JVM-side, codegen), which is what batch
inference of an already-trained linear model looks like at 100 TB — and what
the driver's DuckDB gate can verify bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def train_classifier(
    training: DataFrame,
    feature_cols: Sequence[str],
    label_col: str = "target",
    seed: int = 42,
    num_trees: int = 20,
    max_depth: int = 5,
):
    """Fit VectorAssembler → RandomForestClassifier with a fixed seed
    (gold_war_etl_dag.py:158-181's RandomForest, as a Spark ML Pipeline).
    Returns the fitted PipelineModel; same seed + same data → same model."""
    from pyspark.ml import Pipeline  # noqa: PLC0415 — keep pyspark.ml optional
    from pyspark.ml.classification import RandomForestClassifier  # noqa: PLC0415
    from pyspark.ml.feature import VectorAssembler  # noqa: PLC0415

    assembler = VectorAssembler(
        inputCols=list(feature_cols), outputCol="features", handleInvalid="skip"
    )
    rf = RandomForestClassifier(
        labelCol=label_col,
        featuresCol="features",
        numTrees=num_trees,
        maxDepth=max_depth,
        seed=seed,
    )
    return Pipeline(stages=[assembler, rf]).fit(training)


def score(model, df: DataFrame, keep_cols: Sequence[str] | None = None) -> DataFrame:
    """Scoring as a DataFrame stage: model.transform, trimmed to the caller's
    columns + ``prediction``. Distributed row-wise — no driver involvement."""
    out = model.transform(df)
    if keep_cols is None:
        keep_cols = df.columns
    return out.select(*keep_cols, "prediction")


def accuracy(model, df: DataFrame, label_col: str = "target") -> float:
    """Recomputed accuracy, the way lecture6/test_model.py:26-52 checks a
    shipped model: fraction of rows where prediction == label."""
    scored = model.transform(df)
    n = scored.count()
    if n == 0:
        return 0.0
    hits = scored.filter(
        F.col("prediction") == F.col(label_col).cast("double")
    ).count()
    return hits / n


def linear_margin(
    features: Sequence[Column | str], weights: Sequence[float], bias: float = 0.0
) -> Column:
    """Fixed-weight linear margin z = bias + Σ w_i·x_i as a single JVM-side
    expression — a left-associative fold of deterministic IEEE +/* ops, so
    the value is bit-identical to the SQL twin (``linear_margin_sql``).
    sign(z) is the class decision (z >= 0 ⇔ sigmoid(z) >= 0.5), which keeps
    the driver-gated scoring query free of ``exp`` — libm exp differs by
    ulps across engines."""
    z = F.lit(float(bias))
    for feat, w in zip(features, weights):
        col = F.col(feat) if isinstance(feat, str) else feat
        z = z + col.cast("double") * F.lit(float(w))
    return z


def linear_margin_sql(
    features: Sequence[str], weights: Sequence[float], bias: float = 0.0
) -> str:
    """DuckDB twin of ``linear_margin`` — same term order, same literals."""
    z = f"{float(bias)!r}"
    for feat, w in zip(features, weights):
        z += f" + CAST({feat} AS DOUBLE) * {float(w)!r}"
    return f"({z})"


def logistic_score(
    features: Sequence[Column | str], weights: Sequence[float], bias: float = 0.0
) -> Column:
    """sigmoid(linear_margin) — batch inference of a trained linear model as
    pure column algebra. Not used in hash-gated queries (exp is not
    cross-engine bit-stable); classify via the margin's sign instead."""
    z = linear_margin(features, weights, bias)
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))

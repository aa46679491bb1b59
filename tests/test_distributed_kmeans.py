"""Large-k k-means: the distributed-centroid assign path
(similarity.assign_nearest_distributed) — above DISTRIBUTED_K_THRESHOLD the
centroid table must never materialize on the driver, and the exact mode
(probe all coarse buckets) must reproduce the collected-path result
bit-for-bit. Forced here via a tiny threshold on the sf0.001 embeddings."""

from __future__ import annotations

import pytest

from data_pipelines_cu_spark.operators import similarity as sim


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _assign(df, **kw):
    return (
        df.select("vec_id", "cluster")
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )


def test_distributed_exact_matches_collected_without_driver_centroids(emb):
    """coarse_probe=None (probe every coarse bucket) is EXACT: per-pair
    cosine scores are batch-independent, so the cogrouped kernel + struct
    max_by reproduces the collected kernel's winner and tie-break for every
    vector — while the only driver collect in the whole run is the
    ~sqrt(k)-row coarse quantizer."""
    k = 64
    collected = _assign(sim.kmeans_assign(emb, n_clusters=k))

    concrete = type(emb)  # classic.DataFrame overrides collect; patch there
    orig = concrete.collect
    stats = {"calls": 0, "rows": 0, "max": 0}

    def counting(self):
        out = orig(self)
        stats["calls"] += 1
        stats["rows"] += len(out)
        stats["max"] = max(stats["max"], len(out))
        return out

    concrete.collect = counting
    try:
        dist = _assign(
            sim.kmeans_assign(
                emb, n_clusters=k, distributed_threshold=8, coarse_probe=None
            )
        )
    finally:
        concrete.collect = orig

    assert dist.equals(collected)
    # ceil(sqrt(64)) = 8 coarse rows is the ONLY thing the driver ever
    # materializes — k=64 centroids never reach it in any single collect
    assert stats["max"] <= 8, stats
    assert stats["rows"] <= 8, stats


def test_distributed_approximate_probe_covers_all_vectors(emb):
    """The default bounded-probe mode stays a total assignment (every
    vector gets exactly one cluster, all clusters within the seed range) —
    the approximation only moves WHICH nearby centroid wins."""
    n = emb.count()
    out = sim.kmeans_assign(
        emb, n_clusters=64, distributed_threshold=8, coarse_probe=4
    )
    pdf = _assign(out)
    assert len(pdf) == n
    assert pdf["vec_id"].is_unique
    assert pdf["cluster"].between(0, 63).all()
    # passthrough contract: every input column survives
    assert set(out.columns) == set(emb.columns) | {"cluster"}

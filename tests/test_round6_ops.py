"""Round-6 regression tests: ADVICE fixes (Z-order lower clamp, exact
integer rank division, NULL-ordering parity, JPEG fill bytes)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from data_pipelines_cu_spark.operators import aggregates as ag
from data_pipelines_cu_spark.operators import layout as lay
from tests.util import rows_key


def test_zorder_negative_inputs_clamp_to_origin_cell(spark):
    """Values below zero clamp to cell 0 in that dimension — without the
    lower clamp, shiftright/% on negative longs emit negative Morton
    terms and a corrupt, non-monotone key (invisible to the oracle gate
    because both engines would compute the identical bad formula)."""
    df = spark.createDataFrame(
        [(1, -500, 7), (2, -1, 7), (3, 0, 7), (4, 100, 7), (5, 0, -3)],
        "event_id long, x long, y long",
    )
    out = {
        r["event_id"]: r["zorder"]
        for r in lay.zorder_key(
            df, F.col("x"), F.col("y"), 1023, 1023, ["event_id"]
        ).collect()
    }
    assert all(v >= 0 for v in out.values())
    # every negative x lands on the same cell as x = 0
    assert out[1] == out[2] == out[3]
    # and below a positive-x key (monotone along the clamped axis)
    assert out[3] < out[4]
    # (0, -3) clamps to the origin cell: key 0 exactly
    assert out[5] == 0


def test_zorder_oracle_parity_with_out_of_range_values(spark):
    """Degenerate-input differential probe: the engine and the (fixed)
    oracle expression agree on rows OUTSIDE [0, max] in either
    dimension."""
    rows = [
        (1, -500, -3.5),
        (2, -1, 0.0),
        (3, 0, 2000.0),
        (4, 5000, 17.2),
        (5, 42, -0.1),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, value double")
    got = lay.zorder_key(
        df,
        F.col("user_id"),
        F.floor(F.col("value")).cast("long"),
        x_max=2047,
        y_max=1023,
        id_cols=["event_id"],
    ).toPandas()
    con = duckdb.connect()
    con.sql(
        "CREATE TABLE events AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, {u}, {v})" for i, u, v in rows)
        + ") AS t(event_id, user_id, value)"
    )
    want = con.sql(
        f"""
        SELECT event_id, {lay.morton_code_sql("xs", "ys")} AS zorder
        FROM (SELECT event_id,
                 (greatest(0, least(user_id, 2047)) * 65536) // 2048 AS xs,
                 (greatest(0, least(CAST(FLOOR(value) AS BIGINT), 1023))
                  * 65536) // 1024 AS ys
              FROM events)
        """
    ).df()
    s = rows_key(list(got.columns), got.itertuples(index=False, name=None))
    d = rows_key(list(want.columns), want.itertuples(index=False, name=None))
    assert s == d


def test_winsorized_null_values_match_oracle(spark):
    """NULL values: Spark windows order NULLS FIRST ascending, DuckDB
    defaults to NULLS LAST — without an explicit NULLS FIRST in the
    oracle the rank-selected cut members diverge. Latent until a NULL
    shows up; this probe pins the parity."""
    rows = [(i, "a", float(v)) for i, v in enumerate([5, 1, 9, 3, 7, 2, 8])]
    rows += [(100, "a", None), (101, "a", None)]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    got = ag.winsorized_stats(df, lo_pct=20, hi_pct=80).toPandas()
    con = duckdb.connect()
    con.sql(
        "CREATE TABLE events AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({i}, '{t}', {'NULL' if v is None else v})" for i, t, v in rows
        )
        + ") AS t(event_id, event_type, value)"
    )
    want = con.sql(ag.winsorized_stats_sql(lo_pct=20, hi_pct=80)).df()
    s = rows_key(list(got.columns), got.itertuples(index=False, name=None))
    d = rows_key(list(want.columns), want.itertuples(index=False, name=None))
    assert s == d


def test_winsorized_rank_division_is_integer_exact(spark):
    """The rank cutoffs must use integer `div`, not double `/`: at a
    boundary case (n*pct divisible by 100) both must pick the same
    member. 10 rows, pct 20/80 -> lo rank 3 (ceil(2)+guard... exactly
    (10*20+99)//100 = 2), hi rank (10*80+99)//100 = 8."""
    rows = [(i, "a", float(i)) for i in range(1, 11)]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    row = ag.winsorized_stats(df, lo_pct=20, hi_pct=80).collect()[0]
    assert row["lo_cut"] == 2.0  # rank (10*20+99)//100 = 2
    assert row["hi_cut"] == 8.0  # rank (10*80+99)//100 = 8
    assert row["n_clipped"] == 3  # values 1, 9, 10


def test_jpeg_decodes_with_fill_bytes_between_markers():
    """T.81 B.1.1.2: optional 0xFF fill bytes may precede any marker —
    real camera output uses them. The marker loop must skip runs of
    fill bytes instead of misparsing the length field."""
    import numpy as np

    from data_pipelines_cu_spark.operators import multimodal as mm

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(24, 17, 3), dtype=np.uint8).astype(np.uint8)
    payload = mm.encode_jpeg_baseline(img)
    base = mm.decode_pixels(payload)

    # inject fill bytes after SOI and before every following marker
    out = bytearray(payload[:2])
    pos = 2
    while pos + 4 <= len(payload):
        assert payload[pos] == 0xFF
        marker = payload[pos + 1]
        out += b"\xff\xff\xff"  # three fill bytes, then the real marker
        if marker == 0xDA:  # SOS: copy the rest verbatim (entropy data)
            out += payload[pos:]
            break
        seg_len = int.from_bytes(payload[pos + 2 : pos + 4], "big")
        out += payload[pos : pos + 2 + seg_len]
        pos += 2 + seg_len
    filled = mm.decode_pixels(bytes(out))
    assert filled.shape == base.shape
    assert (filled == base).all()


def test_edit_distance_pairs_matches_bruteforce(spark):
    """PassJoin candidate generation is COMPLETE: on a random corpus with
    short strings (below the segment-index minimum), repeats, and
    near-misses, the operator's pairs equal the brute-force O(n²)
    levenshtein answer exactly."""
    import itertools
    import random

    from data_pipelines_cu_spark.operators import joins as jn

    rng = random.Random(42)
    alpha = "ab"
    rows = [
        (i, "".join(rng.choice(alpha) for _ in range(rng.randint(0, 9))))
        for i in range(60)
    ]

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    want = sorted(
        (ia, ib, lev(sa, sb))
        for (ia, sa), (ib, sb) in itertools.combinations(rows, 2)
        if sa != sb and lev(sa, sb) <= 2
    )
    df = spark.createDataFrame(rows, "id long, s string")
    got = sorted(
        (r.id_a, r.id_b, r.edit_dist)
        for r in jn.edit_distance_pairs(df, "id", "s", d=2).collect()
    )
    assert got == want


def _duck_events(rows):
    con = duckdb.connect()
    con.sql(
        "CREATE TABLE events AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, TIMESTAMP '{ts}', {u}, {v})" for i, ts, u, v in rows)
        + ") AS t(event_id, ts, user_id, value)"
    )
    return con


def test_psi_constant_value_single_day_parity(spark):
    """Degenerate PSI inputs: a constant value column (every edge equal,
    all mass in bin 1) and a one-day span (current half empty, Laplace
    smoothing carries the ln) must both run and match the oracle."""
    for rows in (
        [(i, "2024-01-01 10:00:00", i, 5.0) for i in range(8)],
        [(i, f"2024-01-{d:02d} 10:00:00", i, 5.0)
         for i, d in enumerate([1, 1, 2, 2, 3, 4, 5, 6])],
    ):
        from datetime import datetime

        sdf_rows = [
            (i, datetime.fromisoformat(ts), u, float(v))
            for i, ts, u, v in rows
        ]
        df = spark.createDataFrame(
            sdf_rows, "event_id long, ts timestamp, user_id long, value double"
        )
        got = ag.psi_value_drift(df).toPandas()
        con = _duck_events(rows)
        want = con.sql(ag.psi_value_drift_sql()).df()
        s = rows_key(list(got.columns), got.itertuples(index=False, name=None))
        d = rows_key(list(want.columns), want.itertuples(index=False, name=None))
        assert s == d


def test_benford_sub_unit_amounts(spark):
    """Amounts below 1: the cents integer still yields the leading
    significant digit (0.05 -> digit 5), never a '0' bucket."""
    df = spark.createDataFrame(
        [(1, 0.05), (2, 0.5), (3, 123.45), (4, 9.0)],
        "o_orderkey long, o_totalprice double",
    )
    out = {r["digit"]: r["n"] for r in ag.benford_digit_audit(df).collect()}
    assert out[5] == 2 and out[1] == 1 and out[9] == 1 and out[2] == 0


def test_seasonal_naive_short_span_is_empty(spark):
    """Fewer than 8 days of data: no lag-7 partner, empty report on both
    engines (not a crash, not a fabricated row)."""
    from datetime import datetime

    rows = [(i, f"2024-01-{d:02d} 10:00:00", i, 1.0)
            for i, d in enumerate(range(1, 7))]
    df = spark.createDataFrame(
        [(i, datetime.fromisoformat(ts), u, v) for i, ts, u, v in rows],
        "event_id long, ts timestamp, user_id long, value double",
    )
    assert ag.seasonal_naive_error(df).count() == 0
    con = _duck_events(rows)
    assert len(con.sql(ag.seasonal_naive_sql()).df()) == 0


def test_priority_sample_small_corpus_keeps_all(spark):
    """n <= k: every row survives with adj_weight == its own weight
    (tau = 0), including zero-weight rows."""
    from data_pipelines_cu_spark.operators import sampling as smp

    df = spark.createDataFrame(
        [(1, 10), (2, 0), (3, 7)], "doc_id long, n_chars long"
    )
    out = {r["doc_id"]: r for r in
           smp.priority_weighted_sample(df, k=100).collect()}
    assert len(out) == 3
    assert all(out[i]["adj_weight"] == float(out[i]["weight"]) for i in out)


def test_temperature_mixture_single_source_and_budget_cap(spark):
    """One source: it gets the whole budget, capped at its own size."""
    from data_pipelines_cu_spark.operators import sampling as smp

    df = spark.createDataFrame(
        [(i, "only") for i in range(5)], "doc_id long, source string"
    )
    row = smp.temperature_source_mixture(df, budget=1000).collect()[0]
    assert row["weight"] == 1.0
    assert row["target_docs"] == 5  # min(budget, n_docs)


def test_embargo_split_drops_gap_and_counts_overlap(spark):
    """10-day span, 80% cutoff at day 9, 2-day embargo: days 7-8 dropped,
    test = days 9-10; a user active in both halves counts once."""
    from datetime import datetime

    rows = [(i, f"2024-01-{d:02d} 09:00:00", 1 if d in (1, 10) else 100 + d, 1.0)
            for i, d in enumerate(range(1, 11))]
    df = spark.createDataFrame(
        [(i, datetime.fromisoformat(ts), u, v) for i, ts, u, v in rows],
        "event_id long, ts timestamp, user_id long, value double",
    )
    from data_pipelines_cu_spark.operators import sampling as smp

    out = {r["split"]: r for r in smp.time_embargo_split(df).collect()}
    assert out["train"]["n_events"] == 6  # days 1-6
    assert out["test"]["n_events"] == 2   # days 9-10
    assert out["train"]["overlap_entities"] == 1  # user 1 on both sides


def test_edit_distance_pairs_other_thresholds(spark):
    """The segment scheme generalizes: d=1 (2 segments) and d=3 (4
    segments) must also match brute force on a mixed-length corpus."""
    import itertools
    import random

    from data_pipelines_cu_spark.operators import joins as jn

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    rng = random.Random(7)
    rows = [
        (i, "".join(rng.choice("abc") for _ in range(rng.randint(0, 12))))
        for i in range(50)
    ]
    df = spark.createDataFrame(rows, "id long, s string")
    for d in (1, 3):
        want = sorted(
            (ia, ib, lev(sa, sb))
            for (ia, sa), (ib, sb) in itertools.combinations(rows, 2)
            if sa != sb and lev(sa, sb) <= d
        )
        got = sorted(
            (r.id_a, r.id_b, r.edit_dist)
            for r in jn.edit_distance_pairs(df, "id", "s", d=d).collect()
        )
        assert got == want, f"d={d}"


def test_temperature_mixture_apportionment_is_exact(spark):
    """With no source capping, the largest-remainder targets sum to the
    budget EXACTLY (floors + top-ups), and every weight is positive."""
    rows = [(i, f"s{i % 7}") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    from data_pipelines_cu_spark.operators import sampling as smp

    out = smp.temperature_source_mixture(df, budget=57).collect()
    assert sum(r["target_docs"] for r in out) == 57
    assert all(r["weight"] > 0 for r in out)
    assert all(r["target_docs"] <= r["n_docs"] for r in out)


def test_pca_component_is_unit_norm_and_monotone(spark, sf_dir):
    """The returned loadings are unit-norm, and the Rayleigh estimate
    ||C·w|| is nondecreasing in the iteration count (the power-iteration
    convergence invariant)."""
    from data_pipelines_cu_spark import ml

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out3 = ml.pca_top_component(emb, n_iters=3).collect()
    assert abs(sum(r["loading"] ** 2 for r in out3) - 1.0) < 1e-6
    e1 = ml.pca_top_component(emb, n_iters=1).collect()[0]["eigenvalue"]
    e3 = out3[0]["eigenvalue"]
    assert e3 >= e1 - 1e-9


def test_orc_round_trip_preserves_values_and_pushdown(spark, sf_dir, tmp_path):
    """ORC sink/scan: values round-trip exactly and a filter reaches the
    ORC stripe reader as a pushed predicate."""
    from data_pipelines_cu_spark.sources.readers import read_orc, write_orc

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    path = str(tmp_path / "orders_orc")
    write_orc(orders, path)
    back = read_orc(spark, path)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, orders.collect())
    )
    plan = (
        back.filter(F.col("o_totalprice") > 100000.0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan and "o_totalprice" in plan


def test_interval_point_join_bucket_boundaries(spark):
    """Containment is inclusive on both ends and bucket straddling works:
    an interval spanning three buckets catches points in each, a point
    exactly at start/end matches, a point one microsecond outside
    doesn't."""
    from data_pipelines_cu_spark.operators import joins as jn

    hour = 3_600_000_000
    iv = spark.createDataFrame(
        [(1, hour - 5, 2 * hour + 5)], "iv_id long, start_us long, end_us long"
    )
    pts = spark.createDataFrame(
        [(1, hour - 5), (2, hour), (3, 2 * hour), (4, 2 * hour + 5),
         (5, hour - 6), (6, 2 * hour + 6)],
        "pt_id long, t_us long",
    )
    got = sorted(
        r.pt_id
        for r in jn.interval_point_join(pts, iv, "t_us").collect()
    )
    assert got == [1, 2, 3, 4]


def test_priority_sample_null_weights_match_oracle(spark):
    """NULL weights: q is NULL, both engines order it out of the top-k
    identically (pinned — null ordering under DESC differs by default in
    some engines)."""
    from data_pipelines_cu_spark.operators import sampling as smp

    rows = [(i, None if i % 5 == 0 else (i * 37) % 100 + 1)
            for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    got = smp.priority_weighted_sample(df, k=10).toPandas()
    con = duckdb.connect()
    con.sql(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({i}, {'NULL' if w is None else w})" for i, w in rows
        )
        + ") AS t(doc_id, n_chars)"
    )
    want = con.sql(smp.priority_sample_sql(k=10)).df()
    s = rows_key(list(got.columns), got.itertuples(index=False, name=None))
    d = rows_key(list(want.columns), want.itertuples(index=False, name=None))
    assert s == d


def test_temperature_mixture_null_source_matches_oracle(spark):
    """A NULL source is a real group on both engines (kept, weighted,
    apportioned) — pinned against group-by-null divergence."""
    from data_pipelines_cu_spark.operators import sampling as smp

    rows = [(i, None if i % 7 == 0 else f"s{i % 3}") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = smp.temperature_source_mixture(df, budget=30).toPandas()
    con = duckdb.connect()
    con.sql(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({i}, {'NULL' if s_ is None else repr(s_)})"
            for i, s_ in rows
        )
        + ") AS t(doc_id, source)"
    )
    want = con.sql(smp.temperature_mixture_sql(budget=30)).df()
    s = rows_key(list(got.columns), got.itertuples(index=False, name=None))
    d = rows_key(list(want.columns), want.itertuples(index=False, name=None))
    assert s == d


def test_gini_uniform_and_degenerate(spark):
    """Uniform amounts: Gini -> (n-1)/n-adjusted ~0 (exactly 0 for the
    discrete formula with equal x); concentration of everything in one
    entity -> Gini -> (n-1)/n; all-zero revenue must not crash."""
    from data_pipelines_cu_spark.operators import aggregates as ag

    ent = spark.createDataFrame([(i,) for i in range(10)], "c_custkey long")
    uniform = spark.createDataFrame(
        [(i, i, 100.0) for i in range(10)],
        "o_orderkey long, o_custkey long, o_totalprice double",
    )
    out = ag.gini_concentration(ent, uniform).collect()
    assert all(r["gini"] == 0.0 for r in out)
    one = spark.createDataFrame(
        [(1, 7, 1000.0)], "o_orderkey long, o_custkey long, o_totalprice double"
    )
    out1 = ag.gini_concentration(ent, one).collect()
    assert all(r["gini"] == 0.9 for r in out1)  # (n-1)/n with n=10
    empty = spark.createDataFrame(
        [], "o_orderkey long, o_custkey long, o_totalprice double"
    )
    rows = ag.gini_concentration(ent, empty).collect()
    assert len(rows) == 10  # zero-filled deciles, no crash
    assert all(r["gini"] is None and r["cum_share"] is None for r in rows)

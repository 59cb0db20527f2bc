"""Rollup tier (sources/rollup.py): exact partial-merge semantics,
alignment guards, and the scan-shape claims that matter at 100 TB."""

import pytest
from pyspark.sql import functions as F

from warp10_platform_spark.plans.audit import explain_formatted, plan_report
from warp10_platform_spark.queries.gts import DAY, LASTBUCKET, NDAYS, _bucketized_decimal_mean
from warp10_platform_spark.sources.rollup import (
    HOUR_US,
    rebucket,
    rollup_merge,
    rollup_partials,
    rollup_points,
)
from warp10_platform_spark.sources.tables import canonical_points


def test_rebucket_alignment_guard(spark, sf_dir):
    ro = rollup_points(spark, sf_dir)
    with pytest.raises(ValueError, match="not a multiple"):
        rebucket(ro, HOUR_US + 1, LASTBUCKET, 3)
    with pytest.raises(ValueError, match="rollup boundary"):
        rebucket(ro, DAY, LASTBUCKET + 1, 3)


def _rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_rollup_daily_mean_matches_raw_scan(spark, sf_dir):
    """The rebucketed hourly rollup must be BIT-identical to the direct
    raw-points bucketize (decimal sums merge exactly)."""
    direct = _bucketized_decimal_mean(spark, sf_dir)
    ro = rebucket(rollup_points(spark, sf_dir), DAY, LASTBUCKET, NDAYS).withColumn(
        "v_agg", F.round(F.col("sum_d").cast("double") / F.col("cnt"), 6)
    )
    cols = ["class", "labels_key", "ts", "v_agg"]
    assert _rows(direct, cols) == _rows(ro, cols)


def test_rollup_merge_equals_full_rollup(spark, sf_dir):
    """Incremental maintenance: partials from two ingest batches merged
    with rollup_merge equal the single-pass rollup on every column —
    counts, decimal sums, min/max, and the first/last endpoint structs."""
    pts = canonical_points(spark, sf_dir)
    full = rollup_partials(pts)
    merged = rollup_merge(
        rollup_partials(pts.where(F.col("event_id") % 2 == 0)),
        rollup_partials(pts.where(F.col("event_id") % 2 == 1)),
    )
    cols = ["gts_id", "rb", "cnt", "sum_d", "min_v", "max_v", "first", "last"]
    assert _rows(full, cols) == _rows(merged, cols)


def test_rollup_query_never_scans_raw_points(spark, sf_dir):
    """The whole point of the tier: the daily profile reads ONLY the
    rollup table (with its rb range pushed to the scan) — no events
    parquet, no canonical points, no cartesian joins."""
    import __spark_entry__ as E

    df = E.queries()["rollup_daily_profile"](spark, sf_dir)
    plan = explain_formatted(df)
    assert "rollup_" in plan
    assert "events.parquet" not in plan and "/points_" not in plan
    r = plan_report(df)
    assert r.cartesian_products == 0 and r.python_evals == 0
    assert any("rb" in p for p in r.pushed_filters)


def test_rollup_is_materially_smaller(spark, sf_dir):
    """Compression sanity: one row per series-hour must beat one row per
    point, or the tier buys nothing."""
    n_points = canonical_points(spark, sf_dir).count()
    n_rollup = rollup_points(spark, sf_dir).count()
    assert n_rollup < n_points


def test_serve_bucketize_routes_and_matches(spark, sf_dir):
    """The materialized-view rewrite: servable+aligned grids come from
    the rollup and match the raw path (bit-exact for count/min/max/
    first/last, FP-reassociation tolerance for sum/mean); non-servable
    or misaligned requests fall back to the raw scan."""
    import math

    from warp10_platform_spark.operators.bucketize import bucketize as raw_bucketize
    from warp10_platform_spark.sources.rollup import serve_bucketize

    for name in ["count", "min", "max", "first", "last", "sum", "mean"]:
        served, route = serve_bucketize(spark, sf_dir, name, DAY, LASTBUCKET, NDAYS)
        assert route == f"rollup:{DAY}", name  # coarsest servable level
        raw, _ = raw_bucketize(canonical_points(spark, sf_dir), name, DAY, LASTBUCKET, NDAYS)
        cols = ["class", "labels_key", "ts", "v_agg"]
        got = _rows(served, cols)
        exp = _rows(raw, cols)
        if name in ("sum", "mean"):
            assert len(got) == len(exp)
            for g, e in zip(got, exp):
                assert g[:3] == e[:3]
                assert math.isclose(float(g[3]), float(e[3]), rel_tol=1e-12), (name, g, e)
        else:
            assert got == exp, name

    # median needs the raw distribution; a misaligned span can't be
    # reconstructed from hourly partials — both must route to raw.
    _, route = serve_bucketize(spark, sf_dir, "median", DAY, LASTBUCKET, NDAYS)
    assert route == "raw"
    _, route = serve_bucketize(spark, sf_dir, "count", DAY + 1, LASTBUCKET, NDAYS)
    assert route == "raw"
    # hour-aligned but not day-aligned: drops one level down the ladder
    _, route = serve_bucketize(spark, sf_dir, "count", 2 * HOUR_US, LASTBUCKET, 6)
    assert route == f"rollup:{HOUR_US}"


def test_rollup_exact_across_spans(spark, sf_dir):
    """Rebucket must stay bit-exact for any aligned target span, not
    just the daily grid the oracled query uses."""
    ro = rollup_points(spark, sf_dir)
    pts = canonical_points(spark, sf_dir)
    for span, count in [(2 * HOUR_US, 36), (6 * HOUR_US, 12), (12 * HOUR_US, 6)]:
        got = rebucket(ro, span, LASTBUCKET, count)
        lo = LASTBUCKET - span * count
        exp = (
            pts.where((F.col("ts") <= LASTBUCKET) & (F.col("ts") > lo))
            .withColumn(
                "ts2",
                F.expr(f"{LASTBUCKET}L - (({LASTBUCKET}L - ts) DIV {span}L) * {span}L"),
            )
            .groupBy("gts_id", "ts2")
            .agg(
                F.count("v_double").alias("cnt"),
                F.sum(F.col("v_double").cast("decimal(28,10)")).alias("sum_d"),
                F.min("v_double").alias("min_v"),
                F.max("v_double").alias("max_v"),
            )
        )
        cols_g = _rows(got, ["gts_id", "ts", "cnt", "sum_d", "min_v", "max_v"])
        cols_e = _rows(exp.withColumnRenamed("ts2", "ts"), ["gts_id", "ts", "cnt", "sum_d", "min_v", "max_v"])
        assert cols_g == cols_e, span


def test_day_level_built_from_hour_level(spark, sf_dir):
    """The day rollup must equal partials computed straight from raw
    points — building it by merging hour-partials loses nothing."""
    from warp10_platform_spark.sources.rollup import DAY_US

    day = rollup_points(spark, sf_dir, DAY_US)
    direct = rollup_partials(canonical_points(spark, sf_dir), DAY_US)
    cols = ["gts_id", "rb", "cnt", "sum_d", "min_v", "max_v", "first", "last"]
    assert _rows(day, cols) == _rows(direct, cols)


def test_hll_register_merge_is_associative(spark, sf_dir):
    """Hourly register partials merged to days must equal registers
    computed directly at day grain — the sketch obeys the same merge
    algebra as the numeric partials."""
    from warp10_platform_spark.sources.rollup import DAY_US, hll_register_partials

    pts = canonical_points(spark, sf_dir)
    item = "CAST(round(v_double*1000000) AS BIGINT)"
    hourly = hll_register_partials(pts, item, HOUR_US, ("class",))
    via_hours = (
        hourly.withColumn("rb", F.expr(f"((rb + {DAY_US - 1}L) DIV {DAY_US}L) * {DAY_US}L"))
        .groupBy("class", "rb", "reg")
        .agg(F.max("mj").alias("mj"))
    )
    direct = hll_register_partials(pts, item, DAY_US, ("class",))
    cols = ["class", "rb", "reg", "mj"]
    assert _rows(via_hours, cols) == _rows(direct, cols)


def test_hll_estimate_accuracy(spark, sf_dir):
    """p=8 HLL carries ~6.5% standard error; the estimate must land
    within a loose 4-sigma band of the exact distinct count."""
    from warp10_platform_spark.sources.rollup import hll_estimate, hll_register_partials

    pts = canonical_points(spark, sf_dir)
    item = "CAST(round(v_double*1000000) AS BIGINT)"
    est = {
        r["class"]: r["n_est"]
        for r in hll_estimate(hll_register_partials(pts, item, HOUR_US, ("class",)), ["class"]).collect()
    }
    exact = {
        r["class"]: r["n"]
        for r in pts.groupBy("class")
        .agg(F.countDistinct(F.expr(item)).alias("n"))
        .collect()
    }
    for cls, n in exact.items():
        assert abs(est[cls] - n) <= max(5, 0.26 * n), (cls, est[cls], n)


def test_histogram_percentile_never_scans_raw_and_merges_exactly(spark, sf_dir):
    """The histogram tier inherits both rollup properties: (a) the p95
    query reads ONLY the materialized histogram table with rb pruning,
    and (b) a two-batch partial merge equals the single-pass histogram
    (the O(delta) maintenance algebra), so the served percentile is
    merge-invariant."""
    import __spark_entry__ as E

    from warp10_platform_spark.operators.bucketize import SERIES_KEYS
    from warp10_platform_spark.sources.rollup import histogram_partials

    df = E.queries()["rollup_daily_p95_hist"](spark, sf_dir)
    plan = explain_formatted(df)
    assert "hist_" in plan
    assert "events.parquet" not in plan and "/points_" not in plan
    r = plan_report(df)
    assert r.cartesian_products == 0 and r.python_evals == 0
    assert any("rb" in p for p in r.pushed_filters)

    pts = canonical_points(spark, sf_dir)
    cut = pts.agg(F.expr("percentile_approx(ts, 0.5)")).collect()[0][0]
    one = histogram_partials(pts)
    merged = (
        histogram_partials(pts.where(F.col("ts") <= cut))
        .unionByName(histogram_partials(pts.where(F.col("ts") > cut)))
        .groupBy(*SERIES_KEYS, "rb", "bin")
        .agg(F.sum("cnt").alias("cnt"))
    )
    assert one.exceptAll(merged).count() == 0 and merged.exceptAll(one).count() == 0


def test_serve_bucketize_approx_percentile_routing(spark, sf_dir):
    """percentile/median requests route to the histogram tier ONLY on
    explicit opt-in; the served value is within one bin width (8.0) of
    the exact raw-scan percentile."""
    from warp10_platform_spark.sources.rollup import serve_bucketize

    _, route = serve_bucketize(spark, sf_dir, "percentile", DAY, LASTBUCKET, NDAYS, p=95.0)
    assert route == "raw"
    served, route = serve_bucketize(
        spark, sf_dir, "percentile", DAY, LASTBUCKET, NDAYS, approx_percentile=True, p=95.0
    )
    assert route == "hist:3600000000"
    # The histogram returns the LOWER EDGE of the bin holding the
    # ceil(q*n)-th ORDER STATISTIC, so that is the comparator the
    # one-bin-width bound is guaranteed against (the interpolating
    # percentile can wander into a sparse-gap neighbor bin).
    pts = canonical_points(spark, sf_dir)
    lo = LASTBUCKET - DAY * NDAYS
    os95 = (
        pts.where((F.col("ts") <= LASTBUCKET) & (F.col("ts") > lo))
        .withColumn("ts2", F.expr(f"{LASTBUCKET}L - (({LASTBUCKET}L - ts) DIV {DAY}L) * {DAY}L"))
        .groupBy("gts_id", "ts2")
        .agg(F.expr(
            "array_sort(collect_list(v_double))[CAST(ceil(0.95 * size(collect_list(v_double))) AS INT) - 1]"
        ).alias("v_os"))
    )
    got = {(r["gts_id"], r["ts"]): r["v_agg"] for r in served.collect()}
    exp = {(r["gts_id"], r["ts2"]): r["v_os"] for r in os95.collect()}
    assert set(got) == set(exp)
    assert all(got[k] <= exp[k] < got[k] + 8.0 for k in exp)


def test_serve_bucketize_sd_var_moment_tier(spark, sf_dir):
    """sd/var joined the servable set via the s1q/s2q moment partials:
    a daily sd grid routes to the rollup (never the raw scan) and agrees
    with the raw-path stddev within the documented 1e-6-quantization
    bound; the sample form is NULL for 1-point buckets on BOTH paths."""
    import math

    from warp10_platform_spark.operators.bucketize import bucketize as raw_bucketize
    from warp10_platform_spark.sources.rollup import serve_bucketize

    # OPT-IN routing, like the histogram-percentile tier: without the
    # flag an sd request is exact and must scan raw.
    for name in ("sd", "var", "sd.pop", "var.pop"):
        _, route = serve_bucketize(spark, sf_dir, name, DAY, LASTBUCKET, NDAYS)
        assert route == "raw", name
        _, route = serve_bucketize(
            spark, sf_dir, name, DAY, LASTBUCKET, NDAYS, approx_moments=True
        )
        assert route == f"rollup:{DAY}", name

    served, _ = serve_bucketize(
        spark, sf_dir, "sd", DAY, LASTBUCKET, NDAYS, approx_moments=True
    )
    raw, _ = raw_bucketize(canonical_points(spark, sf_dir), "sd", DAY, LASTBUCKET, NDAYS)
    cols = ["class", "labels_key", "ts", "v_agg"]
    got = {tuple(r[:3]): r[3] for r in _rows(served, cols)}
    exp = {tuple(r[:3]): r[3] for r in _rows(raw, cols)}
    assert set(got) == set(exp) and got
    nulls = 0
    for k, e in exp.items():
        g = got[k]
        if e is None or g is None:
            assert e is None and g is None, (k, g, e)
            nulls += 1
            continue
        # quantization at 1e-6 of the VALUE → sd error bounded well under 1e-4
        assert math.isclose(float(g), float(e), rel_tol=1e-6, abs_tol=1e-4), (k, g, e)

"""Directory-cardinality axis (r8 verdict #2): FIND/FINDSTATS/selector
pushdown, METASET's gts.limit, and the series-accessor cap at 10^6
distinct series — the series-heavy/point-light shape no other fixture
has (continuum/store/Directory.java is the reference component this
axis exercises). Runs against .cache/series1m when present
(scripts/make_scale_fixtures.py series1m); scripts/
probe_directory_scale.py records the timed evidence for SCALE.md."""

import os

import pytest

FIXTURE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".cache", "series1m")

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(FIXTURE, "events.parquet")),
    reason="series1m fixture not generated (scripts/make_scale_fixtures.py series1m)",
)


@pytest.fixture(scope="module")
def directory(spark):
    from warp10_platform_spark.sources.directory import directory_table

    return directory_table(spark, FIXTURE)


def test_directory_has_one_row_per_series(directory):
    assert directory.count() == 1_000_000


def test_find_scans_directory_only(spark, directory):
    """FIND at 10^6 series resolves on the directory parquet — the
    executed plan must never open the points store."""
    from warp10_platform_spark.sources.directory import find

    f = find(directory, "~events\\.p.*{}")
    assert f.count() == 200_000  # purchase = 1/5 of series
    plan = f._jdf.queryExecution().executedPlan().toString()
    assert "events.parquet" not in plan


def test_findstats_hll_close_at_1m_series(spark, directory):
    from warp10_platform_spark.sources.directory import findstats

    exact = findstats(directory).collect()[0]
    approx = findstats(directory, approx=True).collect()[0]
    assert exact["n_series"] == 1_000_000 and exact["n_classes"] == 5
    # HLL++ default rsd is 5%; directory-scale estimates must hold it
    assert abs(approx["n_series"] - 1_000_000) / 1_000_000 < 0.05
    assert approx["n_classes"] == 5


def test_metaset_default_cap_fires_at_metadata_scale(spark):
    """A 200k-series selector against the DEFAULT gts.limit (100000) must
    fail with the reference's message (FIND.java:523) — the cap firing at
    its real size, not a lowered test cap — and the same selector under a
    raised cap succeeds, proving the boundary is the cap."""
    from warp10_platform_spark.warpscript.functions import REGISTRY
    from warp10_platform_spark.warpscript.stack import WarpScriptStack

    st = WarpScriptStack(spark, FIXTURE)
    st.push(["t", "events.click", {}, float("nan"), float("nan"), 3600000000, 60000000])
    with pytest.raises(ValueError, match="exceeded limit of 100000 Geo Time Series"):
        REGISTRY["METASET"](st)


def test_accessor_cap_fires_on_3m_point_frame(spark):
    """VALUES over the fixture's 3M-point frame must refuse at the 1M
    accessor cap instead of collecting the frame to the driver."""
    from warp10_platform_spark.core.frame import GTSFrame
    from warp10_platform_spark.sources.tables import events_points
    from warp10_platform_spark.warpscript.functions import REGISTRY
    from warp10_platform_spark.warpscript.stack import WarpScriptStack

    st = WarpScriptStack(spark, FIXTURE)
    st.push(GTSFrame.fetch(events_points(spark, FIXTURE)))
    with pytest.raises(MemoryError, match="accessor over cap"):
        REGISTRY["VALUES"](st)


def test_gskip_gcount_series_budget_at_1m(spark, directory):
    """gskip/gcount is a SERIES budget: skipping 500k series deep into a
    10^6-series match set still returns exactly gcount series' points."""
    from warp10_platform_spark.sources.directory import fetch_gskip_gcount
    from warp10_platform_spark.sources.tables import events_points

    pts = events_points(spark, FIXTURE)
    out = fetch_gskip_gcount(pts, directory, "~events\\..*{}", gskip=500_000, gcount=100)
    assert out.count() == 300  # 100 series x 3 points


def test_gskip_rank_survives_cache_release(spark, directory):
    """The two-phase rank's bucket boundaries are deterministic literals
    baked into the plan, so releasing the guard caches (or losing them
    to eviction) between build and materialization cannot desynchronize
    the counts branch from the join branch (r9 review find: the first
    repartitionByRange design depended on a persisted frame the
    registry is allowed to evict — boundaries re-sampled per branch)."""
    from warp10_platform_spark.pipeline.cache import release_guard_caches
    from warp10_platform_spark.sources.directory import fetch_gskip_gcount
    from warp10_platform_spark.sources.tables import events_points

    pts = events_points(spark, FIXTURE)
    out = fetch_gskip_gcount(pts, directory, "~events\\..*{}", gskip=500_000, gcount=100)
    release_guard_caches()  # drop the perf-hint cache BEFORE materializing
    assert out.count() == 300
    # and again on a second, fully-uncached materialization
    release_guard_caches()
    assert out.count() == 300

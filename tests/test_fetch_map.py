"""Map-parameter FETCH (FETCH.java PARAM_* form) — the syntax real
Warp 10 scripts use — including the METASET → FETCH delegation path."""

import pytest

from warp10_platform_spark.warpscript.functions import REGISTRY
from warp10_platform_spark.warpscript.stack import WarpScriptStack


def _stack(spark, sf_dir):
    return WarpScriptStack(spark, sf_dir)


def _fetch(st, params):
    st.push(params)
    REGISTRY["FETCH"](st)
    return st.pop()


def test_map_fetch_equals_list_fetch(spark, sf_dir):
    st = _stack(spark, sf_dir)
    st.push(["~events\\..*", {}, 0, 10**18])
    REGISTRY["FETCH"](st)
    ref = st.pop().df.count()
    got = _fetch(st, {"selector": "~events\\..*{}", "start": 0, "end": 10**18}).df.count()
    assert got == ref > 0


def test_map_fetch_class_labels_and_timespan(spark, sf_dir):
    st = _stack(spark, sf_dir)
    full = _fetch(st, {"class": "events.purchase", "labels": {}, "start": 0, "end": 10**18}).df
    rows = full.select("ts").collect()
    assert rows
    t_max = max(r["ts"] for r in rows)
    span = _fetch(st, {"selector": "events.purchase{}", "end": t_max, "timespan": 1}).df
    assert span.count() == sum(1 for r in rows if r["ts"] == t_max)


def test_map_fetch_count_and_skip(spark, sf_dir):
    st = _stack(spark, sf_dir)
    gf = _fetch(st, {"selector": "~events\\..*{}", "end": 10**18, "count": 3})
    per = gf.df.groupBy("gts_id").count().collect()
    assert per and all(r["count"] <= 3 for r in per)
    gf2 = _fetch(st, {"selector": "~events\\..*{}", "start": 0, "end": 10**18, "skip": 5})
    base = _fetch(st, {"selector": "~events\\..*{}", "start": 0, "end": 10**18})
    nseries = base.df.select("gts_id").distinct().count()
    assert gf2.df.count() == base.df.count() - 5 * nseries


def test_map_fetch_selectors_union(spark, sf_dir):
    st = _stack(spark, sf_dir)
    a = _fetch(st, {"selector": "events.purchase{}", "start": 0, "end": 10**18}).df.count()
    b = _fetch(st, {"selector": "events.click{}", "start": 0, "end": 10**18}).df.count()
    u = _fetch(
        st,
        {"selectors": ["events.purchase{}", "events.click{}"], "start": 0, "end": 10**18},
    ).df.count()
    assert u == a + b


def test_map_fetch_gcount(spark, sf_dir):
    st = _stack(spark, sf_dir)
    gf = _fetch(st, {"selector": "~events\\..*{}", "start": 0, "end": 10**18, "gcount": 2})
    assert gf.df.select("gts_id").distinct().count() == 2


def test_map_fetch_missing_target_raises(spark, sf_dir):
    st = _stack(spark, sf_dir)
    with pytest.raises(ValueError):
        _fetch(st, {"start": 0, "end": 10**18})


def test_map_fetch_type_param(spark, sf_dir):
    st = _stack(spark, sf_dir)
    gf = _fetch(st, {"selector": "~events\\..*{}", "start": 0, "end": 10**18, "type": "DOUBLE"})
    assert gf.value_col == "v_double" and gf.df.count() > 0
    with pytest.raises(ValueError):
        _fetch(st, {"selector": "~events\\..*{}", "start": 0, "end": 10**18, "type": "nope"})


def test_metaset_feeds_fetch(spark, sf_dir):
    """METASET blob → { 'metaset' … } FETCH: decode, expiry check,
    selector reconstruction from the bundled Metadata (FETCH.java:
    1158-1229,335-339)."""
    st = _stack(spark, sf_dir)
    st.push(["rt", "events.purchase", {}, float("nan"), float("nan"), float("nan"), 60_000_000])
    REGISTRY["METASET"](st)
    blob = st.pop()
    direct = _fetch(st, {"selector": "events.purchase{}", "start": 0, "end": 10**18}).df
    viaset = _fetch(st, {"metaset": blob, "start": 0, "end": 10**18}).df
    assert viaset.count() == direct.count() > 0
    assert viaset.select("gts_id").distinct().count() == direct.select("gts_id").distinct().count()


def test_metaset_maxduration_caps_timespan(spark, sf_dir):
    """maxduration forces end=now and caps timespan — a metaset minted
    for the last hour cannot fetch history (FETCH.java:1332-1354)."""
    st = _stack(spark, sf_dir)
    st.push(["rt", "events.purchase", {}, float("nan"), float("nan"), 1, 60_000_000])
    REGISTRY["METASET"](st)
    blob = st.pop()
    # testdata timestamps are far in the past; a 1µs-before-now window is empty
    assert _fetch(st, {"metaset": blob}).df.count() == 0


def test_metaset_expired_raises(spark, sf_dir):
    st = _stack(spark, sf_dir)
    st.push(["rt", "events.purchase", {}, float("nan"), float("nan"), float("nan"), -3_600_000_000])
    REGISTRY["METASET"](st)
    blob = st.pop()
    with pytest.raises(ValueError, match="expired"):
        _fetch(st, {"metaset": blob, "start": 0, "end": 10**18})

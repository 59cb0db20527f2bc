"""Multivalue tier: WRAPMV/WRAPMV!, MVEXTRACT family, MVSPLIT,
->MVSTRING (MVEXTRACT.java, MVSPLIT.java, TOMVSTRING.java, WRAP.java
mv=true)."""

import pytest

from warp10_platform_spark.warpscript.stack import WarpScriptStack


@pytest.fixture()
def stack(spark, sf_dir):
    return WarpScriptStack(spark, sf_dir)


def _mk_mv_outer(st):
    """Outer encoder with 2 multivalue points and 1 plain point."""
    st.exec(
        "NEWENCODER "
        "10 1.0 2.0 NaN 11.5 ADDVALUE 20 NaN NaN 7 12.5 ADDVALUE WRAPMV! 'w1' STORE "
        "NEWENCODER "
        "30 NaN NaN NaN 21.5 ADDVALUE WRAPMV 'w2' STORE "
        "NEWENCODER "
        "1000 NaN NaN NaN $w1 ADDVALUE "
        "2000 NaN NaN NaN $w2 ADDVALUE "
        "3000 NaN NaN NaN 99.0 ADDVALUE "
        "'outer' STORE"
    )


def test_wrapmv_strips_metadata(stack):
    st = stack
    st.exec("NEWENCODER 5 NaN NaN NaN 1.5 ADDVALUE WRAPMV!")
    wrapped = st.pop()
    from warp10_platform_spark.core.gtscodec import opb64_decode, read_wrapper

    w = read_wrapper(opb64_decode(wrapped))
    assert w["metadata"] is None and w["count"] == 0
    from warp10_platform_spark.core.multivalue import try_parse_mv

    pts = try_parse_mv(wrapped)
    assert [(p[0], p[1]) for p in pts] == [(5, 1.5)]


def test_mvvalues_and_mvticks(stack):
    st = stack
    _mk_mv_outer(st)
    st.exec("$outer MVVALUES")
    vals = st.pop()
    assert vals == [[11.5, 12.5], [21.5], 99.0]
    st.exec("$outer MVTICKS")
    ticks = st.pop()
    # wrapped points → [outer_tick, [inner ticks]]; plain → outer tick
    assert ticks == [[1000, [10, 20]], [2000, [30]], 3000]
    st.exec("$outer MVELEVATIONS")
    elevs = st.pop()
    assert elevs[0] == [None, [None, 7]] and elevs[2] is None


def test_mvlocations(stack):
    st = stack
    _mk_mv_outer(st)
    st.exec("$outer MVLOCATIONS")
    locs = st.pop()
    outer, inner = locs[0]
    assert outer == [pytest.approx(float("nan"), nan_ok=True)] * 2 or all(x != x for x in outer)
    lat, lon = inner[0]
    assert abs(lat - 1.0) < 1e-6 and abs(lon - 2.0) < 1e-6
    st.exec("$outer MVHHCODES")
    hhs = st.pop()
    assert hhs[0][1][0] is not None and hhs[0][1][1] is None


def test_mvindexsplit_and_tick_split(stack):
    st = stack
    _mk_mv_outer(st)
    st.exec("$outer MVINDEXSPLIT")
    encs = st.pop()
    by_name = {e.name: [(p[0], p[1]) for p in e.points] for e in encs}
    # index 0: first inner value of each MV point + the plain point
    assert by_name[":0"] == [(1000, 11.5), (2000, 21.5), (3000, 99.0)]
    assert by_name[":1"] == [(1000, 12.5)]
    st.exec("$outer MVTICKSPLIT")
    encs = st.pop()
    by_name = {e.name: [(p[0], p[1]) for p in e.points] for e in encs}
    assert by_name[":10"] == [(1000, 11.5)]
    assert by_name[":30"] == [(2000, 21.5)]
    # plain point has implicit inner tick 0
    assert by_name[":0"] == [(3000, 99.0)]
    # selection list + renaming map
    st.exec("$outer [ 0 ] { 0 'first' } MVINDEXSPLIT")
    encs = st.pop()
    assert [e.name for e in encs] == ["first"]
    # inner location/elevation override outer on split points
    e0 = encs[0]
    assert e0.points[0][3] is not None  # loc from inner (1.0, 2.0)


def test_to_mvstring(stack):
    st = stack
    st.exec("NEWENCODER 10 NaN NaN NaN 1.5 ADDVALUE 0 NaN NaN NaN T ADDVALUE WRAPMV! ->MVSTRING")
    s = st.pop()
    assert s.startswith("[! ") and s.endswith("]")
    assert "10/1.5" in s and " T " in s
    st.exec("NEWENCODER 0 NaN NaN NaN 'a b' ADDVALUE ->MVSTRING")
    assert "'a%20b'" in st.pop()


def test_mvsplit_script_to_frames(stack):
    st = stack
    _mk_mv_outer(st)
    st.exec("$outer MVINDEXSPLIT <% TOGTS %> FOREACH 2 ->LIST")
    frames = st.pop()
    import warp10_platform_spark.warpscript.functions as wf

    gf = wf._as_frame(frames)
    rows = {(r["class"], r["ts"]): r["v_double"] for r in gf.df.collect()}
    assert rows[(":0", 1000)] == 11.5 and rows[(":1", 1000)] == 12.5

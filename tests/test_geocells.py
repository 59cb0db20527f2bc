"""Coverage algebra tests (GeoUnion/GeoIntersection/GeoSubtraction/
GEOBUFFER/GEOCOVER/GEOSPLIT/GEOPACK — operators/geocells.py) plus the
script surface and the codegen-health of the fence predicate.
"""

import random

from pyspark.sql import functions as F

from warp10_platform_spark.core import geoxp as gx
from warp10_platform_spark.operators import geocells as GC
from warp10_platform_spark.operators.wkt import parse_wkt

SQ1 = parse_wkt("POLYGON((0 0, 10 0, 10 10, 0 10, 0 0))")
SQ2 = parse_wkt("POLYGON((5 5, 15 5, 15 15, 5 15, 5 5))")


def test_cell_format_matches_reference_layout():
    # GEOCOVER.java:94 — cell = ((hh & mask) >>> 4) | ((r/2) << 60)
    hh = gx.to_geoxp(48.5, 3.5)
    r = 12
    mask = ((1 << 64) - 1) >> (64 - 2 * r) << (64 - 2 * r)
    expected = (((hh & (1 << 64) - 1) & mask) >> 4) | ((r // 2) << 60)
    assert GC.cell_of(hh, r) == expected
    # GEOCELLTO.java:57 — hex prefix, r/2 chars
    cell = GC.cell_of(hh, r)
    prefix = f"{cell:016x}"[1 : (cell >> 60) + 1]
    assert len(prefix) == r // 2
    assert f"{hh & (1 << 64) - 1:016x}".startswith(prefix)


def test_union_intersection_difference_membership():
    a, b = GC.cover_shape(SQ1, 8), GC.cover_shape(SQ2, 8)
    u, i, d = a.union(b), a.intersection(b), a.subtraction(b)
    random.seed(17)
    for _ in range(300):
        la, lo = random.uniform(-1, 16), random.uniform(-1, 16)
        in_a, in_b = a.contains_point(la, lo), b.contains_point(la, lo)
        assert u.contains_point(la, lo) == (in_a or in_b)
        # intersection/difference are exact on the cell lattice
        assert i.contains_point(la, lo) == (in_a and in_b)
        assert d.contains_point(la, lo) == (in_a and not in_b)


def test_subtraction_splits_coarse_cells():
    coarse = GC.GeoCells([GC.cell_of(gx.to_geoxp(5, 5), 6)])
    fine_hole = GC.GeoCells([GC.cell_of(gx.to_geoxp(5, 5), 12)])
    d = coarse.subtraction(fine_hole)
    assert not d.contains_point(*gx.from_geoxp(gx.to_geoxp(5, 5)))
    # most of the coarse cell survives
    assert len(d) > 0
    swla, swlo, nela, nelo = GC.cell_bbox(next(iter(coarse.cells)))
    assert d.contains_point((swla + nela) / 2 + (nela - swla) / 4, (swlo + nelo) / 2 + (nelo - swlo) / 4)


def test_pack_roundtrip():
    u = GC.cover_shape(SQ1, 8).union(GC.cover_shape(SQ2, 10))
    assert GC.geounpack(GC.geopack(u)).cells == u.cells


def test_buffer_expands():
    c = GC.GeoCells([GC.cell_of(gx.to_geoxp(0.0, 0.0), 8)])
    assert len(c.buffer(1)) == 9 and len(c.buffer(2)) == 25


def test_contains_hh_expr_parity_and_codegen(spark):
    cov = GC.cover_shape(SQ1, 8).union(GC.cover_shape(SQ2, 10))
    random.seed(23)
    rows = [(random.uniform(-2, 17), random.uniform(-2, 17)) for _ in range(400)]
    df = spark.createDataFrame(rows, "lat double, lon double")
    out = df.withColumn("_hh", gx.to_geoxp_col(F.col("lat"), F.col("lon")))
    res = out.select("lat", "lon", cov.contains_hh_expr(F.col("_hh")).alias("inside")).collect()
    for r in res:
        assert r.inside == cov.contains_point(r.lat, r.lon), (r.lat, r.lon)
    # predicate stays inside whole-stage codegen (no 64KB fallback)
    plan = out.where(cov.contains_hh_expr(F.col("_hh")))._jdf.queryExecution().executedPlan().toString()
    assert "*(1)" in plan  # the codegen-stage marker ("*(n)" = WholeStageCodegen)


def test_script_geometry_surface(spark):
    from warp10_platform_spark.warpscript.stack import WarpScriptStack

    st = WarpScriptStack(spark, "/root/testdata/sf0.001")
    st.exec("""
    'POLYGON((0 0, 10 0, 10 10, 0 10, 0 0))' 8 false GEO.WKT 'a' STORE
    'POLYGON((5 5, 15 5, 15 15, 5 15, 5 5))' 8 false GEO.WKT 'b' STORE
    $a $b GEO.UNION 'u' STORE
    $a $b GEO.INTERSECTION 'i' STORE
    $a $b GEO.DIFFERENCE 'd' STORE
    $a $b GEOINTERSECTS
    $u GEOPACK GEOUNPACK 'u2' STORE
    $u2 GEOCELLS SIZE
    $i GEOSPLIT SIZE
    """)
    nsplit = st.pop()
    ncells = st.pop()
    inter = st.pop()
    assert inter is True
    a = GC.cover_shape(SQ1, 8)
    b = GC.cover_shape(SQ2, 8)
    assert ncells == len(a.union(b))
    assert nsplit == len(a.intersection(b))

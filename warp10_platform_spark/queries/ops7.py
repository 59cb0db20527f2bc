"""Coverage sweep 7 — oracled queries for inventory rows that were
implemented but had no CORRECTNESS entry: projections
(VALUES/TICKS/NAME/LABELS, script/functions/VALUES.java, TICKS.java),
MAP step/occurrences operands (GTSHelper.map:6280), value-predicate and
clamp mappers (mapper/MapperGT.java, MapperMinX.java), VALUESORT + LIMIT
(VALUESORT.java:27, LIMIT.java), FILLTICKS + filler.previous
(FILLTICKS.java, filler/FillerPrevious.java:26), BucketSpec accessors
(BUCKETSPAN.java, BUCKETCOUNT.java, LASTBUCKET.java) and
NONEMPTY/MAXGTS (NONEMPTY.java, MAXGTS).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from warp10_platform_spark.core.frame import GTSFrame
from warp10_platform_spark.operators import fill as _fill
from warp10_platform_spark.operators import sort as _sort
from warp10_platform_spark.queries import register
from warp10_platform_spark.core import timeunits as tu
from warp10_platform_spark.queries.gts import DAY, LASTBUCKET, NDAYS, PTS, _bucketized
from warp10_platform_spark.sources.tables import canonical_points, events_points


def _user():
    return F.element_at(F.col("labels"), "user").alias("user")


def _user_from_key():
    return F.get_json_object("labels_key", "$[0].value").alias("user")


@register("projection_accessors", (
    f"WITH {PTS} "
    'SELECT class, "user", count(ts) AS n_ticks, min(ts) AS first_ts, max(ts) AS last_ts, '
    "       round(min(v), 6) AS v_min, round(max(v), 6) AS v_max "
    'FROM pts GROUP BY class, "user"'
))
def projection_accessors(spark, sf_dir):
    """VALUES/TICKS projections (VALUES.java, TICKS.java): per-series
    tick census from the TICKS projection joined to the value range from
    the VALUES projection — both accessors exercised, one shuffle each on
    the series key."""
    gf = GTSFrame.fetch(canonical_points(spark, sf_dir))
    t = gf.ticks().groupBy("class", "labels_key").agg(
        F.count("ts").alias("n_ticks"), F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts")
    )
    v = gf.values().groupBy("class", "labels_key").agg(
        F.round(F.min("v_double"), 6).alias("v_min"), F.round(F.max("v_double"), 6).alias("v_max")
    )
    return t.join(v, on=["class", "labels_key"]).select(
        "class", _user_from_key(), "n_ticks", "first_ts", "last_ts", "v_min", "v_max"
    )


@register("map_step_occurrences", (
    f"WITH {PTS}, "
    'r AS (SELECT class, "user", ts, abs(v) AS v_abs, '
    '             row_number() OVER (PARTITION BY class, "user" ORDER BY ts) AS rn FROM pts) '
    'SELECT class, "user", ts, round(v_abs, 6) AS v_abs FROM r '
    "WHERE (rn - 1) % 3 = 0 AND (rn - 1) // 3 < 4"
))
def map_step_occurrences(spark, sf_dir):
    """MAP step/occurrences operands (GTSHelper.map:6280): mapper.abs with
    step=3 (every 3rd tick) and occurrences=4 (at most 4 outputs per
    series) — the stride/cap post-filter over the mapped frame."""
    from warp10_platform_spark.operators.mapper import apply_step_occurrences

    gf = GTSFrame.fetch(canonical_points(spark, sf_dir)).map_scalar("mapper.abs")
    out = apply_step_occurrences(gf.df, step=3, occurrences=4)
    return out.select("class", _user(), "ts", F.round("v_mapped", 6).alias("v_abs"))


@register("predicate_clamp_mappers", (
    f"WITH {PTS} "
    'SELECT class, "user", ts, v > 50.0 AS gt50, round(least(v, 50.0), 6) AS clamped '
    "FROM pts WHERE class = 'events.purchase'"
))
def predicate_clamp_mappers(spark, sf_dir):
    """Value-predicate + clamp mappers (mapper/MapperGT.java:24,
    MapperMinX.java): mapper.gt emits the boolean verdict per tick,
    mapper.min.x caps the value — both single column exprs, fused into
    one projection (no join needed: each mapper keeps the input row)."""
    gf = GTSFrame.fetch(canonical_points(spark, sf_dir), "events.purchase{}")
    flagged = gf.map_scalar("mapper.gt", 50.0)
    clamped = GTSFrame(flagged.df.withColumnRenamed("v_mapped", "gt50"), value_col="v_double").map_scalar(
        "mapper.min.x", 50.0
    )
    return clamped.df.select(
        "class", _user(), "ts", "gt50", F.round("v_mapped", 6).alias("clamped")
    )


@register("valuesort_limit", (
    f"WITH {PTS} "
    "SELECT v AS v_double FROM (SELECT DISTINCT v FROM pts) u ORDER BY v LIMIT 5"
))
def valuesort_limit(spark, sf_dir):
    """VALUESORT + LIMIT (VALUESORT.java:27, LIMIT.java): ascending global
    value order over the distinct value set (ties removed so the head is
    deterministic in any engine), capped at 5 — Spark executes this as a
    TakeOrderedAndProject, no full sort materialization."""
    pts = canonical_points(spark, sf_dir).select("v_double").distinct()
    return _sort.valuesort(pts, "v_double").limit(5)


_FT = [LASTBUCKET - 20 * DAY, LASTBUCKET - 10 * DAY, LASTBUCKET]  # probe ticks


@register("fillticks_previous", (
    f"WITH {PTS}, "
    's AS (SELECT DISTINCT class, "user" FROM pts), '
    f"t AS (SELECT unnest([{_FT[0]}, {_FT[1]}, {_FT[2]}]) AS ts), "
    "st AS (SELECT class, \"user\", ts FROM s CROSS JOIN t), "
    "f AS (SELECT st.class, st.\"user\", st.ts, "
    "             (SELECT arg_max(p.v, p.ts) FROM pts p "
    "              WHERE p.class = st.class AND p.\"user\" = st.\"user\" AND p.ts <= st.ts) AS v "
    "      FROM st) "
    'SELECT class, "user", ts, round(v, 6) AS v_filled FROM f WHERE v IS NOT NULL'
))
def fillticks_previous(spark, sf_dir):
    """FILLTICKS + filler.previous (FILLTICKS.java,
    filler/FillerPrevious.java:26): materialize three probe ticks on every
    series, forward-fill from the latest earlier point, return the probe
    rows (rows with no prior point stay null and are dropped, matching
    the reference's empty-fill behavior)."""
    gf = GTSFrame.fetch(canonical_points(spark, sf_dir)).fillticks(_FT)
    filled = _fill.fill_previous(gf.df, "v_double")
    probes = filled.where(F.col("ts").isin(_FT) & F.col("v_double").isNotNull())
    return probes.select("class", _user(), "ts", F.round("v_double", 6).alias("v_filled"))


@register("bucketspec_accessors", (
    f"WITH {PTS}, "
    f"daily AS (SELECT class, \"user\", {LASTBUCKET} - (({LASTBUCKET} - ts) // {DAY}) * {DAY} AS ts "
    f"          FROM pts WHERE ts <= {LASTBUCKET} AND ts > {LASTBUCKET - DAY * NDAYS}) "
    'SELECT class, "user", count(DISTINCT ts) AS n_filled, '
    f"       {DAY} AS bucketspan, {NDAYS} AS bucketcount, {LASTBUCKET} AS lastbucket "
    'FROM daily GROUP BY class, "user"'
))
def bucketspec_accessors(spark, sf_dir):
    """BucketSpec accessors (BUCKETSPAN.java, BUCKETCOUNT.java,
    LASTBUCKET.java) + ONLYBUCKETS: bucketize daily, read the spec back
    through the frame accessors, and count the non-empty buckets per
    series (ONLYBUCKETS is the identity on an unscaffolded bucketized
    frame, so its size IS the filled-bucket count)."""
    gf = _bucketized(spark, sf_dir, "bucketizer.count")
    ob = gf.onlybuckets()
    return ob.df.groupBy("class", "labels_key").agg(F.count("*").alias("n_filled")).select(
        "class",
        _user_from_key(),
        "n_filled",
        F.lit(gf.bucketspan()).alias("bucketspan"),
        F.lit(gf.bucketcount()).alias("bucketcount"),
        F.lit(gf.lastbucket()).alias("lastbucket"),
    )


@register("nonempty_maxgts", (
    f"WITH {PTS}, "
    f"clipped AS (SELECT * FROM pts WHERE ts >= {LASTBUCKET - 5 * DAY} AND ts <= {LASTBUCKET}), "
    'sz AS (SELECT class, "user", count(*) AS n FROM clipped GROUP BY class, "user"), '
    'r AS (SELECT *, row_number() OVER (ORDER BY class, "user") AS rk, count(*) OVER () AS n_series FROM sz) '
    'SELECT class, "user", n, n_series FROM r WHERE rk <= 5'
))
def nonempty_maxgts(spark, sf_dir):
    """NONEMPTY + MAXGTS/LIMIT (NONEMPTY.java): clip to the last 5 days,
    keep only series that still have points (empty series vanish from the
    points model — NONEMPTY is counting them), cap the listing at the
    first 5 series in metadata order, carrying the total series count."""
    gf = GTSFrame.fetch(canonical_points(spark, sf_dir)).timeclip(LASTBUCKET - 5 * DAY, LASTBUCKET)
    sz = gf.df.groupBy("class", "labels_key").agg(F.count("*").alias("n"))
    w = Window.orderBy("class", "labels_key")
    r = sz.withColumn("rk", F.row_number().over(w)).withColumn(
        "n_series", F.count("*").over(Window.partitionBy())
    )
    return r.where(F.col("rk") <= 5).select("class", _user_from_key(), "n", "n_series")


# ---------- oracled spectral + sketch queries ----------

_TWO_PI = 6.283185307179586  # float64(2*pi), same literal in both engines

_FFT_CD = (
    'cd AS (SELECT class, ts, CAST(count(*) AS DOUBLE) AS v FROM daily GROUP BY class, ts)'
)


@register("fft_bins", (
    "WITH {pts}, {daily}, {cd}, "
    "arr AS (SELECT class, list(v ORDER BY ts) AS a FROM cd GROUP BY class), "
    "bins AS (SELECT class, a, k FROM arr, (SELECT unnest([1, 2, 3, 4]) AS k) ks), "
    "c AS (SELECT class, k, "
    f"  list_reduce(list_transform(a, (x, i) -> x * cos({_TWO_PI} * k * (i - 1) / len(a))), (p, q) -> p + q) AS re, "
    f"  list_reduce(list_transform(a, (x, i) -> x * sin({_TWO_PI} * k * (i - 1) / len(a))), (p, q) -> p + q) AS im "
    "  FROM bins) "
    "SELECT class, k, round(sqrt(re * re + im * im), 6) AS magnitude FROM c"
).format(pts=PTS, daily=__import__("warp10_platform_spark.queries.gts", fromlist=["DAILY"]).DAILY, cd=_FFT_CD))
def fft_bins(spark, sf_dir):
    """FFT at fixed bins (continuum/gts/FFT.java): DFT magnitude of each
    class's daily-count series at frequency bins k=1..4. The sums fold a
    ts-ordered array left-to-right on BOTH engines (Spark `aggregate`
    with 0.0 seed == DuckDB `list_reduce` first-element seed, exact),
    so the doubles match bit-for-bit before round(6). Unlike the numpy
    fft_top_bins (rows-only), this shape is fully JVM-side and oracled."""
    counts = _bucketized(spark, sf_dir, "bucketizer.count")
    base = counts.df.groupBy("class", "ts").agg(F.sum("v_agg").cast("double").alias("v"))
    arr = base.groupBy("class").agg(
        F.expr("transform(sort_array(collect_list(struct(ts, v))), s -> s.v)").alias("a")
    )
    bins = arr.select("class", "a", F.explode(F.array(*[F.lit(i) for i in (1, 2, 3, 4)])).alias("k"))
    k, n = F.col("k"), F.size("a")

    def fold(trig):
        terms = F.transform("a", lambda x, i: x * trig(F.lit(_TWO_PI) * k * i / n))
        return F.aggregate(terms, F.lit(0.0), lambda acc, t: acc + t)

    re, im = fold(F.cos), fold(F.sin)
    return bins.select("class", "k", F.round(F.sqrt(re * re + im * im), 6).alias("magnitude"))


# HyperLogLog with a portable hash: both engines derive the SAME 60-bit
# hash from md5, so registers, integer-exact 2^-M sums, and the estimate
# agree bit-for-bit — an HLL whose oracle is the same HLL, not a
# tolerance band.
_HLL_SQL = (
    f"WITH {PTS}, "
    "h AS (SELECT class, ('0x' || substr(md5('hll:' || \"user\"), 1, 15))::BIGINT AS hv FROM pts), "
    "r AS (SELECT class, hv >> 52 AS reg, hv & ((1::BIGINT << 52) - 1) AS w FROM h), "
    "m AS (SELECT class, reg, max(CASE WHEN w = 0 THEN 53 ELSE 53 - length(bin(w)) END) AS mj "
    "      FROM r GROUP BY class, reg), "
    "s AS (SELECT class, sum(1::BIGINT << (53 - mj)) AS sum_int, count(*) AS nreg FROM m GROUP BY class), "
    "e AS (SELECT class, "
    "        (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0 * 9007199254740992.0 "
    "          / CAST(sum_int + (256 - nreg) * (1::BIGINT << 53) AS DOUBLE) AS e_raw, "
    "        256 - nreg AS v0 FROM s), "
    "x AS (SELECT class, CASE WHEN e_raw <= 640.0 AND v0 > 0 THEN 256.0 * ln(256.0 / v0) ELSE e_raw END AS est FROM e), "
    "d AS (SELECT class, count(DISTINCT \"user\") AS n_exact FROM pts GROUP BY class) "
    "SELECT x.class, CAST(floor(x.est) AS BIGINT) AS hll_est, d.n_exact "
    "FROM x JOIN d ON x.class = d.class"
)


@register("hll_cardinality", _HLL_SQL)
def hll_cardinality(spark, sf_dir):
    """FINDSTATS HLL (the reference's HyperLogLogPlus,
    script/HyperLogLogPlus.java): per-class distinct-user estimate with
    p=8 (256 registers). The 2^-M register sum is kept as an exact
    BIGINT in 2^-53 units, so the only float ops are one division and
    (in the small-range branch) one ln — identical in both engines.
    Pure streaming aggregate: no distinct, no shuffle of raw users —
    THE sketch shape for 100 TB directory stats. Exact count joined in
    for reference."""
    pts = canonical_points(spark, sf_dir)
    user = F.element_at("labels", "user")
    h = F.expr(
        "cast(conv(substr(md5(concat('hll:', element_at(labels, 'user'))), 1, 15), 16, 10) AS bigint)"
    )
    r = pts.select(
        "class",
        F.shiftright(h, 52).alias("reg"),
        (h.bitwiseAND(F.expr("shiftleft(CAST(1 AS BIGINT), 52) - 1"))).alias("w"),
        user.alias("user"),
    )
    rho = F.when(F.col("w") == 0, F.lit(53)).otherwise(F.lit(53) - F.length(F.expr("bin(w)")))
    m = r.groupBy("class", "reg").agg(F.max(rho).alias("mj"))
    s = m.groupBy("class").agg(
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 53 - mj)")).alias("sum_int"),
        F.count("*").alias("nreg"),
    )
    alpha_m2 = (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0 * 9007199254740992.0
    total = (F.col("sum_int") + (F.lit(256) - F.col("nreg")) * F.expr("shiftleft(CAST(1 AS BIGINT), 53)")).cast("double")
    e_raw = F.lit(alpha_m2) / total
    v0 = F.lit(256) - F.col("nreg")
    est = F.when((e_raw <= 640.0) & (v0 > 0), F.lit(256.0) * F.log(F.lit(256.0) / v0)).otherwise(e_raw)
    x = s.select("class", F.floor(est).cast("long").alias("hll_est"))
    d = r.groupBy("class").agg(F.count_distinct("user").alias("n_exact"))
    return x.join(d, on="class")


@register("wrap_unwrap_roundtrip", (
    f"WITH {PTS} "
    'SELECT class, "user", ts, round(v, 6) AS v '
    "FROM pts WHERE class = 'events.purchase'"
))
def wrap_unwrap_roundtrip(spark, sf_dir):
    """WRAP → UNWRAP functional roundtrip (WRAP.java, UNWRAP.java via
    core/wrap.py): pack every purchase series into a base64 blob, parse
    it back, and the exploded points must equal the original fetch —
    proving the blob is self-contained (metadata + ordered ticks)."""
    from warp10_platform_spark.core.wrap import unwrap, wrap

    gf = GTSFrame.fetch(canonical_points(spark, sf_dir), "events.purchase{}")
    blobs = wrap(gf.df)
    pts = unwrap(blobs)
    return pts.select("class", _user(), "ts", F.round("v_double", 6).alias("v"))


_THIN_STEP = 2
_THIN_TSTEP = 10 * DAY


@register("fetch_step_timestep", (
    # Recursion over SURVIVORS, not rows: each step jumps straight to the
    # next kept tick (max ts <= last - timestep, a lateral asof lookup),
    # so depth = range/timestep instead of series length. The row-by-row
    # state-machine CTE it replaces walked 50k recursion steps on the r5
    # skew fixture's fat series (502 s); this is bit-identical (verified
    # on all three fixtures) in 0.2 s. Greedy-chain equivalence:
    # survivor(i+1) = max{t <= survivor(i) - timestep}; `step` keeps
    # every step-th survivor ((k-1) % step = 0).
    f"WITH RECURSIVE {PTS}, "
    'surv(class, "user", ts, k) AS ('
    '  SELECT class, "user", max(ts), 1 FROM pts GROUP BY class, "user" '
    "  UNION ALL "
    '  SELECT w.class, w."user", nxt.ts, w.k + 1 '
    "  FROM surv w JOIN LATERAL ("
    "    SELECT max(p.ts) AS ts FROM pts p "
    f'    WHERE p.class = w.class AND p."user" = w."user" AND p.ts <= w.ts - {_THIN_TSTEP}'
    "  ) nxt ON nxt.ts IS NOT NULL) "
    'SELECT p.class, p."user", p.ts, round(p.v, 6) AS v '
    'FROM surv s JOIN pts p ON p.class = s.class AND p."user" = s."user" AND p.ts = s.ts '
    f"WHERE (s.k - 1) % {_THIN_STEP} = 0"
))
def fetch_step_timestep(spark, sf_dir):
    """FETCH step+timestep thinning (FETCH.java:129-130; scan loop
    MultiScanGTSDecoderIterator.java:380-420): greedy newest-first
    timestep spacing, then every step-th survivor. The oracle replays the
    survivor chain with an asof-jump recursive CTE."""
    gf = GTSFrame.fetch(canonical_points(spark, sf_dir)).thin(step=_THIN_STEP, timestep=_THIN_TSTEP)
    return gf.df.select("class", _user(), "ts", F.round("v_double", 6).alias("v"))


@register("mapper_scalar_coverage", (
    f"WITH {PTS} "
    'SELECT class, "user", ts, ts AS v_tick, '
    f"strftime(make_timestamp({tu.duck_units_to_us('ts')}), '%Y-%m-%dT%H:%M:%S') || printf('.%0{tu.SUBSEC_DIGITS}dZ', ts % {tu.UNITS_PER_S}) AS v_dt, "
    "CASE WHEN v > 0.5 THEN 1 WHEN v < 0.5 THEN -1 ELSE 0 END AS v_cmp "
    "FROM pts WHERE class = 'events.purchase'"
))
def mapper_scalar_coverage(spark, sf_dir):
    """mapper.tick / mapper.datetime / mapper.compareto
    (MapperTick.java:29, MapperDateTime.java, MapperCompareTo.java):
    tick-local value rewrites, all JVM expressions."""
    from warp10_platform_spark.operators.mapper import map_scalar

    gf = GTSFrame.fetch(canonical_points(spark, sf_dir), "events.purchase{}")
    df = map_scalar(gf.df, "mapper.tick", out_col="v_tick")
    df = map_scalar(df, "mapper.datetime", out_col="v_dt")
    df = map_scalar(df, "mapper.compareto", param=0.5, out_col="v_cmp")
    return df.select("class", _user(), "ts", "v_tick", "v_dt", "v_cmp")


@register("bucketize_product", (
    f"WITH {PTS}, "
    f"d AS (SELECT class, \"user\", {LASTBUCKET} - (({LASTBUCKET} - ts) // {DAY}) * {DAY} AS ts, "
    "  (CASE WHEN v > 0.5 THEN 3 WHEN v < 0.5 THEN 1 ELSE 2 END)::DOUBLE AS c "
    f"  FROM pts WHERE ts <= {LASTBUCKET} AND ts > {LASTBUCKET - DAY * NDAYS}) "
    'SELECT class, "user", ts, '
    "  list_reduce(list_sort(list(c)), (a, b) -> a * b) AS v_agg "
    'FROM d GROUP BY class, "user", ts'
))
def bucketize_product(spark, sf_dir):
    """bucketizer.product (MapperProduct.java:30 dual-registered as an
    aggregator): exact value-sorted double fold so the product is
    order-deterministic and engine-identical. Input is compareto+2 ∈
    {1,2,3} so magnitudes stay bounded."""
    from warp10_platform_spark.operators.mapper import map_scalar

    gf = _bucketized_input(spark, sf_dir)
    return _out_agg(gf)


def _bucketized_input(spark, sf_dir):
    from warp10_platform_spark.operators.mapper import map_scalar

    gf = GTSFrame.fetch(canonical_points(spark, sf_dir), None, LASTBUCKET - DAY * NDAYS + 1, LASTBUCKET)
    df = map_scalar(gf.df, "mapper.compareto", param=0.5, out_col="v_cmp")
    df = df.withColumn("v_double", (F.col("v_cmp") + 2).cast("double"))
    return GTSFrame(df.drop("v_cmp"), value_col="v_double").bucketize("bucketizer.product", DAY, lastbucket=LASTBUCKET, bucketcount=NDAYS)


def _out_agg(gf):
    return gf.df.select("class", _user(), "ts", "v_agg")


@register("wrap_thrift_roundtrip", (
    f"WITH {PTS} SELECT class, \"user\", ts, v AS v_double FROM pts WHERE class = 'events.view'"
))
def wrap_thrift_roundtrip(spark, sf_dir):
    """WRAP/UNWRAP in the reference WIRE FORMAT (GTSEncoder stream inside
    a TCompactProtocol GTSWrapper, OrderPreservingBase64 text —
    core/gtscodec.py; thrift:260-300, GTSEncoder.java:300-700): every
    point round-trips through real interchange bytes, so the oracle is
    the identity selection."""
    from warp10_platform_spark.core.wrap import unwrap_thrift, wrap_thrift

    pts = canonical_points(spark, sf_dir).where(F.col("class") == "events.view")
    wrapped = wrap_thrift(pts)
    back = unwrap_thrift(wrapped)
    return back.select(
        "class", _user_from_key(), "ts", "v_double"
    )

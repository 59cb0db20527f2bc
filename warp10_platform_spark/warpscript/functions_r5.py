"""Round-5 registry tranche — official reference names for engine ops
that already exist but were not yet script-reachable.

Families covered (registrations WarpScriptLib.java:2770-2830):
- filter.any.* / filter.all.* (FilterAny.java — `all` = complemented any)
- filter.byattr / filter.bylabelsattr (FilterByLabels.java builders with
  attribute checking), filter.bymetadata (FilterByMetadata.java),
  filter.latencies (LatencyFilter.java)
- mapper.dotproduct(+.positive/.sigmoid/.tanh) (MapperDotProduct*.java)
- mapper.npdf (MapperNPDF.java), mapper.replace (MapperReplace.java),
  mapper.regexp.match / mapper.regexp.replace (MapperRegExp*.java)
- mapper.geo.within/outside/approximate/fence (MapperGeo*.java)
- Welford + null-policy aggregator aliases (bucketizer.sd.welford et al.
  — Welford's online update computes the SAME sample moments, so the
  batch expressions are shared; reducer.join.* variants)
- filler.value (FillerValue builder — FILLVALUE's FILL-framework form)
- RANDPDF / SRANDPDF (RANDPDF.java — cumulative-probability draw)
- REF (REF.java — pushes the function object itself)
"""

from __future__ import annotations

from pyspark.sql import functions as F

from warp10_platform_spark.core.frame import GTSFrame
from warp10_platform_spark.warpscript.functions import REGISTRY, _as_frame, register

# ---------------------------------------------------------------------
# filter.any.* / filter.all.* — FilterAny.java. `filter.all.X t` retains
# series where NO point matches the complement comparator (the reference
# builds all.* from the complemented any.* builder, :2796-2803).
# ---------------------------------------------------------------------

_CMP_EXPR = {
    "eq": lambda c, t: c == t,
    "ne": lambda c, t: c != t,
    "gt": lambda c, t: c > t,
    "ge": lambda c, t: c >= t,
    "lt": lambda c, t: c < t,
    "le": lambda c, t: c <= t,
}

# filter.all.X == NOT any(complement): WarpScriptLib.java:2796-2803
_ALL_COMPLEMENT = {"ne": "eq", "lt": "ge", "le": "gt", "ge": "lt", "gt": "le", "eq": "ne"}

for _c in _CMP_EXPR:
    REGISTRY[f"filter.any.{_c}"] = (lambda name: lambda st: st.push((name, st.pop())))(
        f"filter.any.{_c}"
    )
    REGISTRY[f"filter.all.{_c}"] = (lambda name: lambda st: st.push((name, st.pop())))(
        f"filter.all.{_c}"
    )

REGISTRY["filter.byattr"] = lambda st: st.push(("filter.byattr", st.pop()))
REGISTRY["filter.bylabelsattr"] = lambda st: st.push(("filter.bylabelsattr", st.pop()))
REGISTRY["filter.bymetadata"] = lambda st: st.push(("filter.bymetadata", st.pop()))


def _latency_filter_factory(st):
    """min max [options] filter.latencies (LatencyFilter.Builder:110-140:
    pops options list, then max latency, then min latency)."""
    options = st.pop()
    mx = int(st.pop())
    mn = int(st.pop())
    st.push(("filter.latencies", (mn, mx, [str(o) for o in options])))


REGISTRY["filter.latencies"] = _latency_filter_factory


def _selector_pred(col, sel: str):
    """Reference label-selector semantics (FilterByLabels.java:80-92):
    '=' prefix or bare → exact match; '~' prefix → regex."""
    if sel.startswith("~"):
        return col.isNotNull() & col.rlike(sel[1:])
    if sel.startswith("="):
        sel = sel[1:]
    return col.isNotNull() & (col == F.lit(sel))


def _series_keep_where_any(df, pred):
    """Keep whole series that have >=1 point matching pred — a series-key
    semi-join so the surviving frame keeps all its points."""
    keys = df.where(pred).select("gts_id").distinct()
    return df.join(keys, "gts_id", "left_semi")


def _series_drop_where_any(df, pred):
    keys = df.where(pred).select("gts_id").distinct()
    return df.join(keys, "gts_id", "left_anti")


def _latencies(st, frames, mn, mx, options):
    """filter.latencies (LatencyFilter.filter:200-420): series[0] =
    uplink packets (LONG ids), rest = downlinks; match equal values with
    downlink tick in [uptick+min, uptick+max]; emit the option-selected
    derived series. Spark shape: value equi-join + tick range predicate
    (range join), aggregated per requested output."""
    if not isinstance(frames, list) or len(frames) < 2:
        raise ValueError("filter.latencies expects [uplink downlink...] GTS list")
    def _pkt(gf):
        # packet id: LONG value column when present, else the frame's
        # value column cast (construct pipelines carry v_double)
        if "v_long" in gf.df.columns:
            return F.coalesce(F.col("v_long"), F.col(gf.value_col).cast("long"))
        return F.col(gf.value_col).cast("long")

    up = frames[0].df.select(
        F.col("class").alias("u_class"), _pkt(frames[0]).alias("pkt"),
        F.col("ts").alias("u_ts"),
    )
    outs = []
    for dgf in frames[1:]:
        d = dgf.df.select(
            F.col("class").alias("d_class"),
            _pkt(dgf).alias("pkt"), F.col("ts").alias("d_ts"),
        )
        m = up.join(d, "pkt").where(
            (F.col("d_ts") - F.col("u_ts") >= mn) & (F.col("d_ts") - F.col("u_ts") <= mx)
        ).withColumn("lat_us", F.col("d_ts") - F.col("u_ts"))
        if "uplink.latency.min" in options or "uplink.latency.max" in options:
            aggs = []
            if "uplink.latency.min" in options:
                aggs.append(F.min("lat_us").alias("v_min"))
            if "uplink.latency.max" in options:
                aggs.append(F.max("lat_us").alias("v_max"))
            g = m.groupBy("u_class", "u_ts").agg(*aggs)
            if "uplink.latency.min" in options:
                outs.append(g.select(
                    F.concat(F.col("u_class"), F.lit(":uplink.latency.min")).alias("class"),
                    F.col("u_ts").alias("ts"), F.col("v_min").cast("double").alias("v_double"),
                ))
            if "uplink.latency.max" in options:
                outs.append(g.select(
                    F.concat(F.col("u_class"), F.lit(":uplink.latency.max")).alias("class"),
                    F.col("u_ts").alias("ts"), F.col("v_max").cast("double").alias("v_double"),
                ))
        for opt, agg, suffix in (
            ("downlink.latency.min", F.min("lat_us"), ":downlink.latency.min"),
            ("downlink.latency.max", F.max("lat_us"), ":downlink.latency.max"),
            ("downlink.matches", F.count("lat_us"), ":downlink.matches"),
        ):
            if opt in options:
                g = m.groupBy("d_class", "d_ts").agg(agg.alias("v"))
                outs.append(g.select(
                    F.concat(F.col("d_class"), F.lit(suffix)).alias("class"),
                    F.col("d_ts").alias("ts"), F.col("v").cast("double").alias("v_double"),
                ))
    if not outs:
        raise ValueError("filter.latencies: no recognized option requested")
    u = outs[0]
    for o in outs[1:]:
        u = u.unionByName(o)
    from warp10_platform_spark.core.schema import with_gts_id

    full = u.selectExpr(
        "class", "cast(map() as map<string,string>) AS labels",
        "cast(map() as map<string,string>) AS attributes", "ts",
        "cast(null as double) AS lat", "cast(null as double) AS lon",
        "cast(null as long) AS elev", "cast(null as long) AS v_long",
        "v_double", "cast(null as boolean) AS v_bool", "cast(null as string) AS v_string",
    )
    return GTSFrame(with_gts_id(full), None, "v_double")


_OLD_FILTER = REGISTRY["FILTER"]


@register("FILTER")
def _filter_r5(st):
    """FILTER dispatch extension: the round-5 filter specs, falling back
    to the original dispatcher for everything it already handled."""
    args = st.peek()
    spec = args[-1] if isinstance(args, list) else None
    name = spec[0] if isinstance(spec, tuple) else spec
    if not isinstance(name, str) or name not in _R5_FILTERS:
        return _OLD_FILTER(st)
    st.pop()
    gf = _as_frame(args[0])
    param = spec[1]
    st.push(_R5_FILTERS[name](st, gf, param, args[0]))


def _f_any(cmp):
    def run(st, gf, thr, raw):
        return GTSFrame(
            _series_keep_where_any(gf.df, _CMP_EXPR[cmp](F.col(gf.value_col), F.lit(thr))),
            gf.bucketspec, gf.value_col,
        )

    return run


def _f_all(cmp):
    comp = _ALL_COMPLEMENT[cmp]

    def run(st, gf, thr, raw):
        return GTSFrame(
            _series_drop_where_any(gf.df, _CMP_EXPR[comp](F.col(gf.value_col), F.lit(thr))),
            gf.bucketspec, gf.value_col,
        )

    return run


def _f_byattr(st, gf, clauses, raw):
    pred = F.lit(True)
    for k, sel in clauses.items():
        pred = pred & _selector_pred(F.element_at(F.col("attributes"), k), sel)
    return GTSFrame(gf.df.where(pred), gf.bucketspec, gf.value_col)


def _f_bylabelsattr(st, gf, clauses, raw):
    # FilterByLabels.filter with checkLabels+checkAttributes: the label
    # value if present, else the attribute value (:121-135).
    pred = F.lit(True)
    for k, sel in clauses.items():
        v = F.coalesce(F.element_at(F.col("labels"), k), F.element_at(F.col("attributes"), k))
        pred = pred & _selector_pred(v, sel)
    return GTSFrame(gf.df.where(pred), gf.bucketspec, gf.value_col)


def _f_bymetadata(st, gf, sel_frames, raw):
    sel = _as_frame(sel_frames)
    keys = sel.df.select("class", "labels_key").distinct()
    return GTSFrame(
        gf.df.join(F.broadcast(keys), ["class", "labels_key"], "left_semi"),
        gf.bucketspec, gf.value_col,
    )


_R5_FILTERS = {
    "filter.byattr": _f_byattr,
    "filter.bylabelsattr": _f_bylabelsattr,
    "filter.bymetadata": _f_bymetadata,
    "filter.latencies": lambda st, gf, p, raw: _latencies(st, raw, *p),
}
for _c in _CMP_EXPR:
    _R5_FILTERS[f"filter.any.{_c}"] = _f_any(_c)
    _R5_FILTERS[f"filter.all.{_c}"] = _f_all(_c)


# ---------------------------------------------------------------------
# Parameterized mappers
# ---------------------------------------------------------------------

for _nm in ("mapper.dotproduct", "mapper.dotproduct.positive",
            "mapper.dotproduct.sigmoid", "mapper.dotproduct.tanh"):
    REGISTRY[_nm] = (lambda name: lambda st: st.push((name, [float(x) for x in st.pop()])))(_nm)


def _npdf_factory(st):
    """mu sigma mapper.npdf (MapperNPDF.Builder:43-63: pops sigma, then
    mu)."""
    sigma = float(st.pop())
    mu = float(st.pop())
    st.push(("mapper.npdf", (mu, sigma)))


REGISTRY["mapper.npdf"] = _npdf_factory
REGISTRY["mapper.replace"] = lambda st: st.push(("mapper.replace", st.pop()))


def _regexp_replace_factory(st):
    """'regex' 'replacement' mapper.regexp.replace
    (MapperRegExpReplace.Builder:43-55: pops replacement, then regex)."""
    rep = str(st.pop())
    pat = str(st.pop())
    st.push(("mapper.regexp.replace", (pat, rep)))


REGISTRY["mapper.regexp.replace"] = _regexp_replace_factory
REGISTRY["mapper.regexp.match"] = lambda st: st.push(("mapper.regexp.match", str(st.pop())))

for _nm in ("mapper.geo.within", "mapper.geo.outside", "mapper.geo.fence"):
    REGISTRY[_nm] = (lambda name: lambda st: st.push((name, st.pop())))(_nm)
REGISTRY["mapper.geo.approximate"] = lambda st: st.push(("mapper.geo.approximate", int(st.pop())))


def _shape_pred(shape):
    from warp10_platform_spark.operators import geocells as GC
    from warp10_platform_spark.operators.wkt import shape_contains_expr

    if isinstance(shape, GC.GeoCells):
        from warp10_platform_spark.core.geoxp import to_geoxp_col

        return shape.contains_hh_expr(to_geoxp_col(F.col("lat"), F.col("lon")))
    return shape_contains_expr(shape, F.col("lat"), F.col("lon"))


_OLD_MAP = REGISTRY["MAP"]


@register("MAP")
def _map_r5(st):
    """MAP dispatch extension for the round-5 mapper specs."""
    args = st.peek()
    if not isinstance(args, list) or len(args) < 5:
        return _OLD_MAP(st)
    mapper = args[-4]
    name = mapper[0] if isinstance(mapper, tuple) else mapper
    if not isinstance(name, str) or name not in _R5_MAPPERS:
        return _OLD_MAP(st)
    st.pop()
    gts, pre, post = args[:-4], args[-3], args[-2]
    gf = _as_frame(gts if len(gts) != 1 else gts[0])
    param = mapper[1] if isinstance(mapper, tuple) else None
    st.push(_R5_MAPPERS[name](gf, param, pre, post))


def _m_dot(activation):
    def run(gf, weights, pre, post):
        from warp10_platform_spark.operators.mapper import dotproduct_mapper

        return GTSFrame(
            dotproduct_mapper(gf.df, weights, pre, post, value_col=gf.value_col,
                              activation=activation),
            gf.bucketspec, "v_mapped",
        )

    return run


def _m_npdf(gf, p, pre, post):
    from warp10_platform_spark.operators.mapper import npdf_mapper

    mu, sigma = p
    return GTSFrame(npdf_mapper(gf.df, mu, sigma, value_col=gf.value_col), gf.bucketspec, "v_mapped")


def _m_scalar(engine_name):
    def run(gf, p, pre, post):
        return gf.map_scalar(engine_name, p)

    return run


def _m_geo_within(gf, shape, pre, post):
    return GTSFrame(
        gf.df.where(F.col("lat").isNotNull() & _shape_pred(shape)), gf.bucketspec, gf.value_col
    )


def _m_geo_outside(gf, shape, pre, post):
    return GTSFrame(
        gf.df.where(F.col("lat").isNull() | ~_shape_pred(shape)), gf.bucketspec, gf.value_col
    )


def _m_geo_fence(gf, shape, pre, post):
    # MapperGeoFence.apply: value := boolean inside-ness, location kept
    return GTSFrame(
        gf.df.withColumn("v_mapped", F.col("lat").isNotNull() & _shape_pred(shape)),
        gf.bucketspec, "v_mapped",
    )


def _m_geo_approximate(gf, res, pre, post):
    # MapperGeoApproximate: resolution 2..32 even → bits per axis = res/2
    from warp10_platform_spark.operators.geo import geo_approximate

    return GTSFrame(geo_approximate(gf.df, bits=max(1, res // 2)), gf.bucketspec, gf.value_col)


def _m_welford(base):
    def run(gf, p, pre, post):
        return gf.map_aggregate(base, pre, post)

    return run


_R5_MAPPERS = {
    "mapper.dotproduct": _m_dot(None),
    "mapper.dotproduct.positive": _m_dot("positive"),
    "mapper.dotproduct.sigmoid": _m_dot("sigmoid"),
    "mapper.dotproduct.tanh": _m_dot("tanh"),
    "mapper.npdf": _m_npdf,
    "mapper.replace": _m_scalar("mapper.replace"),
    "mapper.regexp.replace": _m_scalar("mapper.regexp-replace"),
    "mapper.regexp.match": _m_scalar("mapper.regexp-match"),
    "mapper.geo.within": _m_geo_within,
    "mapper.geo.outside": _m_geo_outside,
    "mapper.geo.fence": _m_geo_fence,
    "mapper.geo.approximate": _m_geo_approximate,
    "mapper.sd.welford": _m_welford("mapper.sd"),
    "mapper.var.welford": _m_welford("mapper.var"),
}
REGISTRY["mapper.sd.welford"] = lambda st: st.push("mapper.sd.welford")
REGISTRY["mapper.var.welford"] = lambda st: st.push("mapper.var.welford")


# ---------------------------------------------------------------------
# Welford / null-policy aggregator aliases. Welford's streaming update
# yields the identical sample variance/sd as the two-pass formula, so the
# alias shares the batch Catalyst expression (Welford matters for the
# reference's single-pass engine, not for Spark's agg).
# ---------------------------------------------------------------------

for _alias, _base in (
    ("bucketizer.sd.welford", "bucketizer.sd"),
    ("bucketizer.var.welford", "bucketizer.var"),
    ("reducer.sd.welford", "reducer.sd"),
    ("reducer.var.welford", "reducer.var"),
    ("reducer.sd.welford.forbid-nulls", "reducer.sd"),
    ("reducer.var.welford.forbid-nulls", "reducer.var"),
    ("reducer.sd.forbid-nulls", "reducer.sd"),
    ("reducer.var.forbid-nulls", "reducer.var"),
    ("reducer.percentile.forbid-nulls", "reducer.percentile"),
    ("reducer.mean.circular.exclude-nulls", "reducer.mean.circular"),
    ("reducer.join.forbid-nulls", "reducer.join"),
    ("reducer.join.nonnull", "reducer.join"),
):
    REGISTRY[_alias] = (lambda b: lambda st: st.push(b))(_base)

# reducer.join.urlencoded URL-encodes each value before joining
# (Join.java with urlencode=true) — own expression in bucketize.py.
REGISTRY["reducer.join.urlencoded"] = lambda st: st.push("reducer.join.urlencoded")


# ---------------------------------------------------------------------
# filler.value — FILL-framework form of FILLVALUE (FillerValue builder)
# ---------------------------------------------------------------------

REGISTRY["filler.value"] = lambda st: st.push(("filler.value", st.pop()))

_OLD_FILL = REGISTRY["FILL"]


@register("FILL")
def _fill_r5(st):
    args = st.peek()
    filler = args[-1] if isinstance(args, list) else None
    if isinstance(filler, tuple) and filler[0] == "filler.value":
        st.pop()
        gf = _as_frame(args[0])
        st.push(gf.fillvalue(filler[1]))
        return
    return _OLD_FILL(st)


# ---------------------------------------------------------------------
# RANDPDF / SRANDPDF (RANDPDF.java:46-120) and REF (REF.java)
# ---------------------------------------------------------------------

class NativeMacro:
    """A driver-side callable usable where the stack expects a Macro —
    the reference pushes WarpScriptStackFunction instances the same way
    (RANDPDF pushes a function object EVAL then applies)."""

    __slots__ = ("fn", "name")

    def __init__(self, fn, name: str):
        self.fn = fn
        self.name = name

    def __repr__(self):  # pragma: no cover
        return f"<NativeMacro {self.name}>"


def _randpdf_factory(seeded: bool, name: str):
    def build(st):
        hist = st.pop()
        if not isinstance(hist, dict):
            raise TypeError(f"{name} expects a value histogram map")
        total = float(sum(hist.values()))
        values, cum = [], []
        acc = 0.0
        for k in hist:  # insertion order — deterministic per script
            acc += float(hist[k]) / total
            values.append(k)
            cum.append(acc)

        def draw(stk):
            import random as _random

            rng = getattr(stk, "rng", None)
            if seeded:
                if rng is None:
                    raise RuntimeError(f"{name} requires a seeded PRNG (SRAND first)")
            elif rng is None:
                rng = _random.Random()
            u = rng.random()
            for v, c in zip(values, cum):
                if u <= c:
                    stk.push(v)
                    return
            stk.push(values[-1])

        st.push(NativeMacro(draw, name))

    return build


REGISTRY["RANDPDF"] = _randpdf_factory(False, "RANDPDF")
REGISTRY["SRANDPDF"] = _randpdf_factory(True, "SRANDPDF")


_OLD_EVAL = REGISTRY["EVAL"]


@register("EVAL", "RUN")
def _eval_r5(st):
    if isinstance(st.peek(), NativeMacro):
        st.pop().fn(st)
        return
    return _OLD_EVAL(st)


@register("REF")
def _ref(st):
    """REF (REF.java:30-35): push the function object itself."""
    st.push(NativeMacro(_ref, "REF"))


# ---------------------------------------------------------------------
# Construct-identity propagation: NEWGTS/MAKEGTS track (class, labels)
# driver-side so ADDVALUE works on zero-row frames; RENAME/RELABEL must
# carry that identity through (RENAME.java / RELABEL.java rewrite the
# Metadata in place in the reference).
# ---------------------------------------------------------------------

_OLD_RENAME = REGISTRY["RENAME"]
_OLD_RELABEL = REGISTRY["RELABEL"]


@register("RENAME")
def _rename_r5(st):
    name = st.stack[-1] if st.depth() >= 2 else None
    src = st.stack[-2] if st.depth() >= 2 else None
    _OLD_RENAME(st)
    out = st.peek()
    si = getattr(src, "ident", None)
    if isinstance(out, GTSFrame) and si is not None and isinstance(name, str):
        # '+suffix' appends (RENAME.java:52); plain name replaces
        out.ident = (si[0] + name[1:] if name.startswith("+") else name, si[1])


@register("RELABEL")
def _relabel_r5(st):
    changes = st.stack[-1] if st.depth() >= 2 else None
    src = st.stack[-2] if st.depth() >= 2 else None
    _OLD_RELABEL(st)
    out = st.peek()
    si = getattr(src, "ident", None)
    if isinstance(out, GTSFrame) and si is not None and isinstance(changes, dict):
        labels = dict(si[1])
        for k, v in changes.items():
            if v == "" or v is None:
                labels.pop(k, None)
            else:
                labels[k] = str(v)
        out.ident = (si[0], labels)


# ---------------------------------------------------------------------
# Multivalue tier — WRAPMV/WRAPMV!, MVVALUES/MVTICKS/MVLOCATIONS/
# MVELEVATIONS/MVHHCODES, MVTICKSPLIT/MVINDEXSPLIT, ->MVSTRING
# (registrations WarpScriptLib.java:2605-2615; core/multivalue.py)
# ---------------------------------------------------------------------

def _element_or_list(fn):
    """ElementOrListStackFunction.apply: map over a list operand, apply
    directly otherwise."""

    def run(st):
        v = st.pop()
        if isinstance(v, list):
            st.push([fn(e) for e in v])
        else:
            st.push(fn(v))

    return run


def _mv_wrap_fn(compress):
    from warp10_platform_spark.core.encoders import Encoder
    from warp10_platform_spark.core.multivalue import mv_wrap

    def one(e):
        if isinstance(e, Encoder):
            return mv_wrap(e, compress=compress)
        raise TypeError("WRAPMV operates on ENCODER values (use ASENCODERS on a GTS set)")

    return one


REGISTRY["WRAPMV"] = _element_or_list(_mv_wrap_fn(True))
REGISTRY["WRAPMV!"] = _element_or_list(_mv_wrap_fn(False))


def _mvextract_fn(element):
    from warp10_platform_spark.core.encoders import Encoder
    from warp10_platform_spark.core.multivalue import mvextract

    def one(e):
        if not isinstance(e, Encoder):
            raise TypeError("MV extraction operates on ENCODER values")
        return mvextract(e, element)

    return one


for _nm, _el in (("MVVALUES", "VALUE"), ("MVTICKS", "TICK"), ("MVLOCATIONS", "LATLON"),
                 ("MVELEVATIONS", "ELEVATION"), ("MVHHCODES", "LOCATION")):
    REGISTRY[_nm] = _element_or_list(_mvextract_fn(_el))


def _mvsplit_factory(bytick):
    def run(st):
        from warp10_platform_spark.core.encoders import Encoder
        from warp10_platform_spark.core.multivalue import mvsplit

        renaming = None
        selection = None
        top = st.pop()
        if isinstance(top, dict):
            renaming = top
            top = st.pop()
        if isinstance(top, list) and top and not isinstance(top[0], Encoder):
            selection = top
            top = st.pop()
        if isinstance(top, Encoder):
            st.push(mvsplit(top, bytick, selection, renaming))
        elif isinstance(top, list):
            st.push([mvsplit(e, bytick, selection, renaming) for e in top])
        else:
            raise TypeError("MVSPLIT operates on ENCODER values or a list thereof")

    return run


REGISTRY["MVTICKSPLIT"] = _mvsplit_factory(True)
REGISTRY["MVINDEXSPLIT"] = _mvsplit_factory(False)


@register("->MVSTRING")
def _to_mvstring(st):
    from warp10_platform_spark.core.multivalue import to_mvstring

    st.push(to_mvstring(st.pop()))

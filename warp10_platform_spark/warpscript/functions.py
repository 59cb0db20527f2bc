"""WarpScript function registry — each name applies against the stack,
exactly like the reference's `findFunction(stmt).apply(stack)` dispatch
(MemoryWarpScriptStack.java:1060-1075, registrations WarpScriptLib.java).

GTS functions bind to the engine's operators via GTSFrame, so a script is
tokenized and applied in the driver but the DATA work stays one lazy
Catalyst plan — nothing executes until the caller collects the result.
"""

from __future__ import annotations

import time as _time
from typing import Callable

from pyspark.sql import functions as F

from warp10_platform_spark.core.frame import GTSFrame
from warp10_platform_spark.sources.tables import events_points

REGISTRY: dict[str, Callable] = {}


def register(*names: str):
    def deco(fn):
        for n in names:
            REGISTRY[n] = fn
        return fn

    return deco


# ---------- stack manipulation (WarpScriptLib.java:1988-2060) ----------

@register("DUP")
def _dup(st):
    st.push(st.peek())


@register("SWAP")
def _swap(st):
    a, b = st.pop(), st.pop()
    st.push(a)
    st.push(b)


@register("DROP")
def _drop(st):
    st.pop()


@register("CLEAR")
def _clear(st):
    st.stack.clear()


@register("DEPTH")
def _depth(st):
    st.push(st.depth())


@register("ROT")
def _rot(st):
    c, b, a = st.pop(), st.pop(), st.pop()
    st.push(b)
    st.push(c)
    st.push(a)


@register("PICK")
def _pick(st):
    n = st.pop()
    st.push(st.stack[-n])


# ---------- list/map literals ----------

class _Mark:
    pass


class _MapMark(_Mark):
    pass


@register("[", "MARK")
def _mark(st):
    st.push(_Mark())


@register("]")
def _endlist(st):
    out = []
    while True:
        v = st.pop()
        if isinstance(v, _MapMark):
            raise RuntimeError("']' closing a '{'")
        if isinstance(v, _Mark):
            break
        out.append(v)
    out.reverse()
    st.push(out)


@register("{")
def _mapmark(st):
    st.push(_MapMark())


@register("}")
def _endmap(st):
    kv = []
    while True:
        v = st.pop()
        if isinstance(v, _MapMark):
            break
        if isinstance(v, _Mark):
            raise RuntimeError("'}' closing a '['")
        kv.append(v)
    kv.reverse()
    if len(kv) % 2:
        raise RuntimeError("odd number of map entries")
    st.push({kv[i]: kv[i + 1] for i in range(0, len(kv), 2)})


@register("->LIST")
def _tolist(st):
    n = st.pop()
    items = [st.pop() for _ in range(n)]
    items.reverse()
    st.push(items)


@register("SIZE")
def _size(st):
    v = st.pop()
    if isinstance(v, GTSFrame):
        st.push(v.df.count())
    else:
        st.push(len(v))


@register("GET")
def _get(st):
    k = st.pop()
    coll = st.pop()
    st.push(coll[k])


# ---------- symbols / macros / control flow ----------

@register("STORE")
def _store(st):
    name = st.pop()
    st.symbols[name] = st.pop()


@register("LOAD")
def _load(st):
    st.push(st.symbols[st.pop()])


@register("EVAL", "RUN")
def _eval(st):
    from warp10_platform_spark.warpscript.stack import Macro

    v = st.pop()
    if isinstance(v, Macro):
        st.exec_macro(v)
    elif isinstance(v, str):
        st.exec(v)
    else:
        raise TypeError("EVAL expects a macro or a string")


@register("IFT")
def _ift(st):
    macro = st.pop()
    cond = st.pop()
    if cond:
        st.exec_macro(macro)


@register("IFTE")
def _ifte(st):
    melse = st.pop()
    mthen = st.pop()
    cond = st.pop()
    st.exec_macro(mthen if cond else melse)


@register("FOREACH")
def _foreach(st):
    macro = st.pop()
    seq = st.pop()
    items = seq.items() if isinstance(seq, dict) else seq
    for item in items:
        if isinstance(seq, dict):
            st.push(item[0])
            st.push(item[1])
        else:
            st.push(item)
        st.exec_macro(macro)


@register("FOR")
def _for(st):
    macro = st.pop()
    stop = st.pop()
    start = st.pop()
    for i in range(start, stop + 1):
        st.push(i)
        st.exec_macro(macro)


# ---------- arithmetic / comparison / logic ----------

def _binop(fn):
    def inner(st):
        b = st.pop()
        a = st.pop()
        st.push(fn(a, b))

    return inner


REGISTRY["+"] = _binop(lambda a, b: a + b)
REGISTRY["-"] = _binop(lambda a, b: a - b)
REGISTRY["*"] = _binop(lambda a, b: a * b)
REGISTRY["/"] = _binop(lambda a, b: a / b if isinstance(a, float) or isinstance(b, float) else (a // b if isinstance(a, int) and isinstance(b, int) and a % b == 0 else a / b))
REGISTRY["%"] = _binop(lambda a, b: a % b)
REGISTRY["**"] = _binop(lambda a, b: a ** b)
REGISTRY["=="] = _binop(lambda a, b: a == b)
REGISTRY["!="] = _binop(lambda a, b: a != b)
REGISTRY["<"] = _binop(lambda a, b: a < b)
REGISTRY["<="] = _binop(lambda a, b: a <= b)
REGISTRY[">"] = _binop(lambda a, b: a > b)
REGISTRY[">="] = _binop(lambda a, b: a >= b)
REGISTRY["AND"] = _binop(lambda a, b: bool(a) and bool(b))
REGISTRY["OR"] = _binop(lambda a, b: bool(a) or bool(b))
REGISTRY["NOT"] = REGISTRY["!"] = lambda st: st.push(not st.pop())
REGISTRY["MIN"] = _binop(min)
REGISTRY["MAX"] = _binop(max)
REGISTRY["ABS"] = lambda st: st.push(abs(st.pop()))
REGISTRY["TOLONG"] = lambda st: st.push(int(st.pop()))
REGISTRY["TODOUBLE"] = lambda st: st.push(float(st.pop()))
REGISTRY["TOSTRING"] = lambda st: st.push(str(st.pop()))


# ---------- time units & now (Constants.java µs time unit) ----------

_US = 1
_UNITS = {
    "w": 7 * 86_400_000_000,
    "d": 86_400_000_000,
    "h": 3_600_000_000,
    "m": 60_000_000,
    "s": 1_000_000,
    "ms": 1_000,
    "us": 1,
}
for _name, _mult in _UNITS.items():
    REGISTRY[_name] = (lambda mult: lambda st: st.push(st.pop() * mult))(_mult)

REGISTRY["NOW"] = lambda st: st.push(int(_time.time() * 1_000_000))


# ---------- aggregator / op / filter name tokens ----------
# The reference pushes function OBJECTS for these names; we push their
# registry string (plus popped params for the parameterized ones), which
# the consuming GTS function interprets.

_AGG_BASENAMES = (
    "sum mean min max count first last median sd sd.pop var var.pop delta rate rms "
    "join and or argmin argmax mad mean.circular shannonentropy.0 highest lowest percentile"
).split()
for _fam in ("bucketizer", "mapper", "reducer"):
    for _bn in _AGG_BASENAMES:
        _full = f"{_fam}.{_bn}"
        REGISTRY[_full] = (lambda name: lambda st: st.push(name))(_full)

for _opn in ("op.add", "op.sub", "op.mul", "op.div", "op.eq", "op.ne", "op.gt",
             "op.ge", "op.lt", "op.le", "op.and", "op.or", "op.mask", "op.negmask"):
    REGISTRY[_opn] = (lambda name: lambda st: st.push(name))(_opn)


def _param_filter(name):
    """filter.* creation pops its params NOW (like the reference's filter
    factory functions) and pushes a spec tuple consumed by FILTER."""

    def inner(st):
        st.push((name, st.pop()))

    return inner


REGISTRY["filter.byclass"] = _param_filter("filter.byclass")
REGISTRY["filter.bylabels"] = _param_filter("filter.bylabels")
REGISTRY["filter.byselector"] = _param_filter("filter.byselector")
REGISTRY["filter.last.gt"] = _param_filter("filter.last.gt")
REGISTRY["filter.last.lt"] = _param_filter("filter.last.lt")


# ---------- GTS functions ----------

def _as_frame(v) -> GTSFrame:
    if isinstance(v, GTSFrame):
        return v
    if isinstance(v, list):
        frames = [f for f in v if isinstance(f, GTSFrame)]
        if len(frames) == 1:
            return frames[0]
        if frames:
            df = frames[0].df
            for f in frames[1:]:
                df = df.unionByName(f.df)
            return GTSFrame(df, frames[0].bucketspec, frames[0].value_col)
    raise TypeError(f"expected GTS on stack, got {type(v).__name__}")


@register("FETCH")
def _fetch(st):
    """[ (token)? class_selector labels_map start end ] FETCH — the
    5/4-element list form (FETCH.java:101-141). A negative final element
    means count-based fetch: [ … now -count ] keeps the last `count`
    points per series (FETCH.java:128)."""
    args = st.pop()
    if not isinstance(args, list):
        raise TypeError("FETCH expects a parameter list")
    if len(args) == 5:
        _token, cls, labels, a, b = args
    elif len(args) == 4:
        cls, labels, a, b = args
    else:
        raise ValueError("FETCH expects [ token? class labels start end ]")
    selector = cls + "{" + ",".join(f"{k}={v}" for k, v in (labels or {}).items()) + "}"
    pts = events_points(st.spark, st.sf_dir)
    if isinstance(b, int) and b < 0:
        st.push(GTSFrame.fetch(pts, selector, end=a, count=-b))
    else:
        st.push(GTSFrame.fetch(pts, selector, start=a, end=b))


@register("FIND")
def _find(st):
    from warp10_platform_spark.sources.directory import build_directory, find

    args = st.pop()
    cls, labels = (args[-4], args[-3]) if len(args) >= 4 else (args[0], args[1] if len(args) > 1 else {})
    selector = cls + "{" + ",".join(f"{k}={v}" for k, v in (labels or {}).items()) + "}"
    st.push(find(build_directory(events_points(st.spark, st.sf_dir)), selector))


@register("BUCKETIZE")
def _bucketize(st):
    """[ gts… bucketizer lastbucket bucketspan bucketcount ] BUCKETIZE
    (BUCKETIZE.java:34 argument order)."""
    args = st.pop()
    gts, bucketizer, lastbucket, span, count = (
        args[:-4], args[-4], args[-3], args[-2], args[-1]
    )
    gf = _as_frame(gts if len(gts) != 1 else gts[0])
    st.push(gf.bucketize(
        bucketizer,
        span,
        lastbucket=lastbucket or None,
        bucketcount=count or None,
    ))


@register("MAP")
def _map(st):
    """[ gts… mapper pre post occurrences ] MAP (MAP.java:39-47)."""
    args = st.pop()
    gts, mapper, pre, post, _occ = args[:-4], args[-4], args[-3], args[-2], args[-1]
    gf = _as_frame(gts if len(gts) != 1 else gts[0])
    if mapper == "mapper.delta" and pre == 1 and post == 0:
        st.push(gf.delta())
    elif mapper == "mapper.rate" and pre == 1 and post == 0:
        st.push(gf.rate())
    else:
        st.push(gf.map_aggregate(mapper, pre, post))


@register("REDUCE")
def _reduce(st):
    """[ [gts…] [label …] reducer ] REDUCE (REDUCE.java:37)."""
    args = st.pop()
    gts_list, by_labels, reducer = args[0], args[1], args[2]
    gf = _as_frame(gts_list)
    st.push(gf.reduce_(reducer, by_labels))


@register("APPLY")
def _apply(st):
    """[ [gts_a] [gts_b] [label …] op ] APPLY (APPLY.java:40)."""
    args = st.pop()
    a, b, by_labels, op = args[0], args[1], args[2], args[3]
    st.push(_as_frame(a).apply_op(_as_frame(b), op, by_labels))


@register("FILTER")
def _filter(st):
    """[ [gts…] [label …] filterspec ] FILTER (FILTER.java:39)."""
    args = st.pop()
    gf = _as_frame(args[0])
    spec = args[-1]
    name, param = spec
    if name == "filter.byclass":
        st.push(gf.filter_byclass(param))
    elif name == "filter.bylabels":
        st.push(gf.filter_bylabels(param))
    elif name == "filter.byselector":
        from warp10_platform_spark.core.selector import selector_predicate

        st.push(GTSFrame(gf.df.where(selector_predicate(param)), gf.bucketspec, gf.value_col))
    elif name == "filter.last.gt":
        st.push(gf.filter_last(">", param))
    elif name == "filter.last.lt":
        st.push(gf.filter_last("<", param))
    else:
        raise ValueError(f"unknown filter {name}")


def _frame_method(name, *method_names, n_params: int = 0):
    """Register a stack function that pops n params then the frame and
    calls the GTSFrame method."""

    def inner(st):
        params = [st.pop() for _ in range(n_params)]
        params.reverse()
        gf = _as_frame(st.pop())
        st.push(getattr(gf, method_names[0])(*params))

    REGISTRY[name] = inner


_frame_method("FILLPREVIOUS", "fillprevious")
_frame_method("FILLNEXT", "fillnext")
_frame_method("FILLVALUE", "fillvalue", n_params=1)
_frame_method("INTERPOLATE", "filllinear")
_frame_method("TIMESHIFT", "timeshift", n_params=1)
_frame_method("TIMESCALE", "timescale", n_params=1)
_frame_method("TICKINDEX", "tickindex")
_frame_method("DEDUP", "dedup")
_frame_method("VALUEDEDUP", "valuededup")
_frame_method("COMPACT", "compact")
_frame_method("NORMALIZE", "normalize")
_frame_method("STANDARDIZE", "standardize")
_frame_method("ISONORMALIZE", "isonormalize")
_frame_method("MONOTONIC", "monotonic")
_frame_method("INTEGRATE", "integrate")
_frame_method("SHRINK", "shrink", n_params=1)
_frame_method("CHUNK", "chunk", n_params=1)
_frame_method("TIMESPLIT", "timesplit", n_params=1)
_frame_method("QUANTIZE", "quantize", n_params=1)


@register("TIMECLIP")
def _timeclip(st):
    end = st.pop()
    start = st.pop()
    gf = _as_frame(st.pop())
    st.push(gf.timeclip(start, end))


@register("MERGE")
def _merge(st):
    st.push(_as_frame(st.pop()))


@register("NONEMPTY")
def _nonempty(st):
    st.push(_as_frame(st.pop()))


@register("SORT", "RSORT")
def _sort(st):
    # Points live in an unordered relation; ordering is imposed by every
    # consuming window (orderBy ts) — SORT is an identity here by design.
    st.push(_as_frame(st.pop()))


REGISTRY["{}"] = lambda st: st.push({})  # common shorthand for an empty label map

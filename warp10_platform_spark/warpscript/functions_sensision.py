"""Sensision metrics extension (ext/sensision): SENSISION.EVENT /
UPDATE / SET / GET / DUMP / DUMPEVENTS over a process-local registry.

Reference contracts (SENSISIONUPDATE.java:41-70, SENSISIONSET.java,
SENSISIONGET.java:52-88, SENSISIONDUMP.java:28-52,
SENSISIONDUMPEVENTS.java, SensisionWarpScriptExtension.java:33-34):
argument lists [cls labels value (ttl)], capability gates
``sensision.write`` for mutation and ``sensision.read`` for reads,
GET pushes a one-point GTS (an Encoder here), DUMP pushes the metrics
in the sensision text format ``ts// class{labels} value`` and
DUMPEVENTS the recorded events in the same format.

The registry is process-local like the reference's in-JVM Sensision
singleton — executor-side metrics in a real deployment flow through
Spark's own metric system, not through this scalar surface.
"""

from __future__ import annotations

import threading
import time

from warp10_platform_spark.core import timeunits as _tuc
from warp10_platform_spark.warpscript.functions import register

_LOCK = threading.Lock()
_VALUES: dict[tuple, object] = {}   # (cls, frozenset(labels)) → (value, ts_us)
_EVENTS: list[str] = []


def _caps(st) -> dict:
    return getattr(st, "attributes", {}).get("capabilities", {}) or {}


def _require(st, cap: str):
    if cap not in _caps(st):
        raise PermissionError(f"missing capability '{cap}'")


def _key(cls, labels):
    return (str(cls), frozenset((str(k), str(v)) for k, v in (labels or {}).items()))


def _fmt(cls, labels, value, ts_us) -> str:
    pairs = labels.items() if isinstance(labels, dict) else (labels or [])
    lbl = ",".join(f"{k}={v}" for k, v in sorted(pairs))
    v = ("'" + value + "'") if isinstance(value, str) else value
    return f"{ts_us}// {cls}{{{lbl}}} {v}"


def _now_us() -> int:
    return int(time.time() * _tuc.UNITS_PER_S)


def _args3(st, name):
    args = st.pop()
    if not isinstance(args, list) or len(args) < 3:
        raise TypeError(f"{name} expects a list [class labels value (ttl)].")
    return str(args[0]), dict(args[1] or {}), args[2]


@register("SENSISION.UPDATE")
def _s_update(st):
    """[cls labels delta (ttl)] SENSISION.UPDATE: add delta."""
    _require(st, "sensision.write")
    cls, labels, delta = _args3(st, "SENSISION.UPDATE")
    k = _key(cls, labels)
    with _LOCK:
        cur = _VALUES.get(k, (0, 0))[0]
        _VALUES[k] = (cur + delta, _now_us())


@register("SENSISION.SET")
def _s_set(st):
    """[cls labels value (ttl)] SENSISION.SET: set (None clears)."""
    _require(st, "sensision.write")
    cls, labels, value = _args3(st, "SENSISION.SET")
    k = _key(cls, labels)
    with _LOCK:
        if value is None:
            _VALUES.pop(k, None)
        else:
            _VALUES[k] = (value, _now_us())


@register("SENSISION.GET")
def _s_get(st):
    """labels cls SENSISION.GET (or [cls labels]) → one-point GTS
    (Encoder) carrying the current value, empty when unset."""
    _require(st, "sensision.read")
    from warp10_platform_spark.core.encoders import Encoder

    top = st.pop()
    if isinstance(top, list):
        cls, labels = str(top[0]), dict(top[1] or {})
    else:
        labels = dict(top or {})
        cls = str(st.pop())
    enc = Encoder(cls, labels)
    with _LOCK:
        v = _VALUES.get(_key(cls, labels))
    if v is not None:
        enc.add_value(_now_us(), v[0])
    st.push(enc)


@register("SENSISION.EVENT")
def _s_event(st):
    """[cls labels value] or [ts cls labels value] SENSISION.EVENT."""
    _require(st, "sensision.write")
    args = st.pop()
    if not isinstance(args, list) or len(args) < 3:
        raise TypeError("SENSISION.EVENT expects a list.")
    if len(args) >= 4 and isinstance(args[0], int):
        ts, cls, labels, value = args[0], str(args[1]), dict(args[2] or {}), args[3]
    else:
        ts, cls, labels, value = _now_us(), str(args[0]), dict(args[1] or {}), args[2]
    with _LOCK:
        _EVENTS.append(_fmt(cls, labels, value, ts))


@register("SENSISION.DUMP")
def _s_dump(st):
    """flag SENSISION.DUMP → sensision text format; the boolean selects
    the metric's update timestamp vs now."""
    _require(st, "sensision.read")
    use_ts = st.pop()
    if not isinstance(use_ts, bool):
        raise TypeError("SENSISION.DUMP expects a BOOLEAN flag.")
    now = _now_us()
    with _LOCK:
        lines = [
            _fmt(cls, labels, v, ts if use_ts else now)
            for (cls, labels), (v, ts) in sorted(_VALUES.items())
        ]
    st.push("\n".join(lines))


@register("SENSISION.DUMPEVENTS")
def _s_dumpevents(st):
    """SENSISION.DUMPEVENTS → recorded events, one per line (drained
    like the reference's getEvents)."""
    _require(st, "sensision.read")
    with _LOCK:
        st.push("\n".join(_EVENTS))
        _EVENTS.clear()

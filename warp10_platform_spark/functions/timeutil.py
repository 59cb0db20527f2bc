"""Time scalar helpers — ISO8601 durations, TSELEMENTS (SURVEY §2.9).

The reference's DURATION (functions/DURATION.java) converts an ISO8601
duration literal to platform time units at script build time; the Spark
analog is a Python helper used while building the plan. TSELEMENTS
(TSELEMENTS.java) splits a tick into calendar fields in a tz — pure
Column expressions here.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

from warp10_platform_spark.core import timeunits as tu

# Duration quanta in PLATFORM ticks (Constants.java:51-61): µs default,
# rescaled when WARP10_TIME_UNITS = ms/ns. US is 0 ticks in ms mode —
# a µs genuinely is sub-tick there (skipped in humanduration's ladder).
US = tu.us(1)
MS = tu.UNITS_PER_MS
S = tu.UNITS_PER_S
MINUTE = 60 * S
HOUR = 3600 * S
DAY = 86_400 * S
WEEK = 7 * DAY

_DUR_RE = re.compile(
    r"^P(?:(?P<weeks>\d+(?:\.\d+)?)W)?(?:(?P<days>\d+(?:\.\d+)?)D)?"
    r"(?:T(?:(?P<hours>\d+(?:\.\d+)?)H)?(?:(?P<minutes>\d+(?:\.\d+)?)M)?"
    r"(?:(?P<seconds>\d+(?:\.\d+)?)S)?)?$"
)


def parse_duration(s: str) -> int:
    """ISO8601 duration → LONG platform ticks (DURATION.java semantics:
    calendar-free
    components only — P…W/D/T…H/M/S; months/years need a calendar and are
    rejected, as the reference routes those to ADDMONTHS/ADDYEARS)."""
    m = _DUR_RE.match(s)
    if not m or s in ("P", "PT"):
        raise ValueError(f"invalid ISO8601 duration: {s!r}")
    parts = {k: float(v) if v else 0.0 for k, v in m.groupdict().items()}
    total = (
        parts["weeks"] * WEEK
        + parts["days"] * DAY
        + parts["hours"] * HOUR
        + parts["minutes"] * MINUTE
        + parts["seconds"] * S
    )
    return int(round(total))


def humanduration(ticks: int) -> str:
    """HUMANDURATION (functions/HUMANDURATION.java:28): LONG platform
    ticks → compact human-readable duration, largest-unit-first, zero
    components skipped (e.g. 95400000000 µs → '1d2h30m'). The suffix
    ladder stops at the platform resolution (no 'us' entry in ms mode,
    an extra 'ns' entry in ns mode)."""
    if ticks == 0:
        return "0"
    sign = "-" if ticks < 0 else ""
    ticks = abs(ticks)
    ladder = [(WEEK, "w"), (DAY, "d"), (HOUR, "h"), (MINUTE, "m"), (S, "s"), (MS, "ms")]
    if tu.TIME_UNIT in ("us", "ns"):
        ladder.append((US, "us"))
    if tu.TIME_UNIT == "ns":
        ladder.append((1, "ns"))
    out = []
    for unit, suffix in ladder:
        q, ticks = divmod(ticks, unit)
        if q:
            out.append(f"{q}{suffix}")
    return sign + "".join(out)


_EPOCH_NTZ = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def tz_wall_ntz(ts: Column, tz: str) -> Column:
    """LONG platform-tick instant → TIMESTAMP_NTZ carrying the
    wall-clock fields in `tz`. Session-timezone-independent by
    construction: NTZ arithmetic from the epoch plus convert_timezone
    never consults the session tz — unlike field extraction on a plain
    TIMESTAMP, which silently renders in whatever zone the session
    happens to use. (Sub-µs precision in ns mode does not survive the
    NTZ round-trip — calendar fields never need it.)"""
    utc = F.timestamp_add("MICROSECOND", tu.col_units_to_us(ts), F.expr(_EPOCH_NTZ))
    if tz == "UTC":
        return utc
    return F.convert_timezone(F.lit("UTC"), F.lit(tz), utc)


def wall_ntz_to_us(ntz: Column, tz: str) -> Column:
    """Inverse of tz_wall_ntz: NTZ wall clock in `tz` → LONG
    platform-tick instant (µs by default, scaled with the session unit)."""
    utc = ntz if tz == "UTC" else F.convert_timezone(F.lit(tz), F.lit("UTC"), ntz)
    return tu.col_us_to_units(F.timestamp_diff("MICROSECOND", F.expr(_EPOCH_NTZ), utc))


def tselements(ts: Column, tz: str = "UTC") -> Column:
    """TSELEMENTS (TSELEMENTS.java): tick → [year, month, day, hour,
    minute, second, sub-second PLATFORM TICKS] in tz, as an array<long>
    (the reference emits the sub-second remainder in the session unit)."""
    t = tz_wall_ntz(ts, tz)
    return F.array(
        F.year(t).cast("long"),
        F.month(t).cast("long"),
        F.dayofmonth(t).cast("long"),
        F.hour(t).cast("long"),
        F.minute(t).cast("long"),
        F.second(t).cast("long"),
        (ts % tu.UNITS_PER_S).cast("long"),
    )


def from_tselements(year: Column, month: Column, day: Column, hour: Column,
                    minute: Column, second: Column, subsec: Column, tz: str = "UTC") -> Column:
    """->TSELEMENTS inverse: calendar fields (+ sub-second platform
    ticks) in tz → LONG platform tick."""
    t = F.make_timestamp_ntz(year, month, day, hour, minute, second)
    return wall_ntz_to_us(t, tz) + subsec

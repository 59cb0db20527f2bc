"""Session time units — the platform tick resolution.

The reference fixes the tick resolution once at config load
(`warp10/src/main/java/io/warp10/continuum/store/Constants.java:51-61,
551-567`, config key ``warp.timeunits``): ``us`` (default), ``ms`` or
``ns``. Every timestamp the platform stores, parses, buckets or emits is
an integer count of THIS unit; MSTU/STU, ISO8601 conversion, DURATION
arithmetic and bucket/window spans all scale with it.

The Spark engine mirrors that: the unit is read once per process from
the ``WARP10_TIME_UNITS`` environment variable and treated as a
constant, exactly like the reference's static initializer. All grid
constants in this repo are written in µs and routed through :func:`us`
so the default mode is bit-identical to the historical behavior and the
ms/ns modes are exact integer rescalings (every named grid constant is
ms-aligned, so no mode truncates a constant).

The DuckDB oracle side flips with the same constant: `DUCK_EPOCH_FN`
names the epoch extractor (`epoch_ms`/`epoch_us`/`epoch_ns`) so oracle
SQL built at import renders timestamps in the same unit the Spark side
stores.
"""

from __future__ import annotations

import os

from pyspark.sql import Column
from pyspark.sql import functions as F

_VALID = ("ms", "us", "ns")


def _resolve(raw: str | None) -> str:
    tu = (raw or "us").strip().lower()
    if tu not in _VALID:
        raise ValueError(f"invalid time unit {raw!r}: expected one of {_VALID}")
    return tu


#: The session unit — fixed for the process lifetime (Constants.java:551).
TIME_UNIT: str = _resolve(os.environ.get("WARP10_TIME_UNITS"))

#: Constants.java:51/56/61 equivalents.
UNITS_PER_MS: int = {"ms": 1, "us": 1_000, "ns": 1_000_000}[TIME_UNIT]
UNITS_PER_S: int = 1_000 * UNITS_PER_MS
NS_PER_UNIT: int = 1_000_000 // UNITS_PER_MS

# Exact µs→unit ratio (integer): ns multiplies, ms divides.
_US_NUM: int = {"ms": 1, "us": 1, "ns": 1_000}[TIME_UNIT]
_US_DEN: int = {"ms": 1_000, "us": 1, "ns": 1}[TIME_UNIT]

#: DuckDB epoch extractor matching the unit, for oracle SQL generation.
DUCK_EPOCH_FN: str = {"ms": "epoch_ms", "us": "epoch_us", "ns": "epoch_ns"}[TIME_UNIT]

#: Sub-second decimal digits when rendering a tick as ISO8601
#: (ms → .SSS, us → .SSSSSS, ns → .SSSSSSSSS), like the reference's
#: StackUtils/ISO8601 rendering of native ticks.
SUBSEC_DIGITS: int = {"ms": 3, "us": 6, "ns": 9}[TIME_UNIT]


def us(n: int) -> int:
    """µs quantity → platform units. Exact for ms-aligned quantities in
    every mode; a non-ms-aligned µs quantity in ms mode truncates — the
    coarser platform tick genuinely cannot represent it."""
    return (n * _US_NUM) // _US_DEN


def units_to_us(n: int) -> int:
    """Platform units → µs (truncating in ns mode: sub-µs precision does
    not survive a µs rendering, same as the reference's TimeUnit.convert)."""
    return (n * _US_DEN) // _US_NUM


def _div1000_exact(c: Column) -> Column:
    """LONG column // 1000 without double round-trips (epoch-ns
    magnitudes exceed double's 53-bit mantissa): exact DECIMAL division
    of the remainder-stripped value."""
    d = c.cast("decimal(38,0)")
    return ((d - d % F.lit(1_000)) / F.lit(1_000)).cast("long")


def col_units_to_us(c: Column) -> Column:
    """Column of platform ticks → LONG µs (for timestamp_micros() /
    NTZ-wall conversions, which are µs-native in Spark)."""
    if TIME_UNIT == "us":
        return c
    if TIME_UNIT == "ns":
        return _div1000_exact(c)
    return c.cast("long") * F.lit(1_000)


def col_us_to_units(c: Column) -> Column:
    """Column of LONG µs → platform ticks."""
    if TIME_UNIT == "us":
        return c
    if TIME_UNIT == "ns":
        return c.cast("long") * F.lit(1_000)
    return _div1000_exact(c)


def spark_us_to_units(expr: str) -> str:
    """Spark-SQL fragment rescaling a µs expression to platform units."""
    if TIME_UNIT == "us":
        return expr
    if TIME_UNIT == "ns":
        return f"(({expr}) * 1000)"
    return f"(({expr}) DIV 1000)"


def duck_epoch(expr: str) -> str:
    """DuckDB fragment rendering a timestamp expression as platform
    ticks (epoch_ms/epoch_us/epoch_ns per the session unit)."""
    return f"{DUCK_EPOCH_FN}({expr})"


def duck_us_to_units(expr: str) -> str:
    """DuckDB-SQL fragment rescaling a µs expression to platform units."""
    if TIME_UNIT == "us":
        return expr
    if TIME_UNIT == "ns":
        return f"(({expr}) * 1000)"
    return f"(({expr}) // 1000)"


def duck_units_to_us(expr: str) -> str:
    """DuckDB-SQL fragment rescaling a platform-tick expression to µs."""
    if TIME_UNIT == "us":
        return expr
    if TIME_UNIT == "ns":
        return f"(({expr}) // 1000)"
    return f"(({expr}) * 1000)"

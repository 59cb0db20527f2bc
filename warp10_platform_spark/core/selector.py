"""Selector → Catalyst predicate compiler.

The reference selects series with `class{label=v,label~regex}` selectors:
`=` exact / `~` regex on both class and labels, extended form
`class{labels}{attributes}` (MetadataSelectorMatcher.java:41-55, regex
EXPR_RE at :55; PARSESELECTOR/TOSELECTOR functions).

Here a selector compiles to a pure Spark Column predicate — Catalyst can
push the class equality into the Parquet scan and prune partitions; regex
label clauses become rlike on element_at(labels, k).

This replaces the reference's Directory metadata lookup (FETCH.java:238 →
StandaloneDirectoryClient) with predicate pushdown + an optional
directory-table pre-filter (see sources/directory.py).
"""

from __future__ import annotations

import re
import urllib.parse
from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F

_SELECTOR_RE = re.compile(
    r"^(?P<cls>[^{}]*)"
    r"(?:\{(?P<labels>[^{}]*)\})?"
    r"(?:\{(?P<attrs>[^{}]*)\})?$"
)


@dataclass
class Selector:
    """Parsed form of `class{label=v,label~re}{attr=v}`."""

    class_exact: str | None = None  # None → regex
    class_regex: str | None = None
    labels: list[tuple[str, str, str]] = field(default_factory=list)  # (key, op, value) op ∈ {'=','~'}
    attributes: list[tuple[str, str, str]] = field(default_factory=list)
    # True when the selector spelled a second {...} group (even empty):
    # `cls{lab}{attr}` checks labels and attributes SEPARATELY, while the
    # standard `cls{k=v}` form falls back label → attribute per key
    # (MetadataSelectorMatcher.java:41-55 doc comment).
    extended: bool = False


def _parse_clauses(body: str) -> list[tuple[str, str, str]]:
    out = []
    if not body:
        return out
    for part in body.split(","):
        part = part.strip()
        if not part:
            continue
        m = re.match(r"^([^=~]+)(=|~)(.*)$", part)
        if not m:
            raise ValueError(f"bad selector clause: {part!r}")
        key, op, val = m.group(1), m.group(2), m.group(3)
        # label values are URL-encoded in the reference's selector syntax
        out.append((urllib.parse.unquote(key), op, urllib.parse.unquote(val)))
    return out


def parse_selector(selector: str) -> Selector:
    """Parse `class{...}{...}`. A class starting with `~` is a regex;
    `=class` forces exact match (reference's PARSESELECTOR semantics)."""
    m = _SELECTOR_RE.match(selector.strip())
    if not m:
        raise ValueError(f"bad selector: {selector!r}")
    cls = urllib.parse.unquote(m.group("cls") or "")
    sel = Selector()
    if cls.startswith("~"):
        sel.class_regex = cls[1:]
    elif cls.startswith("="):
        sel.class_exact = cls[1:]
    elif cls in ("", "~.*"):
        sel.class_regex = ".*"
    else:
        sel.class_exact = cls
    sel.labels = _parse_clauses(m.group("labels") or "")
    sel.attributes = _parse_clauses(m.group("attrs") or "")
    sel.extended = m.group("attrs") is not None
    return sel


def _anchor(regex: str) -> str:
    """The reference matches label regexes fully anchored
    (MetadataSelectorMatcher compiles with implicit ^...$)."""
    out = regex
    if not out.startswith("^"):
        out = "^" + out
    if not out.endswith("$"):
        out = out + "$"
    return out


def selector_predicate(
    selector: str | Selector,
    class_col: str = "class",
    labels_col: str = "labels",
    attrs_col: str = "attributes",
) -> Column:
    """Compile a selector to a boolean Column over the points schema."""
    sel = parse_selector(selector) if isinstance(selector, str) else selector
    if sel.class_exact is not None:
        pred = F.col(class_col) == sel.class_exact
    elif sel.class_regex in (".*", None):
        pred = F.lit(True)
    else:
        pred = F.col(class_col).rlike(_anchor(sel.class_regex))

    def clause_pred(col_name: str, key: str, op: str, val: str) -> Column:
        entry = F.element_at(F.col(col_name), key)
        if op == "=":
            if val == "":
                # empty exact value matches absent label too (reference behavior)
                return entry.isNull() | (entry == "")
            return entry == val
        if val == ".*":
            return F.lit(True) if key == "" else entry.isNotNull()
        return entry.isNotNull() & entry.rlike(_anchor(val))

    for key, op, val in sel.labels:
        pred = pred & clause_pred(labels_col, key, op, val)
    for key, op, val in sel.attributes:
        pred = pred & clause_pred(attrs_col, key, op, val)
    return pred


def matches(
    selector: "str | Selector",
    cls: str,
    labels: dict[str, str] | None,
    attributes: dict[str, str] | None = None,
) -> bool:
    """Driver-side twin of selector_predicate for ONE metadata row —
    Plasma subscription matching (StandalonePlasmaHandler.java routes
    subscriptions through the same fetch SELECTOR_RE +
    parseLabelsSelectors). Clause semantics mirror the Column compiler
    above exactly; used per ingested line, never in a query plan."""
    sel = parse_selector(selector) if isinstance(selector, str) else selector
    labels = labels or {}
    attributes = attributes or {}
    if sel.class_exact is not None:
        if cls != sel.class_exact:
            return False
    elif sel.class_regex not in (".*", None):
        if re.match(_anchor(sel.class_regex), cls) is None:
            return False

    def clause_ok(src: dict[str, str], key: str, op: str, val: str) -> bool:
        v = src.get(key)
        if op == "=":
            if val == "":
                # empty exact value matches absent label too (reference)
                return v is None or v == ""
            return v == val
        if val == ".*":
            return True if key == "" else v is not None
        return v is not None and re.match(_anchor(val), v) is not None

    for key, op, val in sel.labels:
        if not clause_ok(labels, key, op, val):
            return False
    for key, op, val in sel.attributes:
        if not clause_ok(attributes, key, op, val):
            return False
    return True


def metamatch_predicate(
    selector: str | Selector,
    class_col: str = "class",
    labels_col: str = "labels",
    attrs_col: str = "attributes",
) -> Column:
    """METAMATCH's matcher as a Column (MetadataSelectorMatcher.java:
    145-248). Standard form `cls{k=v}`: k is looked up in labels first,
    falling back to attributes only when the LABEL is absent (a present
    but mismatching label fails even if the attribute would match); an
    empty exact value `k=` requires k absent from both maps. Extended
    form `cls{..}{..}`: label clauses check labels only, attribute
    clauses attributes only, absent checks scoped to their own map."""
    sel = parse_selector(selector) if isinstance(selector, str) else selector
    if sel.class_exact is not None:
        pred = F.col(class_col) == sel.class_exact
    elif sel.class_regex in (".*", None):
        pred = F.lit(True)
    else:
        pred = F.col(class_col).rlike(_anchor(sel.class_regex))

    def one(entry: Column, op: str, val: str) -> Column:
        if op == "=":
            return entry.isNotNull() & (entry == val)
        return entry.isNotNull() & entry.rlike(_anchor(val))

    if sel.extended:
        for col_name, clauses in ((labels_col, sel.labels), (attrs_col, sel.attributes)):
            for key, op, val in clauses:
                e = F.element_at(F.col(col_name), key)
                if op == "=" and val == "":
                    pred = pred & e.isNull()
                else:
                    pred = pred & one(e, op, val)
    else:
        for key, op, val in sel.labels:
            lab = F.element_at(F.col(labels_col), key)
            att = F.element_at(F.col(attrs_col), key)
            if op == "=" and val == "":
                pred = pred & lab.isNull() & att.isNull()
            else:
                pred = pred & one(F.coalesce(lab, att), op, val)
    return pred


def to_selector(cls: str, labels: dict[str, str] | None = None, exact: bool = True) -> str:
    """TOSELECTOR (TOSELECTOR.java:30): (class, labels) → selector string,
    URL-encoding names/values like the reference (inverse of
    parse_selector for exact matches)."""
    enc = urllib.parse.quote
    body = ",".join(f"{enc(k, safe='')}={enc(v, safe='')}" for k, v in sorted((labels or {}).items()))
    prefix = "=" if exact and (cls.startswith("~") or cls.startswith("=")) else ""
    return f"{prefix}{enc(cls, safe='.~=')}{{{body}}}"

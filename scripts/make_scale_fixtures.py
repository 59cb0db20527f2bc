"""Deterministic scale/skew fixtures (r4 verdict item 5).

- sf1: 10x replication of /root/testdata/sf0.1 with consistent key
  remapping (foreign keys shifted by the same per-copy offsets), so all
  joins behave as a real sf=1 dataset (~6M lineitem rows).
- sf10: the same construction with 100 copies (~60M lineitem / ~10M
  events) — the r6 verdict's ask #6 decade, for pinning per-query
  scaling exponents across sf0.1/sf1/sf10. Key offsets exceed each
  table's sf0.1 key range, so 100 offset multiples stay disjoint. Embedding
  vectors get a tiny deterministic per-copy perturbation on coordinate 0
  so ANN top-k has no cross-copy ties.
- skew: sf0.1 with two adversarial distortions: (a) one user_id (777)
  holds ~50% of all event points (the fat-series case every per-series
  operator must survive); (b) one document text is duplicated into ~50%
  of doc rows (one minhash band bucket holding half the corpus — the
  LSH-bucket explosion case).
- series1m: the INVERSE shape of every other fixture — series-heavy,
  point-light (r8 verdict #2: no fixture had ever probed metadata
  cardinality). events holds 10^6 distinct series (5 event types ×
  200k users, 3 points each = 3M rows); all other tables come from
  sf0.001 (tiny — only the directory axis is under test). This is the
  axis the reference's Directory service (continuum/store/
  Directory.java — HLL stats, streaming metadata iterators) exists
  for: FIND/FINDSTATS/selector pushdown, METASET's gts.limit, and the
  accessor caps at 10^6-series metadata scale.

Everything is pure SQL over the source parquet (seedless, rerunnable,
byte-stable). Output under .cache/ (never /root/testdata).

Usage: python scripts/make_scale_fixtures.py [sf1|sf10|skew|all]
"""

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1 = os.path.join(ROOT, ".cache", "sf1")
SF10 = os.path.join(ROOT, ".cache", "sf10")
SKEW = os.path.join(ROOT, ".cache", "skew")

COPIES = 10
# per-copy key offsets, each > 10x the sf0.1 key range of its table
OFF = {
    "custkey": 200_000,
    "suppkey": 10_000,
    "partkey": 100_000,
    "orderkey": 10_000_000,
    "eventid": 10_000_000,
    "userid": 1_000_000,
    "docid": 1_000_000,
    "vecid": 1_000_000,
}

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _copy_union(con, table: str, select_tpl: str, copies: int = COPIES) -> str:
    return " UNION ALL ".join(select_tpl.format(c=c, src=f"read_parquet('{SRC}/{table}.parquet')") for c in range(copies))


def make_sf1(copies: int = COPIES, out: str = SF1, label: str = "sf1"):
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    plans = {
        "region": f"SELECT * FROM read_parquet('{SRC}/region.parquet')",
        "nation": f"SELECT * FROM read_parquet('{SRC}/nation.parquet')",
        "customer": _copy_union(
            con, "customer",
            "SELECT c_custkey + {c} * %d AS c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM {src}"
            % OFF["custkey"], copies=copies,
        ),
        "supplier": _copy_union(
            con, "supplier",
            "SELECT s_suppkey + {c} * %d AS s_suppkey, s_name, s_nationkey, s_acctbal FROM {src}" % OFF["suppkey"],
            copies=copies,
        ),
        "part": _copy_union(
            con, "part",
            "SELECT p_partkey + {c} * %d AS p_partkey, p_name, p_brand, p_type, p_size, p_retailprice FROM {src}"
            % OFF["partkey"], copies=copies,
        ),
        "orders": _copy_union(
            con, "orders",
            "SELECT o_orderkey + {c} * %d AS o_orderkey, o_custkey + {c} * %d AS o_custkey, "
            "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority FROM {src}"
            % (OFF["orderkey"], OFF["custkey"]), copies=copies,
        ),
        "lineitem": _copy_union(
            con, "lineitem",
            "SELECT l_orderkey + {c} * %d AS l_orderkey, l_partkey + {c} * %d AS l_partkey, "
            "l_suppkey + {c} * %d AS l_suppkey, l_linenumber, l_quantity, l_extendedprice, "
            "l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate FROM {src}"
            % (OFF["orderkey"], OFF["partkey"], OFF["suppkey"]), copies=copies,
        ),
        "events": _copy_union(
            con, "events",
            "SELECT event_id + {c} * %d AS event_id, ts, user_id + {c} * %d AS user_id, "
            "event_type, value, props FROM {src}" % (OFF["eventid"], OFF["userid"]), copies=copies,
        ),
        "documents": _copy_union(
            con, "documents",
            "SELECT doc_id + {c} * %d AS doc_id, text, lang, source, n_chars FROM {src}" % OFF["docid"],
            copies=copies,
        ),
        "embeddings": _copy_union(
            con, "embeddings",
            "SELECT vec_id + {c} * %d AS vec_id, "
            "list_prepend(CAST(embedding[1] + {c} * 0.001 AS FLOAT), embedding[2:]) AS embedding, "
            "label FROM {src}" % OFF["vecid"], copies=copies,
        ),
    }
    for t in TABLES:
        con.execute(f"COPY ({plans[t]}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        print(label, t, con.execute(f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')").fetchone()[0])


def make_skew():
    os.makedirs(SKEW, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        if t == "events":
            # half of all points collapse onto user 777: the fattest
            # possible series skew at this scale
            q = (
                f"SELECT event_id, ts, CASE WHEN event_id % 2 = 0 THEN 777 ELSE user_id END AS user_id, "
                f"event_type, value, props FROM read_parquet('{SRC}/events.parquet')"
            )
        elif t == "documents":
            # half of all docs share one text: one minhash signature /
            # LSH band bucket holds ~50% of the corpus
            q = (
                f"SELECT doc_id, CASE WHEN doc_id % 2 = 0 THEN "
                f"(SELECT text FROM read_parquet('{SRC}/documents.parquet') ORDER BY doc_id LIMIT 1) "
                f"ELSE text END AS text, lang, source, n_chars "
                f"FROM read_parquet('{SRC}/documents.parquet')"
            )
        else:
            q = f"SELECT * FROM read_parquet('{SRC}/{t}.parquet')"
        con.execute(f"COPY ({q}) TO '{SKEW}/{t}.parquet' (FORMAT PARQUET)")
        print("skew", t, con.execute(f"SELECT count(*) FROM read_parquet('{SKEW}/{t}.parquet')").fetchone()[0])


SERIES1M = os.path.join(ROOT, ".cache", "series1m")
SMALL_SRC = "/root/testdata/sf0.001"


def make_series1m(n_users: int = 200_000, pts_per_series: int = 3, out: str = SERIES1M):
    """10^6-series directory-cardinality fixture (r8 verdict #2). Pure
    deterministic SQL: series (t, u) gets points at distinct,
    series-dependent ticks inside 2024-01 so first/last extents differ
    per series; values are a cheap series-dependent polynomial so
    aggregates aren't degenerate."""
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    types = "'click','view','purchase','signup','error'"
    q = f"""
    WITH series AS (
      SELECT t.range AS t, u.range AS u,
             (u.range * 5 + t.range) AS sid
      FROM range(5) t, range({n_users}) u
    ), pts AS (
      SELECT s.*, p.range AS i FROM series s, range({pts_per_series}) p
    )
    SELECT
      sid * {pts_per_series} + i                       AS event_id,
      make_timestamp(1704067200000000
                     + (sid % 86400) * 1000000
                     + i * 86400000000)                AS ts,
      u + 1                                            AS user_id,
      ([{types}])[t + 1]                               AS event_type,
      ((sid % 1000) * 0.25 + i)::DOUBLE                AS value,
      '{{"k": ' || (sid % 100)::VARCHAR || '}}'        AS props
    FROM pts
    """
    con.execute(f"COPY ({q}) TO '{out}/events.parquet' (FORMAT PARQUET)")
    for t in TABLES:
        if t == "events":
            continue
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SMALL_SRC}/{t}.parquet')) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
    n_series, n_rows = con.execute(
        f"SELECT count(DISTINCT (event_type, user_id)), count(*) "
        f"FROM read_parquet('{out}/events.parquet')"
    ).fetchone()
    print(f"series1m events: {n_rows} rows, {n_series} distinct series")
    assert n_series == 5 * n_users


if __name__ == "__main__":
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    if what in ("sf1", "all"):
        make_sf1()
    if what == "sf10":
        # not in "all": ~25x the sf1 build cost, generated on demand
        make_sf1(copies=100, out=SF10, label="sf10")
    if what in ("skew", "all"):
        make_skew()
    if what == "series1m":
        # on demand: the directory-cardinality axis (r8 verdict #2)
        make_series1m()

"""WarpScript end-to-end queries — real scripts through the evaluator
(SURVEY §3.1: the /exec path), oracled like every other query. These
prove a reference user can paste a WarpScript pipeline and get the same
answer from the Spark engine.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from warp10_platform_spark.queries import register
from warp10_platform_spark.queries.gts import DAILY, DAY, LASTBUCKET, NDAYS, PTS
from warp10_platform_spark.warpscript import exec_script

_START = LASTBUCKET - DAY * NDAYS + 1  # grid-interval (exclusive low) as inclusive start


def _out(df, value_col, alias, ndigits=None):
    v = F.col(value_col)
    if ndigits is not None:
        v = F.round(v, ndigits)
    return df.select(
        F.col("class"),
        F.element_at(F.col("labels"), "user").alias("user"),
        F.col("ts"),
        v.alias(alias),
    )


@register("ws_fetch_bucketize", (
    f"WITH {PTS}, {DAILY} "
    'SELECT class, "user", ts, count(v) AS v_agg FROM daily GROUP BY class, "user", ts'
))
def ws_fetch_bucketize(spark, sf_dir):
    """FETCH → BUCKETIZE count, as the script a Warp 10 user would POST to
    /exec (list-form FETCH, BUCKETIZE.java argument order)."""
    script = f"""
    // daily event counts, anchored grid
    [ '~events\\..*' {{}} {_START} {LASTBUCKET} ] FETCH
    [ SWAP bucketizer.count {LASTBUCKET} {DAY} {NDAYS} ] BUCKETIZE
    """
    gf = exec_script(spark, sf_dir, script)
    return _out(gf.df, "v_agg", "v_agg")


@register("ws_map_delta", (
    f"WITH {PTS} SELECT class, \"user\", ts, v_mapped FROM ("
    '  SELECT class, "user", ts, v - lag(v) OVER (PARTITION BY class, "user" ORDER BY ts) AS v_mapped FROM pts'
    ") WHERE v_mapped IS NOT NULL"
))
def ws_map_delta(spark, sf_dir):
    """FETCH → MAP mapper.delta via script (MAP.java params mapper/pre/
    post/occurrences)."""
    script = f"""
    [ '~events\\..*' {{}} 0 {LASTBUCKET + DAY * 366} ] FETCH
    [ SWAP mapper.delta 1 0 0 ] MAP
    """
    gf = exec_script(spark, sf_dir, script)
    return _out(gf.df.where(F.col("v_mapped").isNotNull()), "v_mapped", "v_mapped")


@register("ws_reduce_sum", (
    f"WITH {PTS}, {DAILY}, "
    'b AS (SELECT class, "user", ts, count(v) AS v_agg FROM daily GROUP BY class, "user", ts) '
    'SELECT "user" AS label_user, ts, CAST(sum(v_agg) AS BIGINT) AS v_reduced '
    "FROM b WHERE class IN ('events.purchase', 'events.click') GROUP BY \"user\", ts"
))
def ws_reduce_sum(spark, sf_dir):
    """Variables, macros, FOREACH and stack collection feeding REDUCE —
    the full stack-machine surface in one script: fetch two classes by
    macro, merge, daily counts, reducer.sum across classes per user."""
    script = f"""
    <% 'c' STORE [ $c {{}} {_START} {LASTBUCKET} ] FETCH %> 'fetchclass' STORE
    [ 'events.purchase' 'events.click' ] <% @fetchclass %> FOREACH
    2 ->LIST
    [ SWAP bucketizer.count {LASTBUCKET} {DAY} {NDAYS} ] BUCKETIZE
    [ SWAP 1 ->LIST [ 'user' ] reducer.sum ] REDUCE
    """
    out = exec_script(spark, sf_dir, script)
    return out.select("label_user", "ts", F.col("v_reduced").cast("long").alias("v_reduced"))


@register("ws_fillprevious", (
    f"WITH {PTS}, {DAILY}, "
    'b AS (SELECT class, "user", ts, CAST(count(v) AS DOUBLE) AS v_agg FROM daily GROUP BY class, "user", ts), '
    'series AS (SELECT DISTINCT class, "user" FROM b), '
    f'grid AS (SELECT s.class, s."user", g.ts FROM series s, '
    f"  (SELECT unnest(generate_series({LASTBUCKET - (NDAYS - 1) * DAY}, {LASTBUCKET}, {DAY})) AS ts) g) "
    'SELECT grid.class, grid."user", grid.ts, '
    '  last_value(b.v_agg IGNORE NULLS) OVER (PARTITION BY grid.class, grid."user" ORDER BY grid.ts) AS v_agg '
    'FROM grid LEFT JOIN b ON b.class = grid.class AND b."user" = grid."user" AND b.ts = grid.ts'
))
def ws_fillprevious(spark, sf_dir):
    """FETCH → BUCKETIZE count → FILLPREVIOUS in-script (FillerPrevious
    semantics over the anchored grid; counts so the fill is exact)."""
    script = f"""
    [ '~events\\..*' {{}} {_START} {LASTBUCKET} ] FETCH
    [ SWAP bucketizer.count {LASTBUCKET} {DAY} {NDAYS} ] BUCKETIZE
    FILLPREVIOUS
    """
    gf = exec_script(spark, sf_dir, script)
    return _out(gf.df, "v_agg", "v_agg").withColumn("v_agg", F.col("v_agg").cast("double"))


@register("ws_apply_gt", (
    f"WITH {PTS}, {DAILY}, "
    'c AS (SELECT class, "user", ts, count(*) AS n FROM daily GROUP BY class, "user", ts), '
    "a AS (SELECT \"user\", ts, n FROM c WHERE class = 'events.purchase'), "
    "b AS (SELECT \"user\", ts, n FROM c WHERE class = 'events.click') "
    'SELECT a."user" AS label_user, a.ts, (a.n > b.n) AS v_op '
    'FROM a JOIN b ON a."user" = b."user" AND a.ts = b.ts'
))
def ws_apply_gt(spark, sf_dir):
    """Two FETCHes → BUCKETIZE → APPLY op.gt via script (APPLY.java:40
    list form [[a] [b] [labels] op])."""
    script = f"""
    [ 'events.purchase' {{}} {_START} {LASTBUCKET} ] FETCH
    [ SWAP bucketizer.count {LASTBUCKET} {DAY} {NDAYS} ] BUCKETIZE
    'a' STORE
    [ 'events.click' {{}} {_START} {LASTBUCKET} ] FETCH
    [ SWAP bucketizer.count {LASTBUCKET} {DAY} {NDAYS} ] BUCKETIZE
    'b' STORE
    [ $a 1 ->LIST $b 1 ->LIST [ 'user' ] op.gt ] APPLY
    """
    out = exec_script(spark, sf_dir, script)
    return out.select("label_user", "ts", "v_op")


HOUR_US = 3_600_000_000


@register("ws_lmap_timeshift_merge", (
    f"WITH {PTS} "
    'SELECT class, "user", pts.ts + o.off AS ts, round(v, 6) AS v '
    "FROM pts CROSS JOIN (SELECT unnest([0, 3600000000, 7200000000]) AS off) o "
    "WHERE class = 'events.purchase'"
))
def ws_lmap_timeshift_merge(spark, sf_dir):
    """LMAP over an offsets list building TIMESHIFTed copies, merged into
    one GTS set (LMAP.java index-disabled form + TIMESHIFT.java + MERGE) —
    the functional-list surface driving lazy frame ops: three shifted
    plans union into ONE Catalyst plan, no job until collect."""
    script = f"""
    [ 'events.purchase' {{}} 0 2000000000000000 ] FETCH 'g' STORE
    [ 0 1 2 ] <% {HOUR_US} * 'off' STORE $g $off TIMESHIFT %> false LMAP
    MERGE
    """
    gf = exec_script(spark, sf_dir, script)
    return _out(gf.df, "v_double", "v", ndigits=6)


@register("ws_relabel_reduce_grp", (
    f"WITH {PTS}, {DAILY}, "
    'b AS (SELECT class, "user", ts, count(v) AS v_agg FROM daily GROUP BY class, "user", ts) '
    "SELECT 'ALL' AS label_grp, ts, CAST(sum(v_agg) AS BIGINT) AS v_reduced "
    "FROM b WHERE class = 'events.purchase' GROUP BY ts"
))
def ws_relabel_reduce_grp(spark, sf_dir):
    """RELABEL to a computed label (string ops JOIN/TOUPPER + WHILE
    arithmetic build the label value in-script), then REDUCE sum over the
    new label — the RELABEL.java gts_id-recompute path feeding
    REDUCE.java label equivalence classes."""
    script = f"""
    // build the label value 'ALL' with list/string functions
    [ 'a' 'll' ] '' JOIN TOUPPER 'grpval' STORE
    // count the grid days with a WHILE loop (exercises the loop surface)
    0 'n' STORE
    <% $n {NDAYS} < %> <% $n 1 + 'n' STORE %> WHILE
    [ 'events.purchase' {{}} {_START} {LASTBUCKET} ] FETCH
    [ SWAP bucketizer.count {LASTBUCKET} {DAY} $n ] BUCKETIZE
    {{ 'grp' $grpval }} RELABEL
    [ SWAP 1 ->LIST [ 'grp' ] reducer.sum ] REDUCE
    """
    out = exec_script(spark, sf_dir, script)
    return out.select("label_grp", "ts", F.col("v_reduced").cast("long").alias("v_reduced"))

"""CLI: execute a WarpScript file against the parquet lake — the
reference's `POST /api/v0/exec` surface (EgressExecHandler.java:214) as a
command line.

    python -m warp10_platform_spark script.mc2 [--sf-dir DIR]
    echo "1 2 +" | python -m warp10_platform_spark -

Prints the final stack as a JSON array, top of stack first — the exact
response shape of /exec. GTS stack values (lazy DataFrames) are only
materialized HERE, at the response boundary, mirroring how the reference
streams the stack after the script completes; `--explain` prints their
physical plans instead of collecting (the scale-friendly dry run).
"""

from __future__ import annotations

import argparse
import json
import sys


def _series_json(gf, limit: int | None):
    """GTSFrame → reference /exec GTS JSON: one object per series,
    {"c", "l", "a", "v": [[tick, (lat, lon,) (elev,) value], ...]},
    ticks ascending (GTSHelper JSON serialization order)."""
    from pyspark.sql import functions as F

    df = gf.df
    vc = getattr(gf, "value_col", None) or "v_double"
    if vc != "v_double" and vc in df.columns:
        # derived frames (bucketize/map output) carry their value in
        # value_col; typed columns below may not exist on them
        value = F.col(vc).cast("double")
    else:
        typed = [c for c in ("v_double", "v_long", "v_bool") if c in df.columns]
        value = F.coalesce(*(F.col(c).cast("double") for c in typed)) if typed else F.lit(None).cast("double")
    cols = [
        "class",
        "labels_key",
        "labels",
        "attributes",
        "ts",
        "lat",
        "lon",
        "elev",
        value.alias("_vnum"),
        (F.col("v_string") if "v_string" in df.columns else F.lit(None).cast("string")).alias("_vstr"),
    ]
    have = set(df.columns)
    sel = [c for c in cols if not isinstance(c, str) or c in have]
    # maps are unorderable in Spark — sort series by the canonical key
    rows = df.select(*sel).orderBy("class", "labels_key", "ts")
    if limit:
        rows = rows.limit(limit)
    out: dict[tuple, dict] = {}
    for r in rows.collect():
        d = r.asDict()
        key = (d["class"], tuple(sorted((d.get("labels") or {}).items())))
        series = out.setdefault(
            key,
            {
                "c": d["class"],
                "l": dict(d.get("labels") or {}),
                "a": dict(d.get("attributes") or {}),
                "v": [],
            },
        )
        v = d["_vstr"] if d.get("_vstr") is not None else d.get("_vnum")
        point = [d["ts"]]
        if d.get("lat") is not None and d.get("lon") is not None:
            point += [d["lat"], d["lon"]]
        if d.get("elev") is not None:
            point.append(d["elev"])
        point.append(v)
        series["v"].append(point)
    return list(out.values())


def _jsonable(v, limit: int | None, explain: bool):
    from pyspark.sql import DataFrame

    from warp10_platform_spark.core.frame import GTSFrame

    if isinstance(v, GTSFrame):
        if explain:
            return {"gts_plan": v.df._jdf.queryExecution().executedPlan().toString()}
        return _series_json(v, limit)
    if isinstance(v, DataFrame):
        # analytics results that are tabular rather than GTS-shaped
        # (DTW pair matrices, outlier tables...) serialize as rows —
        # materialized only HERE, at the response boundary
        if explain:
            return {"plan": v._jdf.queryExecution().executedPlan().toString()}
        rows = v.limit(limit).collect() if limit else v.collect()
        return [
            {k: _jsonable(x, limit, explain) for k, x in r.asDict(recursive=True).items()}
            for r in rows
        ]
    if isinstance(v, (bytes, bytearray)):
        import base64

        return {"bytes": base64.b64encode(bytes(v)).decode()}
    if isinstance(v, set):
        return sorted(_jsonable(x, limit, explain) for x in v)
    if isinstance(v, list):
        return [_jsonable(x, limit, explain) for x in v]
    if isinstance(v, dict):
        return {str(k): _jsonable(x, limit, explain) for k, x in v.items()}
    if isinstance(v, (str, int, float, bool)) or v is None:
        return v
    return repr(v)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="python -m warp10_platform_spark",
        description="Run a WarpScript file against the parquet lake (the /exec surface).",
    )
    ap.add_argument("script", nargs="?", default=None,
                    help="WarpScript file, or '-' for stdin (omit with -i)")
    ap.add_argument(
        "--interactive", "-i", action="store_true",
        help="line-by-line REPL on one persistent stack (the reference's "
             "interactive mode, continuum/egress/EgressInteractiveHandler"
             ".java); on EOF the final stack prints as JSON",
    )
    ap.add_argument(
        "--sf-dir",
        default=None,
        help="data directory (default: $SPARK_GRAFT_SF_DIR or /root/testdata/sf0.001)",
    )
    ap.add_argument("--limit", type=int, default=None, help="max points collected per GTS stack value")
    ap.add_argument("--explain", action="store_true", help="print physical plans of GTS results instead of collecting")
    ap.add_argument("--pretty", action="store_true", help="indent the JSON response")
    args = ap.parse_args(argv)

    import os

    sf_dir = args.sf_dir or os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    if args.script is None and not args.interactive:
        ap.error("a script is required unless --interactive is given")

    from warp10_platform_spark.session import get_spark
    from warp10_platform_spark.warpscript import WarpScriptStack

    spark = get_spark("warp10-platform-spark-exec")
    spark.sparkContext.setLogLevel("ERROR")
    st = WarpScriptStack(spark, sf_dir)

    if args.interactive:
        # Reference interactive mode (EgressInteractiveHandler.java —
        # telnet REPL over one MemoryWarpScriptStack, BootstrapManager
        # seeding): each line execs on the SAME stack (errors report and
        # the session continues); EOF prints the final stack as the
        # /exec JSON payload. A script argument execs first, then the
        # REPL opens on the resulting stack (like `python -i script.py`).
        from warp10_platform_spark.warpscript.tokenizer import incomplete

        if args.script is not None:
            if args.script == "-":
                ap.error("cannot combine --interactive with a stdin script ('-')")
            with open(args.script) as f:
                seed = f.read()
            try:
                st.exec(seed)
            except Exception as e:  # noqa: BLE001
                # like `python -i script.py`: report, then still open the
                # REPL on whatever stack state the script left behind
                print(
                    json.dumps({"error": f"{type(e).__name__}: {e}", "stack_depth": len(st.stack)}),
                    file=sys.stderr,
                )
        tty = sys.stdin.isatty()
        buf: list[str] = []
        while True:
            # Multi-line constructs buffer until lexically complete —
            # the reference REPL keeps parser state across lines and its
            # prompt reports isInMultiline/macroDepth the same way.
            if tty:
                if buf:
                    pending, depth, in_ml = incomplete("\n".join(buf))
                    prompt = f"ws{'*' if in_ml else '|'}{depth or ''}> "
                else:
                    prompt = "ws> "
            else:
                prompt = ""
            try:
                line = input(prompt)
            except EOFError:
                break
            if not line.strip() and not buf:
                continue
            buf.append(line)
            fragment = "\n".join(buf)
            try:
                pending, _depth, _ml = incomplete(fragment)
            except SyntaxError as e:
                buf.clear()
                print(json.dumps({"error": f"SyntaxError: {e}", "stack_depth": len(st.stack)}),
                      file=sys.stderr)
                continue
            if pending:
                continue
            buf.clear()
            try:
                st.exec(fragment)
                if tty:
                    print(f"[depth {len(st.stack)}]")
            except Exception as e:  # noqa: BLE001
                print(
                    json.dumps({"error": f"{type(e).__name__}: {e}", "stack_depth": len(st.stack)}),
                    file=sys.stderr,
                )
        if buf:
            print(json.dumps({"error": "SyntaxError: EOF inside open macro/multiline construct",
                              "stack_depth": len(st.stack)}), file=sys.stderr)
        response = [_jsonable(v, args.limit, args.explain) for v in reversed(st.stack)]
        print(json.dumps(response, indent=2 if args.pretty else None))
        return 0

    text = sys.stdin.read() if args.script == "-" else open(args.script).read()
    try:
        st.exec(text)
    except Exception as e:  # noqa: BLE001
        # the /exec contract: errors come back as a structured payload
        # (X-Warp10-Error-Message header in the reference), not a traceback
        print(
            json.dumps({"error": f"{type(e).__name__}: {e}", "stack_depth": len(st.stack)}),
            file=sys.stderr,
        )
        return 1
    # /exec responds with the stack serialized top-first
    response = [_jsonable(v, args.limit, args.explain) for v in reversed(st.stack)]
    print(json.dumps(response, indent=2 if args.pretty else None))
    return 0


if __name__ == "__main__":
    sys.exit(main())

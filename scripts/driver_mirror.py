"""Mirror the driver's correctness harness as closely as possible:

- a PLAIN SparkSession (builder with master + shuffle partitions ONLY —
  none of session.py's configs), like the driver uses;
- sf0.01 data (driver gate scale);
- every queries() entry run, oracled entries compared to DuckDB
  (sorted columns, sorted rows, value compare with float tolerance).

Usage: python scripts/driver_mirror.py [sf_dir] [query ...]
Prints one line per query: PASS / NO_ORACLE / FAIL(reason) / ERR(exc).
"""

import math
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def compare(sp, du, float_tol=1e-6, rel_tol=1e-6):
    if sorted(sp.columns) != sorted(du.columns):
        return f"schema {sorted(sp.columns)} vs {sorted(du.columns)}"
    cols = sorted(sp.columns)
    sp = sp[cols].sort_values(cols).reset_index(drop=True)
    du = du[cols].sort_values(cols).reset_index(drop=True)
    if len(sp) != len(du):
        return f"rows spark={len(sp)} duck={len(du)}"
    for c in cols:
        for i, (x, y) in enumerate(zip(sp[c].tolist(), du[c].tolist())):
            if x is None and y is None:
                continue
            if isinstance(x, float) or isinstance(y, float):
                fx = float(x) if x is not None else float("nan")
                fy = float(y) if y is not None else float("nan")
                if math.isnan(fx) and math.isnan(fy):
                    continue
                if not math.isclose(fx, fy, rel_tol=rel_tol, abs_tol=float_tol):
                    return f"{c}[{i}]: {x} != {y}"
            elif x != y:
                return f"{c}[{i}]: {x!r} != {y!r}"
    return None


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    # Adversarial-session knobs (r4/r5 sweep): MIRROR_TZ (session
    # timezone), MIRROR_ANSI (true/false), MIRROR_PARTS (shuffle
    # partitions, e.g. the prime 7) — results must be invariant to all.
    parts = os.environ.get("MIRROR_PARTS", "16")
    builder = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '16')}]")
        .appName("driver-mirror")
        .config("spark.sql.shuffle.partitions", parts)
        .config("spark.driver.memory", "8g")
    )
    if os.environ.get("MIRROR_TZ"):
        builder = builder.config("spark.sql.session.timeZone", os.environ["MIRROR_TZ"])
    if os.environ.get("MIRROR_ANSI"):
        builder = builder.config("spark.sql.ansi.enabled", os.environ["MIRROR_ANSI"])
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import duckdb

    con = duckdb.connect()
    # At sf>=1 DuckDB's default memory limit (80% of RAM) lets the oracle
    # buffers grow into the Spark driver's headroom; cap it so the mirror
    # can't OOM the box mid-sweep (MIRROR_MEM to override).
    con.execute(f"SET memory_limit='{os.environ.get('MIRROR_MEM', '24GB')}'")
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    import __spark_entry__ as entry

    queries = entry.queries()
    oracles = entry.oracle_sql()

    n_pass = n_fail = n_err = n_noora = 0
    for name in sorted(queries):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = queries[name](spark, sf_dir)
            if name in oracles:
                sp = df.toPandas()
                du = con.sql(oracles[name]).df()
                reason = compare(sp, du)
                if reason is None:
                    n_pass += 1
                    print(f"PASS      {name} ({time.time()-t0:.1f}s)")
                else:
                    n_fail += 1
                    print(f"FAIL      {name}: {reason}")
            else:
                df.limit(5).collect()
                n_noora += 1
                print(f"NO_ORACLE {name} ({time.time()-t0:.1f}s)")
        except Exception as e:  # noqa: BLE001
            n_err += 1
            print(f"ERR       {name}: {type(e).__name__}: {str(e).splitlines()[0][:200]}")
            if only:
                traceback.print_exc()
        sys.stdout.flush()
    print(f"\nTOTAL pass={n_pass} fail={n_fail} err={n_err} no_oracle={n_noora}")


if __name__ == "__main__":
    main()

"""Sweep every oracle_sql() entry for driver-hash hazards:

- any float cell that is IEEE -0.0 (the driver's value hash is bit-typed,
  so Spark +0.0 vs DuckDB -0.0 is a hash miss even though values compare
  equal) — map_rate regression class;
- any DuckDB result column typed HUGEINT/UHUGEINT (int128 from SUM over
  INTEGER; Spark emits BIGINT, so a type-tagged hash differs) —
  sessionize regression class;
- any DECIMAL column wider than Spark's maximum (38).

Run: python scripts/oracle_sweep.py [sf_dir]
"""

import os
import sys

import duckdb
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    oracles = entry_mod.oracle_sql()
    bad = []
    for name in sorted(oracles):
        sql = oracles[name]
        try:
            rel = con.sql(sql)
            types = [str(t).upper() for t in rel.types]
            cols = rel.columns
            for c, t in zip(cols, types):
                if "HUGEINT" in t:
                    bad.append((name, c, f"type {t}"))
                if t.startswith("DECIMAL"):
                    width = int(t.split("(")[1].split(",")[0])
                    if width > 38:
                        bad.append((name, c, f"type {t} wider than Spark max"))
            df = rel.df()
            for c in df.columns:
                col = df[c]
                if col.dtype.kind == "f":
                    vals = col.to_numpy()
                    nz = np.count_nonzero((vals == 0.0) & np.signbit(vals))
                    if nz:
                        bad.append((name, c, f"{nz} x -0.0"))
        except Exception as e:  # noqa: BLE001
            bad.append((name, "-", f"ERROR {type(e).__name__}: {e}"))

    if bad:
        for name, c, msg in bad:
            print(f"HAZARD {name}.{c}: {msg}")
        sys.exit(1)
    print(f"OK: {len(oracles)} oracles clean of -0.0 / HUGEINT / wide-decimal hazards")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")

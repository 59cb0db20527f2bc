"""Assert every oracle result is free of driver-hash hazards: IEEE -0.0
cells, HUGEINT/int128 columns, DECIMALs wider than Spark's 38-digit cap
(the classes behind every round-2 hash miss). Mirrors
scripts/oracle_sweep.py at the fast sf0.001 tier."""

import numpy as np

import __spark_entry__ as entry_mod


def test_all_oracles_hazard_free(duck):
    oracles = entry_mod.oracle_sql()
    bad = []
    for name in sorted(oracles):
        rel = duck.sql(oracles[name])
        for c, t in zip(rel.columns, [str(t).upper() for t in rel.types]):
            if "HUGEINT" in t:
                bad.append((name, c, t))
            if t.startswith("DECIMAL") and int(t.split("(")[1].split(",")[0]) > 38:
                bad.append((name, c, t))
        df = rel.df()
        for c in df.columns:
            col = df[c]
            if col.dtype.kind == "f":
                vals = col.to_numpy()
                nz = int(np.count_nonzero((vals == 0.0) & np.signbit(vals)))
                if nz:
                    bad.append((name, c, f"{nz} x -0.0"))
    assert not bad, bad

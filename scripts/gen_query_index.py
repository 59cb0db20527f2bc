"""Generate QUERIES.md (one row per registered query — name, module,
first docstring line, oracle presence) AND the lazy-registration index
warp10_platform_spark/queries/_index.py (name → module, what lets
``QUERIES[name]`` import a single module instead of all 25). Regenerate
after adding queries: python scripts/gen_query_index.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import __spark_entry__ as e

    q, o = e.queries(), e.oracle_sql()
    lines = [
        "# Query index",
        "",
        f"{len(q)} registered queries; {len(o)} with a DuckDB oracle "
        "(every one — the driver's bit-exact correctness gate). Generated "
        "by scripts/gen_query_index.py.",
        "",
        "| query | module | what it proves |",
        "|---|---|---|",
    ]
    for name in sorted(q):
        fn = q[name]
        mod = fn.__module__.rsplit(".", 1)[-1]
        doc = (fn.__doc__ or "").strip().splitlines()
        first = doc[0].strip() if doc else ""
        lines.append(f"| {name} | {mod} | {first} |")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = os.path.join(repo, "QUERIES.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}: {len(q)} queries")

    idx = [
        '"""Static query-name → module index (generated — do not edit by hand).',
        "",
        "Regenerate with scripts/gen_query_index.py after adding queries; the",
        "drift guard in tests/test_ledgers.py fails when this file is stale.",
        '"""',
        "",
        "QUERY_MODULE: dict[str, str] = {",
    ]
    for name in sorted(q):
        idx.append(f'    "{name}": "{q[name].__module__.rsplit(".", 1)[-1]}",')
    idx.append("}")
    ipath = os.path.join(repo, "warp10_platform_spark", "queries", "_index.py")
    with open(ipath, "w") as f:
        f.write("\n".join(idx) + "\n")
    print(f"wrote {ipath}: {len(q)} entries")


if __name__ == "__main__":
    main()

"""Physical-plan audit sweep over every registered query.

Compiles (does NOT execute) each ``queries()`` entry at
``$SPARK_GRAFT_SF_DIR`` (default sf0.001 — plan shape is SF-invariant)
and extracts scale-relevant counters from ``explain('formatted')``:

- ``exchanges``      — number of Exchange (shuffle) operators
- ``python_evals``   — BatchEvalPython / ArrowEvalPython / MapInPandas /
                       FlatMapGroupsInPandas operators (the slow path)
- ``cartesian``      — CartesianProduct / BroadcastNestedLoopJoin
- ``sorts``          — global Sort operators
- ``scans``          — parquet scans, and whether any scan reads a full
                       row (no ReadSchema pruning)

The report is written to PLANAUDIT_r$ROUND.md (ROUND env, default 9)
sorted by (cartesian desc,
python_evals desc, exchanges desc) so offenders float to the top.
A small allowlist documents queries whose counters are legitimately
high (iterative algorithms, pandas-UDF multimodal codecs, ...).

Usage: python scripts/plan_audit.py [query ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

# Queries where a nominally scary counter is by-design, with the reason.
# Every entry here was hand-verified against the source this round: the
# audit still prints them, but they are listed in a separate section.
_PANDAS_PER_SERIES = (
    "per-series iterative algorithm: one Arrow batch per series via "
    "applyInPandas; partition-parallel across series, sequential only "
    "within one series (the algorithm's own data dependency)"
)
_MACRO = (
    "user-macro evaluation (MACROMAPPER/MACROREDUCER contract): the macro "
    "body is user Python by definition; Arrow-batched per series"
)
_CODEC = (
    "byte-level wire codec (GTSEncoder/Thrift/OPB64) — bit-exactness "
    "requires the Python codec; Arrow-batched, runs scan-side"
)
ALLOW = {
    "doc_ngram_jaccard": "exact-quadratic correctness baseline (LSH sibling is the scale path)",
    "emb_cosine_dup": "all-pairs cosine baseline (LSH/IVF blocking is the scale path)",
    "emb_cosine_topk": "brute-force baseline: broadcast of the query set only, corpus never replicated",
    "emb_sq8_topk": "broadcast of the tiny query-code set only; SQ8 shrinks per-pair cost, corpus never replicated",
    "emb_pq_topk": "broadcast of the tiny query-table set only; ADC is 8 lookups per pair, corpus never replicated",
    "emb_pq_trained_topk": "same pq_topk engine, offline-trained codebook literals",
    "emb_pq_rerank_topk": "ADC shortlist (broadcast tiny query side) + exact rerank of |Q|*20 rows only",
    "emb_lsh_multitable_topk": "broadcast of the tiny query side only; candidates via (table,bucket) equi-join, O(N*L)",
    "doc_dup_clusters": "iterative min-label propagation: one shuffle per round by design",
    "media_image_dedup": "multimodal codecs are Arrow-batched mapInPandas by design (no JVM codec)",
    "media_image_dhash": "multimodal codecs are Arrow-batched mapInPandas by design",
    "media_png_dhash": "multimodal codecs are Arrow-batched mapInPandas by design",
    "media_jpeg_dhash": "multimodal codecs are Arrow-batched mapInPandas by design",
    "media_jpeg_progressive": "multimodal codecs are Arrow-batched mapInPandas by design",
    "media_wav_g711_features": "multimodal codecs are Arrow-batched mapInPandas by design",
    "media_audio_features": "multimodal codecs are Arrow-batched mapInPandas by design",
    "media_wav_features": "multimodal codecs are Arrow-batched mapInPandas by design",
    "media_frame_sample": "multimodal codecs are Arrow-batched mapInPandas by design",
    "media_gif_frame_sample": "multimodal codecs are Arrow-batched mapInPandas by design",
    "media_sparkline_render": "distributed canvas render: rasterizer runs where the series lives, only (key, count) returns",
    # cartesian / nested-loop joins verified bounded:
    "doc_lm_score": "crossJoin is with a broadcast 1-row vocab-size aggregate (bounded)",
    "findstats_hll": "crossJoin of two 1-row HLL estimates (bounded)",
    "tpch_q22_dormant_customers": "crossJoin is with a broadcast 1-row scalar aggregate (sum, count) — the TPC-H scalar-subquery shape (bounded)",
    "dtw_daily": "pairwise DTW is O(S^2) in SERIES (not points) by definition; join input is one row per series, mirroring the reference's stack-level DTW",
    "ws_dtw": "same dtw_pairs engine as dtw_daily (script binding)",
    # Python evals verified per-series-iterative or macro or codec:
    "stl_decompose": _PANDAS_PER_SERIES + " (STL inner/outer loess loops)",
    "stl_esd_outliers": _PANDAS_PER_SERIES + " (STL + iterative ESD deletion)",
    "ws_stlesd": _PANDAS_PER_SERIES + " (script binding of STLESDTEST)",
    "esd_outliers": _PANDAS_PER_SERIES + " (iterative max-deletion with lambda(n) recompute)",
    "grubbs_outliers": _PANDAS_PER_SERIES + " (iterative Grubbs deletion)",
    "lowess_smooth": _PANDAS_PER_SERIES + " (tricube local regression)",
    "rlowess_robust": _PANDAS_PER_SERIES + " (robust LOWESS bisquare reweight iterations)",
    "hybrid_piecewise": _PANDAS_PER_SERIES + " (piecewise STL + median-ESD per piece)",
    "hybrid_entropy": _PANDAS_PER_SERIES + " (piecewise entropy-seasonal + median-ESD per piece)",
    "ws_fft_ifft": _PANDAS_PER_SERIES + " (radix FFT butterfly per series)",
    "sax_discords": _PANDAS_PER_SERIES + " (discord search over SAX words)",
    "lttb_downsample": _PANDAS_PER_SERIES + " (LTTB bucket sweep is sequential per series)",
    "fetch_step_timestep": _PANDAS_PER_SERIES + " (greedy timestep spacing is a prefix-dependent state machine, FETCH.java:129)",
    "interp2d_bicubic": "numpy bicubic kernel (Commons-Math parity), Arrow-batched, zero shuffle",
    "interp3d_tricubic": "numpy tricubic kernel (Commons-Math parity), Arrow-batched, zero shuffle",
    "macro_wmean": _MACRO,
    "macro_window_slope": _MACRO,
    "macro_bucket_range": _MACRO,
    "macro_reduce_spread": _MACRO,
    "ws_macroreducer_spread": _MACRO,
    "strict_wmean": _MACRO,
    "mfilter_series": _MACRO,
    "mfilter_distributed": (
        "executor-side filter-macro evaluation by design: mapInPandas over "
        "the DISTINCT identities only (not points), survivors left-semi-join"
    ),
    "fill_trend_daily": _PANDAS_PER_SERIES + " (model filler: per-series least-squares fit over present points)",
    "wrap_thrift_roundtrip": _CODEC,
    "ws_encoder_roundtrip": _CODEC,
    # r10 vectorized dedup kernels (guide §4.2): deliberate Arrow-batched
    # numpy stages replacing interpreted HOF folds, bit-exact by property
    # test (tests/test_kernels.py) and oracle-gated.
    "emb_semantic_dedup": (
        "bounded cells' pairwise min-dominator runs as one numpy task per "
        "cell (kernels.cell_min_dom, bit-exact with the join path); cells "
        "above kernel_cell_max keep the AQE-skew-split join"
    ),
    "emb_semantic_dedup_trained": (
        "same cell_min_dom kernel routing as emb_semantic_dedup"
    ),
}


def audit_one(spark, name, fn):
    try:
        df = fn(spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
    except Exception as e:  # noqa: BLE001
        return {"name": name, "error": f"{type(e).__name__}: {e}"}
    return {
        "name": name,
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "python_evals": len(
            re.findall(
                r"BatchEvalPython|ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas|MapInBatch",
                plan,
            )
        ),
        "cartesian": len(
            re.findall(r"CartesianProduct|BroadcastNestedLoopJoin", plan)
        ),
        "sorts": len(re.findall(r"^\s*\(\d+\) Sort\b", plan, re.M)),
        "scans": len(re.findall(r"Scan parquet", plan)),
        "error": None,
    }


def main() -> None:
    from warp10_platform_spark.queries import QUERIES
    from warp10_platform_spark.session import get_spark

    spark = get_spark("warp10-platform-spark-planaudit")
    spark.sparkContext.setLogLevel("ERROR")

    only = set(sys.argv[1:])
    rows = []
    for name, fn in sorted(QUERIES.items()):
        if only and name not in only:
            continue
        rows.append(audit_one(spark, name, fn))
        r = rows[-1]
        if r.get("error"):
            print(f"ERROR {name}: {r['error']}", flush=True)
        else:
            print(
                f"{name}: ex={r['exchanges']} py={r['python_evals']} "
                f"cart={r['cartesian']} sort={r['sorts']} scan={r['scans']}",
                flush=True,
            )

    errors = [r for r in rows if r.get("error")]
    ok = [r for r in rows if not r.get("error")]
    ok.sort(key=lambda r: (-r["cartesian"], -r["python_evals"], -r["exchanges"]))

    lines = [
        f"# Physical-plan audit (round {os.environ.get('ROUND', '9')})",
        "",
        f"Queries audited: {len(rows)}  (errors: {len(errors)})",
        "",
        "Counters from `explain('formatted')` of every registered query at "
        f"`{SF_DIR}` — plan shape, not timing. `ex` = Exchange (shuffle) "
        "operators, `py` = Python/Pandas eval operators, `cart` = "
        "cartesian/nested-loop joins, `sort` = Sort operators, `scan` = "
        "parquet scans.",
        "",
        "## Flagged (cartesian > 0 or py > 0, not allowlisted)",
        "",
        "| query | ex | py | cart | sort | scan |",
        "|---|---|---|---|---|---|",
    ]
    flagged = [
        r
        for r in ok
        if (r["cartesian"] or r["python_evals"]) and r["name"] not in ALLOW
    ]
    for r in flagged:
        lines.append(
            f"| {r['name']} | {r['exchanges']} | {r['python_evals']} | "
            f"{r['cartesian']} | {r['sorts']} | {r['scans']} |"
        )
    if not flagged:
        lines.append("| (none) | | | | | |")
    lines += [
        "",
        "## By-design exceptions (allowlisted)",
        "",
        "| query | ex | py | cart | reason |",
        "|---|---|---|---|---|",
    ]
    for r in ok:
        if r["name"] in ALLOW and (r["cartesian"] or r["python_evals"]):
            lines.append(
                f"| {r['name']} | {r['exchanges']} | {r['python_evals']} | "
                f"{r['cartesian']} | {ALLOW[r['name']]} |"
            )
    lines += [
        "",
        "## All queries (sorted worst-first)",
        "",
        "| query | ex | py | cart | sort | scan |",
        "|---|---|---|---|---|---|",
    ]
    for r in ok:
        lines.append(
            f"| {r['name']} | {r['exchanges']} | {r['python_evals']} | "
            f"{r['cartesian']} | {r['sorts']} | {r['scans']} |"
        )
    if errors:
        lines += ["", "## Errors", ""]
        for r in errors:
            lines.append(f"- {r['name']}: {r['error']}")
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), f"PLANAUDIT_r{os.environ.get('ROUND', '9')}.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"\nwrote {out}: {len(flagged)} flagged, {len(errors)} errors")


if __name__ == "__main__":
    main()

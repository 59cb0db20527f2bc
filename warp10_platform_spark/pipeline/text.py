"""Text analysis for training-data pipelines: token counting, quality
scoring, language-ID, fingerprinting. All JVM-side column expressions —
no Python UDFs, so these run at full codegen speed over 100 TB of text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def TOKS():
    return F.split(F.trim(F.col("text")), " ")


def token_count(docs: DataFrame) -> DataFrame:
    """Whitespace token count + char count."""
    return docs.withColumn("n_tokens", F.size(TOKS())).withColumn("n_chars", F.length("text"))


def quality(docs: DataFrame) -> DataFrame:
    """Quality signals: token count, lexical diversity (distinct/total
    tokens), average token length (chars per token)."""
    d = docs.withColumn("_toks", TOKS())
    return (
        d.withColumn("n_tokens", F.size("_toks"))
        .withColumn("lexical_diversity", F.round(F.size(F.array_distinct(F.col("_toks"))) / F.col("n_tokens"), 6))
        .withColumn("avg_token_len", F.round(F.length("text") / F.col("n_tokens"), 6))
        .drop("_toks")
    )


_MARKERS = {
    "en": ("the", "and", "of"),
    "de": ("der", "und", "die"),
    "fr": ("le", "et", "la"),
    "es": ("el", "y", "los"),
}


def langid(docs: DataFrame) -> DataFrame:
    """Marker-word language scoring with fixed tie-break order
    (en > de > fr > es). Higher-order array functions — no UDF."""
    d = docs.withColumn("_toks", TOKS())
    for lang, words in _MARKERS.items():
        cond = " or ".join(f"x = '{w}'" for w in words)
        d = d.withColumn(f"s_{lang}", F.expr(f"size(filter(_toks, x -> {cond}))"))
    pred = (
        F.when((F.col("s_en") >= F.col("s_de")) & (F.col("s_en") >= F.col("s_fr")) & (F.col("s_en") >= F.col("s_es")), "en")
        .when((F.col("s_de") >= F.col("s_fr")) & (F.col("s_de") >= F.col("s_es")), "de")
        .when(F.col("s_fr") >= F.col("s_es"), "fr")
        .otherwise("es")
    )
    return d.withColumn("pred_lang", pred).drop("_toks")


def fingerprint(docs: DataFrame) -> DataFrame:
    """Canonical-form fingerprint: md5 over the sorted distinct token bag
    — near-dup canonicalization (whitespace/order-insensitive)."""
    return docs.withColumn(
        "fingerprint", F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(TOKS()))))
    )

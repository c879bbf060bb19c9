"""Text-analysis operators for LLM training-data curation.

All pure map-side Column expressions (split/filter/aggregate over the
token array) — no shuffles except the final small aggregations, no UDFs:

- ``token_stats``      : per-document token counting (whitespace +
                         regex tokenizer), unique counts, type-token
                         ratio.
- ``language_id``      : n-gram/stopword-profile language heuristic —
                         scores each candidate language's stopword hits
                         and takes the argmax (deterministic tie-break).
- ``quality_scores``   : heuristic quality signals (length, punctuation
                         density, digit density, stopword ratio) and a
                         keep/review routing decision.
- ``doc_fingerprints`` : order-sensitive rolling-hash fingerprint
                         (content-defined identity for exact-ish dedup
                         and incremental re-crawl detection).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import texthash as TH

# Public stopword profiles (tiny on purpose: the operator's shape is the
# point; swap in real profiles for production).
STOPWORDS = {
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit"],
    "en": ["the", "and", "of", "to", "in", "is", "it", "for"],
    "es": ["el", "la", "de", "que", "y", "los", "en", "un"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une"],
    "zh": ["de5", "shi4", "bu4", "le5", "zai4", "ren2", "you3", "wo3"],
}
LANGS = sorted(STOPWORDS)


def token_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    toks = TH.tokens(F.col(text_col))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
        F.round(
            F.size(F.array_distinct(toks)) / F.size(toks).cast("double"), 6
        ).alias("type_token_ratio"),
        F.round(
            F.aggregate(toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t))
            / F.size(toks).cast("double"),
            6,
        ).alias("avg_token_len"),
    )


def _lang_score(toks: F.Column, lang: str) -> F.Column:
    """Occurrence count of the language's stopwords in the token stream."""
    words = STOPWORDS[lang]
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def language_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-profile language ID; argmax score, ties -> first lang
    alphabetically, all-zero -> 'und' (undetermined)."""
    toks = TH.tokens(F.col(text_col))
    scored = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col("lang").alias("labeled_lang"),
        *[_lang_score(toks, lang).alias(f"s_{lang}") for lang in LANGS],
    )
    best = F.greatest(*[F.col(f"s_{lang}") for lang in LANGS])
    # when-chain in LANGS (alphabetical) order: earlier langs win ties.
    chain = None
    for lang in LANGS:
        cond = (F.col(f"s_{lang}") == best) & (best > 0)
        chain = F.when(cond, F.lit(lang)) if chain is None else chain.when(cond, F.lit(lang))
    predicted = chain.otherwise(F.lit("und"))
    return (
        scored.withColumn("predicted_lang", predicted)
        .groupBy("labeled_lang", "predicted_lang")
        .agg(F.count("*").alias("n_docs"))
    )


def quality_scores(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    text = F.col(text_col)
    toks = TH.tokens(text)
    n_chars = F.length(text)
    punct = F.length(F.regexp_replace(text, r"[^.,;:!?]", ""))
    digits = F.length(F.regexp_replace(text, r"[^0-9]", ""))
    stop_hits = _lang_score(toks, "en")
    stop_ratio = stop_hits / F.size(toks).cast("double")
    keep = (
        (F.size(toks) >= 10)
        & (punct / n_chars.cast("double") < 0.2)
        & (digits / n_chars.cast("double") < 0.5)
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_chars.alias("n_chars"),
        F.size(toks).alias("n_tokens"),
        F.round(punct / n_chars.cast("double"), 6).alias("punct_ratio"),
        F.round(digits / n_chars.cast("double"), 6).alias("digit_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.when(keep, F.lit("keep")).otherwise(F.lit("review")).alias("quality_route"),
    )


def doc_fingerprints(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Order-sensitive rolling hash over the token-hash sequence."""
    toks = TH.tokens(F.col(text_col))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        TH.doc_fingerprint(TH.token_hashes(toks)).alias("fingerprint"),
    )

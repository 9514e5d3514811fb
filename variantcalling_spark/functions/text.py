"""Text-analysis scalar functions for training-data pipelines.

Token counting, quality scoring, language identification, document
fingerprinting — all native Column expressions (codegen'd, no UDF),
designed so each is also expressible in portable SQL for the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny per-language marker lexicons for the n-gram/stopword heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "es": ["el", "la", "de"],
    "de": ["der", "und", "die"],
    "fr": ["le", "et", "les"],
    "zh": ["de5", "le5", "he2"],
}

STOPWORDS = ["the", "a", "of", "and", "to"]


def tokens(text: Column) -> Column:
    return F.split(text, " ")


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text))


def distinct_token_count(text: Column) -> Column:
    return F.size(F.array_distinct(tokens(text)))


def stopword_count(text: Column, stopwords: list[str] | None = None) -> Column:
    sw = stopwords or STOPWORDS
    return F.size(F.filter(tokens(text), lambda w: w.isin(*sw)))


def quality_score(text: Column) -> Column:
    """Composite quality heuristic: length band + lexical diversity +
    stopword presence (the length/punct/stopword-ratio family of LLM
    data-quality filters), in exact integer/ratio arithmetic."""
    n_tok = token_count(text)
    n_dist = distinct_token_count(text)
    n_stop = stopword_count(text)
    len_ok = F.when((F.length(text) >= 100) & (F.length(text) <= 400), 1).otherwise(0)
    diversity = n_dist / n_tok.cast("double")
    stop_ratio = n_stop / n_tok.cast("double")
    return F.round(
        0.4 * len_ok + 0.4 * diversity + 0.2 * F.least(stop_ratio * 5, F.lit(1.0)), 6
    )


def lang_scores(text: Column) -> dict[str, Column]:
    """Marker-hit count per language."""
    return {
        lang: F.size(F.filter(tokens(text), lambda w: w.isin(*markers)))
        for lang, markers in LANG_MARKERS.items()
    }


def predict_lang(text: Column) -> Column:
    """Argmax language by marker hits, deterministic tie-break by
    language code order; 'und' when nothing matched."""
    scores = lang_scores(text)
    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lang in sorted(scores):  # later wins only on strictly greater
        s = scores[lang]
        take = s > best_score
        best_lang = F.when(take, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(take, s).otherwise(best_score)
    return best_lang


def fingerprint(text: Column) -> Column:
    """Deterministic 128-bit content fingerprint of normalized text."""
    return F.md5(F.lower(F.trim(text)))

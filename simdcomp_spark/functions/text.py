"""Text-analysis operators for training-data pipelines, DataFrame-first:
token counting, quality signals, language ID heuristic, fingerprinting.
Everything except lang-ID scoring stays in JVM whole-stage codegen."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# tiny per-language stopword seeds for the n-gram/stopword heuristic
_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "it", "for", "with", "on"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "una", "los", "por"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "ein", "zu", "den"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une", "est", "pour"],
    "zh": ["的", "是", "了", "在", "我", "有", "和", "就", "不", "人"],
}


def ws_token_count(col: str = "text") -> Column:
    """Whitespace token count (single-space split, empty fields counted —
    matches DuckDB len(string_split(x, ' ')))."""
    return F.size(F.split(F.col(col), " ")).alias("n_ws_tokens")


def quality_signals(df: DataFrame, col: str = "text") -> DataFrame:
    """Integer-valued quality features (lengths/counts — no float ratios so
    results are exactly reproducible in any SQL engine)."""
    t = F.col(col)
    return df.select(
        "doc_id",
        F.length(t).alias("n_chars_q"),
        F.size(F.split(t, " ")).alias("n_words"),
        (F.length(t) - F.length(F.regexp_replace(t, r"[.,!?;:]", "")))
        .cast("int").alias("n_punct"),
        (F.length(t) - F.length(F.regexp_replace(t, "[A-Z]", "")))
        .cast("int").alias("n_upper"),
    )


def lang_id(df: DataFrame, col: str = "text") -> DataFrame:
    """Stopword-overlap language heuristic (cheap n-gram-free variant of
    n-gram lang ID). Pure JVM: split → array_intersect per language →
    argmax.  Returns (doc_id, lang_pred)."""
    words = F.array_distinct(F.split(F.lower(F.col(col)), " "))
    scores = F.array(*[
        F.struct(
            F.size(F.array_intersect(
                words, F.array(*[F.lit(w) for w in sw]))).alias("score"),
            F.lit(lang).alias("lang"))
        for lang, sw in _STOPWORDS.items()])
    best = F.array_max(scores)
    return df.select(
        "doc_id",
        F.when(best.score > 0, best.lang).otherwise(F.lit("und"))
        .alias("lang_pred"))


def fingerprint(df: DataFrame, col: str = "text") -> DataFrame:
    """Order-sensitive document fingerprint: xxhash64 of each word combined
    positionally (rolling-hash analog), fully JVM-side."""
    words = F.split(F.col(col), " ")
    rolled = F.aggregate(
        F.transform(words, lambda w: F.xxhash64(w)),
        F.lit(0).cast("long"),
        lambda acc, h: F.xxhash64(acc, h))  # overflow-free rolling combine
    return df.select("doc_id", rolled.alias("fingerprint"))

"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting.

Everything is a Catalyst expression (codegen'd, pushdown-friendly) — these
run as a single projection over the corpus scan, no shuffle at all. The
definitions are deliberately simple and *portable* (identical results are
expressible in ANSI SQL — see the DuckDB oracles in __spark_entry__.py),
because at 100 TB the value of a quality score is its stability, not its
sophistication.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: tiny stopword lists for n-gram-free language ID (top function words)
_LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "auf", "sich"],
    "fr": ["le", "la", "les", "et", "des", "est", "dans", "que", "une", "pour"],
    "es": ["el", "la", "los", "las", "es", "en", "que", "una", "por", "con"],
}


def tokens(text: Column) -> Column:
    """Whitespace tokens, empties removed (portable definition)."""
    return F.filter(F.split(text, r"\s+"), lambda x: x != "")


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("long")


def bpe_ish_token_count(text: Column) -> Column:
    """Approximate BPE token count: word-ish and non-space-non-word pieces.
    A cheap, deterministic stand-in for a real tokenizer (~= GPT-style
    'words + punctuation' counting)."""
    pieces = F.filter(
        F.split(text, r"(?<=\W)|(?=\W)"), lambda x: (x != "") & (x != " ")
    )
    return F.size(pieces).cast("long")


def _stopword_hits(toks: Column, words: list[str]) -> Column:
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, F.lower(t))))


def lang_id(text: Column) -> Column:
    """Stopword-vote language guess over {en,de,fr,es}; 'und' (undetermined)
    when nothing matches."""
    toks = tokens(text)
    scores = [(lang, _stopword_hits(toks, ws)) for lang, ws in _LANG_STOPWORDS.items()]
    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lang, score in scores:
        is_better = score > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, score).otherwise(best_score)
    return best_lang


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append the standard quality-signal columns:

    n_chars, n_tokens, avg_token_len, punct_ratio, digit_ratio,
    upper_ratio, stopword_ratio (en), quality_score in [0,1].
    """
    t = F.col(text_col)
    toks = tokens(t)
    n_chars = F.length(t)
    n_tokens = F.size(toks)
    punct = F.length(t) - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    digits = F.length(t) - F.length(F.regexp_replace(t, r"[0-9]", ""))
    uppers = F.length(t) - F.length(F.regexp_replace(t, r"[A-Z]", ""))
    stop_hits = _stopword_hits(toks, _LANG_STOPWORDS["en"])

    nz = F.when(n_chars > 0, n_chars.cast("double")).otherwise(F.lit(1.0))
    ntz = F.when(n_tokens > 0, n_tokens.cast("double")).otherwise(F.lit(1.0))

    out = (
        df.withColumn("n_chars_calc", n_chars.cast("long"))
        .withColumn("n_tokens", n_tokens.cast("long"))
        .withColumn(
            "avg_token_len",
            F.round(
                F.when(
                    n_tokens > 0,
                    F.aggregate(toks, F.lit(0), lambda a, x: a + F.length(x)).cast("double") / ntz,
                ).otherwise(F.lit(0.0)),
                4,
            ),
        )
        .withColumn("punct_ratio", F.round(punct.cast("double") / nz, 4))
        .withColumn("digit_ratio", F.round(digits.cast("double") / nz, 4))
        .withColumn("upper_ratio", F.round(uppers.cast("double") / nz, 4))
        .withColumn("stopword_ratio", F.round(stop_hits.cast("double") / ntz, 4))
    )
    # quality score: length-sane, punctuation-sane, has stopwords
    score = (
        F.when((F.col("n_tokens") >= 10) & (F.col("n_tokens") <= 100000), 0.4).otherwise(0.0)
        + F.when((F.col("punct_ratio") <= 0.2), 0.2).otherwise(0.0)
        + F.when((F.col("digit_ratio") <= 0.3), 0.1).otherwise(0.0)
        + F.when(F.col("stopword_ratio") >= 0.05, 0.3).otherwise(0.0)
    )
    return out.withColumn("quality_score", F.round(score, 4))


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint (md5 hex — portable across engines
    for oracle checks; xxhash64 is the cheaper in-engine alternative)."""
    return F.md5(text)


def rolling_fingerprints(text: Column, window_tokens: int = 32, stride: int = 16) -> Column:
    """Array of md5 fingerprints of overlapping token windows — the
    building block for fuzzy containment / plagiarism checks."""
    toks = tokens(text)
    n = F.size(toks)
    starts = F.sequence(
        F.lit(1),
        F.greatest(n - window_tokens + 1, F.lit(1)),
        F.lit(stride),
    )
    return F.transform(starts, lambda i: F.md5(F.array_join(F.slice(toks, i, window_tokens), " ")))

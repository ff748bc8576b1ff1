"""Text analysis operators for web-scale training-data pipelines:
language-ID, quality scoring, token counting, document fingerprinting.

Everything here is built from native pyspark.sql.functions (JVM-side,
whole-stage codegen) — no Python UDFs — so the same semantics are
expressible as ANSI SQL for the DuckDB oracle and the operators scale
linearly with no serialization overhead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# distinctive high-frequency marker words per language (n-gram heuristic
# stand-in; deterministic and SQL-expressible)
LANG_MARKERS = {
    "en": ["the", "and", "of", "is"],
    "de": ["der", "die", "und", "ist"],
    "fr": ["le", "la", "et", "est"],
    "es": ["el", "los", "que", "es"],
}

FINGERPRINT_MOD = 1 << 57  # keeps acc*31+255 < 2^63 (no int64 overflow)


def _marker_count(col, words):
    # word-boundary regex count per language
    pattern = r"\b(" + "|".join(words) + r")\b"
    return F.regexp_count(col, F.lit(pattern))


def with_token_count(df: DataFrame, text_col: str = "text",
                     out: str = "n_tokens") -> DataFrame:
    """Whitespace tokenization count (BPE-ish splitting is byte-level
    regex; whitespace is the oracle-parity baseline)."""
    return df.withColumn(
        out, F.size(F.split(F.trim(F.col(text_col)), r"\s+")))


def with_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality heuristics: length, mean word length, stopword ratio,
    non-alpha ratio. All JVM-side expressions."""
    text = F.col(text_col)
    n_chars = F.length(text)
    n_tokens = F.size(F.split(F.trim(text), r"\s+"))
    stop = _marker_count(text, LANG_MARKERS["en"])
    non_alnum = F.regexp_count(text, F.lit(r"[^A-Za-z0-9\s]"))
    return (df
            .withColumn("q_chars", n_chars)
            .withColumn("q_tokens", n_tokens)
            .withColumn("q_mean_word_len",
                        (n_chars.cast("double") /
                         F.greatest(n_tokens, F.lit(1)).cast("double")))
            .withColumn("q_stopword_ratio",
                        stop.cast("double") /
                        F.greatest(n_tokens, F.lit(1)).cast("double"))
            .withColumn("q_symbol_ratio",
                        non_alnum.cast("double") /
                        F.greatest(n_chars, F.lit(1)).cast("double")))


def with_lang_guess(df: DataFrame, text_col: str = "text",
                    out: str = "lang_guess") -> DataFrame:
    """Marker-word language ID: argmax over per-language marker counts,
    deterministic tie-break by language code order."""
    text = F.col(text_col)
    scored = None
    for code in sorted(LANG_MARKERS):
        c = _marker_count(text, LANG_MARKERS[code])
        pair = F.struct(c.alias("score"), F.lit(code).alias("code"))
        scored = pair if scored is None else \
            F.when(c > scored["score"], pair).otherwise(scored)
    # note: first-listed language wins ties because later only replaces on >
    return df.withColumn(out, scored["code"])


def with_fingerprint(df: DataFrame, text_col: str = "text",
                     out: str = "fingerprint") -> DataFrame:
    """Deterministic rolling polynomial hash over characters
    (acc*31 + ascii(char)) mod 2^57 — the distributed analog of a
    content-defined document fingerprint. Uses F.aggregate over the char
    array (Catalyst HOF, JVM-side loop)."""
    chars = F.split(F.col(text_col), "")
    return df.withColumn(
        out,
        F.aggregate(
            chars,
            F.lit(0).cast("long"),
            lambda acc, c: (acc * F.lit(31) + F.ascii(c)) %
            F.lit(FINGERPRINT_MOD)))


def word_ngrams(text_col, n: int = 3):
    """Array column of word n-grams joined by single spaces (shingles)."""
    words = F.split(F.trim(text_col), r"\s+")
    count = F.size(words) - (n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(count, F.lit(1))),
        lambda i: F.concat_ws(
            " ", *[F.element_at(words, (i + j).cast("int"))
                   for j in range(n)]))
    return F.when(count >= 1, grams).otherwise(F.array().cast("array<string>"))

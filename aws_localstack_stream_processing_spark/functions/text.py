"""Cross-engine text-analysis expression builders.

Used by the text-analysis operators (language ID, quality scoring, token
counting, shingling) and their DuckDB oracles. All fragments are pure SQL
expressions (no UDFs) so they run inside whole-stage codegen at 100 TB scale.
"""

from __future__ import annotations

# BPE-ish tokenizer: letter runs | single digits | single punctuation marks.
# Simple enough to behave identically under Java regex and DuckDB's RE2.
# NOTE: no backslash classes — Spark SQL string literals process escapes
# ('\s' silently becomes 's'), so we use an explicit space character.
TOKEN_REGEX = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]

# Tiny marker-word profiles for the language-ID heuristic. Deterministic and
# cross-engine; real language ID would swap in character n-gram profiles.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to"],
    "es": ["el", "la", "de", "que"],
    "fr": ["le", "la", "et", "les"],
    "de": ["der", "die", "und", "das"],
    "zh": ["de5", "shi4", "le5", "zai4"],
}


def words(col: str, dialect: str) -> str:
    if dialect == "spark":
        return f"split({col}, ' ')"
    return f"string_split({col}, ' ')"


def n_words(col: str, dialect: str) -> str:
    if dialect == "spark":
        return f"size({words(col, dialect)})"
    return f"len({words(col, dialect)})"


def token_count(col: str, dialect: str) -> str:
    if dialect == "spark":
        return f"size(regexp_extract_all({col}, '{TOKEN_REGEX}', 0))"
    return f"len(regexp_extract_all({col}, '{TOKEN_REGEX}'))"


def stopword_hits(col: str, dialect: str) -> str:
    """Count of words that are in the stopword list."""
    in_list = ", ".join(f"'{w}'" for w in STOPWORDS)
    if dialect == "spark":
        return (
            f"size(filter({words(col, dialect)}, "
            f"w -> w IN ({in_list})))"
        )
    return (
        f"len(list_filter({words(col, dialect)}, "
        f"w -> w IN ({in_list})))"
    )


def marker_hits(col: str, lang: str, dialect: str) -> str:
    in_list = ", ".join(f"'{w}'" for w in LANG_MARKERS[lang])
    if dialect == "spark":
        return f"size(filter({words(col, dialect)}, w -> w IN ({in_list})))"
    return f"len(list_filter({words(col, dialect)}, w -> w IN ({in_list})))"


def distinct_words(col: str, dialect: str) -> str:
    if dialect == "spark":
        return f"size(array_distinct({words(col, dialect)}))"
    return f"len(list_distinct({words(col, dialect)}))"


def shingles(words_col: str, k: int, dialect: str) -> str:
    """Word k-gram shingles as an array of space-joined strings.

    Spark arrays are 0-indexed (bracket access), DuckDB lists are 1-indexed —
    both fragments enumerate shingle start positions explicitly so element
    order (and therefore any downstream fold) is identical.
    """
    if dialect == "spark":
        parts = ", ".join(f"{words_col}[i + {j}]" for j in range(k))
        return (
            f"transform(sequence(0, size({words_col}) - {k}), "
            f"i -> concat_ws(' ', {parts}))"
        )
    parts = " || ' ' || ".join(f"{words_col}[i + {j}]" for j in range(k))
    return (
        f"list_transform(generate_series(1, len({words_col}) - {k - 1}), "
        f"i -> {parts})"
    )

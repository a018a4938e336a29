"""Text-analysis column builders (SURVEY §2 K6-K13 [X]).

All pure Catalyst expressions/HOFs — no Python in the hot path.  Each
builder has a DuckDB twin so the oracle can mirror it exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tiny demo stopword set (shared engine/oracle literal)
STOPWORDS = ["the", "a", "of", "and", "to", "in"]

#: per-language marker lexicons for the n-gram/stopword language-ID
#: heuristic.  The fixture vocabulary is synthetic, so the lexicons mix
#: real function words with domain words to stay meaningful on it.
LANG_LEXICONS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "nicht"],
    "en": ["the", "a", "of", "and", "to"],
    "es": ["el", "la", "los", "que", "y"],
    "fr": ["le", "la", "les", "et", "que"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2"],
}

#: BPE-ish pre-tokenizer: word pieces, digit runs, or single non-space
TOKEN_REGEX = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def tokens(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def token_set(text: Column | str) -> Column:
    return F.array_sort(F.array_distinct(tokens(text)))


def token_set_sql(expr: str) -> str:
    return f"list_sort(list_distinct(string_split({expr}, ' ')))"


def stopword_count(toks: Column) -> Column:
    lex = F.array(*[F.lit(w) for w in STOPWORDS])
    return F.size(F.filter(toks, lambda x: F.array_contains(lex, x)))


def stopword_count_sql(toks_expr: str) -> str:
    lex = "[" + ", ".join(f"'{w}'" for w in STOPWORDS) + "]"
    return f"len(list_filter({toks_expr}, x -> list_contains({lex}, x)))"


def lexicon_score(toks: Column, words: list[str]) -> Column:
    lex = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda x: F.array_contains(lex, x)))


def lexicon_score_sql(toks_expr: str, words: list[str]) -> str:
    lex = "[" + ", ".join(f"'{w}'" for w in words) + "]"
    return f"len(list_filter({toks_expr}, x -> list_contains({lex}, x)))"


def fingerprint(text: Column | str) -> Column:
    """Shape fingerprint: md5 of the sorted distinct token set — stable
    under token reordering/duplication (key-collapse style dedup).

    NULL text → NULL fingerprint (--nulls sweep): without the gate,
    concat_ws silently renders the NULL token array as '' and a
    contentless doc collides with the genuinely-empty one."""
    c = F.col(text) if isinstance(text, str) else text
    return F.when(
        c.isNotNull(),
        F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(F.split(c, " "))))),
    )


def fingerprint_sql(expr: str) -> str:
    return (
        "md5(array_to_string(list_sort(list_distinct("
        f"string_split({expr}, ' '))), ' '))"
    )

"""Text-analysis column functions for large-scale training-data
pipelines (SURVEY.md §7.5; no siskin counterpart — specced from public
LLM-data-pipeline practice, e.g. C4/Gopher-style quality heuristics).

All pure Column expressions — JVM-side, whole-stage-codegen friendly;
no Python UDFs. Designed for ~100 TB corpora: every function is a
narrow map, no shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny built-in stopword lists for the n-gram language heuristic;
# intentionally deterministic and vocabulary-light (real deployments
# swap in fastText — out of scope for this container). Dict order is
# the tie-break precedence (first listed wins). Profiles are the
# highest-frequency function words of each language — public knowledge,
# chosen to be distinctive across the set (Romance overlaps like
# 'una' exist; argmax + precedence absorbs them).
STOPWORDS = {
    "en": ("the", "a", "of", "and", "in", "to", "is"),
    "de": ("der", "die", "das", "und", "ist", "ein"),
    "fr": ("le", "la", "les", "et", "un", "une", "est"),
    "es": ("el", "los", "las", "una", "del", "es", "y"),
    "it": ("il", "gli", "della", "delle", "che", "di", "per"),
    "nl": ("de", "het", "een", "van", "en", "niet"),
    "ru": ("и", "в", "не", "на", "что", "это"),
    # r4 widening — appended AFTER the original seven so existing
    # precedence (first-listed wins ties) is preserved; words chosen
    # to minimize cross-profile overlap (e.g. no bare 'a' for cs —
    # it would feed the en counter's ties; 'não'/'ikke'/'się' are
    # uniquely diacritic-marked)
    "pt": ("o", "os", "um", "uma", "não", "são", "também"),
    "pl": ("się", "nie", "jest", "oraz", "przez", "tym", "być"),
    "cs": ("je", "se", "že", "pro", "jsou", "byl", "tak"),
    "sv": ("och", "att", "det", "som", "är", "på", "för"),
    "da": ("og", "til", "af", "ikke", "er", "med", "også"),
}

# BPE-ish tokenizer regex: words, numbers, or single non-space symbols
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(text: Column | str, sep: str = " ") -> Column:
    """Whitespace tokenization."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, sep)


def token_count(text: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text))


def regex_token_count(text: Column | str, pattern: str = TOKEN_REGEX) -> Column:
    """BPE-ish token count: number of regex token matches."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(pattern), F.lit(0)))


def stopword_count_expr(toks: Column, lang: str) -> Column:
    """Count of tokens in the language's stopword list (not deduped —
    ratio semantics need raw counts).

    Stays a higher-order filter over the staged token array: a
    regexp_extract_all over a rejoined string measured FASTER for one
    language but 2x slower across all 12, because each language's
    expression re-materializes array_join(toks) per row (Catalyst does
    not CSE the interpreted join across sibling expressions)."""
    words = STOPWORDS[lang]
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def lang_id(toks: Column, langs: tuple[str, ...] | None = None) -> Column:
    """Heuristic language id: argmax stopword count over candidate
    languages (default: every STOPWORDS profile), first-listed language
    wins ties, 'und' (undetermined) when no stopwords hit at all
    (mirrors the reference's use of a detector with an 'unknown'
    fallback, conversions.py:440-452)."""
    if langs is None:
        langs = tuple(STOPWORDS)
    return lang_from_scores(lang_scores(toks, langs), langs)


def lang_scores(toks: Column, langs: tuple[str, ...] | None = None) -> Column:
    """Argmax struct (c = best stopword count, ni = -index of the
    winning language) via array_max over (count, -index) structs: each
    language's stopword filter — an INTERPRETED higher-order function,
    the per-row cost center — evaluates exactly once, where a
    greatest()+when-chain re-evaluates every count a second time.
    Struct comparison is lexicographic, so ties go to the highest
    -index = the first-listed language, same as a when-chain.

    Stage this as its OWN projected column and pass the attribute to
    :func:`lang_from_scores`: referencing the struct twice inline
    embeds two copies of the whole filter subtree in the plan
    (Catalyst trees share nothing), doubling per-row cost."""
    if langs is None:
        langs = tuple(STOPWORDS)
    return F.array_max(
        F.array(
            *[
                F.struct(
                    stopword_count_expr(toks, lg).alias("c"),
                    F.lit(-i).alias("ni"),
                )
                for i, lg in enumerate(langs)
            ]
        )
    )


def lang_from_scores(best: Column, langs: tuple[str, ...] | None = None) -> Column:
    """Language name from a :func:`lang_scores` struct; 'und' when no
    stopword hit at all."""
    if langs is None:
        langs = tuple(STOPWORDS)
    name = F.element_at(F.array(*[F.lit(lg) for lg in langs]), -best["ni"] + 1)
    return F.when(best["c"] > 0, name).otherwise(F.lit("und"))


def quality_features(
    text: Column | str, toks: Column | None = None
) -> dict[str, Column]:
    """Gopher/C4-style quality signals as a dict of named columns:
    lengths, mean word length, stopword ratio, symbol ratio.
    Ratios are single IEEE divisions of exact integer counts, so they
    reproduce bit-identically in any engine. Pass a pre-materialized
    ``toks`` column to share one tokenization across several feature
    bundles (split() is cheap, but sharing also lets callers stage the
    array once for the interpreted stopword filters downstream)."""
    c = F.col(text) if isinstance(text, str) else text
    toks = tokens(c) if toks is None else toks
    n_tok = F.size(toks)
    n_chars = F.length(c)
    n_stop = stopword_count_expr(toks, "en")
    n_sym = n_chars - F.length(F.regexp_replace(c, r"[^A-Za-z0-9 ]", ""))
    mean_wl = (n_chars - n_tok + 1).cast("double") / n_tok.cast("double")
    return {
        "n_chars": n_chars,
        "n_tokens": n_tok,
        "mean_word_len": mean_wl,
        "stopword_ratio": n_stop.cast("double") / n_tok.cast("double"),
        "symbol_ratio": n_sym.cast("double") / n_chars.cast("double"),
    }


def quality_keep(text: Column | str, min_tokens: int = 10, max_mean_wl: float = 12.0) -> Column:
    """Boolean keep decision from the quality features (Gopher-rule
    shape: length window + mean-word-length sanity + stopword floor)."""
    ft = quality_features(text)
    return (
        (ft["n_tokens"] >= min_tokens)
        & (ft["mean_word_len"] <= max_mean_wl)
        & (ft["stopword_ratio"] >= 0.0)
    )

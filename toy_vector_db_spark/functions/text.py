"""Text analysis for large-scale training-data pipelines.

Beyond-parity extension (the reference has no text analytics; its only
text handling is the embedding pass-through, pipeline/processor.go:21-40).
These are the standard pre-training corpus filters — language ID,
quality scoring, token counting, fingerprinting — expressed as pure
Column expressions so they run inside whole-stage codegen at 100 TB:
no UDFs anywhere in this module.

Every function here has an exact ANSI-SQL twin (see workload.py), so
the driver's DuckDB oracle checks them value-for-value.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword inventories for the n-gram/stopword
# heuristic language id. Order matters: ties resolve to the FIRST
# language in this list (mirrored in the oracle SQL).
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "it", "for", "was"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "dans", "que", "pour"),
    "es": ("el", "la", "los", "las", "es", "un", "una", "que", "por", "para"),
}

PUNCT_CLASS = "[.,!?;:]"


def tokens(text: Column) -> Column:
    """Whitespace tokenization of trimmed, lowercased text."""
    return F.split(F.trim(F.lower(text)), r"\s+")


def token_count(text: Column) -> Column:
    """Whitespace token count; empty/blank text counts 0."""
    return F.when(F.trim(text) == "", F.lit(0)) \
            .otherwise(F.size(tokens(text))).cast("bigint")


# Maximal letter runs, digit runs, and single non-word marks — a cheap
# stand-in for a BPE tokenizer's fragment count. RE2-compatible (no
# lookaround) so the DuckDB oracle runs the identical pattern.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^\w\s]"


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token estimate for token budgeting: counts regex
    matches of BPE_ISH_PATTERN ("don't x42" -> don/'/t/x/42 = 5)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), F.lit(0))) \
            .cast("bigint")


def char_count(text: Column) -> Column:
    return F.length(text).cast("bigint")


def punct_count(text: Column) -> Column:
    return (F.length(text) -
            F.length(F.regexp_replace(text, PUNCT_CLASS, ""))).cast("bigint")


def stopword_hits(text: Column, lang: str = "en") -> Column:
    """Number of tokens (with duplicates) that are stopwords of ``lang``."""
    stops = F.array(*[F.lit(s) for s in LANG_STOPWORDS[lang]])
    return F.size(F.filter(tokens(text),
                           lambda t: F.array_contains(stops, t))).cast("bigint")


def quality_score(text: Column) -> Column:
    """Heuristic quality in [0,1]: rewards moderate length, real
    sentence punctuation, and natural stopword density; punishes
    degenerate short/unpunctuated text. Deterministic arithmetic only."""
    n_chars = F.length(text).cast("double")
    n_tok = token_count(text).cast("double")
    mean_tok_len = F.when(n_tok > 0, n_chars / n_tok).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0,
                         punct_count(text) / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tok > 0,
                        stopword_hits(text) / n_tok).otherwise(F.lit(0.0))
    length_term = F.least(n_tok / 20.0, F.lit(1.0))              # ≥20 tokens
    tok_len_term = F.when((mean_tok_len >= 3.0) & (mean_tok_len <= 10.0),
                          F.lit(1.0)).otherwise(F.lit(0.5))
    punct_term = F.least(punct_ratio * 20.0, F.lit(1.0))
    stop_term = F.least(stop_ratio * 4.0, F.lit(1.0))
    return (0.4 * length_term + 0.2 * tok_len_term
            + 0.2 * punct_term + 0.2 * stop_term)


def lang_id(text: Column) -> Column:
    """Stopword-voting language id over LANG_STOPWORDS; 'und'
    (undetermined) when no stopword of any language appears. Ties break
    by dict order — the oracle SQL mirrors the same chain."""
    toks = tokens(text)

    def in_list(stops: tuple[str, ...]):
        arr = F.array(*[F.lit(x) for x in stops])
        return lambda t: F.array_contains(arr, t)

    scores = {lang: F.size(F.filter(toks, in_list(stops)))
              for lang, stops in LANG_STOPWORDS.items()}
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    for lang in reversed(list(LANG_STOPWORDS)):  # first lang wins ties
        expr = F.when((scores[lang] > 0) & (scores[lang] == best),
                      F.lit(lang)).otherwise(expr)
    return expr


def text_stats_struct(text: Column) -> Column:
    """All per-document stats + the quality score as ONE struct, with
    each counting expression evaluated exactly once per row (via
    util.bind_once — projection collapse would otherwise re-inline the
    tokenizer into every consumer, multiplying both runtime and
    generated-code size). The whitespace tokenizer itself is also bound
    once: token_count and stopword_hits both consume the same split
    array instead of re-splitting. Fan out with
    ``F.inline(F.array(...))``."""
    from .util import bind_once

    stops = F.array(*[F.lit(s) for s in LANG_STOPWORDS["en"]])

    def stats_from_tokens(toks: Column) -> Column:
        n_tok = F.when(F.trim(text) == "", F.lit(0)) \
                 .otherwise(F.size(toks))
        stop = F.size(F.filter(toks, lambda t: F.array_contains(stops, t)))
        return F.array(n_tok.cast("double"),
                       char_count(text).cast("double"),
                       punct_count(text).cast("double"),
                       stop.cast("double"))

    def build(s: Column) -> Column:
        n_tok, n_chars, n_punct, stop = s[0], s[1], s[2], s[3]
        mean_tok_len = F.when(n_tok > 0, n_chars / n_tok).otherwise(F.lit(0.0))
        punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
        stop_ratio = F.when(n_tok > 0, stop / n_tok).otherwise(F.lit(0.0))
        quality = (0.4 * F.least(n_tok / 20.0, F.lit(1.0))
                   + 0.2 * F.when((mean_tok_len >= 3.0) & (mean_tok_len <= 10.0),
                                  F.lit(1.0)).otherwise(F.lit(0.5))
                   + 0.2 * F.least(punct_ratio * 20.0, F.lit(1.0))
                   + 0.2 * F.least(stop_ratio * 4.0, F.lit(1.0)))
        return F.struct(n_tok.cast("bigint").alias("n_tokens"),
                        n_chars.cast("bigint").alias("n_chars"),
                        n_punct.cast("bigint").alias("n_punct"),
                        stop.cast("bigint").alias("stop_hits"),
                        quality.alias("quality"))

    return bind_once(tokens(text), lambda tk: bind_once(stats_from_tokens(tk), build))


# Gopher-style repetition/symbol gates (Rae et al. 2021,
# arXiv:2112.11446 §A.1.1). Thresholds are module constants so the
# oracle SQL and any pipeline config stay in lockstep.
GOPHER_MAX_DUP_WORD_FRAC = 0.6
GOPHER_MAX_TOP_BIGRAM_FRAC = 0.1
GOPHER_MAX_SYMBOL_RATIO = 0.05
SYMBOL_CLASS = r"[#@*/\\{}<>|~^]"


def repetition_struct(text: Column) -> Column:
    """Gopher-style repetition/symbol quality signals as ONE struct:

    - ``dup_word_frac``: 1 − |distinct tokens| / |tokens| — the mass of
      the document that is repeated words;
    - ``top_bigram_frac``: occurrences of the modal bigram / |bigrams|;
    - ``symbol_ratio``: symbol characters (SYMBOL_CLASS) / characters;
    - ``keep``: all three under their GOPHER_MAX_* thresholds.

    Pure Column expressions (whole-stage codegen, map-only — the 100 TB
    shape for corpus filtering). The modal-bigram count is
    O(distinct · n) per row, bounded by document length, never a
    shuffle. Beyond-parity extension: the reference has no corpus
    filters (its only text handling is pipeline/processor.go:21-40)."""
    from .util import bind_once

    n_chars = F.length(text).cast("double")
    sym = (F.length(text)
           - F.length(F.regexp_replace(text, SYMBOL_CLASS, ""))).cast("double")
    symbol_ratio = F.when(n_chars > 0, sym / n_chars).otherwise(F.lit(0.0))

    def build(toks: Column) -> Column:
        n = F.size(toks)
        dup = F.when(n > 0,
                     1.0 - F.size(F.array_distinct(toks)).cast("double") / n) \
               .otherwise(F.lit(0.0))
        bigrams = F.when(n >= 2, F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat(F.element_at(toks, i), F.lit(" "),
                               F.element_at(toks, i + 1)))) \
            .otherwise(F.array().cast("array<string>"))

        def top_frac(bg: Column) -> Column:
            # Only REPEATED bigram mass counts (Gopher's measures are
            # over duplicated n-grams): a modal count of 1 is no
            # repetition, not 1/nb of it.
            nb = F.size(bg)
            mode = F.array_max(F.transform(
                F.array_distinct(bg),
                lambda d: F.size(F.filter(bg, lambda x: x == d))))
            return F.when((nb > 0) & (mode >= 2),
                          mode.cast("double") / nb).otherwise(F.lit(0.0))

        def assemble(dup_c: Column, top_c: Column) -> Column:
            keep = ((dup_c <= GOPHER_MAX_DUP_WORD_FRAC)
                    & (top_c <= GOPHER_MAX_TOP_BIGRAM_FRAC)
                    & (symbol_ratio <= GOPHER_MAX_SYMBOL_RATIO))
            return F.struct(dup_c.alias("dup_word_frac"),
                            top_c.alias("top_bigram_frac"),
                            symbol_ratio.alias("symbol_ratio"),
                            keep.alias("keep"))

        return bind_once(F.array(dup, bind_once(bigrams, top_frac)),
                         lambda s: assemble(s[0], s[1]))

    return bind_once(tokens(text), build)


# Markup extraction (the raw-crawl -> text step): RE2-compatible
# patterns only (no backreferences / lookaround), so the DuckDB oracle
# runs them verbatim. Script/style contents are junk, not text;
# everything else keeps its inner text.
SCRIPT_BLOCK_RE = r"(?is)<script[^>]*>.*?</script>"
STYLE_BLOCK_RE = r"(?is)<style[^>]*>.*?</style>"
TAG_RE = r"<[^>]+>"
_ENTITY_MAP = (("&nbsp;", " "), ("&amp;", "&"), ("&lt;", "<"),
               ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"))


def strip_markup(text: Column) -> Column:
    """Markup-stripped plain text: drop script/style blocks WITH their
    contents, replace every remaining tag with a space, unescape the
    six common entities, collapse whitespace. Pure regexp/replace
    Column chain — map-only at any scale."""
    t = F.regexp_replace(text, SCRIPT_BLOCK_RE, " ")
    t = F.regexp_replace(t, STYLE_BLOCK_RE, " ")
    t = F.regexp_replace(t, TAG_RE, " ")
    for ent, rep in _ENTITY_MAP:
        t = F.replace(t, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def normalize_for_fingerprint(text: Column) -> Column:
    """Canonical form for exact-dup detection: lowercase, strip
    punctuation, collapse whitespace."""
    t = F.lower(text)
    t = F.regexp_replace(t, PUNCT_CLASS, "")
    t = F.regexp_replace(t, r"\s+", " ")
    return F.trim(t)


def fingerprint(text: Column) -> Column:
    """Exact-duplicate fingerprint: md5 of the normalized text."""
    return F.md5(normalize_for_fingerprint(text))


def rolling_fingerprint(text: Column, window: int = 4) -> Column:
    """Winnowing-style robust fingerprint: md5 over each ``window``-word
    shingle of the normalized text, keep the lexicographic minimum.
    Survives local edits that shift the exact hash.

    NULL text -> NULL, like ``fingerprint`` (the family rule, and what
    the Arrow twin does): without the explicit gate, concat_ws and
    greatest both swallow nulls and a null row would silently
    fingerprint as md5('') — diverging from its own exact fingerprint."""
    from .util import bind_once

    def rolled(toks: Column) -> Column:
        n = F.size(toks)
        return F.array_min(F.transform(
            F.sequence(F.lit(0), F.greatest(n - window, F.lit(0))),
            lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i + 1, window)))))

    # tokenizer bound once per row (see word_shingles)
    out = bind_once(F.split(normalize_for_fingerprint(text), " "), rolled)
    return F.when(text.isNull(), F.lit(None).cast("string")).otherwise(out)


def word_shingles(text: Column, k: int = 3) -> Column:
    """Distinct k-word shingles of normalized text (MinHash/Jaccard
    input). For texts shorter than k words, the whole text is the one
    shingle. The tokenizer (two regexp passes + split) is bound once
    per ROW via bind_once — referenced naively inside the transform
    lambda it would re-run per shingle POSITION (~n_tokens times per
    row; measured 4x on the crossdoc shared-shingle scan).

    NULL text normalizes to the empty string (one [''] shingle) — the
    same rule as the Python tokenizer behind the Arrow signature tier
    (dedup._shingle_set), so the Column/Arrow tier contract is
    bit-identical on EVERY input including null, and sig_tier="auto"
    can never flip a null row's fate with corpus size. Propagating
    null here instead would silently drop null-text rows from banding
    in one tier only (the late-r5 divergence this closes)."""
    from .util import bind_once

    def shingles(toks: Column) -> Column:
        n = F.size(toks)
        return F.array_distinct(F.transform(
            F.sequence(F.lit(0), F.greatest(n - k, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k))))

    normed = normalize_for_fingerprint(F.coalesce(text, F.lit("")))
    return bind_once(F.split(normed, " "), shingles)

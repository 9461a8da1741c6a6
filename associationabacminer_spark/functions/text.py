"""Text-analysis column functions for large-scale training-data pipelines:
language ID, quality scoring, token counting, document fingerprinting.

All built-in ``pyspark.sql.functions`` — JVM-side, codegen'd; designed so
each has an exact ANSI-SQL twin for the DuckDB oracle.  (The reference has
no text analytics; these are the training-pipeline extensions required by
the build brief, expressed over the ``documents`` table.)
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F


def token_count(text: Column | str) -> Column:
    """Whitespace token count (empty string -> 0)."""
    t = F.trim(text if isinstance(text, Column) else F.col(text))
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+"))).cast("int")


def bpe_ish_token_count(text: Column | str) -> Column:
    """BPE-ish token estimate: count of word/number/punct chunks after a
    regex split — a cheap proxy for subword tokenizers."""
    t = text if isinstance(text, Column) else F.col(text)
    cleaned = F.regexp_replace(t, r"([a-zA-Z]{1,4})|([0-9])|([^a-zA-Z0-9\s])", "$1$2$3\x1e")
    stripped = F.regexp_replace(cleaned, r"[^\x1e]", "")
    return F.length(stripped).cast("int")


def punct_ratio(text: Column | str) -> Column:
    t = text if isinstance(text, Column) else F.col(text)
    n = F.length(t)
    punct = F.length(F.regexp_replace(t, r"[^.,;:!?'\"()-]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(punct / n)


_STOPWORDS = (
    "the", "of", "and", "to", "in", "is", "a", "for", "it", "that", "on", "with",
)


def stopword_ratio(text: Column | str, stopwords=_STOPWORDS) -> Column:
    """Fraction of whitespace tokens that are (lowercase) stopwords."""
    t = text if isinstance(text, Column) else F.col(text)
    toks = F.split(F.trim(F.lower(t)), r"\s+")
    hits = F.size(F.filter(toks, lambda w: w.isin(*stopwords)))
    total = F.size(toks)
    return F.when(F.trim(t) == "", F.lit(0.0)).otherwise(hits / total)


def quality_score(text: Column | str) -> Column:
    """Composite [0,1] quality heuristic: length band + stopword presence
    + moderate punctuation (the usual pre-training quality gate shape)."""
    t = text if isinstance(text, Column) else F.col(text)
    n_tok = token_count(t)
    len_ok = F.when((n_tok >= 5) & (n_tok <= 5000), F.lit(0.4)).otherwise(F.lit(0.0))
    stop_ok = F.when(stopword_ratio(t) >= 0.01, F.lit(0.3)).otherwise(F.lit(0.0))
    punct_ok = F.when(punct_ratio(t) <= 0.2, F.lit(0.3)).otherwise(F.lit(0.0))
    return (len_ok + stop_ok + punct_ok).cast("double")


# language-ID: tiny per-language marker vocabularies; score = marker hits.
_LANG_MARKERS = {
    "en": ("the", "and", "of", "is", "you"),
    "de": ("der", "die", "und", "ist", "nicht"),
    "fr": ("le", "la", "et", "est", "les"),
    "es": ("el", "de", "que", "y", "los"),
}


def lang_hits(text: Column | str, lang: str) -> Column:
    t = text if isinstance(text, Column) else F.col(text)
    toks = F.split(F.trim(F.lower(t)), r"\s+")
    return F.size(F.filter(toks, lambda w: w.isin(*_LANG_MARKERS[lang])))


def lang_guess(text: Column | str) -> Column:
    """Argmax of marker-hit counts; 'und' (undetermined) when all zero.
    Ties break in the fixed order en > de > fr > es (strict > below).

    The token array and the 4-hit-count array are pinned with
    ``bind_once``: the argmax expression references every hit count
    several times, and filter() is an interpreted higher-order function
    with no codegen CSE — the plain formulation re-split and re-scanned
    the text ~20x per row (round-6 plan audit)."""
    t = text if isinstance(text, Column) else F.col(text)
    langs = list(_LANG_MARKERS)
    toks_expr = F.split(F.trim(F.lower(t)), r"\s+")

    def with_hits(h):
        hit = {lang: F.element_at(h, i + 1) for i, lang in enumerate(langs)}
        best_score = reduce(F.greatest, hit.values())
        expr = F.lit("und")
        for lang in reversed(langs):
            expr = F.when(hit[lang] == best_score, F.lit(lang)).otherwise(expr)
        return F.when(best_score <= 0, F.lit("und")).otherwise(expr)

    def marker_pred(markers):
        # factory (NOT a default-arg pin): pyspark passes (element,
        # index) to any two-parameter lambda, defaults included — the
        # documented shadowing trap — and a bare closure over the loop
        # var would late-bind every language to the last marker set
        return lambda w: w.isin(*markers)

    return bind_once(
        toks_expr,
        lambda toks: bind_once(
            F.array(
                *[
                    F.size(F.filter(toks, marker_pred(_LANG_MARKERS[lang])))
                    for lang in langs
                ]
            ),
            with_hits,
        ),
    )


def fingerprint(text: Column | str) -> Column:
    """Canonical document fingerprint (the classic 'fingerprint' dedup
    key): lowercase, strip non-alphanumerics, sort unique tokens, md5."""
    t = text if isinstance(text, Column) else F.col(text)
    norm = F.regexp_replace(F.lower(t), r"[^a-z0-9\s]", "")
    toks = F.array_sort(F.array_distinct(F.split(F.trim(norm), r"\s+")))
    return F.md5(F.array_join(toks, " "))


def word_ngrams(text: Column | str, n: int = 3) -> Column:
    """Array of word n-gram shingles (the MinHash/Jaccard input unit)."""
    t = text if isinstance(text, Column) else F.col(text)
    toks = F.split(F.trim(F.lower(t)), r"\s+")
    k = F.size(toks) - (n - 1)
    idx = F.sequence(F.lit(0), F.greatest(k - 1, F.lit(0)))
    return F.when(k <= 0, F.array(F.array_join(toks, " "))).otherwise(
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " "))
    )


def bind_once(expr: Column, fn) -> Column:
    """Evaluate ``expr`` once per row and pass it to ``fn`` as a BOUND
    lambda variable: ``transform(array(expr), fn)[0]``.  Catalyst's
    project-collapse and Generate rewrites inline plain column aliases
    into every use site — for an expensive alias referenced k times
    inside a higher-order lambda that multiplies its evaluation by k
    per ELEMENT (interpreted, no codegen CSE).  A NamedLambdaVariable
    cannot be inlined, so this pins single evaluation regardless of
    what the optimizer does to the surrounding projections."""
    return F.element_at(F.transform(F.array(expr), fn), 1)


def word_ngram_hashes(text: Column | str, n: int = 3) -> Column:
    """Distinct xxhash64 word-n-gram hashes per row — the hashed twin of
    ``array_distinct(transform(word_ngrams(..), xxhash64))`` that never
    builds an n-gram STRING: tokens are hashed once and a shingle hash
    is xxhash64 over the n consecutive token hashes (the
    minhash_signatures_oph technique — profiled there, string shingle
    construction dominated the stage, not hashing).  Shingle equality
    is unchanged up to 64-bit collisions, which every consumer here
    already accepts (they hashed the strings before).

    The token and token-hash arrays are pinned with :func:`bind_once` —
    chained projections are NOT enough (a downstream explode lets the
    optimizer collapse them and re-evaluate the token hashing once per
    n-gram index: the O(tokens^2) trap documented in
    minhash_signatures_oph, measured 5x the stage here).  Short texts
    (< n tokens) fall back to one whole-text shingle, mirroring
    ``word_ngrams`` semantics."""
    t = text if isinstance(text, Column) else F.col(text)
    toks_expr = F.split(F.trim(F.lower(t)), r"\s+")

    def with_toks(toks):
        th_expr = F.transform(toks, lambda x: F.xxhash64(x))

        def with_th(th):
            k = F.size(th) - (n - 1)
            idx = F.sequence(F.lit(0), F.greatest(k - F.lit(1), F.lit(0)))
            return F.when(
                k <= 0, F.array(F.xxhash64(F.array_join(toks, " ")))
            ).otherwise(
                F.transform(
                    idx,
                    lambda i: F.xxhash64(
                        *[F.element_at(th, i + j + 1) for j in range(n)]
                    ),
                )
            )

        return bind_once(th_expr, with_th)

    return F.array_distinct(bind_once(toks_expr, with_toks))


def word_ngram_hash_arrays(
    df, text_col: str, keep_cols: list, n: int, out: str = "sh_arr"
):
    """DataFrame wrapper over :func:`word_ngram_hashes`:
    ``keep_cols`` + ``out`` array column of distinct hashed n-grams."""
    return df.select(
        *keep_cols, word_ngram_hashes(F.col(text_col), n).alias(out)
    )


def repetition_ratio(text: Column | str) -> Column:
    """Repeated-token fraction: 1 - distinct/total whitespace tokens
    (0 = no repetition, ->1 = degenerate loops).  The cheap gibberish /
    repetition-loop screen of quality filtering."""
    t = F.trim(text if isinstance(text, Column) else F.col(text))
    toks = F.split(t, r"\s+")
    return F.when(t == "", F.lit(0.0)).otherwise(
        1.0 - F.size(F.array_distinct(toks)) / F.size(toks)
    )


PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}"


def redact_pii(text: Column | str) -> Column:
    """PII scrub for web-corpus curation: replace emails then IPv4
    literals with typed placeholder tokens.  Pure chained
    regexp_replace — whole-stage codegen, no UDF — and the patterns are
    deliberately restricted to the Java-regex/RE2 common subset so the
    exact same strings drive the DuckDB oracle (q93).  Email runs first
    so an address's dotted domain is never half-eaten by the IP rule."""
    t = text if isinstance(text, Column) else F.col(text)
    t = F.regexp_replace(t, PII_EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(t, PII_IPV4_RE, "<IP>")

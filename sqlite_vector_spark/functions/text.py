"""Text-analysis primitives for LLM-data pipelines.

These are the operators a 100 TB training-data pipeline needs over a
``documents(doc_id, text, ...)`` table: tokenization, quality scoring,
language ID, fingerprinting, shingling. All are pure Catalyst
expressions (split/filter/transform/aggregate higher-order functions)
— JVM-side, whole-stage-codegen'd, zero Python in the scan, and every
one has an exact SQL mirror in oracle.py.

Hashing convention: polynomial rolling hash over characters,
``h = fold(chars, h*31 + ascii(c)) mod 1e9+7`` — deterministic,
overflow-free in BIGINT (acc < 1e9+7, so acc*31 + 127 << 2^63), and
expressible identically in any SQL engine. Spark's builtin xxhash64/
murmur are NOT used in correctness-gated paths because oracles can't
reproduce them; swap in xxhash64 for pure-throughput jobs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

HASH_P = 1_000_000_007
HASH_B = 31


def _col(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


def let(value: Column, body) -> Column:
    """Bind ``value`` to a lambda variable so ``body`` references it
    once instead of duplicating the expression subtree (the same
    single-element-transform trick as functions/distance._let).

    Why it matters here: higher-order functions are CodegenFallback —
    evaluated interpreted, outside whole-stage codegen's subexpression
    elimination — so an expression like ``shingles(text)`` that embeds
    ``words(text)`` in every element_at re-splits the text per shingle
    element (O(words²) per doc; measured 1.36 s -> 0.48 s on the sf0.1
    shingle explode). CollapseProject re-inlines a projected alias only
    when it is cheap or single-referenced, but a lambda binding can
    never be inlined. Same IEEE/string ops, same order -> results are
    byte-identical to the inline form (oracle hashes unchanged)."""
    return F.transform(F.array(value), body)[0]


def words(text: str | Column) -> Column:
    """Whitespace tokens, empties dropped (multi-space safe)."""
    return F.filter(F.split(_col(text), " "), lambda w: w != "")


def token_count(text: str | Column) -> Column:
    return F.size(words(text)).cast("bigint")


def char_count(text: str | Column) -> Column:
    return F.length(_col(text)).cast("bigint")


#: BPE-ish pre-tokenizer: alphabetic runs, single digits, single
#: non-alnum marks — the GPT-2-style pre-tokenization reduced to a
#: regex that parses identically in Java (Spark) and RE2 (DuckDB).
SUBWORD_RE = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"


def subword_token_count(text: str | Column) -> Column:
    """Subword-granularity token count (BPE pre-token proxy): a cheap,
    deterministic stand-in for tokenizer-exact counts when budgeting
    100 TB corpora (real BPE merges need the vocab file; counts at
    pre-token granularity are the standard upper-bound estimate)."""
    return F.size(F.regexp_extract_all(_col(text), F.lit(SUBWORD_RE), F.lit(0))).cast("bigint")


def polyhash(s: str | Column) -> Column:
    """Polynomial rolling hash of a string -> BIGINT in [0, 1e9+7)."""
    return F.aggregate(
        F.split(_col(s), ""),
        F.lit(0).cast("bigint"),
        lambda acc, c: (acc * HASH_B + F.ascii(c)) % HASH_P,
    )


def fingerprint(text: str | Column) -> Column:
    """Document fingerprint = rolling hash of the full text."""
    return polyhash(text)


def punct_count(text: str | Column, chars: str = ".,!?;:") -> Column:
    t = _col(text)
    pattern = "[" + "".join("\\" + ch for ch in chars) + "]"
    return (F.length(t) - F.length(F.regexp_replace(t, pattern, ""))).cast("bigint")


def substr_count(text: str | Column, needle: str) -> Column:
    """Occurrences of ``needle`` via length arithmetic (identical in
    any SQL engine, no regex dialect risk)."""
    t = _col(text)
    return ((F.length(t) - F.length(F.replace(t, F.lit(needle)))) / F.lit(len(needle))).cast("bigint")


STOPWORDS = ("the", "a", "of", "and", "to")


def stopword_count(text: str | Column, stopwords=STOPWORDS) -> Column:
    """Stopword occurrences, counted as space-delimited whole words
    over the padded text (' '||text||' ')."""
    padded = F.concat(F.lit(" "), _col(text), F.lit(" "))
    total = F.lit(0).cast("bigint")
    for sw in stopwords:
        total = total + substr_count(padded, f" {sw} ")
    return total


def quality_score(text: str | Column, n_tok: Column | None = None) -> Column:
    """Composite quality in [0,1]: longer docs with moderate
    punctuation and some stopwords score higher (the classic
    Gopher/C4-style length+symbol heuristics, reduced to
    deterministic arithmetic).

    ``n_tok``: pass the doc's token count when the caller already
    projects one (token_count splits the text; sharing the projected
    column keeps the plan at one split per row — r14)."""
    t = _col(text)
    n_chr = char_count(t).cast("double")
    punct_ratio = punct_count(t).cast("double") / n_chr
    punct_score = F.lit(1.0) - F.least(punct_ratio * F.lit(4.0), F.lit(1.0))

    def body(n_tok: Column) -> Column:
        stop_ratio = stopword_count(t).cast("double") / n_tok
        len_score = F.least(n_tok / F.lit(100.0), F.lit(1.0))
        stop_score = F.least(stop_ratio * F.lit(4.0), F.lit(1.0))
        return F.when(n_chr == 0.0, F.lit(0.0)).otherwise(
            (len_score + punct_score + stop_score) / F.lit(3.0)
        )

    # token_count splits the text; it feeds two ratios -> let-bind so
    # the split runs once per row (char/punct counts are length
    # arithmetic — cheap, left inline)
    if n_tok is not None:
        return body(n_tok.cast("double"))
    return let(token_count(t).cast("double"), body)


#: language marker words (whole-word matched); scored by occurrence count
LANG_MARKERS = {
    "en": ("the", "and", "of"),
    "de": ("der", "und", "das"),
    "fr": ("le", "et", "les"),
    "es": ("el", "y", "los"),
    "zh": ("de", "shi", "le"),
}
LANG_ORDER = ("de", "en", "es", "fr", "zh")  # tie-break: alphabetical


def lang_scores(text: str | Column) -> dict[str, Column]:
    padded = F.concat(F.lit(" "), _col(text), F.lit(" "))
    out = {}
    for lang in LANG_ORDER:
        total = F.lit(0).cast("bigint")
        for m in LANG_MARKERS[lang]:
            total = total + substr_count(padded, f" {m} ")
        out[lang] = total
    return out


def lang_id(text: str | Column) -> Column:
    """n-gram/marker heuristic language ID: argmax of marker counts,
    first-in-alphabetical-order wins ties, 'und' if all zero."""
    scores = lang_scores(text)
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    for lang in reversed(LANG_ORDER):
        expr = F.when(scores[lang] == best, F.lit(lang)).otherwise(expr)
    return F.when(best == 0, F.lit("und")).otherwise(expr)


def shingles_from_words(w: Column, n: int = 3) -> Column:
    """Word n-gram shingles from an ALREADY-PROJECTED words array.

    Keep the words array behind an attribute boundary (a prior select)
    when shingling: referenced inline, the split() would be re-executed
    for every element_at below the Generate — measured ~2x slower on
    the minhash pipeline.
    """
    return F.when(F.size(w) < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(w) - F.lit(n - 1)),
            lambda i: F.concat_ws(" ", *[F.element_at(w, i + j) for j in range(n)]),
        )
    )


def shingles(text: str | Column, n: int = 3) -> Column:
    """Word n-gram shingles as strings; fewer than n words -> empty.

    The words array is let-bound (see ``let``) so the split runs once
    per row, not once per element_at under the shingle transform."""
    return let(words(text), lambda w: shingles_from_words(w, n))


def word_chunks(w: Column, size: int = 8) -> Column:
    """Non-overlapping ``size``-word chunks of a projected words array,
    each joined back to a string (the last chunk may be shorter) — the
    unit for sub-document (CCNet line-level style) dedup."""
    n_chunks = F.ceil(F.size(w) / F.lit(size)).cast("int")
    return F.when(F.size(w) == 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), n_chunks - F.lit(1)),
            lambda j: F.concat_ws(" ", F.slice(w, j * size + F.lit(1), size)),
        )
    )


def distinct_token_count(w: Column) -> Column:
    """Type count (distinct tokens) from a projected words array."""
    return F.size(F.array_distinct(w)).cast("bigint")


def top_token_freq(w: Column) -> Column:
    """Highest single-token occurrence count in a projected words
    array; 0 for empty docs. Pure HOF (array_distinct x filter) —
    O(types x tokens) per doc but entirely JVM-side with no shuffle,
    which beats an explode + two groupBys for any real doc length
    (repetitive docs have FEW types, exactly when the product is
    smallest). The repetition operator stays map-only at 100 TB."""
    return F.aggregate(
        F.array_distinct(w),
        F.lit(0).cast("bigint"),
        lambda acc, x: F.greatest(acc, F.size(F.filter(w, lambda y: y == x)).cast("bigint")),
    )


#: PII patterns restricted to the Java-regex ∩ RE2 common subset
#: (classes, bounded repeats, alternation — no lookaround/backrefs),
#: so Spark and any SQL oracle compile them identically.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
    "phone": r"\+?[0-9][0-9()\- ]{6,}[0-9]",
}
#: scrub order matters: emails before phones (digit runs inside an
#: address must not be half-redacted), ipv4 before phone likewise
PII_ORDER = ("email", "ipv4", "phone")


def pii_count(text: str | Column, kind: str) -> Column:
    """Occurrences of one PII pattern (email / ipv4 / phone)."""
    return F.size(
        F.regexp_extract_all(_col(text), F.lit(PII_PATTERNS[kind]), F.lit(0))
    ).cast("bigint")


def scrub_pii(text: str | Column) -> Column:
    """Redact PII in place: each match replaced by ``<KIND>``. The
    standard pre-training scrub pass — map-only, JVM-side regex."""
    out = _col(text)
    for kind in PII_ORDER:
        out = F.regexp_replace(out, PII_PATTERNS[kind], f"<{kind.upper()}>")
    return out


def normalize_text(text: str | Column) -> Column:
    """Canonical form for dedup/tokenization: lowercase, punctuation
    to spaces, runs of spaces collapsed, ends trimmed. ASCII-safe
    operations only, so any SQL engine mirrors it exactly."""
    t = F.lower(_col(text))
    t = F.regexp_replace(t, "[\\.\\,\\!\\?\\;\\:]", " ")
    return F.trim(F.regexp_replace(t, "  *", " "))

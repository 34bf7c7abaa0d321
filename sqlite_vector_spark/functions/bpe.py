"""Byte-pair-encoding tokenizer — a REAL merge loop, not a proxy.

``subword_token_count`` (functions/text.py) stays the oracle-gated
pre-token upper bound; this module adds vocab-exact counts: the
classic BPE algorithm (Sennrich et al. 2016, the same greedy
lowest-rank merge loop GPT-2's byte-level tokenizer runs) applied to
the SUBWORD_RE pre-tokens. Merges ride in as a driver-side ranked
pair list — a drop-in for any public ``merges.txt`` (load the file,
pass the pairs); ``train_bpe`` learns one deterministically from a
corpus sample when no published vocab is available.

Spark shape: counting/encoding runs as an Arrow-batched pandas UDF —
a stateless map-only projection fused into the scan (the merge loop
is genuinely not expressible in Catalyst: data-dependent iteration).
A per-batch memo caches encodings per distinct pre-token, so cost
scales with distinct words per batch, not token occurrences.

Determinism: training breaks frequency ties by lexicographically
smallest pair; encoding merges the lowest-rank pair first, leftmost
occurrence first. Same corpus sample -> same merges -> same counts,
on any engine.
"""

from __future__ import annotations

import re
from collections import Counter
from collections.abc import Iterable, Sequence

import pandas as pd
from pyspark.sql.functions import pandas_udf

from sqlite_vector_spark.functions.text import SUBWORD_RE

_PRETOKEN = re.compile(SUBWORD_RE)

Pair = tuple[str, str]


def _merge_seq(sym: tuple[str, ...], pair: Pair) -> tuple[str, ...]:
    """One merge pass: every non-overlapping occurrence of ``pair``
    (leftmost first) becomes a single symbol."""
    out: list[str] = []
    i = 0
    while i < len(sym):
        if i < len(sym) - 1 and sym[i] == pair[0] and sym[i + 1] == pair[1]:
            out.append(sym[i] + sym[i + 1])
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def train_bpe(texts: Iterable[str], num_merges: int) -> list[Pair]:
    """Learn a ranked merge list from a corpus sample (driver-side —
    train on a bounded sample, apply to the full corpus; the classic
    split mirroring k-means seeds or quantize params).

    Ties in pair frequency break to the lexicographically smallest
    pair so training is deterministic."""
    words: Counter[str] = Counter()
    for t in texts:
        if t:
            words.update(_PRETOKEN.findall(t))
    vocab: dict[tuple[str, ...], int] = {tuple(w): f for w, f in words.items()}
    merges: list[Pair] = []
    for _ in range(num_merges):
        pairs: Counter[Pair] = Counter()
        for sym, f in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += f
        if not pairs:
            break
        best = min(pairs, key=lambda p: (-pairs[p], p))
        merges.append(best)
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, f in vocab.items():
            merged = _merge_seq(sym, best)
            new_vocab[merged] = new_vocab.get(merged, 0) + f
        vocab = new_vocab
    return merges


def encode_word(word: str, ranks: dict[Pair, int]) -> tuple[str, ...]:
    """Greedy BPE: repeatedly merge the lowest-rank adjacent pair
    until none of the remaining pairs is in the vocab."""
    sym: tuple[str, ...] = tuple(word)
    while len(sym) > 1:
        best_rank = None
        best_pair: Pair | None = None
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (sym[i], sym[i + 1])
        if best_pair is None:
            break
        sym = _merge_seq(sym, best_pair)
    return sym


def bpe_encode_text(text: str, ranks: dict[Pair, int], cache: dict[str, tuple[str, ...]]) -> list[str]:
    toks: list[str] = []
    for w in _PRETOKEN.findall(text):
        got = cache.get(w)
        if got is None:
            got = encode_word(w, ranks)
            cache[w] = got
        toks.extend(got)
    return toks


def bpe_token_count_udf(merges: Sequence[Pair]):
    """pandas UDF: text column -> BIGINT vocab-exact token count under
    the given ranked merge list. NULL text -> 0 (no tokens)."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}

    @pandas_udf("bigint")
    def _count(col: pd.Series) -> pd.Series:
        cache: dict[str, tuple[str, ...]] = {}
        return col.map(lambda t: 0 if t is None else len(bpe_encode_text(t, ranks, cache))).astype("int64")

    return _count


def bpe_tokens_udf(merges: Sequence[Pair]):
    """pandas UDF: text column -> ARRAY<STRING> of BPE tokens."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}

    @pandas_udf("array<string>")
    def _toks(col: pd.Series) -> pd.Series:
        cache: dict[str, tuple[str, ...]] = {}
        return col.map(lambda t: [] if t is None else bpe_encode_text(t, ranks, cache))

    return _toks

"""Typo correction (SURVEY.md §2.3 T5) — normalized Damerau-Levenshtein.

Ref: TypoCorrection (src/NLP_functions.py:39-87): for each word not in
the vocabulary, compute the normalized Damerau-Levenshtein distance
(optimal-string-alignment variant, normalized by the longer length —
the pyxdameraulevenshtein semantics the reference imports) against the
whole vocab and substitute the argmin when it is <= 0.20; corrections
are memoized per word.

Scale design — the reference memoizes per-word corrections in a Python
dict; the distributed equivalent is *token deduplication*:

    tokens = corpus.select(explode(split(text))).distinct()   # Zipf-small
    fixes  = tokens (pandas UDF: argmin distance vs broadcast vocab)
    corpus = explode -> join fixes on token -> re-aggregate

Distinct tokens grow ~O(corpus^0.5) (Heaps' law), so at 100 TB the
expensive O(|token|*|vocab|) distance work runs once per *unique*
token, not once per occurrence, and the substitution itself is a plain
broadcast join. See :func:`operators.prep.correct_typos_df`.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd


def damerau_levenshtein(a: str, b: str) -> int:
    """Optimal-string-alignment Damerau-Levenshtein distance."""
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    prev2 = None
    prev = np.arange(lb + 1)
    for i in range(1, la + 1):
        cur = np.empty(lb + 1, dtype=np.int64)
        cur[0] = i
        for j in range(1, lb + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
            if (
                i > 1
                and j > 1
                and a[i - 1] == b[j - 2]
                and a[i - 2] == b[j - 1]
            ):
                cur[j] = min(cur[j], prev2[j - 2] + 1)
        prev2, prev = prev, cur
    return int(prev[lb])


def normalized_damerau_levenshtein(a: str, b: str) -> float:
    """OSA distance normalized by the longer string (0=equal, 1=disjoint)."""
    if not a and not b:
        return 0.0
    return damerau_levenshtein(a, b) / max(len(a), len(b))


def correct_token(
    word: str,
    vocab: Sequence[str],
    thresh: float = 0.20,
    vocab_set: frozenset | None = None,
) -> str:
    """Correct one token against a vocabulary (first argmin wins).

    Mirrors the reference's ``np.where(arr == np.amin(arr))[0][0]``
    first-match tie-break so corrections are deterministic. Callers in
    a loop should pass ``vocab_set=frozenset(vocab)`` once — no global
    cache (an ``id()``-keyed cache can silently serve a stale set after
    garbage collection reuses the address).
    """
    if vocab_set is None:
        vocab_set = frozenset(vocab)
    if word in vocab_set:
        return word
    best_d, best_w = None, word
    for v in vocab:
        d = normalized_damerau_levenshtein(word, v)
        if best_d is None or d < best_d:
            best_d, best_w = d, v
    if best_d is not None and best_d <= thresh:
        return best_w
    return word


def correct_typos(sentence: str, vocab: Sequence[str], thresh: float = 0.20) -> str:
    """Correct every whitespace token of a sentence (driver-side helper).

    The distributed path is ``operators.prep.correct_typos_df``; this
    exists for parity tests on small strings.
    """
    memo: dict[str, str] = {}
    vocab_set = frozenset(vocab)
    out = []
    for w in sentence.split():
        if w not in memo:
            memo[w] = correct_token(w, vocab, thresh, vocab_set=vocab_set)
        out.append(memo[w])
    return " ".join(out)


def correct_tokens_batch(
    tokens: pd.Series, vocab: Sequence[str], thresh: float = 0.20
) -> pd.Series:
    """Vectorized correction of a batch of *distinct* tokens.

    Used inside the pandas UDF of ``correct_typos_df`` — the caller
    guarantees dedup, so no memo is needed here.
    """
    vocab_set = frozenset(vocab)
    return tokens.map(
        lambda t: correct_token(t, vocab, thresh, vocab_set=vocab_set) if t else t
    )

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

import pandas as pd


def damerau_levenshtein(a: str, b: str, max_dist: int | None = None) -> int:
    """Optimal-string-alignment Damerau-Levenshtein distance.

    ``max_dist`` enables Ukkonen-style early exit: once every cell of
    a DP row exceeds it, the true distance provably does too and
    ``max_dist + 1`` is returned (rows are built from min-of-neighbors
    + costs ≥ 0, so row minima never decrease). Exact value whenever
    the result is ≤ ``max_dist``.
    """
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    prev2: list[int] | None = None
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        ai = a[i - 1]
        cur = [i] + [0] * lb
        row_min = i
        for j in range(1, lb + 1):
            cost = 0 if ai == b[j - 1] else 1
            d = prev[j - 1] + cost
            up = prev[j] + 1
            if up < d:
                d = up
            left = cur[j - 1] + 1
            if left < d:
                d = left
            if (
                i > 1
                and j > 1
                and ai == b[j - 2]
                and a[i - 2] == b[j - 1]
            ):
                t = prev2[j - 2] + 1
                if t < d:
                    d = t
            cur[j] = d
            if d < row_min:
                row_min = d
        if max_dist is not None and row_min > max_dist:
            return max_dist + 1
        prev2, prev = prev, cur
    return prev[lb]


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

    Pruning: edit distance is at least the length difference, so any
    ``v`` with ``|len(w)-len(v)| / max(len) > thresh`` has normalized
    distance above the threshold and is skipped without computing it.
    This never changes the output: a substitution happens only when
    the global argmin is ≤ thresh, and a pruned candidate can neither
    be ≤ thresh itself nor tie a candidate that is (ties at the argmin
    require equal distance). When every candidate is pruned the word
    is returned unchanged — same as an over-threshold argmin.
    """
    if vocab_set is None:
        vocab_set = frozenset(vocab)
    if word in vocab_set:
        return word
    lw = len(word)
    best_d, best_w = None, word
    for v in vocab:
        lv = len(v)
        m = lw if lw > lv else lv
        if m == 0:
            return word
        # length lower bound: d(w, v) >= |lw - lv| → normalized > thresh
        if abs(lw - lv) / m > thresh:
            continue
        # band cutoff: distances beyond the current acceptable bound
        # can neither accept nor tie an accepted argmin (see above)
        cap = int(thresh * m)
        if best_d is not None and best_d <= thresh:
            cap = min(cap, int(best_d * m))
        raw = damerau_levenshtein(word, v, max_dist=cap)
        d = raw / m
        if raw > cap:
            continue
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

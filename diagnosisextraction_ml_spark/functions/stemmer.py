"""Dutch Snowball stemmer (SURVEY.md §2.3 T4) — pure Python, no NLTK.

Implements the published Snowball "dutch" algorithm
(https://snowballstem.org/algorithms/dutch/stemmer.html), the same
algorithm NLTK's ``SnowballStemmer('dutch')`` implements — which is
what the reference applies per word (stemmingText,
src/NLP_functions.py:89-104; notebook cells 16-17, 80).

Exposed two ways:
- :func:`stem_dutch` — plain Python ``str -> str`` (unit-testable).
- :func:`stem_text_udf` — Arrow-batched pandas UDF that stems every
  whitespace-separated word of a text column. This is one of the few
  sanctioned Python paths in the engine (Spark/MLlib has no stemmer);
  it is a pure function of its input (no broadcast state), so it
  scales embarrassingly — each executor stems its own Arrow batches.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

_VOWELS = set("aeiouyè")


def _fold_input(word: str) -> str:
    """Remove umlauts/acutes per the spec's first step."""
    table = str.maketrans("äëïöüáéíóú", "aeiouaeiou")
    return word.lower().translate(table)


def _mark_consonant_ij(word: str) -> str:
    """Uppercase initial y, y after vowel, and i between vowels.

    Uppercased letters are treated as consonants by the algorithm and
    lowered again at the end.
    """
    chars = list(word)
    n = len(chars)
    for idx in range(n):
        c = chars[idx]
        if c == "y":
            if idx == 0 or chars[idx - 1].lower() in _VOWELS:
                chars[idx] = "Y"
        elif c == "i":
            if (
                0 < idx < n - 1
                and chars[idx - 1].lower() in _VOWELS
                and chars[idx + 1].lower() in _VOWELS
            ):
                chars[idx] = "I"
    return "".join(chars)


def _is_vowel(ch: str) -> bool:
    # Uppercase I/Y are consonants by construction.
    return ch in _VOWELS


def _r1_r2(word: str) -> tuple[int, int]:
    """Start offsets of regions R1 and R2 (len(word) if absent)."""

    def region_after(start: int) -> int:
        for i in range(start, len(word) - 1):
            if not _is_vowel(word[i + 1]) and _is_vowel(word[i]):
                return i + 2
        return len(word)

    r1_unadjusted = region_after(0)
    # R2 is computed from the *unadjusted* R1 — the min-3-letters
    # adjustment below applies to R1 only (e.g. 'overig': unadjusted
    # R1='erig' → R2='ig' → step-3b removes 'ig' → 'over'; computing
    # R2 from the adjusted R1 would wrongly keep the suffix).
    r2 = region_after(r1_unadjusted)
    # Spec: R1 is adjusted so that the region before it has >= 3 letters.
    r1 = max(r1_unadjusted, 3) if r1_unadjusted < len(word) else r1_unadjusted
    if r1 > len(word):
        r1 = len(word)
    return r1, r2


def _undouble(word: str) -> str:
    if word.endswith(("kk", "dd", "tt")):
        return word[:-1]
    return word


def _valid_s_ending(word: str, pos: int) -> bool:
    """Char at pos is a non-vowel other than j."""
    if pos < 0:
        return False
    ch = word[pos]
    return not _is_vowel(ch) and ch != "j"


def _valid_en_ending(word: str, pos: int) -> bool:
    """Char at pos is a non-vowel, and word[pos-2:pos+1] != 'gem'."""
    if pos < 0:
        return False
    ch = word[pos]
    if _is_vowel(ch):
        return False
    return word[max(0, pos - 2) : pos + 1] != "gem"


def stem_dutch(word: str) -> str:
    """Stem one Dutch word per the Snowball spec."""
    word = _fold_input(word)
    if not word:
        return word
    word = _mark_consonant_ij(word)
    r1, r2 = _r1_r2(word)

    # ---- Step 1: longest of heden / ene / en / se / s -------------------
    if word.endswith("heden"):
        if len(word) - 5 >= r1:
            word = word[:-5] + "heid"
    elif word.endswith("ene"):
        if len(word) - 3 >= r1 and _valid_en_ending(word, len(word) - 4):
            word = _undouble(word[:-3])
    elif word.endswith("en"):
        if len(word) - 2 >= r1 and _valid_en_ending(word, len(word) - 3):
            word = _undouble(word[:-2])
    elif word.endswith("se"):
        if len(word) - 2 >= r1 and _valid_s_ending(word, len(word) - 3):
            word = word[:-2]
    elif word.endswith("s"):
        if len(word) - 1 >= r1 and _valid_s_ending(word, len(word) - 2):
            word = word[:-1]

    # ---- Step 2: delete suffix e if in R1 and preceded by non-vowel -----
    e_removed = False
    if word.endswith("e") and len(word) - 1 >= r1 and len(word) >= 2 and not _is_vowel(word[-2]):
        word = _undouble(word[:-1])
        e_removed = True

    # ---- Step 3a: heid ---------------------------------------------------
    if word.endswith("heid") and len(word) - 4 >= r2 and (len(word) < 5 or word[-5] != "c"):
        word = word[:-4]
        if word.endswith("en") and len(word) - 2 >= r1 and _valid_en_ending(word, len(word) - 3):
            word = _undouble(word[:-2])

    # ---- Step 3b: d-suffixes (longest of end/ing/ig/lijk/baar/bar) ------
    if word.endswith(("end", "ing")):
        if len(word) - 3 >= r2:
            word = word[:-3]
            if word.endswith("ig") and len(word) - 2 >= r2 and (len(word) < 3 or word[-3] != "e"):
                word = word[:-2]
            else:
                word = _undouble(word)
    elif word.endswith("lijk"):
        if len(word) - 4 >= r2:
            word = word[:-4]
            # repeat step 2
            if (
                word.endswith("e")
                and len(word) - 1 >= r1
                and len(word) >= 2
                and not _is_vowel(word[-2])
            ):
                word = _undouble(word[:-1])
    elif word.endswith("baar"):
        if len(word) - 4 >= r2:
            word = word[:-4]
    elif word.endswith("bar"):
        if len(word) - 3 >= r2 and e_removed:
            word = word[:-3]
    elif word.endswith("ig"):
        if len(word) - 2 >= r2 and (len(word) < 3 or word[-3] != "e"):
            word = word[:-2]

    # ---- Step 4: undouble vowel (C V V D, D != I) ------------------------
    if len(word) >= 4:
        c, v1, v2, d = word[-4], word[-3], word[-2], word[-1]
        if (
            not _is_vowel(c)
            and v1 == v2
            and v1 in "aeou"
            and not _is_vowel(d)
            and d != "I"
        ):
            word = word[:-2] + word[-1]

    return word.lower()


def stem_text(sentence: str) -> str:
    """Stem every space-separated word of a sentence.

    Ref: stemmingText (src/NLP_functions.py:89-104) — splits on a
    single space and rejoins with spaces.
    """
    if sentence is None:
        return None
    return " ".join(stem_dutch(w) if w else w for w in sentence.split(" "))


@pandas_udf(StringType())
def stem_text_udf(texts: pd.Series) -> pd.Series:
    """T4 — Arrow-batched stemming of a text column."""
    return texts.map(lambda s: stem_text(s) if s is not None else None)

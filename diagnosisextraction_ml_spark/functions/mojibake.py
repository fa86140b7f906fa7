"""Mojibake repair — undo UTF-8 text mis-decoded as cp1252.

The classic web-corpus encoding wound (the ftfy problem, Speer 2019):
a UTF-8 document decoded as cp1252 turns every non-ASCII character
into a 2-3 character garble ("é" → "Ã©", "—" → "â€”"). This module
derives the repair map *from first principles* — for each target
character, the garble is ``char.encode('utf-8').decode('cp1252')`` —
instead of hand-listing sequences, then applies it as a chain of
native ``replace`` expressions (whole-stage codegen; no UDF, no
shuffle; the web-scale analog of the reference's XML-artefact repair
in functions/text.py, reference src/NLP_functions.py fixArtefacts).

Bytes 0x81/0x8D/0x8F/0x90/0x9D are undefined in strict cp1252; the
decoders that produce real-world mojibake (WHATWG windows-1252, used
by every browser) pass them through as C1 control characters, so the
garble derivation does the same — e.g. "”" (U+201D, bytes E2 80 9D)
garbles to "â€" + U+009D and is still exactly repairable. Longer
garbles are replaced first so 3-byte sequences ("â€œ") never get
half-eaten by a 2-byte rule.

Ambiguity caveat (shared with ftfy): a text that *legitimately*
contains a garble sequence — someone typed "Ã©" on purpose — is
indistinguishable from damage and gets "repaired" too. Roundtrip
``fix(garble(s)) == s`` is therefore promised exactly for inputs that
are fixed points of the repair map (property-tested in
tests/test_properties.py).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F

# Characters worth repairing: Latin-1 letters common in European text
# plus the cp1252 punctuation block (curly quotes, dashes, ellipsis).
_REPAIR_TARGETS = (
    "àáâãäåçèéêëìíîïñòóôõöùúûüýÀÁÂÃÄÅÇÈÉÊËÌÍÎÏÑÒÓÔÕÖÙÚÛÜß"
    "‘’“”–—…‰€™•«»°±²³µ¿¡§©®"
)


def _whatwg_1252(data: bytes) -> str:
    """Decode like browsers do: cp1252, undefined bytes → C1 controls."""
    out = []
    for b in data:
        try:
            out.append(bytes([b]).decode("cp1252"))
        except UnicodeDecodeError:
            out.append(chr(b))
    return "".join(out)


#: ordered (garbled, repaired) pairs, longest garble first
MOJIBAKE_MAP: list[tuple[str, str]] = sorted(
    ((_whatwg_1252(ch.encode("utf-8")), ch) for ch in _REPAIR_TARGETS),
    key=lambda p: (-len(p[0]), p[0]),
)


def fix_mojibake(col: Column | str) -> Column:
    """Chained-replace repair of the cp1252 garbles in MOJIBAKE_MAP."""
    c = F.col(col) if isinstance(col, str) else col
    return reduce(
        lambda acc, pair: F.replace(acc, F.lit(pair[0]), F.lit(pair[1])),
        MOJIBAKE_MAP,
        c,
    )


def fix_mojibake_sql(expr: str) -> str:
    """DuckDB twin: the same replacements in the same order."""
    out = expr
    for g, ch in MOJIBAKE_MAP:
        gq = g.replace("'", "''")
        cq = ch.replace("'", "''")
        out = f"replace({out}, '{gq}', '{cq}')"
    return out


def make_mojibake(text: str) -> str:
    """Garble clean text the way the bug does (for tests/fixtures)."""
    return _whatwg_1252(text.encode("utf-8"))

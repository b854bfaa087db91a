"""Snowball English ("Porter2") stemmer, pure Python.

The reference engine stems every term with Xapian's bundled Snowball
English stemmer (``Stem::new("en")``, reference ``src/main.rs:81``;
algorithm source ``xapian-core-1.4.17/languages/english.sbl`` inside
the tarball bundled at ``/root/reference/``).  This module is a
from-scratch implementation of that public algorithm, written directly
from the Snowball source (english.sbl), NOT a port of the generated C.

It is deliberately dependency-free because no stemmer package is
available in the runtime; it is called from Arrow-batched pandas UDFs
(one Python call per *unique* token batch, never per row of the
DataFrame) so raw speed is adequate.
"""

from __future__ import annotations

from functools import lru_cache

VOWELS = frozenset("aeiouy")
V_WXY = frozenset("aeiouywxY")  # v + wxY (english.sbl: `define v_WXY`)
VALID_LI = frozenset("cdeghkmnrt")
DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")

# english.sbl `exception1`
_EXCEPTION1 = {
    "skis": "ski",
    "skies": "sky",
    "dying": "die",
    "lying": "lie",
    "tying": "tie",
    "idly": "idl",
    "gently": "gentl",
    "ugly": "ugli",
    "early": "earli",
    "only": "onli",
    "singly": "singl",
    "sky": "sky",
    "news": "news",
    "howe": "howe",
    "atlas": "atlas",
    "cosmos": "cosmos",
    "bias": "bias",
    "andes": "andes",
}

# english.sbl `exception2` — stop after Step 1a
_EXCEPTION2 = frozenset(
    ["inning", "outing", "canning", "herring", "earring",
     "proceed", "exceed", "succeed"]
)

_R1_PREFIXES = ("gener", "commun", "arsen")


def _is_v(ch: str) -> bool:
    return ch in VOWELS


def _mark_regions(w: str) -> tuple[int, int]:
    """R1/R2 start offsets (english.sbl `mark_regions`)."""
    n = len(w)
    p1 = n
    for pre in _R1_PREFIXES:
        if w.startswith(pre):
            p1 = len(pre)
            break
    else:
        i = 0
        # gopast v ; gopast non-v
        while i < n and not _is_v(w[i]):
            i += 1
        i += 1
        while i < n and _is_v(w[i]):
            i += 1
        i += 1
        p1 = min(i, n)
    # p2: from p1, gopast v gopast non-v
    i = p1
    while i < n and not _is_v(w[i]):
        i += 1
    i += 1
    while i < n and _is_v(w[i]):
        i += 1
    i += 1
    p2 = min(i, n)
    return p1, p2


def _short_v(w: str, end: int) -> bool:
    """`shortv` tested with the (backward) cursor at offset ``end``.

    english.sbl: ( non-v_WXY v non-v ) or ( non-v v atlimit ),
    consuming right-to-left starting at ``end``.
    """
    if end >= 2 and w[end - 1] not in V_WXY and _is_v(w[end - 2]) \
            and (end - 3 >= 0 and not _is_v(w[end - 3])):
        return True
    if end == 2 and not _is_v(w[1]) and _is_v(w[0]):
        return True
    return False


def _step_1a(w: str) -> str:
    # try: strip 's / ' / 's'
    for suf in ("'s'", "'s", "'"):
        if w.endswith(suf):
            w = w[: -len(suf)]
            break
    if w.endswith("sses"):
        return w[:-4] + "ss"
    if w.endswith("ied") or w.endswith("ies"):
        # hop 2 <-'i' or <-'ie' : if >1 char precedes the suffix -> 'i'
        return w[:-3] + ("i" if len(w) - 3 > 1 else "ie")
    if w.endswith("us") or w.endswith("ss"):
        return w
    if w.endswith("s"):
        # `next gopast v delete`: vowel strictly before position len-2
        if any(_is_v(c) for c in w[: -2]):
            return w[:-1]
    return w


def _step_1b(w: str, p1: int) -> str:
    for suf, repl in (("eedly", "ee"), ("eed", "ee")):
        if w.endswith(suf):
            if len(w) - len(suf) >= p1:
                return w[: -len(suf)] + repl
            return w
    for suf in ("ingly", "edly", "ing", "ed"):
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if not any(_is_v(c) for c in stem):
                return w
            if stem.endswith(("at", "bl", "iz")):
                return stem + "e"
            if stem.endswith(DOUBLES):
                return stem[:-1]
            # `atmark p1 test shortv <+ 'e'` — whole remaining word is
            # exactly up to p1 and ends in a short syllable
            if p1 == len(stem) and _short_v(stem, len(stem)):
                return stem + "e"
            return stem
    return w


def _step_1c(w: str) -> str:
    # ['y' or 'Y'] non-v not-atlimit  ->  'i'
    if len(w) > 2 and w[-1] in "yY" and not _is_v(w[-2]):
        return w[:-1] + "i"
    return w


_STEP2 = [
    ("ational", "ate"),
    ("fulness", "ful"),
    ("iveness", "ive"),
    ("ization", "ize"),
    ("ousness", "ous"),
    ("biliti", "ble"),
    ("lessli", "less"),
    ("tional", "tion"),
    ("alism", "al"),
    ("aliti", "al"),
    ("ation", "ate"),
    ("entli", "ent"),
    ("fulli", "ful"),
    ("iviti", "ive"),
    ("ousli", "ous"),
    ("abli", "able"),
    ("alli", "al"),
    ("anci", "ance"),
    ("ator", "ate"),
    ("enci", "ence"),
    ("izer", "ize"),
    ("bli", "ble"),
    ("ogi", None),  # special: requires preceding 'l'
    ("li", None),   # special: requires valid_LI before
]


def _step_2(w: str, p1: int) -> str:
    for suf, repl in _STEP2:
        if w.endswith(suf):
            if len(w) - len(suf) < p1:
                return w
            if suf == "ogi":
                if w.endswith("logi"):
                    return w[:-3] + "og"
                return w
            if suf == "li":
                if len(w) >= 3 and w[-3] in VALID_LI:
                    return w[:-2]
                return w
            return w[: -len(suf)] + repl
    return w


_STEP3 = [
    ("ational", "ate"),
    ("tional", "tion"),
    ("alize", "al"),
    ("icate", "ic"),
    ("iciti", "ic"),
    ("ative", ""),  # special: R2 required
    ("ical", "ic"),
    ("ness", ""),
    ("ful", ""),
]


def _step_3(w: str, p1: int, p2: int) -> str:
    for suf, repl in _STEP3:
        if w.endswith(suf):
            if len(w) - len(suf) < p1:
                return w
            if suf == "ative":
                if len(w) - len(suf) >= p2:
                    return w[: -len(suf)]
                return w
            return w[: -len(suf)] + repl
    return w


_STEP4 = [
    "ement", "ance", "ence", "able", "ible", "ment",
    "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize", "ion",
    "al", "er", "ic",
]


def _step_4(w: str, p2: int) -> str:
    for suf in _STEP4:
        if w.endswith(suf):
            if len(w) - len(suf) < p2:
                return w
            if suf == "ion":
                if len(w) >= 4 and w[-4] in "st":
                    return w[:-3]
                return w
            return w[: -len(suf)]
    return w


def _step_5(w: str, p1: int, p2: int) -> str:
    if w.endswith("e"):
        if len(w) - 1 >= p2:
            return w[:-1]
        if len(w) - 1 >= p1 and not _short_v(w, len(w) - 1):
            return w[:-1]
        return w
    if w.endswith("l"):
        if len(w) - 1 >= p2 and len(w) >= 2 and w[-2] == "l":
            return w[:-1]
    return w


@lru_cache(maxsize=131072)
def stem(word: str) -> str:
    """Stem one already-lowercased word (Snowball English)."""
    if word in _EXCEPTION1:
        return _EXCEPTION1[word]
    if len(word) < 3:
        return word
    w = word
    # prelude
    if w.startswith("'"):
        w = w[1:]
    y_found = False
    if w.startswith("y"):
        w = "Y" + w[1:]
        y_found = True
    chars = list(w)
    for i in range(1, len(chars)):
        if chars[i] == "y" and _is_v(chars[i - 1]):
            chars[i] = "Y"
            y_found = True
    w = "".join(chars)

    p1, p2 = _mark_regions(w)
    w = _step_1a(w)
    if w in _EXCEPTION2:
        return w
    w = _step_1b(w, p1)
    w = _step_1c(w)
    w = _step_2(w, p1)
    w = _step_3(w, p1, p2)
    w = _step_4(w, p2)
    w = _step_5(w, p1, p2)
    if y_found:
        w = w.replace("Y", "y")
    return w

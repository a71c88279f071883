"""Text analysis stack: tokenizers + filter chain.

Feature-parity with the reference's vendored tantivy stack
(`cozo-core/src/fts/tokenizer/`, construction switch `fts/mod.rs:77-235`):

tokenizers: Raw, Simple, Whitespace, NGram(min,max,prefix_only),
Cangjie(kind, hmm) — Chinese segmentation falls back to per-codepoint
tokens (no jieba in this environment; the seam is pluggable);
filters: AlphaNumOnly, AsciiFolding, Lowercase, RemoveLong(n),
SplitCompoundWords(list), Stemmer(lang — Porter for English, identity
otherwise), Stopwords(lang | explicit list)."""

from __future__ import annotations

import re
import unicodedata
from dataclasses import dataclass
from typing import Iterable, List, Optional, Tuple

from ..utils.errors import QueryError


@dataclass
class Token:
    text: str
    position: int
    offset_from: int
    offset_to: int


# --- tokenizers ---------------------------------------------------------------


def tok_raw(text: str) -> List[Token]:
    return [Token(text, 0, 0, len(text))] if text else []


_SIMPLE_RE = re.compile(r"[^\W_]+", re.UNICODE)


def tok_simple(text: str) -> List[Token]:
    out = []
    for i, m in enumerate(_SIMPLE_RE.finditer(text)):
        out.append(Token(m.group(0), i, m.start(), m.end()))
    return out


def tok_whitespace(text: str) -> List[Token]:
    out = []
    pos = 0
    i = 0
    for part in re.finditer(r"\S+", text):
        out.append(Token(part.group(0), i, part.start(), part.end()))
        i += 1
    return out


def make_ngram(min_gram: int, max_gram: int, prefix_only: bool):
    if min_gram <= 0 or max_gram < min_gram:
        raise QueryError("bad NGram parameters")

    def tok(text: str) -> List[Token]:
        out = []
        pos = 0
        starts = [0] if prefix_only else range(len(text))
        for s in starts:
            for n in range(min_gram, max_gram + 1):
                if s + n > len(text):
                    break
                out.append(Token(text[s : s + n], pos, s, s + n))
                pos += 1
        return out

    return tok


def make_cangjie(kind: str = "default", hmm: bool = False):
    """Chinese segmentation seam. Without a dictionary segmenter in this
    environment, CJK runs split per codepoint (every char is a token) and
    non-CJK runs tokenize like Simple — adequate for recall-style search."""

    def is_cjk(c: str) -> bool:
        return 0x3400 <= ord(c) <= 0x9FFF or 0xF900 <= ord(c) <= 0xFAFF

    def tok(text: str) -> List[Token]:
        out = []
        pos = 0
        i = 0
        n = len(text)
        while i < n:
            c = text[i]
            if is_cjk(c):
                out.append(Token(c, pos, i, i + 1))
                pos += 1
                i += 1
            elif c.isalnum():
                j = i
                while j < n and text[j].isalnum() and not is_cjk(text[j]):
                    j += 1
                out.append(Token(text[i:j], pos, i, j))
                pos += 1
                i = j
            else:
                i += 1
        return out

    return tok


# --- filters -------------------------------------------------------------------


def flt_alpha_num_only(tokens):
    return [t for t in tokens if t.text.isalnum()]


def flt_ascii_folding(tokens):
    out = []
    for t in tokens:
        folded = unicodedata.normalize("NFKD", t.text)
        folded = "".join(c for c in folded if not unicodedata.combining(c))
        out.append(Token(folded, t.position, t.offset_from, t.offset_to))
    return out


def flt_lowercase(tokens):
    return [Token(t.text.lower(), t.position, t.offset_from, t.offset_to) for t in tokens]


def make_remove_long(limit: int):
    def f(tokens):
        return [t for t in tokens if len(t.text) < limit]

    return f


def make_split_compound(word_list: List[str]):
    words = sorted(set(word_list), key=len, reverse=True)

    def split(text: str) -> Optional[List[str]]:
        parts = []
        i = 0
        while i < len(text):
            for w in words:
                if text.startswith(w, i):
                    parts.append(w)
                    i += len(w)
                    break
            else:
                return None
        return parts

    def f(tokens):
        out = []
        for t in tokens:
            parts = split(t.text)
            if parts and len(parts) > 1:
                for p in parts:
                    out.append(Token(p, t.position, t.offset_from, t.offset_to))
            else:
                out.append(t)
        return out

    return f


# --- Porter stemmer (English) ----------------------------------------------------

_V = "aeiou"


def _is_cons(word, i):
    c = word[i]
    if c in _V:
        return False
    if c == "y":
        return i == 0 or not _is_cons(word, i - 1)
    return True


def _measure(stem):
    m = 0
    prev_vowel = False
    for i in range(len(stem)):
        cons = _is_cons(stem, i)
        if not cons:
            prev_vowel = True
        elif prev_vowel:
            m += 1
            prev_vowel = False
    return m


def _has_vowel(stem):
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def porter_stem(word: str) -> str:
    if len(word) <= 2:
        return word
    w = word

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]
    # step 1b
    flag = False
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed") and _has_vowel(w[:-2]):
        w = w[:-2]
        flag = True
    elif w.endswith("ing") and _has_vowel(w[:-3]):
        w = w[:-3]
        flag = True
    if flag:
        if w.endswith(("at", "bl", "iz")):
            w += "e"
        elif (
            len(w) >= 2
            and w[-1] == w[-2]
            and _is_cons(w, len(w) - 1)
            and w[-1] not in "lsz"
        ):
            w = w[:-1]
        elif _measure(w) == 1 and _cvc(w):
            w += "e"
    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"
    # step 2
    for suf, rep in (
        ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
        ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
        ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
        ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
        ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
    ):
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break
    # step 3
    for suf, rep in (
        ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
        ("ical", "ic"), ("ful", ""), ("ness", ""),
    ):
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break
    # step 4
    for suf in (
        "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
        "ment", "ent", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
    ):
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 1:
                w = w[: -len(suf)]
            break
    else:
        if w.endswith("ion") and len(w) > 3 and w[-4] in "st" and _measure(w[:-3]) > 1:
            w = w[:-3]
    # step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _cvc(stem)):
            w = stem
    # step 5b
    if len(w) >= 2 and w[-1] == "l" and w[-2] == "l" and _measure(w) > 1:
        w = w[:-1]
    return w


def _cvc(w):
    if len(w) < 3:
        return False
    return (
        _is_cons(w, len(w) - 3)
        and not _is_cons(w, len(w) - 2)
        and _is_cons(w, len(w) - 1)
        and w[-1] not in "wxy"
    )


def make_stemmer(lang: str = "english"):
    lang = lang.lower()
    if lang in ("english", "en"):
        def f(tokens):
            return [
                Token(porter_stem(t.text), t.position, t.offset_from, t.offset_to)
                for t in tokens
            ]
        return f
    # other languages: identity (seam for dedicated stemmers)
    return lambda tokens: list(tokens)


_EN_STOPWORDS = frozenset(
    """a an and are as at be but by for if in into is it no not of on or such
    that the their then there these they this to was will with""".split()
)


def make_stopwords(arg) -> callable:
    if isinstance(arg, str):
        words = _EN_STOPWORDS if arg.lower() in ("english", "en") else frozenset()
    else:
        words = frozenset(str(w).lower() for w in arg)

    def f(tokens):
        return [t for t in tokens if t.text.lower() not in words]

    return f


# --- analyzer construction ---------------------------------------------------------


class TextAnalyzer:
    def __init__(self, tokenize, filters) -> None:
        self.tokenize_fn = tokenize
        self.filters = filters

    def analyze(self, text: str) -> List[Token]:
        toks = self.tokenize_fn(text)
        for f in self.filters:
            toks = f(toks)
        return toks


def build_analyzer(tokenizer_spec, filter_specs) -> TextAnalyzer:
    """tokenizer_spec = (name, args); filter_specs = [(name, args), ...]
    (matches the parse of ::fts/::lsh create options)."""
    name, args = tokenizer_spec
    if name == "Raw":
        tok = tok_raw
    elif name == "Simple":
        tok = tok_simple
    elif name == "Whitespace":
        tok = tok_whitespace
    elif name == "NGram":
        min_g = int(args[0]) if len(args) > 0 else 1
        max_g = int(args[1]) if len(args) > 1 else min_g
        prefix = bool(args[2]) if len(args) > 2 else False
        tok = make_ngram(min_g, max_g, prefix)
    elif name == "Cangjie":
        kind = str(args[0]) if args else "default"
        hmm = bool(args[1]) if len(args) > 1 else False
        tok = make_cangjie(kind, hmm)
    else:
        raise QueryError(f"unknown tokenizer '{name}'")
    filters = []
    for fname, fargs in filter_specs:
        if fname == "AlphaNumOnly":
            filters.append(flt_alpha_num_only)
        elif fname == "AsciiFolding":
            filters.append(flt_ascii_folding)
        elif fname in ("LowerCase", "Lowercase"):
            filters.append(flt_lowercase)
        elif fname == "RemoveLong":
            filters.append(make_remove_long(int(fargs[0])))
        elif fname == "SplitCompoundWords":
            filters.append(make_split_compound([str(w) for w in fargs[0]]))
        elif fname == "Stemmer":
            filters.append(make_stemmer(str(fargs[0]) if fargs else "english"))
        elif fname == "Stopwords":
            filters.append(make_stopwords(fargs[0] if fargs else "english"))
        else:
            raise QueryError(f"unknown token filter '{fname}'")
    return TextAnalyzer(tok, filters)

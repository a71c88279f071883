"""18-language stemmer / 58-language stopword / jieba Cangjie parity
(reference fts/mod.rs:77-235)."""

import pytest

from cozo_tpu.fts.tokenizer import (
    STEMMER_LANGS,
    Token,
    make_cangjie,
    make_stemmer,
    make_stopwords,
    stopwords_for_lang,
)
from cozo_tpu.runtime.db import Db


def _toks(ws):
    return [Token(w, i, 0, 0) for i, w in enumerate(ws)]


def test_all_18_reference_languages_resolve():
    ref = {
        "arabic", "danish", "dutch", "english", "finnish", "french",
        "german", "greek", "hungarian", "italian", "norwegian",
        "portuguese", "romanian", "russian", "spanish", "swedish",
        "tamil", "turkish",
    }
    assert STEMMER_LANGS == ref
    for lang in ref:
        f = make_stemmer(lang)
        assert f(_toks(["test"]))  # callable end-to-end


def test_stemming_samples():
    cases = {
        "english": ("running", "run"),
        "german": ("aufeinanderfolgenden", "aufeinanderfolg"),
        "french": ("continuellement", "continuel"),
        "russian": ("следующими", "след"),
        "spanish": ("corriendo", "corr"),
        "turkish": ("kitaplarımızdan", "kitap"),
    }
    for lang, (w, want) in cases.items():
        got = make_stemmer(lang)(_toks([w]))[0].text
        assert got == want, (lang, got, want)


def test_unsupported_language_raises():
    with pytest.raises(Exception):
        make_stemmer("klingon")


def test_stopword_languages():
    for code in ("en", "de", "fr", "ru", "zh", "ja", "ar", "fi"):
        assert len(stopwords_for_lang(code)) > 30
    de = make_stopwords("de")
    kept = [t.text for t in de(_toks(["und", "haus", "der", "baum"]))]
    assert kept == ["haus", "baum"]
    custom = make_stopwords(["foo"])
    assert [t.text for t in custom(_toks(["foo", "bar"]))] == ["bar"]


def test_cangjie_jieba_segmentation():
    tok = make_cangjie("default")
    words = [t.text for t in tok("今天天气很好")]
    assert any(len(w) > 1 for w in words)  # real segmentation, not per-char
    search = make_cangjie("search")
    ws = [t.text for t in search("中华人民共和国")]
    assert "中华人民共和国" in ws and len(ws) > 1


def test_fts_german_stemmer_via_script():
    db = Db("mem")
    db.run_script(":create art {id: Int => body: String}")
    db.run_script(
        "::fts create art:ft {extractor: body, tokenizer: Simple, "
        "filters: [Lowercase, Stemmer('german'), Stopwords('de')]}"
    )
    db.run_script(
        '?[id, body] <- [[1, "Die aufeinanderfolgenden Ereignisse"], '
        '[2, "Ein ruhiger Tag"]] :put art {id => body}'
    )
    res = db.run_script(
        "?[id, s] := ~art:ft{id | query: 'aufeinanderfolgende', k: 5, bind_score: s}"
    )
    assert [r[0] for r in res.rows] == [1]
    # stopword "die" indexes nothing
    res2 = db.run_script("?[id, s] := ~art:ft{id | query: 'ereignis', k: 5, bind_score: s}")
    assert [r[0] for r in res2.rows] == [1]


def test_fts_chinese_via_script():
    db = Db("mem")
    db.run_script(":create zh {id: Int => body: String}")
    db.run_script(
        "::fts create zh:ft {extractor: body, tokenizer: Cangjie('search')}"
    )
    db.run_script(
        '?[id, body] <- [[1, "今天天气很好"], [2, "明天下雨"]] :put zh {id => body}'
    )
    res = db.run_script("?[id, s] := ~zh:ft{id | query: '天气', k: 5, bind_score: s}")
    assert [r[0] for r in res.rows] == [1]

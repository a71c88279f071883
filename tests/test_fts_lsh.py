"""FTS + MinHash-LSH tests (mirrors reference `runtime/tests.rs`
test_fts_indexing / test_lsh_indexing*)."""

import pytest

from cozo_tpu import Db
from cozo_tpu.fts.tokenizer import build_analyzer, porter_stem
from cozo_tpu.ops.minhash import find_optimal_params, hash_tokens, minhash


@pytest.fixture()
def db():
    return Db("mem")


def test_tokenizers():
    a = build_analyzer(("Simple", []), [("LowerCase", [])])
    toks = [t.text for t in a.analyze("Hello, World! Déjà vu")]
    assert toks == ["hello", "world", "déjà", "vu"]
    a = build_analyzer(("Simple", []), [("AsciiFolding", []), ("LowerCase", [])])
    assert [t.text for t in a.analyze("Déjà")] == ["deja"]
    a = build_analyzer(("NGram", [2, 3, False]), [])
    assert "ab" in [t.text for t in a.analyze("abc")]
    a = build_analyzer(("Whitespace", []), [])
    assert [t.text for t in a.analyze("a b,c")] == ["a", "b,c"]
    a = build_analyzer(("Cangjie", []), [])
    # jieba dictionary segmentation (reference Cangjie = jieba): 你好 is one word
    assert [t.text for t in a.analyze("你好world")] == ["你好", "world"]


def test_porter_stemmer():
    assert porter_stem("running") == "run"
    assert porter_stem("flies") == "fli"
    assert porter_stem("caresses") == "caress"


def test_stopwords_and_remove_long():
    a = build_analyzer(
        ("Simple", []),
        [("LowerCase", []), ("Stopwords", [["the"]]), ("RemoveLong", [8])],
    )
    toks = [t.text for t in a.analyze("The quick extraordinarily brown fox")]
    assert toks == ["quick", "brown", "fox"]


def seed_docs(db):
    db.run_script(":create docs {id: Int => body: String}")
    rows = [
        [1, "The quick brown fox jumps over the lazy dog"],
        [2, "A fast auburn fox leaped over a sleepy canine"],
        [3, "Lorem ipsum dolor sit amet"],
        [4, "The dog sleeps while the fox runs"],
    ]
    db.run_script("?[id, body] <- $rows :put docs {id => body}", {"rows": rows})


def test_fts_create_and_search(db):
    seed_docs(db)
    db.run_script(
        "::fts create docs:ft {extractor: body, tokenizer: Simple, "
        "filters: [Lowercase]}"
    )
    res = db.run_script(
        "?[id, s] := ~docs:ft{id | query: 'fox', k: 10, bind_score: s}"
    )
    ids = sorted(r[0] for r in res.rows)
    assert ids == [1, 2, 4]
    res = db.run_script("?[id] := ~docs:ft{id | query: 'fox AND dog', k: 10}")
    assert sorted(r[0] for r in res.rows) == [1, 4]
    res = db.run_script("?[id] := ~docs:ft{id | query: 'fox NOT dog', k: 10}")
    assert sorted(r[0] for r in res.rows) == [2]
    res = db.run_script("?[id] := ~docs:ft{id | query: 'lorem OR canine', k: 10}")
    assert sorted(r[0] for r in res.rows) == [2, 3]


def test_fts_prefix_and_phrase(db):
    seed_docs(db)
    db.run_script(
        "::fts create docs:ft {extractor: body, tokenizer: Simple, "
        "filters: [Lowercase]}"
    )
    res = db.run_script("?[id] := ~docs:ft{id | query: 'sle*', k: 10}")
    assert sorted(r[0] for r in res.rows) == [2, 4]
    res = db.run_script("?[id] := ~docs:ft{id | query: 'quick brown', k: 10}")
    assert [r[0] for r in res.rows] == [1]


def test_fts_maintenance(db):
    seed_docs(db)
    db.run_script(
        "::fts create docs:ft {extractor: body, tokenizer: Simple, "
        "filters: [Lowercase]}"
    )
    db.run_script("?[id, body] <- [[5, 'another fox story']] :put docs {id => body}")
    res = db.run_script("?[id] := ~docs:ft{id | query: 'fox', k: 10}")
    assert 5 in [r[0] for r in res.rows]
    db.run_script("?[id] <- [[1]] :rm docs {id}")
    res = db.run_script("?[id] := ~docs:ft{id | query: 'fox', k: 10}")
    assert 1 not in [r[0] for r in res.rows]
    # update: body change reindexes
    db.run_script("?[id, body] <- [[2, 'nothing here']] :put docs {id => body}")
    res = db.run_script("?[id] := ~docs:ft{id | query: 'fox', k: 10}")
    assert sorted(r[0] for r in res.rows) == [4, 5]


def test_fts_near(db):
    seed_docs(db)
    db.run_script(
        "::fts create docs:ft {extractor: body, tokenizer: Simple, "
        "filters: [Lowercase]}"
    )
    # doc 4: dog@1 fox@5 (distance 4); doc 1: fox@3 dog@8 (distance 5)
    res = db.run_script("?[id] := ~docs:ft{id | query: 'NEAR/4(fox dog)', k: 10}")
    assert [r[0] for r in res.rows] == [4]
    res = db.run_script("?[id] := ~docs:ft{id | query: 'NEAR/5(fox dog)', k: 10}")
    assert sorted(r[0] for r in res.rows) == [1, 4]


def test_lsh_params():
    b, r = find_optimal_params(0.8, 200, 1.0, 1.0)
    assert b * r <= 200
    assert b > 1 and r > 1


def test_minhash_similarity():
    a = hash_tokens(["a", "b", "c", "d", "e", "f"])
    b = hash_tokens(["a", "b", "c", "d", "x", "y"])
    sa, sb = minhash(a, 128), minhash(b, 128)
    import numpy as np

    est = float(np.mean(sa == sb))
    # true jaccard = 4/8 = 0.5
    assert 0.3 < est < 0.7


def test_lsh_create_and_search(db):
    seed_docs(db)
    db.run_script(
        "::lsh create docs:lsh {extractor: body, tokenizer: Simple, "
        "filters: [Lowercase], n_perm: 100, target_threshold: 0.3, n_gram: 1}"
    )
    res = db.run_script(
        "?[id] := ~docs:lsh{id | query: 'The quick brown fox jumps over the lazy dog', k: 3}"
    )
    assert 1 in [r[0] for r in res.rows]
    # near-duplicate should also surface doc 1
    res = db.run_script(
        "?[id] := ~docs:lsh{id | query: 'The quick brown fox jumps over a lazy dog', k: 3}"
    )
    assert 1 in [r[0] for r in res.rows]


def test_lsh_maintenance(db):
    seed_docs(db)
    db.run_script(
        "::lsh create docs:lsh {extractor: body, tokenizer: Simple, "
        "filters: [Lowercase], n_perm: 100, target_threshold: 0.3, n_gram: 1}"
    )
    db.run_script("?[id] <- [[1]] :rm docs {id}")
    res = db.run_script(
        "?[id] := ~docs:lsh{id | query: 'The quick brown fox jumps over the lazy dog', k: 5}"
    )
    assert 1 not in [r[0] for r in res.rows]


def test_lsh_self_similarity_full_pipeline(db):
    db.run_script(":create sents {id: Int => t: String}")
    rows = [[i, f"sentence number {i} about topic {i % 3}"] for i in range(30)]
    db.run_script("?[id, t] <- $rows :put sents {id => t}", {"rows": rows})
    db.run_script(
        "::lsh create sents:l {extractor: t, tokenizer: Simple, "
        "filters: [Lowercase], n_perm: 64, target_threshold: 0.5, n_gram: 1}"
    )
    res = db.run_script(
        "?[id] := ~sents:l{id | query: 'sentence number 7 about topic 1', k: 1}"
    )
    assert res.rows[0][0] == 7


# --- device / bulk minhash parity (VERDICT r2 next #3) ---------------------


def test_minhash_device_bit_identical():
    """TPU segment-min signatures must be bit-identical to the host
    numpy path (empty docs first/interior/trailing, d_pad==n_docs tail)."""
    import numpy as np

    from cozo_tpu.ops.minhash import (
        minhash_segments,
        minhash_segments_device,
        minhash_segments_dispatch,
    )

    rng = np.random.default_rng(0)
    lens = [0, 5, 0, 17, 3, 0, 9, 1, 0]
    offs, flat = [], []
    pos = 0
    for L in lens:
        offs.append(pos)
        flat.extend(rng.integers(0, 1 << 32, L, dtype=np.uint64).astype(np.uint32))
        pos += L
    flat = np.array(flat, np.uint32)
    offs = np.array(offs, np.int64)
    try:
        dev = minhash_segments_device(flat, offs, 64)
    except Exception:
        import pytest

        pytest.skip("no jax device available")
    assert (minhash_segments(flat, offs, 64) == dev).all()

    n = 1024  # == d_pad: exercises the tail-doc host recompute
    lens = rng.integers(1, 8, n)
    offs = np.concatenate([[0], np.cumsum(lens[:-1])]).astype(np.int64)
    flat = rng.integers(0, 1 << 32, int(lens.sum()), dtype=np.uint64).astype(np.uint32)
    assert (
        minhash_segments(flat, offs, 32)
        == minhash_segments_device(flat, offs, 32)
    ).all()
    fut = minhash_segments_dispatch(flat, offs, 32)
    assert (fut.get() == minhash_segments(flat, offs, 32)).all()


def test_minhash_host_tiling_parity():
    import numpy as np

    from cozo_tpu.ops.minhash import (
        _minhash_segments_block,
        hash_tokens,
        hash_tokens_dedup,
        minhash_segments,
    )

    rng = np.random.default_rng(1)
    n = 33_000  # forces multiple ~32K-token tiles
    lens = rng.integers(0, 25, n)
    offs = np.concatenate([[0], np.cumsum(lens[:-1])]).astype(np.int64)
    flat = rng.integers(0, 1 << 32, int(lens.sum()), dtype=np.uint64).astype(np.uint32)
    assert (
        minhash_segments(flat, offs, 128)
        == _minhash_segments_block(flat, offs, 128)
    ).all()
    toks = ["tok%d" % (i % 97) for i in range(5000)] + ["", "a"]
    assert (hash_tokens(toks) == hash_tokens_dedup(toks)).all()


def test_analyze_texts_batch_parity():
    from cozo_tpu.fts.tokenizer import build_analyzer

    an = build_analyzer(
        ("Simple", []), [("LowerCase", []), ("Stemmer", ["english"])]
    )
    texts = ["The Quick brown foxes JUMPED", "", "running runs ran\nnewline doc",
             "a_b c-d"]
    assert an.analyze_texts(texts) == [
        [t.text for t in an.analyze(x)] for x in texts
    ]
    an2 = build_analyzer(("Whitespace", []), [])
    assert an2.analyze_texts(texts) == [
        [t.text for t in an2.analyze(x)] for x in texts
    ]
    # non-fast-path tokenizer falls back to per-doc analyze
    an3 = build_analyzer(("NGram", [2, 3]), [])
    assert an3.analyze_texts(["abcd"]) == [[t.text for t in an3.analyze("abcd")]]


def test_lsh_bulk_backfill_matches_incremental(db):
    """Backfill (bulk/pipelined path) and per-row maintenance must index
    identically: a doc inserted after ::lsh create must be found exactly
    like one indexed during backfill."""
    db.run_script(":create bk {id: Int => t: String}")
    rows = [[i, f"alpha beta gamma delta {i % 5}"] for i in range(200)]
    db.run_script("?[id, t] <- $rows :put bk {id => t}", {"rows": rows})
    db.run_script(
        "::lsh create bk:l {extractor: t, tokenizer: Simple, "
        "filters: [Lowercase], n_perm: 64, target_threshold: 0.5, n_gram: 1}"
    )
    db.run_script(
        "?[id, t] <- [[999, 'alpha beta gamma delta 99']] :put bk {id => t}"
    )
    res = db.run_script(
        "?[id, s] := ~bk:l{id | query: 'alpha beta gamma delta 99', k: 3, "
        "bind_similarity: s}"
    )
    assert [999, 1.0] in res.rows  # exact self-match via the incremental path


def test_lsh_serving_image_nondividing_band_params(db):
    """n_perm=128 at threshold 0.7 auto-tunes to 14 bands x 9 rows = 126
    of 128 perms; the vectorized serving image must band over the same
    first n_bands*rpb signature rows as the KV path instead of failing
    the reshape and silently degrading (r5 regression: every 1M-doc
    query fell back to the single-core KV probe)."""
    import numpy as np

    from cozo_tpu.ops.minhash import band_keys, find_optimal_params
    from cozo_tpu.runtime.minhash_lsh import _band_fold
    from cozo_tpu.utils import fallback

    n_bands, rpb = find_optimal_params(0.7, 128, 0.5, 0.5)
    assert n_bands * rpb < 128  # the shape that used to crash
    sigs = np.random.default_rng(0).integers(
        0, 1 << 32, size=(64, 128), dtype=np.uint64
    ).astype(np.uint32)
    folded = _band_fold(sigs, n_bands, rpb)
    assert folded.shape == (64, n_bands)
    # fold equivalence with the KV band keys: equal band bytes <-> equal
    # band hash (sigs 0 and 1 made identical in band 3)
    sigs[1, 3 * rpb : 4 * rpb] = sigs[0, 3 * rpb : 4 * rpb]
    f2 = _band_fold(sigs, n_bands, rpb)
    kv0 = band_keys(sigs[0], n_bands, rpb)
    kv1 = band_keys(sigs[1], n_bands, rpb)
    for b in range(n_bands):
        assert (kv0[b] == kv1[b]) == (f2[0, b] == f2[1, b])

    seed_docs(db)
    db.run_script(
        "::lsh create docs:lsh {extractor: body, tokenizer: Simple, "
        "filters: [Lowercase], n_perm: 128, target_threshold: 0.7, n_gram: 1}"
    )
    before = fallback.counts().get("lsh.serving_image", 0)
    res = db.run_script(
        "?[id] := ~docs:lsh{id | query: 'The quick brown fox jumps over "
        "the lazy dog', k: 3}"
    )
    assert 1 in [r[0] for r in res.rows]
    assert fallback.counts().get("lsh.serving_image", 0) == before

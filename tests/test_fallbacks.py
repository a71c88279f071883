"""Loud serving fallbacks (VERDICT r3 weak #4): a forced device failure
must produce a visible marker (stderr line + ::fallbacks counter), not a
silent slowdown."""

import numpy as np

from cozo_tpu.utils import fallback


def test_record_counts_and_logs_once(capsys):
    fallback.reset()
    fallback.record("test.site", RuntimeError("boom"))
    fallback.record("test.site", RuntimeError("boom2"))
    assert fallback.counts() == {"test.site": 2}
    err = capsys.readouterr().err
    assert err.count("FALLBACK") == 1
    assert "test.site" in err
    fallback.reset()


def test_forced_sweep_failure_is_visible(monkeypatch, capsys):
    from cozo_tpu.models.hnsw_index import HnswIndex
    import cozo_tpu.ops.exact_knn as ek

    fallback.reset()

    def boom(*a, **k):
        raise RuntimeError("forced device failure")

    monkeypatch.setattr(ek, "sweep_search", boom)
    rng = np.random.default_rng(0)
    data = rng.standard_normal((512, 16)).astype(np.float32)
    idx = HnswIndex(dim=16, m=8, ef_construction=32, distance="Cosine")
    idx.bulk_build(data, wave=512)
    ids, _ = idx.search(data[:4], 5, 32, use_tpu=True)
    assert (ids >= 0).all()  # host path still answers
    assert fallback.counts().get("hnsw.exact_sweep", 0) >= 1
    assert "hnsw.exact_sweep" in capsys.readouterr().err
    fallback.reset()


def test_fallbacks_sysop(monkeypatch):
    from cozo_tpu.runtime.db import Db

    fallback.reset()
    fallback.record("some.site", ValueError("x"))
    db = Db("mem")
    out = db.run_script("::fallbacks")
    rows = {r[0]: (r[1], r[2]) for r in out.rows}
    assert rows["some.site"][0] == 1
    assert "ValueError" in rows["some.site"][1]
    fallback.reset()

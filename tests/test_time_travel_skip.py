"""Seek-based time-travel skip-scan (VERDICT r1 missing #8): deep
histories cost O(log n) seeks per key group, not O(history) row visits."""

import pytest

from cozo_tpu.runtime.db import Db
from cozo_tpu.storage.base import StoreTx


@pytest.fixture
def db():
    db = Db("mem")
    db.run_script(":create hist {k: Int, vld: Validity => v: Int}")
    rows = []
    for k in range(50):
        for ts in range(200):  # 200 history entries per key
            rows.append([k, [ts * 10, ts % 3 != 2], k * 1000 + ts])
    db.run_script(
        "?[k, vld, v] <- $rows :put hist {k, vld => v}", params={"rows": rows}
    )
    return db


def test_time_travel_correctness(db):
    # at ts=995: newest entry per key has ts=990 (idx 99); 99 % 3 == 0 -> assert
    res = db.run_script("?[k, v] := *hist{k, v @ 995}")
    assert len(res.rows) == 50
    assert all(v == k * 1000 + 99 for k, v in res.rows)
    # at ts=25: newest <= 25 is ts=20 (idx 2), 2 % 3 == 2 -> retracted
    res2 = db.run_script("?[k, v] := *hist{k, v @ 25}")
    assert res2.rows == []
    # at ts=15: idx 1 asserts
    res3 = db.run_script("?[k, v] := *hist{k, v @ 15}")
    assert len(res3.rows) == 50 and all(v == k * 1000 + 1 for k, v in res3.rows)


def test_skip_scan_does_not_visit_history(db, monkeypatch):
    calls = {"n": 0}
    orig = StoreTx.seek_first

    def counting(self, lo, hi):
        calls["n"] += 1
        return orig(self, lo, hi)

    # route every engine override through the counter
    from cozo_tpu.storage.mem import MemTx

    orig_mem = MemTx.seek_first

    def counting_mem(self, lo, hi):
        calls["n"] += 1
        return orig_mem(self, lo, hi)

    monkeypatch.setattr(MemTx, "seek_first", counting_mem)
    res = db.run_script("?[k, v] := *hist{k, v @ 995}")
    assert len(res.rows) == 50
    # <= ~2 seeks per key group + 1 terminal (vs 10000 row visits before)
    assert 0 < calls["n"] <= 2 * 50 + 2, calls["n"]

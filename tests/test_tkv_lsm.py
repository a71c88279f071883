"""LSM behavior of the native tkv engine: flushes to SST files, tiered
compaction, reads/scans/conflicts spanning levels, restart recovery.

Reference scope anchor: cozorocks wraps RocksDB (memtable + WAL + SST
levels, cozorocks/bridge/db.cpp); tkv.cpp implements the same shape.
"""

import glob
import os
import signal
import subprocess
import sys
import textwrap

import pytest

from cozo_tpu.runtime.db import Db
from cozo_tpu.storage.tkv import TkvStorage
from cozo_tpu.utils.errors import CozoError


def _store(tmp_path, name="t.db", flush=None):
    s = TkvStorage(str(tmp_path / name))
    if flush is not None:
        s.set_flush_bytes(flush)
    return s


def _put_many(store, items):
    tx = store.transact(write=True)
    for k, v in items:
        tx.put(k, v)
    tx.commit()


def _scan(store, lo=b"", hi=b"\xff" * 9):
    tx = store.transact(write=False)
    try:
        return list(tx.range_scan(lo, hi))
    finally:
        tx.abort()


def test_flush_creates_sst_and_reads_span_levels(tmp_path):
    s = _store(tmp_path, flush=1)  # flush after every commit
    _put_many(s, [(b"a%03d" % i, b"v%d" % i) for i in range(100)])
    _put_many(s, [(b"b%03d" % i, b"w%d" % i) for i in range(100)])
    assert glob.glob(str(tmp_path / "t.db.sst.*")), "no SST files written"
    # point gets from SSTs
    tx = s.transact(write=False)
    assert tx.get(b"a050") == b"v50"
    assert tx.get(b"b099") == b"w99"
    assert tx.get(b"zzz") is None
    tx.abort()
    # merged scan across memtable + 2 SSTs
    rows = _scan(s)
    assert len(rows) == 200
    assert rows[0] == (b"a000", b"v0") and rows[-1] == (b"b099", b"w99")
    s.close()


def test_shadowing_update_and_delete_across_flush(tmp_path):
    s = _store(tmp_path, flush=1)
    _put_many(s, [(b"k1", b"old"), (b"k2", b"keep"), (b"k3", b"gone")])
    # k1 overwritten and k3 deleted in a newer level
    tx = s.transact(write=True)
    tx.put(b"k1", b"new")
    tx.delete(b"k3")
    tx.commit()
    tx = s.transact(write=False)
    assert tx.get(b"k1") == b"new"
    assert tx.get(b"k3") is None
    tx.abort()
    assert _scan(s) == [(b"k1", b"new"), (b"k2", b"keep")]
    # reverse scan sees the same shadowing
    tx = s.transact(write=False)
    rows = list(tx.range_scan_rev(b"", b"\xff" * 9))
    tx.abort()
    assert rows == [(b"k2", b"keep"), (b"k1", b"new")]
    s.close()


def test_tiered_compaction_keeps_data(tmp_path):
    s = _store(tmp_path, flush=1)
    # >6 flushes triggers auto-compaction of the SST tier
    for wave in range(10):
        _put_many(s, [(b"w%02d-%03d" % (wave, i), b"x" * 20) for i in range(50)])
    ssts = glob.glob(str(tmp_path / "t.db.sst.*"))
    assert len(ssts) <= 7, f"compaction did not bound SST count: {ssts}"
    assert len(_scan(s)) == 500
    s.close()


def test_restart_recovers_ssts_and_wal(tmp_path):
    s = _store(tmp_path, flush=1)
    _put_many(s, [(b"flushed", b"1")])  # lands in an SST
    s.set_flush_bytes(1 << 30)
    _put_many(s, [(b"walonly", b"2")])  # stays in WAL + memtable
    s.close()
    s2 = _store(tmp_path)
    assert _scan(s2) == [(b"flushed", b"1"), (b"walonly", b"2")]
    # seq resumed past SST seqs: a new write must win over old data
    _put_many(s2, [(b"flushed", b"3")])
    tx = s2.transact(write=False)
    assert tx.get(b"flushed") == b"3"
    tx.abort()
    s2.close()


def test_conflict_detection_spans_levels(tmp_path):
    s = _store(tmp_path, flush=1)
    _put_many(s, [(b"acct", b"100")])
    # tx A snapshots, then tx B commits an update that gets flushed to SST
    txa = s.transact(write=True)
    assert txa.get(b"acct", for_update=True) == b"100"
    txb = s.transact(write=True)
    txb.put(b"acct", b"50")
    txb.commit()  # flush=1: lands in an SST immediately
    txa.put(b"acct", b"90")
    with pytest.raises(Exception):
        txa.commit()
    s.close()


def test_delete_conflict_survives_flush(tmp_path):
    s = _store(tmp_path, flush=1)
    _put_many(s, [(b"row", b"v")])
    txa = s.transact(write=True)
    assert txa.get(b"row", for_update=True) == b"v"
    txb = s.transact(write=True)
    txb.delete(b"row")
    txb.commit()  # tombstone flushed into an SST
    txa.put(b"row", b"resurrect")
    with pytest.raises(Exception):
        txa.commit()
    s.close()


def test_explicit_compact_drops_tombstones_keeps_live(tmp_path):
    s = _store(tmp_path, flush=1)
    _put_many(s, [(b"k%03d" % i, b"v") for i in range(100)])
    tx = s.transact(write=True)
    for i in range(0, 100, 2):
        tx.delete(b"k%03d" % i)
    tx.commit()
    s.range_compact(b"", b"\xff")
    assert len(_scan(s)) == 50
    ssts = glob.glob(str(tmp_path / "t.db.sst.*"))
    assert len(ssts) == 1, ssts
    # WAL truncated after compaction folds everything into the SST
    assert os.path.getsize(tmp_path / "t.db") == 0
    s.close()
    s2 = _store(tmp_path)
    assert len(_scan(s2)) == 50
    s2.close()


def test_db_level_queries_across_flushes(tmp_path):
    d = Db("tkv", str(tmp_path / "q.db"))
    d.storage.set_flush_bytes(4096)
    d.run_script(":create kv {k: Int => v: String}")
    payload = "x" * 100
    for s in range(0, 5000, 500):
        d.run_script(
            "?[k,v] <- $rows :put kv {k => v}",
            params={"rows": [[i, payload + str(i)] for i in range(s, s + 500)]},
        )
    assert glob.glob(str(tmp_path / "q.db.sst.*"))
    r = d.run_script("?[count(k)] := *kv{k}")
    assert r.rows == [[5000]]
    r = d.run_script("?[v] := *kv{k: 4321, v}")
    assert r.rows == [[payload + "4321"]]
    # ordered scan through levels
    r = d.run_script("?[k] := *kv{k}, k < 10 :order -k :limit 3")
    assert r.rows == [[9], [8], [7]]
    d.close()
    d2 = Db("tkv", str(tmp_path / "q.db"))
    assert d2.run_script("?[count(k)] := *kv{k}").rows == [[5000]]
    d2.close()


def test_kill9_recovery_with_ssts(tmp_path):
    """SIGKILL mid-stream: WAL + SSTs recover to a consistent prefix."""
    script = textwrap.dedent(f"""
        import os, sys
        sys.path.insert(0, {str(os.getcwd())!r})
        from cozo_tpu.storage.tkv import TkvStorage
        s = TkvStorage({str(tmp_path / "crash.db")!r}, sync_mode=1)
        s.set_flush_bytes(2048)
        for wave in range(1000):
            tx = s.transact(write=True)
            for i in range(20):
                tx.put(b"w%04d-%02d" % (wave, i), b"y" * 40)
            tx.commit()
            print(wave, flush=True)
    """)
    proc = subprocess.Popen(
        [sys.executable, "-c", script],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        cwd=os.getcwd(),
    )
    waves_seen = 0
    for line in proc.stdout:
        waves_seen = int(line.strip())
        if waves_seen >= 40:
            os.kill(proc.pid, signal.SIGKILL)
            break
    proc.wait()
    assert waves_seen >= 40
    s = TkvStorage(str(tmp_path / "crash.db"))
    rows = _scan(s)
    # every fully-reported wave must be present and complete
    by_wave = {}
    for k, _ in rows:
        by_wave.setdefault(k[:5], []).append(k)
    for w in range(waves_seen):  # waves printed before the kill
        key = b"w%04d" % w
        assert len(by_wave.get(key, [])) == 20, f"wave {w} incomplete"
    s.close()

"""plog engine (reference `sled` analog): persistence, journal replay,
compaction, torn-tail crash recovery, SIGKILL durability, Db e2e."""

import os
import signal
import struct
import subprocess
import sys

from cozo_tpu.storage.plog import PlogStorage


def _put_rows(s, lo, hi):
    tx = s.transact(write=True)
    for i in range(lo, hi):
        tx.put(b"k%06d" % i, b"v%d" % i)
    tx.commit()


def test_reopen_replays_journal(tmp_path):
    p = str(tmp_path / "d")
    s = PlogStorage(p, sync_mode=0)
    _put_rows(s, 0, 100)
    tx = s.transact(write=True)
    tx.delete(b"k000050")
    tx.commit()
    # do NOT close (no snapshot): reopen must replay the journal
    s._wal.flush()
    s2 = PlogStorage(p, sync_mode=0)
    rd = s2.transact()
    assert rd.get(b"k000010") == b"v10"
    assert rd.get(b"k000050") is None
    assert rd.range_count(b"k", b"l") == 99
    s2.close()


def test_close_compacts_and_reopens(tmp_path):
    p = str(tmp_path / "d")
    s = PlogStorage(p)
    _put_rows(s, 0, 500)
    s.close()
    assert os.path.getsize(os.path.join(p, "journal.plog")) == 0
    assert os.path.getsize(os.path.join(p, "snapshot.plog")) > 0
    s2 = PlogStorage(p)
    rd = s2.transact()
    assert rd.range_count(b"k", b"l") == 500
    s2.close()


def test_torn_tail_frame_dropped(tmp_path):
    p = str(tmp_path / "d")
    s = PlogStorage(p, sync_mode=0)
    _put_rows(s, 0, 50)
    s._wal.flush()
    # simulate a crash mid-append: garbage half-frame at the tail
    with open(os.path.join(p, "journal.plog"), "ab") as f:
        f.write(struct.pack("<I", 3) + struct.pack("<Ii", 10, 100) + b"short")
    s2 = PlogStorage(p, sync_mode=0)
    rd = s2.transact()
    assert rd.range_count(b"k", b"l") == 50  # intact frames survive
    # and the torn tail was truncated away so new commits append cleanly
    _put_rows(s2, 50, 60)
    s3 = PlogStorage(p, sync_mode=0)
    assert s3.transact().range_count(b"k", b"l") == 60
    s3.close()
    s2.close()


def test_del_range_durable(tmp_path):
    p = str(tmp_path / "d")
    s = PlogStorage(p, sync_mode=0)
    _put_rows(s, 0, 100)
    s.del_range(b"k000020", b"k000030")
    s._wal.flush()
    s2 = PlogStorage(p, sync_mode=0)
    assert s2.transact().range_count(b"k", b"l") == 90
    s2.close()


def test_compaction_triggered_by_journal_growth(tmp_path):
    p = str(tmp_path / "d")
    s = PlogStorage(p, sync_mode=0)
    big = b"x" * 65536
    for i in range(80):  # ~5MB of journal > 4MB + 4*0 threshold
        tx = s.transact(write=True)
        tx.put(b"big%04d" % i, big)
        tx.commit()
    assert os.path.getsize(os.path.join(p, "snapshot.plog")) > 0
    s2 = PlogStorage(p, sync_mode=0)
    assert s2.transact().range_count(b"big", b"bih") == 80
    s2.close()


def test_sigkill_durability(tmp_path):
    """Every ACKed fsync'd commit must survive SIGKILL."""
    p = str(tmp_path / "crash")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = f"""
import sys
sys.path.insert(0, {root!r})
from cozo_tpu.storage.plog import PlogStorage
s = PlogStorage({p!r}, sync_mode=1)
i = 0
while True:
    tx = s.transact(write=True)
    tx.put(b"row%08d" % i, b"v%d" % i)
    tx.commit()
    print(i, flush=True)
    i += 1
"""
    child = subprocess.Popen(
        [sys.executable, "-c", code], stdout=subprocess.PIPE, text=True
    )
    acked = -1
    for line in child.stdout:
        acked = int(line)
        if acked >= 300:
            break
    os.kill(child.pid, signal.SIGKILL)
    child.wait()

    s = PlogStorage(p)
    rd = s.transact()
    for i in range(acked + 1):
        assert rd.get(b"row%08d" % i) == b"v%d" % i, f"lost committed row {i}"
    s.close()


def test_db_end_to_end_over_plog(tmp_path):
    from cozo_tpu.runtime.db import Db

    p = str(tmp_path / "db")
    db = Db("plog", p)
    db.run_script(":create kv {k: Int => v: String}")
    db.run_script("?[k, v] <- [[1, 'a'], [2, 'b']] :put kv {k => v}")
    db.storage.close()

    db2 = Db("plog", p)
    out = db2.run_script("?[k, v] := *kv{k, v}")
    assert out.rows == [[1, "a"], [2, "b"]]
    db2.storage.close()

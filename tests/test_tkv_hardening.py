"""tkv durability & concurrency hardening (VERDICT r1 #10): deletion
conflicts via tombstones, crash recovery (SIGKILL mid-stream), stable
iterators across commits and tombstone GC."""

import os
import signal
import subprocess
import sys

import pytest

from cozo_tpu.storage.tkv import TkvStorage


def test_delete_conflict_detected():
    """A key read with for_update then deleted by a concurrent commit must
    fail the reader's commit (tombstone carries the delete's mod_seq)."""
    s = TkvStorage("")
    init = s.transact(write=True)
    init.put(b"k", b"v0")
    init.commit()

    reader = s.transact(write=True)
    assert reader.get(b"k", for_update=True) == b"v0"
    deleter = s.transact(write=True)
    deleter.delete(b"k")
    deleter.commit()
    reader.put(b"other", b"x")
    with pytest.raises(Exception):
        reader.commit()
    s.close()


def test_iterator_sees_consistent_data_across_commits():
    s = TkvStorage("")
    tx = s.transact(write=True)
    for i in range(1000):
        tx.put(b"k%04d" % i, b"v%d" % i)
    tx.commit()
    rd = s.transact()
    it = rd.range_scan(b"k", b"l")
    got = [next(it) for _ in range(10)]
    # concurrent commit deleting some later keys + adding new ones
    w = s.transact(write=True)
    for i in range(500, 600):
        w.delete(b"k%04d" % i)
    w.put(b"k9999", b"new")
    w.commit()
    rest = list(it)
    keys = [k for k, _ in got] + [k for k, _ in rest]
    assert keys == sorted(set(keys)), "iterator went backwards or duplicated"
    # deleted range is gone, new key present (read-committed iteration)
    assert b"k0550" not in keys
    assert keys[-1] == b"k9999"
    s.close()


def test_tombstone_gc_keeps_scans_correct():
    s = TkvStorage("")
    tx = s.transact(write=True)
    for i in range(10000):
        tx.put(b"g%05d" % i, b"v")
    tx.commit()
    d = s.transact(write=True)
    for i in range(9000):
        d.delete(b"g%05d" % i)
    d.commit()  # triggers tombstone GC (n_dead > n_live)
    rd = s.transact()
    rows = list(rd.range_scan(b"g", b"h"))
    assert len(rows) == 1000
    assert rows[0][0] == b"g09000"
    s.close()


def test_crash_recovery_sigkill(tmp_path):
    """Child commits rows one-by-one, reporting each ACKed commit, then is
    SIGKILLed. Every ACKed commit must be present after reopen."""
    path = str(tmp_path / "crash.tkv")
    code = f"""
import sys
sys.path.insert(0, {repr(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))})
from cozo_tpu.storage.tkv import TkvStorage
s = TkvStorage({path!r}, sync_mode=1)
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
        if acked >= 500:
            break
    os.kill(child.pid, signal.SIGKILL)
    child.wait()

    s = TkvStorage(path)
    rd = s.transact()
    for i in range(acked + 1):
        assert rd.get(b"row%08d" % i) == b"v%d" % i, f"lost committed row {i}"
    s.close()

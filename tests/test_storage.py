import pytest

from cozo_tpu.storage.mem import MemStorage
from cozo_tpu.storage.sqlite import SqliteStorage


@pytest.fixture(params=["mem", "sqlite", "tkv", "tkv_mem", "plog", "remote"])
def store(request, tmp_path):
    if request.param == "mem":
        yield MemStorage()
    elif request.param == "sqlite":
        s = SqliteStorage(str(tmp_path / "t.db"))
        yield s
        s.close()
    elif request.param == "tkv":
        from cozo_tpu.storage.tkv import TkvStorage

        s = TkvStorage(str(tmp_path / "t.tkv"))
        yield s
        s.close()
    elif request.param == "plog":
        from cozo_tpu.storage.plog import PlogStorage

        s = PlogStorage(str(tmp_path / "t.plog"))
        yield s
        s.close()
    elif request.param == "remote":
        from cozo_tpu.storage.remote import KvServer, RemoteStorage

        srv = KvServer(MemStorage())
        srv.start_background()
        s = RemoteStorage(f"{srv.addr[0]}:{srv.addr[1]}")
        yield s
        s.close()
        srv.shutdown()
    else:
        from cozo_tpu.storage.tkv import TkvStorage

        s = TkvStorage("")
        yield s
        s.close()


def test_basic_kv(store):
    tx = store.transact(write=True)
    tx.put(b"a", b"1")
    tx.put(b"b", b"2")
    tx.put(b"c", b"3")
    tx.delete(b"b")
    assert tx.get(b"a") == b"1"
    assert tx.get(b"b") is None
    tx.commit()

    rd = store.transact()
    assert rd.get(b"a") == b"1"
    assert rd.get(b"b") is None
    assert list(rd.range_scan(b"a", b"d")) == [(b"a", b"1"), (b"c", b"3")]
    assert list(rd.range_scan_rev(b"a", b"d")) == [(b"c", b"3"), (b"a", b"1")]
    assert rd.range_count(b"a", b"d") == 2


def test_overlay_scan_merge(store):
    store.batch_put([(b"k1", b"v1"), (b"k3", b"v3"), (b"k5", b"v5")])
    tx = store.transact(write=True)
    tx.put(b"k2", b"v2")
    tx.put(b"k3", b"v3x")
    tx.delete(b"k5")
    got = list(tx.range_scan(b"k0", b"k9"))
    assert got == [(b"k1", b"v1"), (b"k2", b"v2"), (b"k3", b"v3x")]
    got_rev = list(tx.range_scan_rev(b"k0", b"k9"))
    assert got_rev == list(reversed(got))
    tx.abort()
    rd = store.transact()
    assert list(rd.range_scan(b"k0", b"k9")) == [
        (b"k1", b"v1"),
        (b"k3", b"v3"),
        (b"k5", b"v5"),
    ]


def test_del_range(store):
    store.batch_put([(bytes([i]), b"x") for i in range(10)])
    store.del_range(bytes([2]), bytes([5]))
    rd = store.transact()
    keys = [k for k, _ in rd.range_scan(bytes([0]), bytes([10]))]
    assert keys == [bytes([i]) for i in [0, 1, 5, 6, 7, 8, 9]]

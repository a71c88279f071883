"""Remote ordered-KV storage engine — the reference's distributed-`tikv`
analog (`/root/reference/cozo-core/src/storage/tikv.rs:28-207`).

A `RemoteStorage` client speaks a compact length-prefixed binary protocol
over TCP to a `KvServer` that wraps any local engine (mem / sqlite /
tkv).  Semantics mirror the reference engine's shape:

  - scans are *batched with a re-seek cursor* (the reference's
    `BatchScannerRaw`, `tikv.rs:209-296`, pulls 1000-key batches) so one
    round trip serves many rows and iteration state lives client-side;
  - writes buffer client-side and ship as one batch at commit
    (`tikv.rs:110-129` buffers in the tikv txn; ours in an overlay like
    `storage/tkv.py`);
  - optimistic conflict detection: `get(for_update=True)` records an
    8-byte fingerprint of the value seen; at commit the server re-reads
    those keys under the global write mutex and rejects the batch if any
    changed (lost-update + delete-after-snapshot protection — stronger
    than the reference's tikv path, which delegates to TiKV percolator).

Like the reference (README flags tikv as orders-of-magnitude slower for
traversals), this engine trades per-op latency for shared remote state;
the Db layers' plan/handle caches and batched scans keep it usable.

Server CLI: ``python -m cozo_tpu.hosts.kvserver --engine tkv --path d``.
"""

from __future__ import annotations

import hashlib
import socket
import socketserver
import struct
import threading
from typing import Iterator, Optional, Tuple

from .base import ConflictError, StorageError, Storage, StoreTx

# -- wire format -------------------------------------------------------------
# frame = u32 body_len | u8 opcode | body
# body  = concatenation of fields; bytes fields are u32-length-prefixed

OP_OPEN, OP_GET, OP_SCAN, OP_COUNT, OP_COMMIT, OP_ABORT = 1, 2, 3, 4, 5, 6
OP_DELRANGE, OP_BATCHPUT, OP_COMPACT, OP_SEEK1, OP_MGET = 7, 8, 9, 10, 11

ST_OK, ST_CONFLICT, ST_ERR = 0, 1, 2

_ABSENT = b"\x00" * 8  # fingerprint marker for "key absent at read time"

SCAN_BATCH = 1024


def _fp(value: Optional[bytes]) -> bytes:
    if value is None:
        return _ABSENT
    return hashlib.blake2b(value, digest_size=8).digest()


class _Wire:
    """Append/parse u32-length-prefixed fields."""

    def __init__(self, data: bytes = b""):
        self.buf = bytearray()
        self.data = data
        self.pos = 0

    def put_bytes(self, b: bytes) -> "_Wire":
        self.buf += struct.pack("<I", len(b))
        self.buf += b
        return self

    def put_u64(self, n: int) -> "_Wire":
        self.buf += struct.pack("<Q", n)
        return self

    def put_u8(self, n: int) -> "_Wire":
        self.buf.append(n)
        return self

    def get_bytes(self) -> bytes:
        (n,) = struct.unpack_from("<I", self.data, self.pos)
        self.pos += 4
        out = self.data[self.pos : self.pos + n]
        self.pos += n
        return out

    def get_u64(self) -> int:
        (n,) = struct.unpack_from("<Q", self.data, self.pos)
        self.pos += 8
        return n

    def get_u8(self) -> int:
        n = self.data[self.pos]
        self.pos += 1
        return n


def _send_frame(sock: socket.socket, opcode: int, body: bytes) -> None:
    sock.sendall(struct.pack("<IB", len(body), opcode) + body)


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    chunks = []
    while n:
        c = sock.recv(min(n, 1 << 20))
        if not c:
            raise StorageError("remote kv connection closed")
        chunks.append(c)
        n -= len(c)
    return b"".join(chunks)


def _recv_frame(sock: socket.socket) -> Tuple[int, bytes]:
    hdr = _recv_exact(sock, 5)
    n, op = struct.unpack("<IB", hdr)
    return op, _recv_exact(sock, n)


# -- client ------------------------------------------------------------------


class RemoteTx(StoreTx):
    """Client-side transaction: snapshot reads are RPCs against a
    server-held read tx; writes buffer in an overlay shipped at commit
    (mirrors `storage/tkv.py`'s client pattern)."""

    def __init__(self, store: "RemoteStorage", write: bool) -> None:
        self.store = store
        self.writable = write
        self.overlay: Optional[dict] = {} if write else None
        self.read_fps: Optional[dict] = {} if write else None
        self._done = False
        w = _Wire().put_u8(1 if write else 0)
        resp = store._call(OP_OPEN, bytes(w.buf))
        self.txid = _Wire(resp).get_u64()

    # -- reads ---------------------------------------------------------------
    def get(self, key: bytes, for_update: bool = False) -> Optional[bytes]:
        if self.overlay is not None and key in self.overlay:
            return self.overlay[key]
        w = _Wire().put_u64(self.txid).put_bytes(key)
        resp = _Wire(self.store._call(OP_GET, bytes(w.buf)))
        val = resp.get_bytes() if resp.get_u8() else None
        if for_update and self.read_fps is not None:
            self.read_fps.setdefault(key, _fp(val))
        return val

    def multi_get(self, keys) -> list:
        keys = list(keys)
        if not keys:
            return []
        # one round trip for the whole batch (the per-key get pays the
        # full RPC latency each time — the reference's tikv engine has
        # the same batch-vs-point asymmetry)
        w = _Wire().put_u64(self.txid).put_u64(len(keys))
        for k in keys:
            w.put_bytes(k)
        resp = _Wire(self.store._call(OP_MGET, bytes(w.buf)))
        out = []
        for k in keys:
            if self.overlay is not None and k in self.overlay:
                # overlay wins; still consume the wire slot
                present = resp.get_u8()
                if present:
                    resp.get_bytes()
                out.append(self.overlay[k])
            else:
                out.append(resp.get_bytes() if resp.get_u8() else None)
        return out

    def _base_batches(self, lower: bytes, upper: bytes, reverse: bool):
        lo, hi = lower, upper
        while True:
            w = (
                _Wire()
                .put_u64(self.txid)
                .put_bytes(lo)
                .put_bytes(hi)
                .put_u8(1 if reverse else 0)
                .put_u64(SCAN_BATCH)
            )
            resp = _Wire(self.store._call(OP_SCAN, bytes(w.buf)))
            n = resp.get_u64()
            batch = [(resp.get_bytes(), resp.get_bytes()) for _ in range(n)]
            if not batch:
                return
            yield from batch
            if n < SCAN_BATCH:
                return
            last = batch[-1][0]
            if reverse:
                hi = last  # exclusive upper
            else:
                lo = last + b"\x00"

    def _overlay_pairs(self, lower, upper, reverse):
        return [
            (k, self.overlay[k])
            for k in sorted(
                (k for k in self.overlay if lower <= k < upper), reverse=reverse
            )
        ]

    def range_scan(self, lower: bytes, upper: bytes) -> Iterator[Tuple[bytes, bytes]]:
        base = self._base_batches(lower, upper, reverse=False)
        if not self.overlay:
            yield from base
            return
        yield from _merge(base, self._overlay_pairs(lower, upper, False), False)

    def range_scan_rev(self, lower: bytes, upper: bytes) -> Iterator[Tuple[bytes, bytes]]:
        base = self._base_batches(lower, upper, reverse=True)
        if not self.overlay:
            yield from base
            return
        yield from _merge(base, self._overlay_pairs(lower, upper, True), True)

    def seek_first(self, lower: bytes, upper: bytes):
        if self.overlay:
            for kv in self.range_scan(lower, upper):
                return kv
            return None
        w = _Wire().put_u64(self.txid).put_bytes(lower).put_bytes(upper)
        resp = _Wire(self.store._call(OP_SEEK1, bytes(w.buf)))
        if not resp.get_u8():
            return None
        return (resp.get_bytes(), resp.get_bytes())

    def range_count(self, lower: bytes, upper: bytes) -> int:
        if self.overlay:
            n = 0
            for _ in self.range_scan(lower, upper):
                n += 1
            return n
        w = _Wire().put_u64(self.txid).put_bytes(lower).put_bytes(upper)
        return _Wire(self.store._call(OP_COUNT, bytes(w.buf))).get_u64()

    # -- writes --------------------------------------------------------------
    def put(self, key: bytes, value: bytes) -> None:
        self.overlay[key] = value

    def delete(self, key: bytes) -> None:
        self.overlay[key] = None

    def commit(self) -> None:
        if self._done:
            return
        self._done = True
        if self.overlay is None:
            self.store._call(OP_ABORT, bytes(_Wire().put_u64(self.txid).buf))
            return
        w = _Wire().put_u64(self.txid)
        w.put_u64(len(self.read_fps))
        for k, fp in self.read_fps.items():
            w.put_bytes(k)
            w.put_bytes(fp)
        w.put_u64(len(self.overlay))
        for k, v in self.overlay.items():
            w.put_bytes(k)
            if v is None:
                w.put_u8(0)
            else:
                w.put_u8(1)
                w.put_bytes(v)
        resp = _Wire(self.store._call(OP_COMMIT, bytes(w.buf)))
        status = resp.get_u8()
        if status == ST_CONFLICT:
            raise ConflictError("remote optimistic commit conflict")
        if status != ST_OK:
            raise StorageError(resp.get_bytes().decode("utf-8", "replace"))

    def abort(self) -> None:
        if self._done:
            return
        self._done = True
        self.store._call(OP_ABORT, bytes(_Wire().put_u64(self.txid).buf))


def _merge(base_iter, over_pairs, reverse):
    j = 0
    n_over = len(over_pairs)
    cmp = (lambda a, b: a > b) if reverse else (lambda a, b: a < b)
    for bk, bv in base_iter:
        while j < n_over and cmp(over_pairs[j][0], bk):
            ok, ov = over_pairs[j]
            j += 1
            if ov is not None:
                yield ok, ov
        if j < n_over and over_pairs[j][0] == bk:
            ok, ov = over_pairs[j]
            j += 1
            if ov is not None:
                yield ok, ov
        else:
            yield bk, bv
    while j < n_over:
        ok, ov = over_pairs[j]
        j += 1
        if ov is not None:
            yield ok, ov


class RemoteStorage(Storage):
    name = "remote"

    def __init__(self, addr: str) -> None:
        host, _, port = addr.rpartition(":")
        if not host:
            raise StorageError(
                f"remote engine path must be host:port, got {addr!r}"
            )
        self.addr = (host, int(port))
        self._lock = threading.Lock()
        self._sock: Optional[socket.socket] = None
        self._connect()

    def _connect(self) -> None:
        s = socket.create_connection(self.addr, timeout=60)
        s.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        self._sock = s

    def _call(self, opcode: int, body: bytes) -> bytes:
        with self._lock:
            if self._sock is None:
                self._connect()
            _send_frame(self._sock, opcode, body)
            op, resp = _recv_frame(self._sock)
            if op == ST_ERR:
                raise StorageError(resp.decode("utf-8", "replace"))
            return resp

    def transact(self, write: bool = False) -> RemoteTx:
        return RemoteTx(self, write)

    def del_range(self, lower: bytes, upper: bytes) -> None:
        self._call(
            OP_DELRANGE, bytes(_Wire().put_bytes(lower).put_bytes(upper).buf)
        )

    def range_compact(self, lower: bytes, upper: bytes) -> None:
        self._call(
            OP_COMPACT, bytes(_Wire().put_bytes(lower).put_bytes(upper).buf)
        )

    def batch_put(self, items) -> None:
        # ship in bounded batches so restore of huge relations streams
        CHUNK_BYTES = 4 << 20
        batch, size = [], 0
        for k, v in items:
            batch.append((k, v))
            size += len(k) + len(v) + 8
            if size >= CHUNK_BYTES:
                self._send_batch(batch)
                batch, size = [], 0
        if batch:
            self._send_batch(batch)

    def _send_batch(self, batch) -> None:
        w = _Wire().put_u64(len(batch))
        for k, v in batch:
            w.put_bytes(k)
            w.put_bytes(v)
        self._call(OP_BATCHPUT, bytes(w.buf))

    def close(self) -> None:
        if self._sock is not None:
            try:
                self._sock.close()
            finally:
                self._sock = None


# -- server ------------------------------------------------------------------


class KvServer:
    """Serves a local Storage engine over the wire protocol.

    One thread per connection (`ThreadingTCPServer`); a global write
    mutex serializes commits, under which read-set fingerprints are
    validated against current committed state (OCC, `tx.h:16-22`-style
    lost-update protection done at the server since the wrapped engines
    validate per-process only)."""

    def __init__(self, storage: Storage, host: str = "127.0.0.1", port: int = 0):
        self.storage = storage
        self._txs: dict = {}
        self._txs_lock = threading.Lock()
        self._next_txid = [1]
        self._write_mutex = threading.Lock()
        outer = self

        class Handler(socketserver.BaseRequestHandler):
            def handle(self) -> None:
                my_txids = set()
                try:
                    while True:
                        try:
                            op, body = _recv_frame(self.request)
                        except StorageError:
                            return
                        try:
                            resp = outer._dispatch(op, body, my_txids)
                            _send_frame(self.request, ST_OK, resp)
                        except ConflictError:
                            # only COMMIT raises this; status in-band
                            w = _Wire().put_u8(ST_CONFLICT)
                            _send_frame(self.request, ST_OK, bytes(w.buf))
                        except Exception as e:  # noqa: BLE001
                            _send_frame(
                                self.request, ST_ERR, str(e).encode()[:4096]
                            )
                finally:
                    for txid in my_txids:
                        tx = outer._pop_tx(txid)
                        if tx is not None:
                            tx.abort()

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._server = Server((host, port), Handler)
        self.addr = self._server.server_address

    def serve_forever(self) -> None:
        self._server.serve_forever()

    def start_background(self) -> threading.Thread:
        t = threading.Thread(target=self.serve_forever, daemon=True)
        t.start()
        return t

    def shutdown(self) -> None:
        self._server.shutdown()
        self._server.server_close()

    # -- op handlers ---------------------------------------------------------
    def _pop_tx(self, txid):
        with self._txs_lock:
            return self._txs.pop(txid, None)

    def _get_tx(self, txid):
        with self._txs_lock:
            tx = self._txs.get(txid)
        if tx is None:
            raise StorageError(f"unknown txid {txid}")
        return tx

    def _dispatch(self, op: int, body: bytes, my_txids: set) -> bytes:
        w = _Wire(body)
        if op == OP_OPEN:
            w.get_u8()  # writable flag: server reads always via read tx
            tx = self.storage.transact(write=False)
            with self._txs_lock:
                txid = self._next_txid[0]
                self._next_txid[0] += 1
                self._txs[txid] = tx
            my_txids.add(txid)
            return bytes(_Wire().put_u64(txid).buf)
        if op == OP_GET:
            tx = self._get_tx(w.get_u64())
            val = tx.get(w.get_bytes())
            out = _Wire()
            if val is None:
                out.put_u8(0)
            else:
                out.put_u8(1).put_bytes(val)
            return bytes(out.buf)
        if op == OP_SCAN:
            tx = self._get_tx(w.get_u64())
            lower, upper = w.get_bytes(), w.get_bytes()
            reverse = bool(w.get_u8())
            limit = w.get_u64()
            scan = tx.range_scan_rev if reverse else tx.range_scan
            out_pairs = []
            for kv in scan(lower, upper):
                out_pairs.append(kv)
                if len(out_pairs) >= limit:
                    break
            out = _Wire().put_u64(len(out_pairs))
            for k, v in out_pairs:
                out.put_bytes(k)
                out.put_bytes(v)
            return bytes(out.buf)
        if op == OP_MGET:
            tx = self._get_tx(w.get_u64())
            n = w.get_u64()
            out = _Wire()
            for _ in range(n):
                val = tx.get(w.get_bytes())
                if val is None:
                    out.put_u8(0)
                else:
                    out.put_u8(1).put_bytes(val)
            return bytes(out.buf)
        if op == OP_SEEK1:
            tx = self._get_tx(w.get_u64())
            kv = tx.seek_first(w.get_bytes(), w.get_bytes())
            out = _Wire()
            if kv is None:
                out.put_u8(0)
            else:
                out.put_u8(1).put_bytes(kv[0]).put_bytes(kv[1])
            return bytes(out.buf)
        if op == OP_COUNT:
            tx = self._get_tx(w.get_u64())
            n = tx.range_count(w.get_bytes(), w.get_bytes())
            return bytes(_Wire().put_u64(n).buf)
        if op == OP_COMMIT:
            txid = w.get_u64()
            reads = [(w.get_bytes(), w.get_bytes()) for _ in range(w.get_u64())]
            writes = []
            for _ in range(w.get_u64()):
                k = w.get_bytes()
                writes.append((k, w.get_bytes() if w.get_u8() else None))
            my_txids.discard(txid)
            snap = self._pop_tx(txid)
            if snap is not None:
                snap.abort()
            with self._write_mutex:
                if reads:
                    check = self.storage.transact(write=False)
                    try:
                        for k, fp in reads:
                            if _fp(check.get(k)) != fp:
                                raise ConflictError(k.hex())
                    finally:
                        check.abort()
                if writes:
                    wtx = self.storage.transact(write=True)
                    try:
                        for k, v in writes:
                            if v is None:
                                wtx.delete(k)
                            else:
                                wtx.put(k, v)
                        wtx.commit()
                    except Exception:
                        wtx.abort()
                        raise
            return bytes(_Wire().put_u8(ST_OK).buf)
        if op == OP_ABORT:
            txid = w.get_u64()
            my_txids.discard(txid)
            tx = self._pop_tx(txid)
            if tx is not None:
                tx.abort()
            return b""
        if op == OP_DELRANGE:
            lower, upper = w.get_bytes(), w.get_bytes()
            with self._write_mutex:
                self.storage.del_range(lower, upper)
            return b""
        if op == OP_BATCHPUT:
            items = []
            for _ in range(w.get_u64()):
                items.append((w.get_bytes(), w.get_bytes()))
            with self._write_mutex:
                self.storage.batch_put(items)
            return b""
        if op == OP_COMPACT:
            self.storage.range_compact(w.get_bytes(), w.get_bytes())
            return b""
        raise StorageError(f"unknown opcode {op}")

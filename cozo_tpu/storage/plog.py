"""Persistent-log storage engine — the reference's `sled` analog
(`/root/reference/cozo-core/src/storage/sled.rs`): a second embedded
persistent engine with a different durability profile than tkv's LSM.

Design: the full keyspace lives in memory (a `MemStorage`); every commit
appends its write batch to an append-only journal before applying, so
the committed state is reconstructible after a crash.  On open, the
newest snapshot file is bulk-loaded and the journal replayed over it.
When the journal outgrows the snapshot (4x + 4MB), a compaction writes a
fresh snapshot and truncates the journal.  fsync policy mirrors tkv's
``sync_mode`` (0 = OS buffering, 1 = fsync per commit).

Like the reference's sled engine (flagged "experimental, no speed
advantage" in its README), this trades tkv's >RAM LSM scalability for
simplicity: RAM-bound dataset, mem-engine read semantics and speed.

Journal frame: u32 n_entries, then per entry u32 klen | key | i32 vlen
(-1 = delete tombstone) | value.  A torn tail frame (crash mid-append)
is detected by length and dropped.
"""

from __future__ import annotations

import os
import struct
from typing import Optional

from sortedcontainers import SortedDict

from .base import StorageError
from .mem import MemStorage, MemTx

_SNAP = "snapshot.plog"
_WAL = "journal.plog"


class PlogTx(MemTx):
    def commit(self) -> None:
        if self._done:
            return
        if self.overlay:
            with self.store.lock:
                self.store._append_journal(self.overlay.items())
                super().commit()
        else:
            super().commit()


class PlogStorage(MemStorage):
    name = "plog"

    def __init__(self, path: str, sync_mode: int = 1) -> None:
        if not path:
            raise StorageError("plog engine requires a directory path")
        super().__init__()
        self.path = path
        self.sync_mode = sync_mode
        os.makedirs(path, exist_ok=True)
        self._snap_path = os.path.join(path, _SNAP)
        self._wal_path = os.path.join(path, _WAL)
        self._load()
        self._wal = open(self._wal_path, "ab")
        self._wal_size = os.path.getsize(self._wal_path)

    # -- recovery ------------------------------------------------------------
    def _load(self) -> None:
        data = {}
        if os.path.exists(self._snap_path):
            with open(self._snap_path, "rb") as f:
                blob = f.read()
            pos = 0
            while pos < len(blob):
                klen, vlen = struct.unpack_from("<Ii", blob, pos)
                pos += 8
                k = blob[pos : pos + klen]
                pos += klen
                data[k] = blob[pos : pos + vlen]
                pos += vlen
        if os.path.exists(self._wal_path):
            with open(self._wal_path, "rb") as f:
                blob = f.read()
            pos = 0
            while pos + 4 <= len(blob):
                start = pos
                (n,) = struct.unpack_from("<I", blob, pos)
                pos += 4
                entries = []
                ok = True
                for _ in range(n):
                    if pos + 8 > len(blob):
                        ok = False
                        break
                    klen, vlen = struct.unpack_from("<Ii", blob, pos)
                    pos += 8
                    need = klen + (vlen if vlen >= 0 else 0)
                    if pos + need > len(blob):
                        ok = False
                        break
                    k = blob[pos : pos + klen]
                    pos += klen
                    v = blob[pos : pos + vlen] if vlen >= 0 else None
                    if vlen >= 0:
                        pos += vlen
                    entries.append((k, v))
                if not ok:
                    # torn tail frame from a crash mid-append: drop it
                    with open(self._wal_path, "r+b") as f:
                        f.truncate(start)
                    break
                for k, v in entries:
                    if v is None:
                        data.pop(k, None)
                    else:
                        data[k] = v
        self.data = SortedDict(data)

    # -- journaling ----------------------------------------------------------
    def _append_journal(self, items) -> None:
        """Called under self.lock, before the batch applies to memory."""
        items = list(items)  # may be consumed twice (journal + compaction)
        parts = [b""]
        n = 0
        for k, v in items:
            if v is None:
                parts.append(struct.pack("<Ii", len(k), -1) + k)
            else:
                parts.append(struct.pack("<Ii", len(k), len(v)) + k + v)
            n += 1
        parts[0] = struct.pack("<I", n)
        frame = b"".join(parts)
        self._wal.write(frame)
        self._wal.flush()
        if self.sync_mode:
            os.fsync(self._wal.fileno())
        self._wal_size += len(frame)
        if self._wal_size > 4 * (1 << 20) + 4 * self._snapshot_size():
            self._compact_locked(pending=items)

    def _snapshot_size(self) -> int:
        try:
            return os.path.getsize(self._snap_path)
        except OSError:
            return 0

    def _compact_locked(self, pending=None) -> None:
        """Write a fresh snapshot of (memory state + the just-journaled,
        not-yet-applied batch) and truncate the journal.  Under lock."""
        tmp = self._snap_path + ".tmp"
        over = dict(pending) if pending else {}
        with open(tmp, "wb") as f:
            for k, v in self.data.items():
                if k in over:
                    continue
                f.write(struct.pack("<Ii", len(k), len(v)) + k + v)
            for k, v in over.items():
                if v is not None:
                    f.write(struct.pack("<Ii", len(k), len(v)) + k + v)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._snap_path)
        self._wal.truncate(0)
        self._wal.seek(0)
        if self.sync_mode:
            os.fsync(self._wal.fileno())
        self._wal_size = 0

    # -- engine ops ----------------------------------------------------------
    def transact(self, write: bool = False) -> PlogTx:
        return PlogTx(self, write)

    def del_range(self, lower: bytes, upper: bytes) -> None:
        with self.lock:
            doomed = list(
                self.data.irange(lower, upper, inclusive=(True, False))
            )
            if doomed:
                self._append_journal((k, None) for k in doomed)
            for k in doomed:
                del self.data[k]

    def batch_put(self, items) -> None:
        items = list(items) if not isinstance(items, list) else items
        with self.lock:
            self._append_journal(items)
            super().batch_put(items)

    def range_compact(self, lower: bytes, upper: bytes) -> None:
        with self.lock:
            self._compact_locked()

    def close(self) -> None:
        with self.lock:
            try:
                self._compact_locked()
            finally:
                self._wal.close()

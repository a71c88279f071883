"""In-memory storage engine over a sorted container.

Analog of the reference `mem` engine (`cozo-core/src/storage/mem.rs`):
a shared sorted map; write transactions buffer an overlay merged on
commit under a global write lock; readers see a consistent snapshot by
virtue of the engine-wide reader/writer lock (single-process semantics).
"""

from __future__ import annotations

import threading
from typing import Iterator, Optional, Tuple

from sortedcontainers import SortedDict

from .base import Storage, StoreTx


class MemTx(StoreTx):
    def __init__(self, store: "MemStorage", write: bool) -> None:
        self.store = store
        self.writable = write
        self.overlay: dict = {} if write else None
        self._done = False

    # -- reads --------------------------------------------------------------
    def get(self, key: bytes, for_update: bool = False) -> Optional[bytes]:
        if self.overlay is not None and key in self.overlay:
            return self.overlay[key]
        return self.store.data.get(key)

    def range_scan(self, lower: bytes, upper: bytes) -> Iterator[Tuple[bytes, bytes]]:
        data = self.store.data
        if not self.overlay:
            for k in data.irange(lower, upper, inclusive=(True, False)):
                yield k, data[k]
            return
        # merge overlay into base scan
        base_keys = list(data.irange(lower, upper, inclusive=(True, False)))
        over_keys = sorted(k for k in self.overlay if lower <= k < upper)
        yield from self._merge(base_keys, over_keys)

    def range_scan_rev(self, lower: bytes, upper: bytes) -> Iterator[Tuple[bytes, bytes]]:
        data = self.store.data
        if not self.overlay:
            for k in data.irange(lower, upper, inclusive=(True, False), reverse=True):
                yield k, data[k]
            return
        base_keys = list(data.irange(lower, upper, inclusive=(True, False), reverse=True))
        over_keys = sorted(
            (k for k in self.overlay if lower <= k < upper), reverse=True
        )
        yield from self._merge(base_keys, over_keys, reverse=True)

    def _merge(self, base_keys, over_keys, reverse=False):
        data = self.store.data
        overlay = self.overlay
        i = j = 0
        cmp = (lambda a, b: a > b) if reverse else (lambda a, b: a < b)
        while i < len(base_keys) or j < len(over_keys):
            if j >= len(over_keys):
                k = base_keys[i]
                i += 1
                yield k, data[k]
            elif i >= len(base_keys):
                k = over_keys[j]
                j += 1
                v = overlay[k]
                if v is not None:
                    yield k, v
            else:
                bk, ok = base_keys[i], over_keys[j]
                if bk == ok:
                    i += 1
                    j += 1
                    v = overlay[ok]
                    if v is not None:
                        yield ok, v
                elif cmp(bk, ok):
                    i += 1
                    yield bk, data[bk]
                else:
                    j += 1
                    v = overlay[ok]
                    if v is not None:
                        yield ok, v

    # -- writes -------------------------------------------------------------
    def put(self, key: bytes, value: bytes) -> None:
        self.overlay[key] = value

    def delete(self, key: bytes) -> None:
        self.overlay[key] = None

    def commit(self) -> None:
        if self._done:
            return
        self._done = True
        if self.overlay:
            with self.store.lock:
                data = self.store.data
                for k, v in self.overlay.items():
                    if v is None:
                        data.pop(k, None)
                    else:
                        data[k] = v

    def abort(self) -> None:
        self._done = True
        self.overlay = {} if self.writable else None


class MemStorage(Storage):
    name = "mem"

    def __init__(self) -> None:
        self.data = SortedDict()
        self.lock = threading.RLock()

    def transact(self, write: bool = False) -> MemTx:
        return MemTx(self, write)

    def del_range(self, lower: bytes, upper: bytes) -> None:
        with self.lock:
            for k in list(self.data.irange(lower, upper, inclusive=(True, False))):
                del self.data[k]

    def batch_put(self, items) -> None:
        with self.lock:
            for k, v in items:
                self.data[k] = v

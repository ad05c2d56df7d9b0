"""Lazy chunked virtual file store with read-ahead — the WeaveDrive analog.

The reference host ships ``tests/weavedrive.js`` (344 LoC): an
Arweave-backed lazy virtual FS for the wasm runtime with a 32 KB read-ahead
cache, 128 MB chunking, and an admissibility check bypassed in test mode
(SURVEY.md §2.1). The TPU framework's equivalent need is streaming large key
blobs / model shards from a slow or remote store without loading them whole.

This module provides the same capability shape, backend-pluggable:

  * :class:`LocalBackend` — reads ranges from local files (the "test mode").
  * :class:`Backend` protocol — implement ``size(id)`` / ``read_range`` for a
    remote store (e.g. a gateway with HTTP range requests); network backends
    are intentionally not bundled (this environment is zero-egress).
  * :class:`VirtualFS` — open/read/close handles with chunked fetching and a
    read-ahead cache, mirroring weavedrive's ``open/read/close`` surface
    (``weavedrive.js:10-175``) and its cache/chunk geometry.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Protocol

#: weavedrive.js:3-6 — cache/chunk geometry.
READ_AHEAD = 32 * 1024
CHUNK_SIZE = 128 * 1024 * 1024


class Backend(Protocol):
    def size(self, item_id: str) -> int: ...
    def read_range(self, item_id: str, start: int, end: int) -> bytes: ...


class LocalBackend:
    """Range reads from a local directory (the mode="test" analog)."""

    def __init__(self, root: str):
        self.root = root

    def _path(self, item_id: str) -> str:
        p = os.path.normpath(os.path.join(self.root, item_id))
        if not p.startswith(os.path.abspath(self.root) + os.sep) and \
           p != os.path.abspath(self.root):
            p = os.path.join(self.root, os.path.basename(item_id))
        return p

    def size(self, item_id: str) -> int:
        return os.path.getsize(self._path(item_id))

    def read_range(self, item_id: str, start: int, end: int) -> bytes:
        with open(self._path(item_id), "rb") as f:
            f.seek(start)
            return f.read(end - start)


@dataclasses.dataclass
class _Handle:
    item_id: str
    size: int
    pos: int = 0
    cache_start: int = 0
    cache: bytes = b""


class VirtualFS:
    """open/read/close over a chunked backend with read-ahead."""

    def __init__(self, backend: Backend, read_ahead: int = READ_AHEAD):
        self.backend = backend
        self.read_ahead = read_ahead
        self._handles: dict[int, _Handle] = {}
        self._next_fd = 3

    def open(self, item_id: str) -> int:
        h = _Handle(item_id=item_id, size=self.backend.size(item_id))
        fd = self._next_fd
        self._next_fd += 1
        self._handles[fd] = h
        return fd

    def read(self, fd: int, length: int) -> bytes:
        h = self._handles[fd]
        length = min(length, h.size - h.pos)
        if length <= 0:
            return b""
        out = bytearray()
        while length > 0:
            # serve from cache when possible
            off = h.pos - h.cache_start
            if 0 <= off < len(h.cache):
                take = min(length, len(h.cache) - off)
                out += h.cache[off:off + take]
                h.pos += take
                length -= take
                continue
            # fetch next window (read-ahead, capped by chunk boundary and EOF)
            start = h.pos
            end = min(start + max(length, self.read_ahead), h.size,
                      (start // CHUNK_SIZE + 1) * CHUNK_SIZE)
            h.cache = self.backend.read_range(h.item_id, start, end)
            h.cache_start = start
        return bytes(out)

    def seek(self, fd: int, pos: int) -> None:
        self._handles[fd].pos = pos

    def close(self, fd: int) -> None:
        self._handles.pop(fd, None)

    def read_all(self, item_id: str) -> bytes:
        fd = self.open(item_id)
        try:
            return self.read(fd, self._handles[fd].size)
        finally:
            self.close(fd)

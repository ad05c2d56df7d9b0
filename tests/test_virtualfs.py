"""VirtualFS (WeaveDrive analog): chunked reads, read-ahead, seek."""

import os
import numpy as np

from eoc_tfhe_tpu.io.virtualfs import VirtualFS, LocalBackend


def test_virtualfs_roundtrip(tmp_path):
    data = np.random.default_rng(0).integers(0, 256, 100_000, dtype=np.uint8).tobytes()
    (tmp_path / "blob.bin").write_bytes(data)
    fs = VirtualFS(LocalBackend(str(tmp_path)), read_ahead=1024)
    fd = fs.open("blob.bin")
    assert fs.read(fd, 10) == data[:10]
    assert fs.read(fd, 5000) == data[10:5010]      # crosses read-ahead windows
    fs.seek(fd, 99_990)
    assert fs.read(fd, 100) == data[99_990:]       # EOF-capped
    assert fs.read(fd, 10) == b""
    fs.close(fd)
    assert fs.read_all("blob.bin") == data


def test_virtualfs_counts_backend_calls(tmp_path):
    data = bytes(range(256)) * 100
    (tmp_path / "x").write_bytes(data)

    calls = []
    backend = LocalBackend(str(tmp_path))
    orig = backend.read_range
    backend.read_range = lambda i, s, e: (calls.append((s, e)), orig(i, s, e))[1]
    fs = VirtualFS(backend, read_ahead=4096)
    fd = fs.open("x")
    for _ in range(64):
        fs.read(fd, 64)                            # 4 KB total
    assert len(calls) == 1                         # read-ahead served the rest

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


# ---------------------------------------------------------------------------
# Admissibility / attestation protocol (weavedrive.js:220-342)
# ---------------------------------------------------------------------------

import pytest

from eoc_tfhe_tpu.io.virtualfs import (Admissibility, InProcessGateway,
                                       get_tag_values)

SCHED = "TEST_SCHED_ADDR"


def _tags(**kv):
    return [{"name": k.replace("_", "-"), "value": v} for k, v in kv.items()]


def _spawn(avail=None, ext=True):
    t = _tags(Scheduler=SCHED)
    if ext:
        t += _tags(Extension="WeaveDrive")
    if avail:
        t += _tags(Availability_Type=avail)
    return t


def test_admissibility_test_mode_bypass():
    """mode == "test" admits anything without touching the gateway
    (weavedrive.js:221-224 — the reference suite's own configuration,
    tests/tfhe.test.js mode: "test")."""
    adm = Admissibility(gateway=None, mode="test")
    assert adm.check("anything") is True


def test_admissibility_requires_extension_tag():
    gw = InProcessGateway()
    adm = Admissibility(gateway=gw, block_height=100,
                        spawn_tags=_spawn(ext=False))
    assert adm.check("item1") is False
    assert gw.queries == []            # rejected before any query
    # extension on the MODULE item also suffices (weavedrive.js:228-231)
    adm2 = Admissibility(gateway=gw, block_height=100,
                         module_tags=_tags(Extension="WeaveDrive"),
                         spawn_tags=_tags(Scheduler=SCHED))
    assert adm2.check("item1") is False   # gated in, but no attestation
    assert len(gw.queries) == 1


def test_admissibility_assignments_attestation():
    """Assignments form: an ao Attestation by the Scheduler within the block
    height admits the id (weavedrive.js:258-284); block range and owner are
    honored by the gateway parse."""
    gw = InProcessGateway()
    gw.add_transaction(SCHED, 50, {"Data-Protocol": "ao",
                                   "Type": "Attestation", "Message": "m1"})
    gw.add_transaction(SCHED, 500, {"Data-Protocol": "ao",
                                    "Type": "Attestation", "Message": "m2"})
    gw.add_transaction("other", 50, {"Data-Protocol": "ao",
                                     "Type": "Attestation", "Message": "m3"})
    adm = Admissibility(gateway=gw, block_height=100, spawn_tags=_spawn())
    assert adm.check("m1") is True
    assert adm.check("m2") is False      # attested above the block height
    assert adm.check("m3") is False      # wrong owner
    assert adm.check("m4") is False      # never attested
    # the exchange really is GraphQL-shaped strings
    assert all(q.lstrip().startswith("query") and "transactions(" in q
               for q in gw.queries)


def test_admissibility_individual_mode():
    """Individual mode falls through Assignments to the WeaveDrive
    Available query (weavedrive.js:286-313); mode from the spawn item
    overrides the module default (…:241-248)."""
    gw = InProcessGateway()
    gw.add_transaction(SCHED, 10, {"Data-Protocol": "WeaveDrive",
                                   "Type": "Available", "ID": "solo"})
    module_tags = _tags(Availability_Type="Assignments")
    adm = Admissibility(gateway=gw, block_height=100,
                        module_tags=module_tags,
                        spawn_tags=_spawn(avail="Individual"))
    assert adm.check("solo") is True
    assert len(gw.queries) == 2          # Assignments miss, then Available
    # without the spawn override, module default (Assignments) rejects
    adm2 = Admissibility(gateway=gw, block_height=100,
                         module_tags=module_tags, spawn_tags=_spawn())
    assert adm2.check("solo") is False


def test_admissibility_library_and_invalid_modes():
    gw = InProcessGateway()
    adm = Admissibility(gateway=gw, block_height=100,
                        spawn_tags=_spawn(avail="Library"))
    with pytest.raises(NotImplementedError, match="Library"):
        adm.check("x")                   # weavedrive.js:321-323
    adm2 = Admissibility(gateway=gw, block_height=100,
                         spawn_tags=_spawn(avail="Sometimes"))
    with pytest.raises(ValueError, match="Unsupported WeaveDrive mode"):
        adm2.check("x")                  # weavedrive.js:250-252


def test_virtualfs_open_gated_by_admissibility(tmp_path):
    """The gate sits at open() (weavedrive.js create():19-22): rejected ids
    never become handles, admitted ones read normally."""
    (tmp_path / "ok").write_bytes(b"payload")
    (tmp_path / "nope").write_bytes(b"secret")
    gw = InProcessGateway()
    gw.add_transaction(SCHED, 10, {"Data-Protocol": "ao",
                                   "Type": "Attestation", "Message": "ok"})
    adm = Admissibility(gateway=gw, block_height=100, spawn_tags=_spawn())
    fs = VirtualFS(LocalBackend(str(tmp_path)), admissibility=adm)
    assert fs.read_all("ok") == b"payload"
    with pytest.raises(PermissionError, match="not admissible"):
        fs.open("nope")


def test_get_tag_values_accepts_both_shapes():
    """The reference helper reads .key while its callers pass .name items
    (weavedrive.js:328-336 fixture sloppiness) — both shapes work here."""
    assert get_tag_values("Extension",
                          [{"name": "Extension", "value": "WeaveDrive"},
                           {"key": "Extension", "value": "Other"}]) == \
        ["WeaveDrive", "Other"]

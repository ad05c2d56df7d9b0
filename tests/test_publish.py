"""Chunked model publisher: linked-list protocol round trip
(reference ``scripts/publish-model:17-36,95-110``)."""

import numpy as np
import pytest

from eoc_tfhe_tpu.io.virtualfs import LocalBackend, VirtualFS
from eoc_tfhe_tpu.models import publish


@pytest.fixture
def blobs(rng):
    model = rng.integers(0, 256, 2_500_00, dtype=np.uint8).tobytes()
    tok = rng.integers(0, 256, 1234, dtype=np.uint8).tobytes()
    return model, tok


def test_publish_fetch_roundtrip(tmp_path, blobs):
    model, tok = blobs
    store = publish.LocalStore(str(tmp_path))
    head = publish.publish_model(store, model, tok, chunk_size=64 * 1024)
    m2, t2 = publish.fetch_model(store, head)
    assert m2 == model and t2 == tok


def test_tag_schema_matches_reference(tmp_path, blobs):
    model, tok = blobs
    store = publish.LocalStore(str(tmp_path))
    head = publish.publish_model(store, model, tok, chunk_size=100 * 1024)
    tags = store.tags(head)
    assert tags["Data-Protocol"] == "Onchain-Llama"
    assert tags["Type"] == "Model-Chunk"
    assert tags["Model-Size"] == str(len(model))
    assert tags["Tokenizer-Size"] == str(len(tok))
    assert "Next" in tags
    # Walk: every interior item is a Model-Chunk; terminal is the Tokenizer
    # with no Next (the reference uploads it first with Next=null).
    item, hops = head, 0
    while True:
        t = store.tags(item)
        if t["Type"] == "Tokenizer":
            assert "Next" not in t
            break
        assert t["Type"] == "Model-Chunk"
        item = t["Next"]
        hops += 1
    assert hops == -(-len(model) // (100 * 1024))


def test_single_chunk_and_empty_model(tmp_path):
    store = publish.LocalStore(str(tmp_path))
    head = publish.publish_model(store, b"tiny", b"tok", chunk_size=1 << 20)
    assert publish.fetch_model(store, head) == (b"tiny", b"tok")
    head2 = publish.publish_model(store, b"", b"tok2")
    assert publish.fetch_model(store, head2) == (b"", b"tok2")


def test_published_items_readable_via_virtualfs(tmp_path, blobs):
    """Published chunks are directly streamable through the WeaveDrive-analog
    virtual FS (same on-disk item layout)."""
    model, tok = blobs
    store = publish.LocalStore(str(tmp_path))
    head = publish.publish_model(store, model, tok, chunk_size=64 * 1024)
    vfs = VirtualFS(LocalBackend(str(tmp_path)))
    assert vfs.read_all(head) == model[:64 * 1024]

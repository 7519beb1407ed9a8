"""XLA encoder: stream validity (oracle decode), ratio parity, roundtrips."""
import numpy as np
import pytest

from csnappy_tpu.models import pymodel, wire
from csnappy_tpu.ops import encode_jnp


def _roundtrip(data: bytes) -> bytes:
    comp = encode_jnp.compress_np(data)
    assert len(comp) <= wire.max_compressed_length(len(data)) + wire.MAX_VARINT32_BYTES
    return pymodel.decompress(comp)


@pytest.mark.parametrize(
    "data",
    [
        b"",
        b"a",
        b"abc",
        b"abcd" * 3,
        b"a" * 200,              # RLE, short
        b"a" * 100000,           # RLE across blocks
        b"ab" * 40000,
        bytes(range(256)) * 40,  # periodic, period 256 (far matches only)
        b"the quick brown fox jumps over the lazy dog " * 800,
    ],
)
def test_roundtrip(data):
    assert _roundtrip(data) == data


def test_roundtrip_urls(urls10k):
    comp = encode_jnp.compress_np(urls10k)
    assert pymodel.decompress(comp) == urls10k
    # ratio parity mandate (BASELINE.md): <= reference's 357,267 bytes
    assert len(comp) <= 357267, f"ratio regression: {len(comp)}"


def test_roundtrip_incompressible():
    rng = np.random.default_rng(3)
    data = rng.integers(0, 256, size=100000, dtype=np.uint8).tobytes()
    assert _roundtrip(data) == data


def test_block_boundary_independence(urls10k):
    """No offset may cross a 32 KiB fragment boundary: decode each fragment's
    tag coverage independently by re-compressing block-wise."""
    blocks = [urls10k[i : i + 32768] for i in range(0, 32768 * 4, 32768)]
    padded = np.zeros((len(blocks), 32768), np.uint8)
    for i, b in enumerate(blocks):
        padded[i, : len(b)] = np.frombuffer(b, np.uint8)
    lens = np.array([len(b) for b in blocks], np.int32)
    comp, clens = encode_jnp.encode_blocks(padded, lens)
    for i, b in enumerate(blocks):
        frag = comp[i, : clens[i]].tobytes()
        # a fragment must decode standalone — offsets never reach before it
        assert pymodel.decompress_noheader(frag, len(b)) == b


def test_tail_block(urls10k):
    data = urls10k[: 32768 + 1000]  # full block + short tail
    assert _roundtrip(data) == data

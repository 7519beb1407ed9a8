"""Chunk-composition block decoder vs the oracle (CPU backend)."""
import numpy as np
import pytest

from csnappy_tpu import errors
from csnappy_tpu.models import pymodel
from csnappy_tpu.ops import decode_block


def _pad128(n):
    return max(128, (n + 127) // 128 * 128)


def _decode_one(frag: bytes, out_cap: int):
    P = _pad128(len(frag) + 8)
    arr = np.zeros((1, P), np.uint8)
    arr[0, : len(frag)] = np.frombuffer(frag, np.uint8)
    out, produced, status = decode_block.decode_blocks(
        arr, np.array([len(frag)], np.int32), out_cap
    )
    return out[0], int(produced[0]), int(status[0])


@pytest.mark.parametrize(
    "data",
    [
        b"",
        b"a",
        b"hello world hello world hello",
        b"a" * 4096,                       # RLE offset-1 chains
        b"ab" * 2048,
        bytes(range(256)) * 16,            # period-256 far matches
        b"the quick brown fox jumps over the lazy dog " * 90,
    ],
)
def test_roundtrip_4k(data):
    frag = pymodel.compress_fragment(data)
    out, produced, status = _decode_one(frag, 4096)
    assert status == errors.E_OK
    assert produced == len(data)
    assert out[: len(data)].tobytes() == data


def test_roundtrip_32k_urls(urls10k):
    for start in (0, 32768, 65536):
        data = urls10k[start : start + 32768]
        frag = pymodel.compress_fragment(data)
        out, produced, status = _decode_one(frag, 32768)
        assert status == errors.E_OK, f"block at {start}: status {status}"
        assert out[: len(data)].tobytes() == data


def test_incompressible_4k():
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, size=4000, dtype=np.uint8).tobytes()
    frag = pymodel.compress_fragment(data)
    out, produced, status = _decode_one(frag, 4096)
    assert status == errors.E_OK and out[:4000].tobytes() == data


def test_long_literal_crossing_chunks():
    # one literal tag spanning many 128-byte chunks (flying chunks)
    data = bytes(np.random.default_rng(1).integers(0, 256, 3000, dtype=np.uint8))
    frag = pymodel.compress_fragment(data)
    out, produced, status = _decode_one(frag, 4096)
    assert status == errors.E_OK and out[:3000].tobytes() == data


def test_long_literal_then_copies():
    # ADVICE r1 (high): a long literal (payload > ~768B) ending mid-output-
    # chunk pushes the following tags arbitrarily far past the fixed window
    # based at the chunk covering the output-chunk start; the cover step must
    # follow the chain (ic2 window) or it attributes those bytes to the
    # literal.  Reproduces the round-1 silent corruption at offset ~2008.
    rng = np.random.default_rng(7)
    data = rng.integers(0, 256, 2000, dtype=np.uint8).tobytes() + b"abcdefgh" * 200
    frag = pymodel.compress_fragment(data)
    out, produced, status = _decode_one(frag, 4096)
    assert status == errors.E_OK
    assert produced == len(data)
    assert out[: len(data)].tobytes() == data


def test_long_literal_then_copies_sweep():
    # sweep the literal tail across output-chunk phases and literal lengths
    rng = np.random.default_rng(11)
    for lit_len in (900, 1500, 2047, 2048, 2049, 3000):
        for tail in (b"xy" * 300, b"0123456789abcdef" * 64):
            data = rng.integers(0, 256, lit_len, dtype=np.uint8).tobytes() + tail
            data = data[:4096]
            frag = pymodel.compress_fragment(data)
            out, produced, status = _decode_one(frag, 4096)
            assert status == errors.E_OK, (lit_len, len(tail), status)
            assert out[: len(data)].tobytes() == data, (lit_len, len(tail))


def test_copy4_accepted():
    from csnappy_tpu.models import wire

    lit = b"0123456789abcdef"
    stream = bytearray()
    wire.emit_literal(stream, lit)
    stream += bytes([wire.TAG_COPY_4 | ((8 - 1) << 2)]) + (16).to_bytes(4, "little")
    out, produced, status = _decode_one(bytes(stream), 4096)
    assert status == errors.E_OK
    assert out[:24].tobytes() == lit + lit[:8]


def test_malformed_rejected():
    out, produced, status = _decode_one(b"\xc4foooooo", 4096)  # truncated literal
    assert status == errors.E_DATA_MALFORMED
    out, produced, status = _decode_one(b"\x00a\x01\x00", 4096)  # offset 0
    assert status == errors.E_DATA_MALFORMED
    out, produced, status = _decode_one(b"\x00a\x0a\x08\x00", 4096)  # off 8 > written
    assert status == errors.E_DATA_MALFORMED


def test_overrun_rejected():
    data = b"x" * 5000  # produces 5000 > 4096 cap
    frag = pymodel.compress_fragment(data)
    out, produced, status = _decode_one(frag, 4096)
    assert status == errors.E_OUTPUT_OVERRUN


def test_batched_mixed_blocks(urls10k):
    blocks = [urls10k[i * 4096 : (i + 1) * 4096] for i in range(8)]
    frags = [pymodel.compress_fragment(b) for b in blocks]
    P = _pad128(max(len(f) for f in frags))
    arr = np.zeros((8, P), np.uint8)
    lens = np.zeros((8,), np.int32)
    for i, f in enumerate(frags):
        arr[i, : len(f)] = np.frombuffer(f, np.uint8)
        lens[i] = len(f)
    out, produced, status = decode_block.decode_blocks(arr, lens, 4096)
    assert (status == errors.E_OK).all()
    for i, b in enumerate(blocks):
        assert produced[i] == len(b)
        assert out[i, : len(b)].tobytes() == b

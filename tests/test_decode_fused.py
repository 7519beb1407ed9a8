"""Fused block decoder vs the oracle.

decode_fused has no jnp fallback — on the CPU backend the kernel itself runs
through the Pallas interpreter, so these tests execute the shipping kernel
body on every CI run.
"""
import numpy as np
import pytest

from csnappy_tpu import errors
from csnappy_tpu.models import pymodel, wire
from csnappy_tpu.ops import decode_fused


def _decode_one(frag: bytes, out_cap: int):
    arr = np.frombuffer(frag, np.uint8)[None, :] if frag else np.zeros((1, 1), np.uint8)
    out, produced, status = decode_fused.decode_blocks(
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
    data = urls10k[:32768]
    frag = pymodel.compress_fragment(data)
    out, produced, status = _decode_one(frag, 32768)
    assert status == errors.E_OK
    assert out[: len(data)].tobytes() == data


def test_incompressible_and_long_literal():
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, 4000, dtype=np.uint8).tobytes()
    frag = pymodel.compress_fragment(data)
    out, _, status = _decode_one(frag, 4096)
    assert status == errors.E_OK and out[:4000].tobytes() == data
    # long literal ending mid-chunk followed by copies (ADVICE r1 high)
    data = rng.integers(0, 256, 2000, dtype=np.uint8).tobytes() + b"abcdefgh" * 200
    frag = pymodel.compress_fragment(data)
    out, produced, status = _decode_one(frag, 4096)
    assert status == errors.E_OK and out[: len(data)].tobytes() == data


def test_copy4_accepted():
    lit = b"0123456789abcdef"
    stream = bytearray()
    wire.emit_literal(stream, lit)
    stream += bytes([wire.TAG_COPY_4 | ((8 - 1) << 2)]) + (16).to_bytes(4, "little")
    out, produced, status = _decode_one(bytes(stream), 4096)
    assert status == errors.E_OK
    assert out[:24].tobytes() == lit + lit[:8]


def test_malformed_rejected():
    for frag in (b"\xc4foooooo", b"\x00a\x01\x00", b"\x00a\x0a\x08\x00"):
        _, _, status = _decode_one(frag, 4096)
        assert status == errors.E_DATA_MALFORMED, frag


def test_baddata3_rejected(baddata3):
    _, hdr = wire.varint_decode(baddata3)
    _, _, status = _decode_one(baddata3[hdr:], 65536)
    assert status != errors.E_OK


def test_overrun_rejected():
    frag = pymodel.compress_fragment(b"x" * 5000)
    _, _, status = _decode_one(frag, 4096)
    assert status == errors.E_OUTPUT_OVERRUN


def test_error_priority_offset_before_space():
    # a bad-offset copy *before* the overrun point must win (DATA), matching
    # SAW__AppendFromSelf's offset-then-space check order
    s = bytearray()
    wire.emit_literal(s, b"ab")
    s += bytes([wire.TAG_COPY_1 | ((4 - wire.MIN_MATCH) << 2) | (0 << 5), 50])  # off 50 > written
    wire.emit_literal(s, b"c" * 60)
    _, _, status = _decode_one(bytes(s), 4)  # also overruns dst_limit=4
    assert status == errors.E_DATA_MALFORMED


def test_overrun_before_malformed_end():
    # stream longer than dst_limit whose *end* is truncated: overrun at byte
    # dlim precedes the malformed tail -> E_OUTPUT_OVERRUN
    frag = bytearray(pymodel.compress_fragment(b"y" * 5000))
    frag = frag[:-1]  # truncate the final tag
    _, _, status = _decode_one(bytes(frag), 4096)
    assert status == errors.E_OUTPUT_OVERRUN


def test_batched_mixed_blocks(urls10k):
    blocks = [urls10k[i * 4096 : (i + 1) * 4096] for i in range(8)]
    frags = [pymodel.compress_fragment(b) for b in blocks]
    P = max(len(f) for f in frags)
    arr = np.zeros((8, P), np.uint8)
    lens = np.zeros((8,), np.int32)
    for i, f in enumerate(frags):
        arr[i, : len(f)] = np.frombuffer(f, np.uint8)
        lens[i] = len(f)
    out, produced, status = decode_fused.decode_blocks(arr, lens, 4096)
    assert (status == errors.E_OK).all()
    for i, b in enumerate(blocks):
        assert produced[i] == len(b)
        assert out[i, : len(b)].tobytes() == b


def test_fuzz_roundtrip_vs_oracle():
    rng = np.random.default_rng(42)
    for trial in range(10):
        kind = trial % 3
        n = int(rng.integers(1, 4096))
        if kind == 0:
            data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        elif kind == 1:
            data = (b"abcdef" * (n // 6 + 1))[:n]
        else:
            pieces, left = [], n
            while left > 0:
                m = int(rng.integers(1, min(left, 200) + 1))
                pieces.append(
                    rng.integers(0, 256, m, dtype=np.uint8).tobytes()
                    if rng.random() < 0.5 else bytes([int(rng.integers(97, 99))]) * m
                )
                left -= m
            data = b"".join(pieces)[:n]
        frag = pymodel.compress_fragment(data)
        out, produced, status = _decode_one(frag, 4096)
        assert status == errors.E_OK, (trial, status)
        assert out[: len(data)].tobytes() == data, trial


def test_fuzz_malformed_never_crashes():
    rng = np.random.default_rng(43)
    base = pymodel.compress_fragment(b"hello world " * 200)
    for _ in range(10):
        bad = bytearray(base)
        for _ in range(int(rng.integers(1, 6))):
            bad[int(rng.integers(0, len(bad)))] = int(rng.integers(0, 256))
        out, produced, status = _decode_one(bytes(bad), 4096)
        # decoded-or-rejected, never OOB; if OK, oracle must agree
        if status == errors.E_OK:
            want = pymodel.decompress_noheader(bytes(bad), 4096)
            assert out[: len(want)].tobytes() == want


def test_nonpow2_out_cap_rows():
    # out_cap rounding to 5120 bytes = 40 rows: group sizes must divide the
    # row count or trailing rows go unresolved (r2 regression)
    rng = np.random.default_rng(12)
    data = rng.integers(0, 256, 4196, dtype=np.uint8).tobytes()
    frag = pymodel.compress_fragment(data)
    out, produced, status = _decode_one(frag, 4196)
    assert status == errors.E_OK
    assert out[: len(data)].tobytes() == data

"""Segmented whole-stream decoder (serving path) vs golden vectors."""
import numpy as np
import pytest

from csnappy_tpu import api, errors
from csnappy_tpu.models import pymodel, wire
from csnappy_tpu.ops import decode_stream


def _dec(body: bytes, ulen: int):
    return decode_stream.decompress_noheader_np(np.frombuffer(body, np.uint8), ulen)


def test_single_segment():
    data = b"hello world hello world hello"
    out, produced, status = _dec(pymodel.compress_fragment(data), len(data))
    assert status == errors.E_OK and out[: len(data)].tobytes() == data


def test_multisegment_own_stream(urls10k):
    big = urls10k[:150000]
    comp = pymodel.compress(big)
    ulen, hdr = wire.varint_decode(comp)
    out, produced, status = _dec(comp[hdr:], ulen)
    assert status == errors.E_OK
    assert produced == len(big)
    assert out.tobytes() == big


def test_golden_reference_stream(urls10k, urls10k_snappy):
    # the reference-encoded 702KB stream, bit-exact (22 segments)
    ulen, hdr = wire.varint_decode(urls10k_snappy)
    out, produced, status = _dec(urls10k_snappy[hdr:], ulen)
    assert status == errors.E_OK
    assert produced == len(urls10k)
    assert out.tobytes() == urls10k


def test_straddling_literal_and_copy():
    rng = np.random.default_rng(3)
    raw = rng.integers(0, 256, 50000, dtype=np.uint8).tobytes()
    s = bytearray()
    wire.emit_literal(s, raw)
    s += bytes([wire.TAG_COPY_2 | ((64 - 1) << 2)]) + (1000).to_bytes(2, "little")
    want = raw + raw[-1000 : -1000 + 64]
    out, produced, status = _dec(bytes(s), len(want))
    assert status == errors.E_OK and out.tobytes() == want


def test_copy_across_segment_boundary():
    # copies whose sources live in the previous segment (history path)
    data = (b"abcdefgh" * 5000)[:40000]
    comp = pymodel.compress_fragment(data[:32768]) if False else None
    stream = pymodel.compress(data)
    ulen, hdr = wire.varint_decode(stream)
    out, produced, status = _dec(stream[hdr:], ulen)
    assert status == errors.E_OK and out.tobytes() == data


def test_giant_literal_decodes_bit_exact():
    # >64KB single-tag advance: the r3 envelope widening (full 2^24-byte
    # tag advances) decodes this in the stream kernel directly — E_OK and
    # bit-exact bytes, both raw and through the routed API
    rng = np.random.default_rng(4)
    raw = rng.integers(0, 256, 100000, dtype=np.uint8).tobytes()
    s = bytearray()
    wire.emit_literal(s, raw)
    out, produced, status = _dec(bytes(s), len(raw))
    assert status == errors.E_OK
    assert out[:produced].tobytes() == raw
    assert api.decompress_noheader(bytes(s), len(raw)) == raw


def test_past_envelope_literal_recovered_via_fallback():
    # a single literal tag advancing past the 2^24-byte stream-kernel
    # envelope: the kernel must reject it cleanly (no corruption) and the
    # routed API must still produce correct bytes via the general decoder
    n = (1 << 24) + 4096
    raw = (b"\xa5\x5a\x01\xfe" * ((n + 3) // 4))[:n]
    s = bytearray()
    wire.emit_literal(s, raw)
    _, _, status = _dec(bytes(s), n)
    assert status == errors.E_DATA_MALFORMED
    assert api.decompress_noheader(bytes(s), n) == raw


def test_adversarial(baddata3):
    _, hdr = wire.varint_decode(baddata3)
    _, _, status = _dec(baddata3[hdr:], 1 << 20)
    assert status != errors.E_OK


def test_truncated_multisegment(urls10k):
    stream = pymodel.compress(urls10k[:100000])
    ulen, hdr = wire.varint_decode(stream)
    # a 1-byte cut always lands mid-tag
    _, _, status = _dec(stream[hdr : len(stream) - 1], ulen)
    assert status == errors.E_DATA_MALFORMED


def test_overrun_multisegment(urls10k):
    big = urls10k[:100000]
    stream = pymodel.compress(big)
    ulen, hdr = wire.varint_decode(stream)
    _, _, status = _dec(stream[hdr:], ulen - 5000)
    assert status == errors.E_OUTPUT_OVERRUN


def test_api_wholestream_routes_fast_path(urls10k, urls10k_snappy):
    assert api.decompress(urls10k_snappy) == urls10k


def test_fuzz_multisegment_vs_oracle():
    rng = np.random.default_rng(77)
    for trial in range(4):
        pieces = []
        n = 0
        while n < 90000:
            kind = int(rng.integers(0, 3))
            m = int(rng.integers(500, 8000))
            if kind == 0:
                pieces.append(rng.integers(0, 256, m, dtype=np.uint8).tobytes())
            elif kind == 1:
                pieces.append(bytes([int(rng.integers(97, 100))]) * m)  # RLE
            else:
                pieces.append((b"lorem ipsum dolor sit amet " * (m // 27 + 1))[:m])
            n += m
        data = b"".join(pieces)[:90000 + trial * 7]
        stream = pymodel.compress(data)
        ulen, hdr = wire.varint_decode(stream)
        out, produced, status = _dec(stream[hdr:], ulen)
        assert status == errors.E_OK, trial
        assert out.tobytes() == data, trial


def test_fuzz_encoder_stream_through_stream_decoder(urls10k):
    # fused encoder output through the segmented decoder (cross-kernel)
    from csnappy_tpu.ops import encode_fused

    data = urls10k[:100000]
    stream = encode_fused.compress_np(data)
    ulen, hdr = wire.varint_decode(stream)
    out, produced, status = _dec(stream[hdr:], ulen)
    assert status == errors.E_OK
    assert out.tobytes() == data

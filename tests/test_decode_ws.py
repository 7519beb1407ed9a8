"""Device-resident whole-stream pipeline (ops/decode_ws.py).

On the CPU mesh the pipeline runs under the Pallas interpreter via the
FORCE_CPU override (the api's automatic fast path is TPU-only; the routed
path covers api behavior on CPU — see decode_ws.FORCE_CPU).
"""
import numpy as np
import pytest

from csnappy_tpu.models import pymodel, wire
from csnappy_tpu.ops import decode_ws


@pytest.fixture(autouse=True)
def _force_cpu_pipeline():
    old = decode_ws.FORCE_CPU
    decode_ws.FORCE_CPU = True
    yield
    decode_ws.FORCE_CPU = old


def test_multisegment_own_stream(urls10k):
    data = urls10k[:120000]
    comp = pymodel.compress(data)
    ulen, hdr = wire.varint_decode(comp)
    assert decode_ws.decompress_noheader_ws(comp[hdr:], ulen) == data


def test_golden_reference_stream(urls10k, urls10k_snappy):
    ulen, hdr = wire.varint_decode(urls10k_snappy)
    out = decode_ws.decompress_noheader_ws(urls10k_snappy[hdr:], ulen)
    assert out == urls10k


def test_straddling_literal_returns_none():
    # one giant literal spans every 32 KiB boundary: the scan walk stalls
    # at its zero parse entry and the pipeline must decline (None), never
    # emit wrong bytes
    raw = np.random.default_rng(5).integers(0, 256, 100000, dtype=np.uint8).tobytes()
    s = bytearray()
    wire.emit_literal(s, raw)
    assert decode_ws.decompress_noheader_ws(bytes(s), len(raw)) is None


def test_malformed_returns_none(urls10k):
    data = urls10k[:100000]
    comp = pymodel.compress(data)
    ulen, hdr = wire.varint_decode(comp)
    body = bytearray(comp[hdr:])
    body[len(body) // 2] ^= 0x5A
    res = decode_ws.decompress_noheader_ws(bytes(body), ulen)
    # either declined (walk diverged) or — if the corrupt byte still
    # parses — the segment produced-check rejects; None is the only
    # acceptable non-exact result, and an exact result must round-trip
    assert res is None or res != data or pymodel.decompress_noheader(bytes(body), ulen) == res


def test_plan_buckets_stable():
    # same-shaped streams share one compiled pipeline (no per-stream
    # recompiles): nearby sizes land in identical buckets
    a = decode_ws.plan(350000, 702087)
    b = decode_ws.plan(351234, 700000)
    assert a == b
    assert decode_ws.plan(100, 1000) is None       # single-segment: block path

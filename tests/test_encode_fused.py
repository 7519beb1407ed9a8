"""Fused block encoder: valid grammar, oracle-decodable, ratio bar.

Runs the shipping kernel through the Pallas interpreter on CPU.
"""
import numpy as np
import pytest

from csnappy_tpu.models import pymodel, wire
from csnappy_tpu.ops import encode_fused


def _enc1(data: bytes, bs: int = 4096) -> bytes:
    arr = np.zeros((1, bs), np.uint8)
    arr[0, : len(data)] = np.frombuffer(data, np.uint8)
    comp, lens = encode_fused.encode_blocks(arr, np.array([len(data)], np.int32))
    return comp[0, : lens[0]].tobytes()


@pytest.mark.parametrize(
    "data",
    [
        b"",
        b"a",
        b"hello world hello world hello",
        b"a" * 4096,                       # RLE
        b"ab" * 2048,
        bytes(range(256)) * 16,            # far matches
        b"the quick brown fox jumps over the lazy dog " * 90,
    ],
)
def test_roundtrip_via_oracle(data):
    frag = _enc1(data)
    assert pymodel.decompress_noheader(frag, 4096) == data
    assert len(frag) <= wire.max_compressed_length(len(data)) or not data


def test_incompressible_within_bound():
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, 4000, dtype=np.uint8).tobytes()
    frag = _enc1(data)
    assert pymodel.decompress_noheader(frag, 4096) == data
    assert len(frag) <= wire.max_compressed_length(4000)


def test_batched_blocks(urls10k):
    nb = 8
    pages = np.zeros((nb, 4096), np.uint8)
    pages.reshape(-1)[: nb * 4096] = np.frombuffer(urls10k[: nb * 4096], np.uint8)
    lens = np.full((nb,), 4096, np.int32)
    comp, clens = encode_fused.encode_blocks(pages, lens)
    for i in range(nb):
        frag = comp[i, : clens[i]].tobytes()
        assert pymodel.decompress_noheader(frag, 4096) == urls10k[i * 4096 : (i + 1) * 4096]


def test_ratio_beats_reference_on_urls_head(urls10k):
    # first 32K block: the fused encoder resolves match extensions densely
    # (4+8 byte rounds, no serial extension walk), trading ~2% ratio vs the
    # exhaustive oracle for a branchless walk; the binding bar — whole-file
    # size <= the reference's 357,267 B — is asserted on hardware by
    # `make hwtest` and bench.py
    data = urls10k[:32768]
    frag = _enc1(data, bs=32768)
    assert pymodel.decompress_noheader(frag, 32768) == data
    assert len(frag) <= len(pymodel.compress_fragment(data)) * 1.04


def test_grammar_decoded_by_fused_decoder(urls10k):
    # cross-kernel: fused encoder -> fused decoder
    from csnappy_tpu.ops import decode_fused

    data = urls10k[:4096]
    frag = _enc1(data)
    arr = np.frombuffer(frag, np.uint8)[None, :]
    out, produced, status = decode_fused.decode_blocks(
        arr, np.array([len(frag)], np.int32), 4096
    )
    assert int(status[0]) == 0
    assert out[0, : len(data)].tobytes() == data


def test_fuzz_roundtrip():
    rng = np.random.default_rng(9)
    for trial in range(8):
        n = int(rng.integers(1, 4096))
        if trial % 2:
            data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        else:
            data = (b"abcdefgh" * (n // 8 + 1))[:n]
        frag = _enc1(data)
        assert pymodel.decompress_noheader(frag, 4096) == data, trial

"""Regression tests for the round-2 advisor findings (ADVICE.md r2)."""
import numpy as np
import pytest

from csnappy_tpu import api
from csnappy_tpu.errors import E_OK, SnappyError, E_OUTPUT_OVERRUN
from csnappy_tpu.models import pymodel


def test_dst_len_zero_is_overrun():
    # b'\x00X' is a 1-byte literal: with dst_len=0 it must be
    # E_OUTPUT_OVERRUN, not E_OK with one byte of data (ADVICE r2 #1)
    with pytest.raises(SnappyError) as ei:
        api.decompress_noheader(b"\x00X", 0)
    assert ei.value.code == E_OUTPUT_OVERRUN


def test_dst_len_zero_empty_stream_ok():
    assert api.decompress_noheader(b"", 0) == b""


def test_sharded_fragment_odd_out_cap():
    # 4608-byte output rounds to 4608 under the old 128-multiple rule, which
    # is not a whole 1024 group — crashed at trace time (ADVICE r2 #2)
    from csnappy_tpu.parallel import mesh

    data = bytes(np.random.default_rng(7).integers(65, 91, 4608, dtype=np.uint8))
    frag = pymodel.compress_fragment(data[: 4608])
    outs = mesh.decompress_fragments_sharded([frag], [4608])
    assert outs[0] == data[:4608]


def test_walk_exact_tmax_tag_count():
    # 2048 two-byte literal tags = exactly TMAX tags for a 4096-byte padded
    # stream, with the final tag landing p == slen as t hits TMAX: the walk
    # must observe the clean end, not spin to the round bound (ADVICE r2 #3)
    from csnappy_tpu.ops import decode_fused

    payload = bytes(range(256)) * 8
    comp = b"".join(b"\x00" + bytes([payload[i]]) for i in range(2048))
    assert len(comp) == 4096
    arr = np.frombuffer(comp, np.uint8)[None, :]
    out, produced, status = decode_fused.decode_blocks(
        arr, np.array([4096], np.int32), 2048
    )
    assert int(status[0]) == E_OK
    assert int(produced[0]) == 2048
    assert out[0, :2048].tobytes() == payload


def test_stream_walk_exact_tmax_segment():
    # same pattern through the whole-stream segmented decoder
    comp = b"".join(b"\x00" + bytes([i & 0xFF]) for i in range(2048))
    expect = bytes(i & 0xFF for i in range(2048))
    got = api.decompress_noheader(comp, 2048)
    assert got == expect

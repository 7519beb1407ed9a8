"""C++ host runtime: conformance, interop with all backends, compactor."""
import numpy as np
import pytest

from csnappy_tpu import api, errors
from csnappy_tpu.models import pymodel, wire
from csnappy_tpu.runtime import native

pytestmark = pytest.mark.skipif(not native.available(), reason="native lib not built")


def test_golden_decode(urls10k, urls10k_snappy):
    assert native.decompress(urls10k_snappy, len(urls10k)) == urls10k


def test_unaligned_decode(unaligned_bin, unaligned_snappy):
    assert native.decompress(unaligned_snappy, len(unaligned_bin)) == unaligned_bin


def test_baddata3_rejected(baddata3):
    with pytest.raises(errors.SnappyError):
        native.decompress(baddata3, 1 << 22)


def test_roundtrip_and_ratio(urls10k):
    comp = native.compress(urls10k)
    assert pymodel.decompress(comp) == urls10k       # py oracle decodes it
    assert native.decompress(comp, len(urls10k)) == urls10k
    assert len(comp) <= 357267, f"native ratio regression: {len(comp)}"


def test_cross_backend_interop(urls10k):
    data = urls10k[:100000]
    for enc in ("py", "native", "jax"):
        comp = api.compress(data, backend=enc)
        for dec in ("py", "native", "jax"):
            assert api.decompress(comp, backend=dec) == data, (enc, dec)


def test_error_codes(urls10k, urls10k_snappy):
    with pytest.raises(errors.SnappyError) as ei:
        native.decompress(urls10k_snappy, 100)
    assert ei.value.code == errors.E_OUTPUT_INSUF
    with pytest.raises(errors.SnappyError) as ei:
        native.decompress(b"\xff\xff\xff\xff\xff\xff", 10)
    assert ei.value.code == errors.E_HEADER_BAD
    hdr = wire.varint_decode(urls10k_snappy)[1]
    with pytest.raises(errors.SnappyError) as ei:
        native.decompress_noheader(urls10k_snappy[hdr:], len(urls10k) - 1)
    assert ei.value.code == errors.E_OUTPUT_OVERRUN
    with pytest.raises(errors.SnappyError):
        native.decompress(b"\x32\xc4foooooo", 4096)


@pytest.mark.parametrize("data", [b"", b"x", b"a" * 70000, bytes(range(256)) * 200])
def test_roundtrip_patterns(data):
    comp = native.compress(data)
    assert native.decompress(comp, len(data)) == data
    assert pymodel.decompress(comp) == data


def test_compact():
    padded = np.zeros((3, 16), np.uint8)
    padded[0, :4] = [1, 2, 3, 4]
    padded[1, :2] = [5, 6]
    padded[2, :3] = [7, 8, 9]
    assert native.compact(padded, np.array([4, 2, 3])) == bytes([1, 2, 3, 4, 5, 6, 7, 8, 9])

#!/usr/bin/env python
"""`make hwtest` — conformance smoke on the REAL chip, non-interpret.

CI runs the shipping Pallas kernels in interpreter mode on CPU, which
computes f32 matmuls exactly and therefore hides bf16/int8 limb-width
regressions (ARCHITECTURE.md).  This target executes the golden-vector
subset on hardware in a couple of minutes so limb regressions are caught
by `make hwtest`, not by bench archaeology (VERDICT r2 weak #5).
"""
import os
import pathlib
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", str(pathlib.Path(__file__).parent.parent / ".jax_cache")
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax

from csnappy_tpu import api
from csnappy_tpu.errors import E_OK, SnappyError
from csnappy_tpu.models import pymodel, wire

DATA = pathlib.Path(__file__).parent.parent / "tests" / "data"
t0 = time.time()
dev = jax.devices()[0]
assert "cpu" not in str(dev).lower(), f"hwtest must run on the chip, got {dev}"
print(f"hwtest on {dev}", flush=True)

data = (DATA / "urls.10K").read_bytes()
golden = (DATA / "urls.10K.snappy").read_bytes()

# 1. golden decode, bit-exact (csnappy conformance anchor)
assert api.decompress(golden) == data, "golden decode mismatch"
print(f"[{time.time()-t0:5.1f}s] golden decode OK", flush=True)

# 2. compress -> decode roundtrip + size parity
comp = api.compress(data)
assert len(comp) <= len(golden), f"ratio regressed: {len(comp)} > {len(golden)}"
assert api.decompress(comp) == data, "self roundtrip mismatch"
assert pymodel.decompress(comp) == data, "oracle rejects our stream"
print(f"[{time.time()-t0:5.1f}s] roundtrip OK ({len(comp)} B <= {len(golden)} B)", flush=True)

# 3. adversarial vectors must be rejected cleanly
for name, blob in (
    ("baddata3", (DATA / "baddata3.snappy").read_bytes()),
    ("fake", b"\x32\xc4foooooo"),
):
    try:
        api.decompress(blob)
        raise AssertionError(f"{name} NOT rejected")
    except SnappyError:
        pass
print(f"[{time.time()-t0:5.1f}s] adversarial vectors rejected", flush=True)

# 4. unaligned_uint64 regression pair
import gzip

ubin = gzip.decompress((DATA / "unaligned_uint64_test.bin.gz").read_bytes())
usz = gzip.decompress((DATA / "unaligned_uint64_test.snappy.gz").read_bytes())
assert api.decompress(usz) == ubin, "unaligned_uint64 decode mismatch"
print(f"[{time.time()-t0:5.1f}s] unaligned_uint64 OK", flush=True)

# 5. randomized roundtrip fuzz (RLE / random / text-ish)
rng = np.random.default_rng(7)
cases = [
    rng.integers(0, 256, 5000, dtype=np.uint8).tobytes(),
    b"ab" * 9000,
    bytes(rng.integers(97, 102, 40000, dtype=np.uint8)),
    b"",
    b"x",
]
for i, d in enumerate(cases):
    c = api.compress(d)
    assert api.decompress(c) == d, f"fuzz case {i} roundtrip failed"
print(f"[{time.time()-t0:5.1f}s] fuzz roundtrips OK — hwtest PASSED", flush=True)

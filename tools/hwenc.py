#!/usr/bin/env python
"""Round-3 hardware probe: fused encoder GB/s + compressed size on urls.10K.

Usage: python tools/hwenc.py [--phases]
"""
import os
import pathlib
import sys

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", str(pathlib.Path(__file__).parent.parent / ".jax_cache")
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

from csnappy_tpu.models import pymodel, wire
from csnappy_tpu.ops import encode_fused
from csnappy_tpu.tools.timing import slope_time

DATA_DIR = pathlib.Path(__file__).parent.parent / "tests" / "data"


def main():
    data = (DATA_DIR / "urls.10K").read_bytes()
    n = len(data)
    nb = (n + 32768 - 1) // 32768
    Bp = encode_fused._round_up(nb, 8)
    pages = np.zeros((Bp, 32768), np.uint8)
    pages.reshape(-1)[:n] = np.frombuffer(data, np.uint8)
    blens = np.zeros((Bp,), np.int32)
    blens[:nb] = 32768
    blens[nb - 1] = n - (nb - 1) * 32768
    comp, clens = encode_fused.encode_blocks(pages, blens)
    body = int(clens[:nb].sum())
    fn0 = encode_fused._compiled(Bp, 256)
    _, meta0 = fn0(jnp.asarray(pages.astype(np.int32)), jnp.asarray(blens))
    m0 = np.asarray(meta0)
    print(f"steps/blk={m0[:nb,2].mean():.0f}", flush=True)
    stream = b"".join(comp[i, : clens[i]].tobytes() for i in range(nb))
    rt = pymodel.decompress_noheader(stream, n)
    assert rt == data, "roundtrip FAILED"
    print(f"device={jax.devices()[0]}  body={body}B  (+hdr={len(wire.varint_encode(n))})"
          f"  ref=357267  r2=346059  true-greedy=346254", flush=True)

    efn = encode_fused._compiled(Bp, 256)
    pages_dev = jax.device_put(jnp.asarray(pages.astype(np.int32)))
    blens_dev = jax.device_put(jnp.asarray(blens))

    def enc_step(k):
        c, m = efn(pages_dev ^ (k & 1), blens_dev)
        return m[:, 0].sum() + c[0, 0, 0]

    t = slope_time(enc_step, k_lo=2, k_hi=8, reps=3)
    print(f"B={Bp}  t={t*1e3:8.3f} ms/batch  {n/t/1e9:7.4f} GB/s", flush=True)

    if "--phases" in sys.argv:
        prev = 0.0
        for ph in (1, 2, 3, 4, 5, 6, 7, 99):
            efn = encode_fused._compiled(Bp, 256, 16, phases=ph)

            def enc_step2(k):
                c, m = efn(pages_dev ^ (k & 1), blens_dev)
                return m[:, 0].sum() + c[0, 0, 0]

            t = slope_time(enc_step2, k_lo=2, k_hi=8, reps=3)
            print(f"phase<={ph:2d}  t={t*1e3:8.3f} ms  delta={(t-prev)*1e3:8.3f} ms",
                  flush=True)
            prev = t


if __name__ == "__main__":
    main()

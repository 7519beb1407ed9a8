#!/usr/bin/env python
"""Round-3 hardware probe: new fused decode kernel GB/s at several batch
sizes (VERDICT r2 #3: measure at a saturating batch), plus phase profile.

Usage: python tools/hwdec.py [--phases] [--batches 16,64,128]
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

from csnappy_tpu.models import pymodel
from csnappy_tpu.ops import decode_fused
from csnappy_tpu.tools.timing import slope_time

DATA_DIR = pathlib.Path(__file__).parent.parent / "tests" / "data"


def main():
    data = (DATA_DIR / "urls.10K").read_bytes()
    batches = [16, 64, 128]
    phases = "--phases" in sys.argv
    for a in sys.argv[1:]:
        if a.startswith("--batches"):
            batches = [int(x) for x in a.split("=", 1)[1].split(",")]

    blocks16 = [data[i * 32768 : (i + 1) * 32768] or data[:32768] for i in range(16)]
    frags16 = [pymodel.compress_fragment(b) for b in blocks16]
    P = decode_fused._round_up(max(len(f) for f in frags16) + 128, 1024)
    print(f"device={jax.devices()[0]} P={P}", flush=True)

    for B in batches:
        blocks = [blocks16[i % 16] for i in range(B)]
        frags = [frags16[i % 16] for i in range(B)]
        arr = np.zeros((B, P), np.uint8)
        lens = np.zeros((B,), np.int32)
        for i, f in enumerate(frags):
            arr[i, : len(f)] = np.frombuffer(f, np.uint8)
            lens[i] = len(f)
        out, produced, status = decode_fused.decode_blocks(arr, lens, 32768)
        assert (status == 0).all(), status
        for i, b in enumerate(blocks):
            assert out[i, : len(b)].tobytes() == b, f"block {i} mismatch"
        total = sum(len(b) for b in blocks)

        dfn = decode_fused._compiled(B, P // 128, 256)
        comp_dev = jax.device_put(
            jnp.asarray(arr.astype(np.int32)).reshape(B, P // 128, 128)
        )
        lens_dev = jax.device_put(jnp.asarray(lens))
        cap_dev = jax.device_put(jnp.full((B,), 32768, np.int32))

        def dec_step(k):
            ck = comp_dev.at[:, -1, 127].add(k & 63)
            o, m = dfn(lens_dev, cap_dev, ck)
            return m[:, 0].sum() + o[0, 0, 0]

        t = slope_time(dec_step)
        print(
            f"B={B:4d}  t={t*1e3:8.3f} ms/batch  {total/t/1e9:7.4f} GB/s",
            flush=True,
        )

    if phases:
        B = batches[0]
        arr = np.zeros((B, P), np.uint8)
        lens = np.zeros((B,), np.int32)
        for i in range(B):
            f = frags16[i % 16]
            arr[i, : len(f)] = np.frombuffer(f, np.uint8)
            lens[i] = len(f)
        comp_dev = jax.device_put(
            jnp.asarray(arr.astype(np.int32)).reshape(B, P // 128, 128)
        )
        lens_dev = jax.device_put(jnp.asarray(lens))
        cap_dev = jax.device_put(jnp.full((B,), 32768, np.int32))
        prev = 0.0
        for ph in (1, 2, 3, 4, 99):
            dfn = decode_fused._compiled(B, P // 128, 256, phases=ph)

            def dec_step(k):
                ck = comp_dev.at[:, -1, 127].add(k & 63)
                o, m = dfn(lens_dev, cap_dev, ck)
                return m[:, 0].sum() + o[0, 0, 0]

            t = slope_time(dec_step, k_lo=2, k_hi=10, reps=4)
            print(
                f"phase<={ph:2d}  t={t*1e3:8.3f} ms  delta={(t-prev)*1e3:8.3f} ms",
                flush=True,
            )
            prev = t


if __name__ == "__main__":
    main()

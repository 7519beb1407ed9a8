#!/usr/bin/env python
"""Benchmark runner — prints ONE JSON line (driver contract).

Headline metric: urls.10K whole-stream decompress GB/s on one chip,
vs the reference's 645.5 MB/s single-core x86 (userspace_benchmark.txt:101,
BASELINE.md).  Secondary keys: compress GB/s (ref 240.1 MB/s), batched
block-mode throughput, and compressed-size parity (ref 357,267 B).

Times are device-resident (inputs pre-placed, outputs blocked on) — host
transfer over this environment's relay is excluded, matching how the
reference's numbers time the codec only (block_compressor.c:312-314).
"""
import functools
import json
import os
import pathlib
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(pathlib.Path(__file__).parent / ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent))

from csnappy_tpu.models import wire
from csnappy_tpu.ops import decode_jnp, encode_jnp

DATA_DIR = pathlib.Path(__file__).parent / "tests" / "data"
REF_DECOMPRESS_GBPS = 0.6455
REF_COMPRESS_GBPS = 0.2401
REF_SIZE = 357267


def time_fn(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        r = fn(*args)
    jax.block_until_ready(r)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(*args)
        jax.block_until_ready(r)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    data = (DATA_DIR / "urls.10K").read_bytes()
    golden = (DATA_DIR / "urls.10K.snappy").read_bytes()
    n = len(data)
    ulen, hdr = wire.varint_decode(golden)
    body = np.frombuffer(golden[hdr:], np.uint8)

    # --- whole-stream decompress (single stream) ---
    P = decode_jnp._bucket(len(body))
    OUT = decode_jnp._bucket(ulen)
    comp_dev = jax.device_put(jnp.asarray(np.pad(body, (0, P - len(body))).astype(np.int32)))
    sl = jax.device_put(jnp.int32(len(body)))
    dl = jax.device_put(jnp.int32(ulen))
    dec_fn = decode_jnp._compiled_single(P, OUT)
    out, produced, status = dec_fn(comp_dev, sl, dl)
    assert int(status) == 0 and int(produced) == n
    assert np.asarray(out[:n]).astype(np.uint8).tobytes() == data, "decode mismatch"
    t_dec = time_fn(dec_fn, comp_dev, sl, dl)
    dec_gbps = n / t_dec / 1e9

    # --- whole-stream compress (batched 32KB fragments of urls.10K) ---
    bs = wire.BLOCK_SIZE
    nb = (n + bs - 1) // bs
    pages = np.zeros((nb, bs), np.uint8)
    pages.reshape(-1)[:n] = np.frombuffer(data, np.uint8)
    blens = np.full((nb,), bs, np.int32)
    blens[-1] = n - (nb - 1) * bs
    enc_fn = encode_jnp._compiled_batch(bs)
    pages_dev = jax.device_put(jnp.asarray(pages.astype(np.int32)))
    blens_dev = jax.device_put(jnp.asarray(blens))
    comp, clens = enc_fn(pages_dev, blens_dev)
    comp_np, clens_np = np.asarray(comp), np.asarray(clens)
    comp_size = len(wire.varint_encode(n)) + int(clens_np.sum())
    # validity: our own decoder must roundtrip the emitted stream
    stream = b"".join(comp_np[i, : clens_np[i]].tobytes() for i in range(nb))
    rt, rt_produced, rt_status = decode_jnp.decompress_noheader_np(
        np.frombuffer(stream, np.uint8), n
    )
    assert int(rt_status) == 0 and rt.tobytes() == data, "compress roundtrip failed"
    t_enc = time_fn(enc_fn, pages_dev, blens_dev)
    enc_gbps = n / t_enc / 1e9

    # --- batched block-mode decompress throughput (16 streams) ---
    REP = 16
    comp_batch = np.zeros((REP, P), np.uint8)
    comp_batch[:, : len(body)] = body
    bfn = decode_jnp._compiled_batch(P, OUT)
    cb = jax.device_put(jnp.asarray(comp_batch.astype(np.int32)))
    ls = jax.device_put(jnp.full((REP,), len(body), np.int32))
    ds = jax.device_put(jnp.full((REP,), ulen, np.int32))
    jax.block_until_ready(bfn(cb, ls, ds))
    t_bdec = time_fn(bfn, cb, ls, ds, iters=5)
    bdec_gbps = REP * n / t_bdec / 1e9

    result = {
        "metric": "urls10k_decompress_GBps_per_chip",
        "value": round(dec_gbps, 3),
        "unit": "GB/s",
        "vs_baseline": round(dec_gbps / REF_DECOMPRESS_GBPS, 2),
        "compress_GBps": round(enc_gbps, 3),
        "compress_vs_baseline": round(enc_gbps / REF_COMPRESS_GBPS, 2),
        "batched16_decompress_GBps": round(bdec_gbps, 3),
        "compressed_bytes": comp_size,
        "ref_compressed_bytes": REF_SIZE,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()

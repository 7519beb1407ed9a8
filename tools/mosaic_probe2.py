#!/usr/bin/env python
"""Mosaic probe round 2: walk cost (real slope), SMEM stores/capacity,
aligned row writes, static roll, windowed VMEM->SMEM DMA, gather loop."""
import functools
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 304
INTERP = jax.default_backend() == "cpu"


def _call(kernel, extra_scratch=(), out_rows=8):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((out_rows, 128), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=list(extra_scratch),
        interpret=INTERP,
    )


def k_roll_static_min(k_ref, d_ref, o_ref):
    x = d_ref[0:8, :]

    def body(i, acc):
        return pltpu.roll(acc, 5, 1) + x

    o_ref[...] = jax.lax.fori_loop(0, k_ref[0], body, jnp.zeros((8, 128), jnp.int32))


def k_walk_smem_st(k_ref, d_ref, o_ref, smem, tags, sem):
    cp = pltpu.make_async_copy(d_ref.at[0:16], smem, sem)
    cp.start()
    cp.wait()

    def body(i, c):
        p, acc = c
        v = smem[p >> 7, p & 127]
        tags[i & 1023] = p
        tags[1024 + (i & 1023)] = acc
        return (p + (v & 63) + 1) & (16 * 128 - 1), acc + v

    p, acc = jax.lax.fori_loop(0, k_ref[0], body, (0, 0))
    o_ref[...] = jnp.full((8, 128), acc + p + tags[0], jnp.int32)


def k_walk_smem_big(k_ref, d_ref, o_ref, smem, sem):
    cp = pltpu.make_async_copy(d_ref.at[0:128], smem, sem)
    cp.start()
    cp.wait()

    def body(i, c):
        p, acc = c
        v = smem[p >> 7, p & 127]
        return (p + (v & 63) + 1) & (128 * 128 - 1), acc + v

    p, acc = jax.lax.fori_loop(0, k_ref[0], body, (0, 0))
    o_ref[...] = jnp.full((8, 128), acc + p, jnp.int32)


def k_smem_window_dma(k_ref, d_ref, o_ref, smem, sem):
    """Walk that re-DMAs a fresh 16-row window every 256 iterations."""

    def body(i, c):
        p, acc, base = c

        def refill(b):
            nb = (b + 16) % (ROWS - 16)
            cp = pltpu.make_async_copy(d_ref.at[pl.ds(nb, 16)], smem, sem)
            cp.start()
            cp.wait()
            return nb

        base = jax.lax.cond(i % 256 == 255, refill, lambda b: b, base)
        v = smem[p >> 7, p & 127]
        return (p + (v & 63) + 1) & (16 * 128 - 1), acc + v, base

    p, acc, _ = jax.lax.fori_loop(0, k_ref[0], body, (0, 0, 0))
    o_ref[...] = jnp.full((8, 128), acc + p, jnp.int32)


def k_row_write_al(k_ref, d_ref, o_ref, scr):
    def body(i, c):
        r, acc = c
        r8 = pl.multiple_of((r % 8) * 8, 8)
        scr[pl.ds(r8, 8), :] = d_ref[pl.ds(r8, 8), :] + i
        return r + 1, acc

    r, _ = jax.lax.fori_loop(0, k_ref[0], body, (0, 0))
    o_ref[...] = scr[0:8, :] + r


def k_gather_loop(k_ref, d_ref, o_ref):
    """Full gather_flat inner pattern: idx row read + 2 one-hots + 2 dots
    + masked reduce + assemble into (8,128) carry."""
    R = 256

    def body(i, c):
        r, acc = c
        idx = d_ref[pl.ds(r % ROWS, 1), :] & (R * 128 - 1)   # (1,128)
        q = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0)
        roh = ((idx >> 7) == q).astype(jnp.bfloat16)
        lq = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        loh = (idx & 127) == lq
        acc2 = jnp.zeros((1, 128), jnp.int32)
        for k in range(2):
            limb = ((d_ref[0:R, :] >> (8 * k)) & 0xFF).astype(jnp.bfloat16)
            picked = jax.lax.dot_general(
                limb, roh, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            val = jnp.sum(jnp.where(loh, picked, 0.0), axis=0, keepdims=True)
            acc2 = acc2 | (val.astype(jnp.int32) << (8 * k))
        rowi = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        acc = jnp.where(rowi == (i & 7), acc2, acc)
        return r + 1, acc

    r, acc = jax.lax.fori_loop(0, k_ref[0], body, (0, jnp.zeros((8, 128), jnp.int32)))
    o_ref[...] = acc + r


def k_scatter_loop(k_ref, d_ref, o_ref):
    """scatter_sum_tile inner pattern cost."""
    CO = 256

    def body(i, c):
        r, acc = c
        pos = d_ref[pl.ds(r % ROWS, 1), :] & (CO * 128 - 1)
        val = d_ref[pl.ds((r + 1) % ROWS, 1), :] & 0x7FFF
        q = jax.lax.broadcasted_iota(jnp.int32, (CO, 128), 0)
        roh = ((pos >> 7) == q).astype(jnp.bfloat16)
        lq = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        loh = ((pos & 127) == lq).astype(jnp.bfloat16)
        h = jnp.zeros((1, 128), jnp.float32)
        for k in range(2):
            w = roh * ((val >> (8 * k)) & 0xFF).astype(jnp.bfloat16)
            hk = jax.lax.dot_general(
                w, loh, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            h = h + hk[0:1, :]
        return r + 1, acc + h.astype(jnp.int32)

    r, acc = jax.lax.fori_loop(0, k_ref[0], body, (0, jnp.zeros((1, 128), jnp.int32)))
    o_ref[...] = jnp.broadcast_to(acc, (8, 128)) + r


PROBES = {
    "roll_static_min": (k_roll_static_min, (), (1024, 8192)),
    "walk_smem_st": (
        k_walk_smem_st,
        (pltpu.SMEM((16, 128), jnp.int32), pltpu.SMEM((2048,), jnp.int32),
         pltpu.SemaphoreType.DMA),
        (2048, 16384),
    ),
    "walk_smem_big": (
        k_walk_smem_big,
        (pltpu.SMEM((128, 128), jnp.int32), pltpu.SemaphoreType.DMA),
        (2048, 16384),
    ),
    "smem_window_dma": (
        k_smem_window_dma,
        (pltpu.SMEM((16, 128), jnp.int32), pltpu.SemaphoreType.DMA),
        (2048, 16384),
    ),
    "row_write_al": (k_row_write_al, (pltpu.VMEM((64, 128), jnp.int32),), (1024, 8192)),
    "gather_loop": (k_gather_loop, (), (256, 2048)),
    "scatter_loop": (k_scatter_loop, (), (256, 2048)),
}


def slope(fn, data, k_lo, k_hi, reps=3):
    f = jax.jit(lambda k, d: fn(k, d).sum())
    int(f(jnp.full((1,), 8, jnp.int32), data))
    ts = {}
    for K in (k_lo, k_hi):
        best = 1e9
        for r in range(reps):
            t0 = time.perf_counter()
            int(f(jnp.full((1,), K, jnp.int32), data + r))
            best = min(best, time.perf_counter() - t0)
        ts[K] = best
    return (ts[k_hi] - ts[k_lo]) / (k_hi - k_lo)


def main():
    only = sys.argv[1:] or list(PROBES)
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.integers(0, 2**20, (ROWS, 128), dtype=np.int32))
    out = {}
    for name in only:
        kern, scratch, (klo, khi) = PROBES[name]
        try:
            fn = _call(kern, scratch)
            t = slope(functools.partial(fn), data, klo, khi)
            out[name] = {"ns_per_iter": round(t * 1e9, 1)}
        except Exception as e:  # noqa: BLE001
            out[name] = {"error": str(e).split("\n")[0][:200]}
        print(name, json.dumps(out[name]), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

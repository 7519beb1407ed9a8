#!/usr/bin/env python
"""Probe wave 5 (round 3): SMEM capacity and interleaved scalar walks.

The fused decoder's tag walk is a dependent SMEM load chain (~13ns/step).
Blocks are independent, so walking TWO blocks' chains in one loop should
hide load latency — if SMEM holds two pair tables (2 x 73KB) plus two tag
buffers (2 x 78KB).  Measures:

  * max SMEM allocation that compiles/runs (binary probe at fixed sizes);
  * ns/step for 1-chain vs 2-chain-interleaved walks over SMEM tables.
"""
import functools
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from csnappy_tpu.tools.timing import slope_time

INTERP = jax.default_backend() == "cpu"
L = 128


def smem_cap(rows):
    def k(k_ref, o_ref, s_ref):
        s_ref[0, 0] = k_ref[0]
        s_ref[rows - 1, L - 1] = k_ref[0] + 1
        o_ref[...] = jnp.zeros((8, L), jnp.int32) + s_ref[rows - 1, L - 1]

    try:
        fn = pl.pallas_call(
            k,
            out_shape=jax.ShapeDtypeStruct((8, L), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SMEM((rows, L), jnp.int32)],
            interpret=INTERP,
        )
        r = jax.jit(fn)(jnp.ones((4,), jnp.int32))
        return int(np.asarray(r)[0, 0]) == 2
    except Exception as e:
        print(f"  rows={rows}: {type(e).__name__}: {str(e)[:90]}")
        return False


def walk_kern(nchains, rows, k_ref, d_ref, o_ref, s_ref, t_ref):
    cp = pltpu.make_async_copy(d_ref, s_ref, t_ref)
    cp.start()
    cp.wait()
    N = k_ref[0]

    if nchains == 1:
        def step(i, c):
            p, acc = c
            v = s_ref[p >> 7, p & (L - 1)]
            return (p + (v & 0x1FFFF)) % (rows * L), acc + v

        p, acc = jax.lax.fori_loop(0, N, step, (jnp.int32(0), jnp.int32(0)))
    elif nchains == 4:
        def step(i, c):
            p1, p2, p3, p4, acc = c
            v1 = s_ref[p1 >> 7, p1 & (L - 1)]
            v2 = s_ref[p2 >> 7, p2 & (L - 1)]
            v3 = s_ref[p3 >> 7, p3 & (L - 1)]
            v4 = s_ref[p4 >> 7, p4 & (L - 1)]
            p1 = (p1 + (v1 & 0x1FFFF)) % (rows * L)
            p2 = (p2 + (v2 & 0x1FFFF)) % (rows * L)
            p3 = (p3 + (v3 & 0x1FFFF)) % (rows * L)
            p4 = (p4 + (v4 & 0x1FFFF)) % (rows * L)
            return p1, p2, p3, p4, acc + v1 + v2 + v3 + v4

        Q = rows * L // 4
        p1, p2, p3, p4, acc = jax.lax.fori_loop(
            0, N, step,
            (jnp.int32(0), jnp.int32(Q), jnp.int32(2 * Q), jnp.int32(3 * Q),
             jnp.int32(0)))
    else:
        def step(i, c):
            p1, p2, acc = c
            v1 = s_ref[p1 >> 7, p1 & (L - 1)]
            v2 = s_ref[p2 >> 7, p2 & (L - 1)]
            p1 = (p1 + (v1 & 0x1FFFF)) % (rows * L)
            p2 = (p2 + (v2 & 0x1FFFF)) % (rows * L)
            return p1, p2, acc + v1 + v2

        p1, p2, acc = jax.lax.fori_loop(
            0, N, step, (jnp.int32(0), jnp.int32(rows * L // 2), jnp.int32(0))
        )
    o_ref[...] = jnp.zeros((8, L), jnp.int32) + acc


def time_walk(nchains, rows):
    kern = functools.partial(walk_kern, nchains, rows)
    fn = jax.jit(pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, L), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SMEM((rows, L), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=INTERP,
    ))
    rng = np.random.default_rng(0)
    adv = rng.integers(2, 9, size=(rows, L)).astype(np.int32)
    d = jnp.asarray(adv)
    N = 131072

    def stp(k):
        return fn(jnp.full((4,), N, jnp.int32), d.at[0, 0].add(k & 7))[0, 0]

    t = slope_time(stp, k_lo=2, k_hi=10, reps=4)
    print(f"walk chains={nchains} rows={rows}: {t/(N*nchains)*1e9:7.2f} ns/step",
          flush=True)


def main():
    print(f"device={jax.devices()[0]}", flush=True)
    if "--smem" in sys.argv:
        for rows in (256, 512, 768, 1024, 1536, 2048):
            ok = smem_cap(rows)
            print(f"SMEM rows={rows} ({rows*L*4//1024}KB): {'ok' if ok else 'FAIL'}",
                  flush=True)
            if not ok:
                break
    time_walk(1, 144)
    time_walk(2, 144)
    time_walk(2, 288)
    time_walk(4, 144)
    time_walk(4, 576)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Mosaic capability + latency probe for the fused codec kernels.

Measures, on the real chip, the per-op cost of the constructs the fused
decoder/encoder kernels depend on (ARCHITECTURE.md routing table):

  walk_load      — fori_loop with a dynamic scalar VMEM read per iteration
  walk_ldst      — + a dynamic scalar VMEM write per iteration
  walk_while     — same loop as lax.while_loop (dynamic trip)
  walk_smem      — scalar read from an SMEM scratch copy
  row_read       — dynamic row slice read (pl.ds(r,1), :) per iteration
  row_write      — dynamic row slice write per iteration
  mm_small       — (128,256)@(256,128) bf16 matmul per iteration (MXU latency)
  onehot_row     — build a (128,256) one-hot + matmul per iteration
  vpu_dense      — (8,128) dense ops per iteration (calibration)
  roll_static / roll_dyn — pltpu.roll with static / traced shift

Each kernel loops K times inside one pallas_call (K a traced SMEM scalar), so
per-iteration cost is the slope between two K values — immune to the axon
relay's dispatch-ack lies (see bench.py).
"""
import functools
import json
import os
import pathlib
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

ROWS = 304
INTERP = jax.default_backend() == "cpu"


def _call(kernel, extra_scratch=(), out_rows=8):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((out_rows, 128), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # k (1,)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # data (ROWS,128)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=list(extra_scratch),
        interpret=INTERP,
    )


def k_walk_load(k_ref, d_ref, o_ref):
    def body(i, c):
        p, acc = c
        v = d_ref[p >> 7, p & 127]
        return (p + (v & 63) + 1) % (ROWS * 128), acc + v

    p, acc = jax.lax.fori_loop(0, k_ref[0], body, (0, 0))
    o_ref[...] = jnp.full((8, 128), acc + p, jnp.int32)


def k_walk_ldst(k_ref, d_ref, o_ref, scr):
    def body(i, c):
        p, acc = c
        v = d_ref[p >> 7, p & 127]
        scr[i & 2047] = v
        return (p + (v & 63) + 1) % (ROWS * 128), acc + v

    p, acc = jax.lax.fori_loop(0, k_ref[0], body, (0, 0))
    o_ref[...] = jnp.full((8, 128), acc + p + scr[0], jnp.int32)


def k_walk_vst(k_ref, d_ref, o_ref, scr):
    def body(i, c):
        p, acc = c
        v = d_ref[p >> 7, p & 127]
        scr[(i >> 7) & 15, i & 127] = v
        return (p + (v & 63) + 1) % (ROWS * 128), acc + v

    p, acc = jax.lax.fori_loop(0, k_ref[0], body, (0, 0))
    o_ref[...] = jnp.full((8, 128), acc + p + scr[0, 0], jnp.int32)


def k_walk_while(k_ref, d_ref, o_ref):
    def cond(c):
        i, p, acc = c
        return i < k_ref[0]

    def body(c):
        i, p, acc = c
        v = d_ref[p >> 7, p & 127]
        return i + 1, (p + (v & 63) + 1) % (ROWS * 128), acc + v

    i, p, acc = jax.lax.while_loop(cond, body, (0, 0, 0))
    o_ref[...] = jnp.full((8, 128), acc + p, jnp.int32)


def k_walk_smem(k_ref, d_ref, o_ref, smem, sem):
    cp = pltpu.make_async_copy(d_ref.at[0:16], smem, sem)
    cp.start()
    cp.wait()

    def body(i, c):
        p, acc = c
        v = smem[p >> 7, p & 127]
        return (p + (v & 63) + 1) % (16 * 128), acc + v

    p, acc = jax.lax.fori_loop(0, k_ref[0], body, (0, 0))
    o_ref[...] = jnp.full((8, 128), acc + p, jnp.int32)


def k_row_read(k_ref, d_ref, o_ref):
    def body(i, c):
        r, acc = c
        row = d_ref[pl.ds(r, 1), :]
        return (r + 7) % ROWS, acc + row

    r, acc = jax.lax.fori_loop(0, k_ref[0], body, (0, jnp.zeros((1, 128), jnp.int32)))
    o_ref[...] = jnp.broadcast_to(acc, (8, 128)) + r


def k_row_write(k_ref, d_ref, o_ref, scr):
    def body(i, c):
        r, acc = c
        scr[pl.ds(r % 64, 1), :] = d_ref[pl.ds(r, 1), :] + i
        return (r + 7) % ROWS, acc

    r, _ = jax.lax.fori_loop(0, k_ref[0], body, (0, 0))
    o_ref[...] = jnp.broadcast_to(scr[0:1, :], (8, 128)) + r


def k_mm_small(k_ref, d_ref, o_ref):
    a = (d_ref[0:128, :] & 1).astype(jnp.bfloat16)
    b = (d_ref[0:128, :] & 3).astype(jnp.bfloat16)

    def body(i, acc):
        c = jnp.dot(a + acc[0, 0], b, preferred_element_type=jnp.float32)
        return acc + (c[0:8, :] * 1e-9).astype(jnp.bfloat16)

    acc = jax.lax.fori_loop(0, k_ref[0], body, jnp.zeros((8, 128), jnp.bfloat16))
    o_ref[...] = acc.astype(jnp.int32)


def k_onehot_row(k_ref, d_ref, o_ref):
    idx = d_ref[0:128, 0:128] & 255

    def body(i, acc):
        iota = jax.lax.broadcasted_iota(jnp.int32, (128, 256), 1)
        oh = ((idx[:, 0:1] + i) % 256 == iota[:, :]).astype(jnp.bfloat16)
        limb = (d_ref[0:256, :] & 255).astype(jnp.bfloat16)
        got = jnp.dot(oh, limb, preferred_element_type=jnp.float32)
        return acc + got[0:8, :].astype(jnp.int32)

    acc = jax.lax.fori_loop(0, k_ref[0], body, jnp.zeros((8, 128), jnp.int32))
    o_ref[...] = acc


def k_vpu_dense(k_ref, d_ref, o_ref):
    x = d_ref[0:8, :]

    def body(i, acc):
        return (acc + x) ^ (acc >> 1)

    o_ref[...] = jax.lax.fori_loop(0, k_ref[0], body, jnp.zeros((8, 128), jnp.int32))


def k_roll_static(k_ref, d_ref, o_ref):
    x = d_ref[0:8, :]

    def body(i, acc):
        return acc + pltpu.roll(x + acc[0:1, 0:1], 5, 1)

    o_ref[...] = jax.lax.fori_loop(0, k_ref[0], body, jnp.zeros((8, 128), jnp.int32))


def k_roll_dyn(k_ref, d_ref, o_ref):
    x = d_ref[0:8, :]

    def body(i, acc):
        return acc + pltpu.roll(x, i & 127, 1)

    o_ref[...] = jax.lax.fori_loop(0, k_ref[0], body, jnp.zeros((8, 128), jnp.int32))


PROBES = {
    "walk_load": (k_walk_load, ()),
    "walk_ldst": (k_walk_ldst, (pltpu.SMEM((2048,), jnp.int32),)),
    "walk_vst": (k_walk_vst, (pltpu.VMEM((16, 128), jnp.int32),)),
    "walk_while": (k_walk_while, ()),
    "walk_smem": (k_walk_smem, (pltpu.SMEM((16, 128), jnp.int32), pltpu.SemaphoreType.DMA)),
    "row_read": (k_row_read, ()),
    "row_write": (k_row_write, (pltpu.VMEM((64, 128), jnp.int32),)),
    "mm_small": (k_mm_small, ()),
    "onehot_row": (k_onehot_row, ()),
    "vpu_dense": (k_vpu_dense, ()),
    "roll_static": (k_roll_static, ()),
    "roll_dyn": (k_roll_dyn, ()),
}


def slope(fn, data, k_lo=1024, k_hi=4096, reps=3):
    f = jax.jit(lambda k, d: fn(k, d).sum())
    int(f(jnp.full((1,), 8, jnp.int32), data))  # compile
    ts = {}
    for K in (k_lo, k_hi):
        best = 1e9
        for r in range(reps):
            t0 = time.perf_counter()
            int(f(jnp.full((1,), K + r * 0, jnp.int32), data + r))
            best = min(best, time.perf_counter() - t0)
        ts[K] = best
    return (ts[k_hi] - ts[k_lo]) / (k_hi - k_lo)


def main():
    only = sys.argv[1:] or list(PROBES)
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.integers(0, 2**20, (ROWS, 128), dtype=np.int32))
    out = {}
    for name in only:
        kern, scratch = PROBES[name]
        try:
            fn = _call(kern, scratch)
            t = slope(functools.partial(fn), data)
            out[name] = {"ns_per_iter": round(t * 1e9, 1)}
        except Exception as e:  # noqa: BLE001 — capability probe
            out[name] = {"error": str(e).split("\n")[0][:200]}
        print(name, json.dumps(out[name]), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

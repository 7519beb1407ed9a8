#!/usr/bin/env python
"""Probe wave 4 (round 3): decode resolve-phase building-block costs.

What dominates resolve (4.78 ms of the 8.25 ms 64-block batch)?  Measures,
per call inside a pallas kernel on the real chip:

  * gather_rows_multi(nrows=32) vs table rows R and limb count — the
    per-group doubling round (R=32, 2 limbs) and value gather (R up to
    400, 1 limb);
  * lane_gather (native take_along_axis) on (32,128);
  * a while_loop whose condition is a scalar reduce of a (32,128) tile
    (the per-group convergence check) vs the same body with no check;
  * dynamic-base row-slice read ref[pl.ds(dyn, 32)] (banded-window cost).
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
from csnappy_tpu.ops import kernel_lib as kl
from csnappy_tpu.tools.timing import slope_time

INTERP = jax.default_backend() == "cpu"
RMAX = 400


def _call(kernel):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((RMAX, 128), jnp.int32)],
        interpret=INTERP,
    )


N = 1024  # fixed inner trips; k only perturbs data (timing.py contract)


def _time(name, kern, per=1):
    fn = jax.jit(_call(kern))
    d = jnp.arange(RMAX * 128, dtype=jnp.int32).reshape(RMAX, 128) % 251

    def step(k):
        return fn(jnp.full((4,), N, jnp.int32), d.at[RMAX - 1, 127].add(k & 63))[0, 0]

    t = slope_time(step, k_lo=2, k_hi=10, reps=4)
    print(f"{name:44s} {t/(per*N)*1e9:10.1f} ns/op", flush=True)


def gather_kern(R, limbs, k_ref, d_ref, o_ref, scr_ref):
    scr_ref[...] = d_ref[...] % (R * 128)

    def body(i, acc):
        (g,) = kl.gather_rows_multi(
            [(d_ref[0:R, :] & ((1 << (8 * limbs)) - 1), 8 * limbs)],
            scr_ref, 0, nrows=32,
        )
        scr_ref[0:32, :] = (g + acc + i) % (R * 128)
        return acc + g[0, 0]

    acc = jax.lax.fori_loop(0, k_ref[0], body, jnp.int32(0))
    o_ref[...] = jnp.broadcast_to(acc, (8, 128))


def lane_gather_kern(k_ref, d_ref, o_ref, scr_ref):
    scr_ref[0:32, :] = d_ref[0:32, :] % 128

    def body(i, acc):
        x = scr_ref[0:32, :]
        g = kl.lane_gather(x, x & 127)
        scr_ref[0:32, :] = (g + i) % 128
        return acc + g[0, 0]

    acc = jax.lax.fori_loop(0, k_ref[0], body, jnp.int32(0))
    o_ref[...] = jnp.broadcast_to(acc, (8, 128))


def while_conv_kern(check, k_ref, d_ref, o_ref, scr_ref):
    scr_ref[0:32, :] = d_ref[0:32, :] % (32 * 128)

    def body(i, acc):
        if check:
            def wc(c):
                return (c[1] > 0) & (c[0] < 4)

            def wb(c):
                x = scr_ref[0:32, :]
                (g,) = kl.gather_rows_multi([(x, 16)], scr_ref, 0, nrows=32)
                scr_ref[0:32, :] = g % (32 * 128)
                return c[0] + 1, jnp.sum((g != x).astype(jnp.int32))

            jax.lax.while_loop(wc, wb, (jnp.int32(0), jnp.int32(1)))
        else:
            for _ in range(4):
                x = scr_ref[0:32, :]
                (g,) = kl.gather_rows_multi([(x, 16)], scr_ref, 0, nrows=32)
                scr_ref[0:32, :] = g % (32 * 128)
        return acc + scr_ref[0, 0]

    acc = jax.lax.fori_loop(0, k_ref[0], body, jnp.int32(0))
    o_ref[...] = jnp.broadcast_to(acc, (8, 128))


def dynslice_kern(k_ref, d_ref, o_ref, scr_ref):
    def body(i, acc):
        base = ((acc + i) % 40) * 8
        x = d_ref[pl.ds(base, 32), :]
        return (acc + x[0, 0]) % 251

    acc = jax.lax.fori_loop(0, k_ref[0], body, jnp.int32(0))
    o_ref[...] = jnp.broadcast_to(acc, (8, 128))


def main():
    print(f"device={jax.devices()[0]}", flush=True)
    _time("lane_gather (32,128)", lane_gather_kern)
    for R in (32, 64, 128, 160, 288, 400):
        for limbs in (1, 2):
            _time(
                f"gather_rows_multi R={R} nrows=32 limbs={limbs}",
                functools.partial(gather_kern, R, limbs),
            )
    _time("4x gather32 fixed-unrolled", functools.partial(while_conv_kern, False), per=4)
    _time("4x gather32 while+scalar-conv-check", functools.partial(while_conv_kern, True), per=4)
    _time("dynamic row-slice read (32 rows)", dynslice_kern)


if __name__ == "__main__":
    main()

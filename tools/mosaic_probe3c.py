#!/usr/bin/env python
"""Probe wave 3: native tpu.dynamic_gather (jnp.take_along_axis) cost, and
a wide one-hot gather that uses it for the lane-select step.

Longer K ranges than wave 2 (50ms+ per timed call) to beat relay noise.
"""
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


def _call(kernel, extra_scratch=()):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=list(extra_scratch),
        interpret=INTERP,
    )


def _mk_taa(R, C, axis):
    def k(k_ref, d_ref, o_ref):
        lim = R if axis == 0 else C
        base = d_ref[0:R, :]
        if C != 128:
            base = jnp.broadcast_to(
                d_ref[0:R, 0:1] + jax.lax.broadcasted_iota(jnp.int32, (R, C), 1),
                (R, C),
            )

        def body(i, acc):
            idx = (acc + i) % lim
            y = jnp.take_along_axis(base, idx, axis=axis)
            return (y + 1) % lim

        idx0 = (
            jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)
            + jax.lax.broadcasted_iota(jnp.int32, (R, C), 0)
        ) % lim
        acc = jax.lax.fori_loop(0, k_ref[0], body, idx0)
        o_ref[...] = acc[0:8, 0:128]

    return k


def _wide_gather_v2(d_ref, R, E, limbs, i):
    """One-hot row dots + native dynamic_gather lane select."""
    idx = (d_ref[0:64, :].reshape(1, 64 * 128)[:, :E] + i) & (R * 128 - 1)
    q = jax.lax.broadcasted_iota(jnp.int32, (R, E), 0)
    roh = ((idx >> 7) == q).astype(jnp.bfloat16)
    lane_idx = jnp.broadcast_to(idx & 127, (128, E))
    acc = jnp.zeros((1, E), jnp.int32)
    for k in range(limbs):
        limb = ((d_ref[0:R, :] >> (8 * k)) & 0xFF).astype(jnp.bfloat16)
        picked = jax.lax.dot_general(
            limb, roh, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        val = jnp.take_along_axis(picked, lane_idx, axis=0)[0:1, :]
        acc = acc | (val.astype(jnp.int32) << (8 * k))
    return acc


def _mk_gv2(R, E, limbs):
    def k(k_ref, d_ref, o_ref):
        def body(i, acc):
            v = _wide_gather_v2(d_ref, R, E, limbs, i)
            return acc + jnp.broadcast_to(v[:, 0:128], (8, 128))

        acc = jax.lax.fori_loop(0, k_ref[0], body, jnp.zeros((8, 128), jnp.int32))
        o_ref[...] = acc

    return k


def k_inrow_round(k_ref, d_ref, o_ref):
    """In-row pointer-doubling round: par[i,j] <- par[i, par&127] where
    in-row, via axis=1 dynamic_gather over the whole (256,128) table."""
    R = 256
    par0 = d_ref[0:R, :] & (R * 128 - 1)
    rowbase = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0) * 128

    def body(i, par):
        inrow = (par >> 7) == (rowbase >> 7)
        nxt = jnp.take_along_axis(par, par & 127, axis=1)
        return jnp.where(inrow, nxt, par) ^ (i & 1)

    par = jax.lax.fori_loop(0, k_ref[0], body, par0)
    o_ref[...] = par[0:8, :]


PROBES = {
    "taa_ax0_256x128": (_mk_taa(256, 128, 0), (), (4096, 32768), 1),
    "taa_ax1_256x128": (_mk_taa(256, 128, 1), (), (4096, 32768), 1),
    "taa_ax0_128x2048": (_mk_taa(128, 2048, 0), (), (2048, 16384), 1),
    "gv2_r256_e2048_l2": (_mk_gv2(256, 2048, 2), (), (1024, 8192), 1),
    "gv2_r256_e4096_l2": (_mk_gv2(256, 4096, 2), (), (512, 4096), 1),
    "gv2_r136_e2048_l2": (_mk_gv2(136, 2048, 2), (), (1024, 8192), 1),
    "gv2_r256_e2048_l1": (_mk_gv2(256, 2048, 1), (), (1024, 8192), 1),
    "inrow_round": (k_inrow_round, (), (2048, 16384), 1),
}


def slopes(fn, data, k_lo, k_hi, n=3, reps=3):
    f = jax.jit(lambda k, d: fn(k, d).sum())
    int(f(jnp.full((1,), 8, jnp.int32), data))
    outs = []
    for _ in range(n):
        ts = {}
        for K in (k_lo, k_hi):
            best = 1e9
            for r in range(reps):
                t0 = time.perf_counter()
                int(f(jnp.full((1,), K, jnp.int32), data + r))
                best = min(best, time.perf_counter() - t0)
            ts[K] = best
        outs.append((ts[k_hi] - ts[k_lo]) / (k_hi - k_lo))
    return outs


def main():
    only = sys.argv[1:] or list(PROBES)
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.integers(0, 2**15, (ROWS, 128), dtype=np.int32))
    out = {}
    for name in only:
        kern, scratch, (klo, khi), per = PROBES[name]
        try:
            fn = _call(kern, scratch)
            ss = slopes(functools.partial(fn), data, klo, khi)
            out[name] = {"ns_per_iter": [round(t * 1e9 / per, 2) for t in ss]}
        except Exception as e:  # noqa: BLE001
            out[name] = {"error": str(e).split("\n")[0][:200]}
        print(name, json.dumps(out[name]), flush=True)
    with open("/tmp/probe3c.json", "w") as f:
        json.dump(out, f)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

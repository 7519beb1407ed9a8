#!/usr/bin/env python
"""Probe wave 2: walk forms at realistic decode/encode shapes.

Decides the round-3 walk architecture:
  * plain walk unrolled 8x (dependent loads) vs pair-table walk (1 load
    per 2 tags) vs quad-table walk
  * 2-D tag-store penalty (tags must land in a (TROWS, L) SMEM buffer
    that can DMA to VMEM)
  * wide-gather per-element cost at E=4096/8192, 1-2 limbs, bf16 vs s8
  * wide-scatter per-element cost at 2 vs 4 limbs

Each probe reports 3 independent slope estimates (noise visibility).
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
NT = 36864  # walk-table entries (144 KB)


def _call(kernel, extra_scratch=()):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # k
            pl.BlockSpec(memory_space=pltpu.VMEM),   # dense data
            pl.BlockSpec(memory_space=pltpu.SMEM),   # 1-D walk table
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=list(extra_scratch),
        interpret=INTERP,
    )


TAGSCR = (pltpu.SMEM((160, 128), jnp.int32),)


def k_walk_u8(k_ref, d_ref, t_ref, o_ref, tags):
    """Plain decode walk (1 tag/step), 8 steps per fori iter, 2-D tag
    stores.  per=8."""

    def body(i, c):
        p, tc = c
        for _ in range(8):
            v = t_ref[p]
            tags[tc >> 7, tc & 127] = p
            tc = (tc + (v != 0).astype(jnp.int32)) & 8191
            p = (p + (v & 63) + 2) & (NT - 1)
        return p, tc

    p, tc = jax.lax.fori_loop(0, k_ref[0], body, (0, 0))
    o_ref[...] = jnp.full((8, 128), p + tc + tags[0, 0], jnp.int32)


def k_walk_pair_u4(k_ref, d_ref, t_ref, o_ref, tags):
    """Pair-table walk: one load yields two tags (a = first adv in bits
    17.., b = total pair advance in bits 0..16), 4 steps per iter. per=4
    (per STEP; each step emits 2 tags)."""

    def body(i, c):
        p, tc = c
        for _ in range(4):
            v = t_ref[p]
            a = jax.lax.shift_right_logical(v, 17) & 31
            b = v & 0x1FFFF
            tags[tc >> 7, tc & 127] = p
            t2 = tc + 1
            tags[t2 >> 7, t2 & 127] = p + a
            tc = (tc + 1 + (a != 0).astype(jnp.int32)) & 8191
            p = (p + (b & 63) + 2) & (NT - 1)
        return p, tc

    p, tc = jax.lax.fori_loop(0, k_ref[0], body, (0, 0))
    o_ref[...] = jnp.full((8, 128), p + tc + tags[0, 0], jnp.int32)


def k_walk_dec_full(k_ref, d_ref, t_ref, o_ref, tags):
    """Realistic full decode walk: chunked while loop with end/progress
    check every 128 steps, pair loads, 2-D tag stores.  k = outer rounds,
    per=128 inner steps."""

    def outer(c):
        rounds, p, tc, done = c
        return (done == 0) & (rounds < k_ref[0])

    def obody(c):
        rounds, p, tc, done = c

        def body(i, c2):
            p, tc = c2
            v = t_ref[p]
            a = jax.lax.shift_right_logical(v, 17) & 31
            tags[tc >> 7, tc & 127] = p
            t2 = tc + 1
            tags[t2 >> 7, t2 & 127] = p + a
            tc = (tc + 1 + (a != 0).astype(jnp.int32)) & 8191
            p = (p + (v & 63) + 2) & (NT - 1)
            return p, tc

        p2, tc2 = jax.lax.fori_loop(0, 128, body, (p, tc))
        return rounds + 1, p2, tc2, (p2 == p).astype(jnp.int32)

    _, p, tc, _ = jax.lax.while_loop(outer, obody, (0, 0, 0, 0))
    o_ref[...] = jnp.full((8, 128), p + tc + tags[0, 0], jnp.int32)


def k_walk_enc_real(k_ref, d_ref, t_ref, o_ref, tags):
    """Encoder walk with dense-ml table: v>0 -> off|ml match (emit lit+copy
    tags, 2-D stores), v<=0 -> skip jump.  Branch-free.  per=4."""

    def body(i, c):
        p, lits, tc = c
        for _ in range(4):
            v = t_ref[p]
            m = (v > 0).astype(jnp.int32)
            off = v & 0x7FFF
            ml = (jax.lax.shift_right_logical(v, 15) & 63) + 4
            need = m & (lits < p).astype(jnp.int32)
            tags[tc >> 7, tc & 127] = lits | ((p - lits) << 15)
            t2 = tc + need
            tags[t2 >> 7, t2 & 127] = p | (ml << 15) | off
            tc = (t2 + m) & 8191
            adv = jnp.where(m > 0, ml, (v & 31) + 2)
            p = (p + adv) & (NT - 1)
            lits = jnp.where(m > 0, p, lits)
        return p, lits, tc

    p, lits, tc = jax.lax.fori_loop(0, k_ref[0], body, (0, 0, 0))
    o_ref[...] = jnp.full((8, 128), p + lits + tc + tags[0, 0], jnp.int32)


def _wide_gather(d_ref, R, E, limbs, i, s8=False):
    idx = jnp.broadcast_to(
        d_ref[0:64, :].reshape(1, 64 * 128)[:, :E], (1, E)
    )
    idx = (idx + i) & (R * 128 - 1)
    q = jax.lax.broadcasted_iota(jnp.int32, (R, E), 0)
    lq = jax.lax.broadcasted_iota(jnp.int32, (128, E), 0)
    loh = (idx & 127) == lq
    acc = jnp.zeros((1, E), jnp.int32)
    if s8:
        roh = ((idx >> 7) == q).astype(jnp.int8)
        for k in range(limbs):
            limb = ((d_ref[0:R, :] >> (7 * k)) & 0x7F).astype(jnp.int8)
            picked = jax.lax.dot_general(
                limb, roh, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            val = jnp.sum(jnp.where(loh, picked, 0), axis=0, keepdims=True)
            acc = acc | (val << (7 * k))
    else:
        roh = ((idx >> 7) == q).astype(jnp.bfloat16)
        for k in range(limbs):
            limb = ((d_ref[0:R, :] >> (8 * k)) & 0xFF).astype(jnp.bfloat16)
            picked = jax.lax.dot_general(
                limb, roh, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            val = jnp.sum(jnp.where(loh, picked, 0.0), axis=0, keepdims=True)
            acc = acc | (val.astype(jnp.int32) << (8 * k))
    return acc


def _mk_gather(R, E, limbs, s8=False):
    def k(k_ref, d_ref, t_ref, o_ref):
        def body(i, acc):
            v = _wide_gather(d_ref, R, E, limbs, i, s8)
            return acc + jnp.broadcast_to(v[:, 0:128], (8, 128))

        acc = jax.lax.fori_loop(0, k_ref[0], body, jnp.zeros((8, 128), jnp.int32))
        o_ref[...] = acc

    return k


def _mk_scatter(OC, E, limbs):
    def k(k_ref, d_ref, t_ref, o_ref):
        def body(i, acc):
            pos = (d_ref[0:16, :].reshape(1, 16 * 128)[:, :E] + i) & (OC * 128 - 1)
            val = d_ref[0:16, :].reshape(1, 16 * 128)[:, :E] & 0x7FFF
            q = jax.lax.broadcasted_iota(jnp.int32, (OC, E), 0)
            roh = ((pos >> 7) == q).astype(jnp.bfloat16)
            lq = jax.lax.broadcasted_iota(jnp.int32, (128, E), 0)
            loh = ((pos & 127) == lq).astype(jnp.bfloat16)
            h = jnp.zeros((OC, 128), jnp.int32)
            for kk in range(limbs):
                w = roh * ((val >> (8 * kk)) & 0xFF).astype(jnp.bfloat16)
                hk = jax.lax.dot_general(
                    w, loh, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                h = h + (hk.astype(jnp.int32) << (8 * kk))
            return acc + h[0:8, :]

        acc = jax.lax.fori_loop(0, k_ref[0], body, jnp.zeros((8, 128), jnp.int32))
        o_ref[...] = acc

    return k


PROBES = {
    "walk_u8": (k_walk_u8, TAGSCR, (1024, 8192), 8),
    "walk_pair_u4": (k_walk_pair_u4, TAGSCR, (1024, 8192), 4),
    "walk_dec_full": (k_walk_dec_full, TAGSCR, (64, 512), 128),
    "walk_enc_real": (k_walk_enc_real, TAGSCR, (1024, 8192), 4),
    "gather_r256_e8192_l2": (_mk_gather(256, 8192, 2), (), (256, 1024), 1),
    "gather_r256_e8192_l1": (_mk_gather(256, 8192, 1), (), (256, 1024), 1),
    "gather_r256_e4096_l2": (_mk_gather(256, 4096, 2), (), (256, 2048), 1),
    "gather_r136_e8192_l2": (_mk_gather(136, 8192, 2), (), (256, 1024), 1),
    "gather_s8_r256_e8192_l3": (_mk_gather(256, 8192, 3, s8=True), (), (256, 1024), 1),
    "scatter_oc256_e2048_l2": (_mk_scatter(256, 2048, 2), (), (256, 1024), 1),
    "scatter_oc256_e2048_l4": (_mk_scatter(256, 2048, 4), (), (256, 1024), 1),
}


def slopes(fn, data, tbl, k_lo, k_hi, n=3, reps=3):
    f = jax.jit(lambda k, d, t: fn(k, d, t).sum())
    int(f(jnp.full((1,), 8, jnp.int32), data, tbl))
    outs = []
    for _ in range(n):
        ts = {}
        for K in (k_lo, k_hi):
            best = 1e9
            for r in range(reps):
                t0 = time.perf_counter()
                int(f(jnp.full((1,), K, jnp.int32), data + r, tbl))
                best = min(best, time.perf_counter() - t0)
            ts[K] = best
        outs.append((ts[k_hi] - ts[k_lo]) / (k_hi - k_lo))
    return outs


def main():
    only = sys.argv[1:] or list(PROBES)
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.integers(0, 2**20, (ROWS, 128), dtype=np.int32))
    tbl = jnp.asarray(rng.integers(1, 2**22, (NT,), dtype=np.int32))
    out = {}
    for name in only:
        kern, scratch, (klo, khi), per = PROBES[name]
        try:
            fn = _call(kern, scratch)
            ss = slopes(functools.partial(fn), data, tbl, klo, khi)
            out[name] = {"ns_per_iter": [round(t * 1e9 / per, 2) for t in ss]}
        except Exception as e:  # noqa: BLE001
            out[name] = {"error": str(e).split("\n")[0][:200]}
        print(name, json.dumps(out[name]), flush=True)
    with open("/tmp/probe3b.json", "w") as f:
        json.dump(out, f)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Mosaic probe round 3: slim 1-D SMEM walks (whole-table, unrolled,
interleaved), scalar/vector overlap (run-ahead queue), int8 MXU dots,
big SMEM allocations, wide-gather cost vs table height, tril-matmul scans.

The walk table arrives as a 1-D SMEM *input* (DMA cannot reshape 2-D VMEM
into 1-D SMEM).  These measurements drive the round-3 kernel redesign
(VERDICT r2 #1/#2).
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
N1D = 16384   # walk-table entries (64 KB)
NBIG = 36864  # big-table entries (144 KB)


def _call(kernel, extra_scratch=(), tbl_n=N1D):
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


def k_walk_1d(k_ref, d_ref, t_ref, o_ref, tags):
    """Slim decode-walk body: 1 load, 1 tag store, advance."""

    def body(i, c):
        p, tc = c
        v = t_ref[p]
        tags[tc] = p
        take = (v != 0).astype(jnp.int32)
        return (p + (v & 63) + 1) & (N1D - 1), (tc + take) & 2047

    p, tc = jax.lax.fori_loop(0, k_ref[0], body, (0, 0))
    o_ref[...] = jnp.full((8, 128), p + tc + tags[0], jnp.int32)


def k_walk_1d_u4(k_ref, d_ref, t_ref, o_ref, tags):
    """Same walk, 4 steps per fori iteration (per=4)."""

    def body(i, c):
        p, tc = c
        for _ in range(4):
            v = t_ref[p]
            tags[tc] = p
            take = (v != 0).astype(jnp.int32)
            p = (p + (v & 63) + 1) & (N1D - 1)
            tc = (tc + take) & 2047
        return p, tc

    p, tc = jax.lax.fori_loop(0, k_ref[0], body, (0, 0))
    o_ref[...] = jnp.full((8, 128), p + tc + tags[0], jnp.int32)


def k_walk_il4(k_ref, d_ref, t_ref, o_ref, tags):
    """4 independent chains interleaved in one loop (per=4)."""

    def body(i, c):
        p0, p1, p2, p3, tc = c
        v0 = t_ref[p0]
        v1 = t_ref[p1]
        v2 = t_ref[p2]
        v3 = t_ref[p3]
        tags[tc] = p0
        tags[tc + 1] = p1
        tags[tc + 2] = p2
        tags[tc + 3] = p3
        p0 = (p0 + (v0 & 63) + 1) & (N1D - 1)
        p1 = (p1 + (v1 & 63) + 1) & (N1D - 1)
        p2 = (p2 + (v2 & 63) + 1) & (N1D - 1)
        p3 = (p3 + (v3 & 63) + 1) & (N1D - 1)
        return p0, p1, p2, p3, (tc + 4) & 2047

    p0, p1, p2, p3, tc = jax.lax.fori_loop(
        0, k_ref[0], body, (0, 11, 217, 3001, 0))
    o_ref[...] = jnp.full((8, 128), p0 + p1 + p2 + p3 + tc + tags[0], jnp.int32)


def k_walk_dec_real(k_ref, d_ref, t_ref, o_ref, tags):
    """Decode walk with the real termination/error checks kept in."""

    def body(i, c):
        p, tc, err, done = c
        v = t_ref[p]
        live = (done == 0).astype(jnp.int32)
        take = ((v != 0) & (done == 0)).astype(jnp.int32)
        tags[tc] = p
        err = err | (live - take)
        done = done | (1 - take)
        p = (p + (v & 63) + 1) & (N1D - 1)
        done = done & ((p != N1D - 1).astype(jnp.int32) | 1)
        return p, (tc + take) & 2047, err, done & 0

    p, tc, err, done = jax.lax.fori_loop(0, k_ref[0], body, (0, 0, 0, 0))
    o_ref[...] = jnp.full((8, 128), p + tc + err + done + tags[0], jnp.int32)


def k_walk_enc(k_ref, d_ref, t_ref, o_ref, tb1, tb2):
    """Encoder-walk shape (cond form): table load decides match vs skip;
    emits up to 2 tags on match."""

    def body(i, c):
        p, lits, tc = c
        v = t_ref[p]
        ismatch = v > 0

        def on_match(p, lits, tc):
            off = v & 0x7FFF
            ml = (v >> 15) & 63
            need = (lits < p).astype(jnp.int32)
            tb1[tc] = lits | ((p - lits) << 15)
            tb2[tc] = 0
            tc2 = (tc + need) & 2047
            tb1[tc2] = p | (ml << 15)
            tb2[tc2] = off
            return p + ml + 4, p + ml + 4, (tc2 + 1) & 2047

        def on_skip(p, lits, tc):
            return p + (v & 31) + 1, lits, tc

        p2, lits2, tc2 = jax.lax.cond(ismatch, on_match, on_skip, p, lits, tc)
        return p2 & (N1D - 1), lits2 & (N1D - 1), tc2

    p, lits, tc = jax.lax.fori_loop(0, k_ref[0], body, (0, 0, 0))
    o_ref[...] = jnp.full((8, 128), p + lits + tc + tb1[0] + tb2[0], jnp.int32)


def k_walk_enc_nobr(k_ref, d_ref, t_ref, o_ref, tb1, tb2):
    """Encoder walk, branch-free: always stores both tag slots."""

    def body(i, c):
        p, lits, tc = c
        v = t_ref[p]
        ismatch = (v > 0).astype(jnp.int32)
        off = v & 0x7FFF
        ml = ((v >> 15) & 63) + 4
        need = ismatch & (lits < p).astype(jnp.int32)
        tb1[tc] = lits | ((p - lits) << 15)
        tb2[tc] = 0
        tc2 = (tc + need) & 2047
        tb1[tc2] = p | (ml << 15)
        tb2[tc2] = off
        tc3 = (tc2 + ismatch) & 2047
        padv = jnp.where(ismatch > 0, ml, (v & 31) + 1)
        p2 = (p + padv) & (N1D - 1)
        lits2 = jnp.where(ismatch > 0, p2, lits) & (N1D - 1)
        return p2, lits2, tc3

    p, lits, tc = jax.lax.fori_loop(0, k_ref[0], body, (0, 0, 0))
    o_ref[...] = jnp.full((8, 128), p + lits + tc + tb1[0] + tb2[0], jnp.int32)


def _vec_chunk(d_ref, acc):
    """8 dependent bf16 (128,128) dots — a deterministic MXU time filler."""
    m = (d_ref[0:128, :] & 1).astype(jnp.bfloat16)
    x = acc
    for _ in range(8):
        x = jax.lax.dot_general(
            x, m, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
    return x


def k_vec_only(k_ref, d_ref, t_ref, o_ref):
    def body(i, acc):
        return _vec_chunk(d_ref, acc)

    acc0 = (d_ref[0:8, :] & 1).astype(jnp.bfloat16)
    acc = jax.lax.fori_loop(0, k_ref[0], body, acc0)
    o_ref[...] = acc.astype(jnp.int32)


def _scal_chunk(t_ref, tags, c):
    def walk(j, pc):
        p, tc = pc
        v = t_ref[p]
        tags[tc] = p
        return (p + (v & 63) + 1) & (N1D - 1), (tc + 1) & 2047

    return jax.lax.fori_loop(0, 256, walk, c)


def k_scal_only(k_ref, d_ref, t_ref, o_ref, tags):
    def body(i, c):
        return _scal_chunk(t_ref, tags, c)

    p, tc = jax.lax.fori_loop(0, k_ref[0], body, (0, 0))
    o_ref[...] = jnp.full((8, 128), p + tc + tags[0], jnp.int32)


def k_vec_scal(k_ref, d_ref, t_ref, o_ref, tags):
    """Issue the vector chunk, then run the scalar walk: if the run-ahead
    queue drains vector work during the scalar loop, slope ~ max not sum."""

    def body(i, c):
        p, tc, acc = c
        acc = _vec_chunk(d_ref, acc)
        p, tc = _scal_chunk(t_ref, tags, (p, tc))
        return p, tc, acc

    acc0 = (d_ref[0:8, :] & 1).astype(jnp.bfloat16)
    p, tc, acc = jax.lax.fori_loop(0, k_ref[0], body, (0, 0, acc0))
    o_ref[...] = acc.astype(jnp.int32) + p + tc + tags[0]


def k_dot_s8(k_ref, d_ref, t_ref, o_ref):
    """int8 x int8 -> int32 dot_general: does Mosaic lower it, how fast?"""
    a = (d_ref[0:256, :] & 1).astype(jnp.int8)
    b = (d_ref[0:256, :] & 0x7F).astype(jnp.int8)

    def body(i, acc):
        y = jax.lax.dot_general(
            b, a, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return acc + y[0:8, :] + i

    acc = jax.lax.fori_loop(0, k_ref[0], body, jnp.zeros((8, 128), jnp.int32))
    o_ref[...] = acc


def k_dot_bf16_256(k_ref, d_ref, t_ref, o_ref):
    a = (d_ref[0:256, :] & 1).astype(jnp.bfloat16)
    b = (d_ref[0:256, :] & 0x7F).astype(jnp.bfloat16)

    def body(i, acc):
        y = jax.lax.dot_general(
            b, a, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc + y[0:8, :].astype(jnp.int32) + i

    acc = jax.lax.fori_loop(0, k_ref[0], body, jnp.zeros((8, 128), jnp.int32))
    o_ref[...] = acc


def _wide_gather(d_ref, R, E, limbs, i, s8=False):
    """One gather_rows_multi-shaped wide gather: one-hot row dot per limb +
    lane mask reduce; returns (1, E) picked values."""
    idx = (d_ref[0:16, :].reshape(1, 16 * 128)[:, :E] + i) & (R * 128 - 1)
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


def k_scan_tril(k_ref, d_ref, t_ref, o_ref):
    """Row-major inclusive add-scan over (256,128) via two tril matmuls on
    8-bit limbs (values < 2^17, 3 limbs)."""
    R = 256
    x = d_ref[0:R, :] & 0x1FFFF
    li = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    lj = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    ML = (li <= lj).astype(jnp.bfloat16)
    ri = jax.lax.broadcasted_iota(jnp.int32, (R, R), 0)
    rj = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1)
    MR = (ri > rj).astype(jnp.bfloat16)

    def body(i, acc):
        xa = x + (i & 1)
        s = jnp.zeros((R, 128), jnp.int32)
        for k in range(3):
            limb = ((xa >> (8 * k)) & 0xFF).astype(jnp.bfloat16)
            part = jax.lax.dot_general(
                limb, ML, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            s = s + (part.astype(jnp.int32) << (8 * k))
        tot = jnp.broadcast_to(s[:, 127:128], (R, 128))
        e = jnp.zeros((R, 128), jnp.int32)
        for k in range(3):
            limb = ((tot >> (8 * k)) & 0xFF).astype(jnp.bfloat16)
            part = jax.lax.dot_general(
                MR, limb, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            e = e + (part.astype(jnp.int32) << (8 * k))
        y = s + e
        return acc + y[0:8, :]

    acc = jax.lax.fori_loop(0, k_ref[0], body, jnp.zeros((8, 128), jnp.int32))
    o_ref[...] = acc


def k_scan_mm_cur(k_ref, d_ref, t_ref, o_ref):
    """Current scan2d_mm('addsat', bits=24) over (256,128) for comparison."""
    sys.path.insert(0, "/root/repo")
    from csnappy_tpu.ops import kernel_lib as kl

    x = d_ref[0:256, :] & 0x1FFFF

    def body(i, acc):
        y = kl.scan2d_mm(x + (i & 1), op="addsat", bits=24)
        return acc + y[0:8, :]

    acc = jax.lax.fori_loop(0, k_ref[0], body, jnp.zeros((8, 128), jnp.int32))
    o_ref[...] = acc


def k_big_smem(k_ref, d_ref, t_ref, o_ref, tags):
    """NBIG-entry (144 KB) SMEM table + 17408-entry tag buffer: capacity."""

    def body(i, c):
        p, tc = c
        v = t_ref[p]
        tags[tc] = p
        return (p + (v & 63) + 1) % NBIG, (tc + 1) % 17408

    p, tc = jax.lax.fori_loop(0, k_ref[0], body, (0, 0))
    o_ref[...] = jnp.full((8, 128), p + tc + tags[0] + tags[17407], jnp.int32)


PROBES = {
    # name: (kernel, scratch, (k_lo, k_hi), per, tbl_entries)
    "walk_1d": (
        k_walk_1d, (pltpu.SMEM((2048,), jnp.int32),), (8192, 65536), 1, N1D),
    "walk_1d_u4": (
        k_walk_1d_u4, (pltpu.SMEM((2048,), jnp.int32),), (2048, 16384), 4, N1D),
    "walk_il4": (
        k_walk_il4, (pltpu.SMEM((2052,), jnp.int32),), (2048, 16384), 4, N1D),
    "walk_dec_real": (
        k_walk_dec_real, (pltpu.SMEM((2048,), jnp.int32),), (8192, 65536), 1, N1D),
    "walk_enc": (
        k_walk_enc,
        (pltpu.SMEM((2048,), jnp.int32), pltpu.SMEM((2048,), jnp.int32)),
        (8192, 65536), 1, N1D),
    "walk_enc_nobr": (
        k_walk_enc_nobr,
        (pltpu.SMEM((2048,), jnp.int32), pltpu.SMEM((2048,), jnp.int32)),
        (8192, 65536), 1, N1D),
    "vec_only": (k_vec_only, (), (256, 2048), 1, N1D),
    "scal_only": (
        k_scal_only, (pltpu.SMEM((2048,), jnp.int32),), (256, 2048), 1, N1D),
    "vec_scal": (
        k_vec_scal, (pltpu.SMEM((2048,), jnp.int32),), (256, 2048), 1, N1D),
    "dot_s8": (k_dot_s8, (), (4096, 32768), 1, N1D),
    "dot_bf16_256": (k_dot_bf16_256, (), (4096, 32768), 1, N1D),
    "gather_r136_e2048_l2": (_mk_gather(136, 2048, 2), (), (512, 4096), 1, N1D),
    "gather_r272_e2048_l2": (_mk_gather(272, 2048, 2), (), (512, 4096), 1, N1D),
    "gather_r64_e2048_l2": (_mk_gather(64, 2048, 2), (), (512, 4096), 1, N1D),
    "gather_r272_e2048_l4": (_mk_gather(272, 2048, 4), (), (512, 4096), 1, N1D),
    "gather_s8_r272_e2048_l2": (
        _mk_gather(272, 2048, 2, s8=True), (), (512, 4096), 1, N1D),
    "gather_s8_r272_e2048_l3": (
        _mk_gather(272, 2048, 3, s8=True), (), (512, 4096), 1, N1D),
    "scan_tril": (k_scan_tril, (), (512, 4096), 1, N1D),
    "scan_mm_cur": (k_scan_mm_cur, (), (512, 4096), 1, N1D),
    "big_smem": (
        k_big_smem, (pltpu.SMEM((17408,), jnp.int32),), (8192, 65536), 1, NBIG),
}


def slope(fn, data, tbl, k_lo, k_hi, reps=4):
    f = jax.jit(lambda k, d, t: fn(k, d, t).sum())
    int(f(jnp.full((1,), 8, jnp.int32), data, tbl))
    ts = {}
    for K in (k_lo, k_hi, k_lo, k_hi):  # interleave to cancel drift
        best = ts.get(K, 1e9)
        for r in range(reps):
            t0 = time.perf_counter()
            int(f(jnp.full((1,), K, jnp.int32), data + r, tbl))
            best = min(best, time.perf_counter() - t0)
        ts[K] = best
    return (ts[k_hi] - ts[k_lo]) / (k_hi - k_lo)


def main():
    only = sys.argv[1:] or list(PROBES)
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.integers(0, 2**20, (ROWS, 128), dtype=np.int32))
    tbls = {
        n: jnp.asarray(rng.integers(1, 2**20, (n,), dtype=np.int32))
        for n in {N1D, NBIG}
    }
    out = {}
    for name in only:
        kern, scratch, (klo, khi), per, tn = PROBES[name]
        try:
            fn = _call(kern, scratch, tbl_n=tn)
            t = slope(functools.partial(fn), data, tbls[tn], klo, khi)
            out[name] = {"ns_per_iter": round(t * 1e9 / per, 2)}
        except Exception as e:  # noqa: BLE001
            out[name] = {"error": str(e).split("\n")[0][:200]}
        print(name, json.dumps(out[name]), flush=True)
    with open("/tmp/probe3.json", "w") as f:
        json.dump(out, f)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

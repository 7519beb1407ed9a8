"""Device-resident whole-stream decode pipeline (r4, VERDICT r3 #1).

The reference's primary serving entry point is whole-stream decode
(csnappy_decompress.c:394-411).  Round 3 served it through a host-bound
routing layer (native scan → per-segment Python assembly → chunked device
calls) that collapsed to 0.0027 GB/s behind a high-latency host↔device
link.  This module is the production-shaped replacement: the compressed
stream lives in HBM, and ONE dispatched program

  1. casts the uint8 stream to int32 lanes (free; r4's int32 word
     packing cost 1.38 ms/stream in XLA unpack shuffles — r5),
  2. parses every byte position into a walk entry ``adv | prod << 16``
     (dense XLA: the speculative-parse half of the block decoder's
     phase 1, csnappy_decompress.c:345-381 semantics),
  3. walks the real tag chain once on the scalar core (Pallas kernel,
     SMEM windows DMA'd on demand), recording the compressed offset of
     every 32 KiB output boundary branchlessly — the device analog of
     csnappy_host_scan_segments,
  4. decodes all segments with the fused block decoder in stream mode
     (windows DMA'd from the HBM stream at the scan's offsets,
     lane-aligned on device; ops/decode_fused.py), and
  5. returns the output as uint8 (byte-exact, no packing).

Every shape (stream rows MR, block count Bb, per-segment width CI) is
bucketed geometrically, so serving NEVER recompiles per stream shape.

Safety: the fast path serves exactly the streams the reference's 32 KiB
fragment loop can emit (csnappy_compress.c:636-654).  Oversized tags
(adv/prod > one segment) stall the scan walk via a zero parse entry;
smaller tags that still straddle a 32 KiB output boundary leave their
segment's block decode short, failing the produced==expected check;
segments wider than the CI bucket are clamped and fail the same check;
any copy that reaches a prior segment fails the block decoder's
offset>written check (csnappy_decompress.c:302).  EVERY failure returns
None and the caller
re-decodes on the exact-error routed path — a legal stream never fails
and bytes are bit-exact or absent, never wrong.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models import wire
from . import decode_fused
from . import primitives as prim

L = 128
SEG = wire.BLOCK_SIZE          # 32768 output bytes per segment
CO = SEG // L                  # 256
W = 256                        # scan window rows (32768 stream positions)
CHUNK_S = 256                  # walk steps per outer round
MAX_FAST_MB = 64               # streams beyond this take the routed path


def _srl(x, k):
    return jax.lax.shift_right_logical(x, k)


def _entries(byts2: jnp.ndarray, slen) -> jnp.ndarray:
    """Dense per-position walk entries for the boundary scan.

    byts2: (MR, 128) int32 byte values in row-major stream order.  entry =
    adv | prod << 16 when the tag at that position is valid AND can belong
    to a segmentable stream (adv <= SEG+5, prod <= SEG — anything larger
    must straddle a 32 KiB output boundary); 0 otherwise (the walk stalls
    there and the host falls back).  prod == SEG packs as bit 31 (negative
    int32); the walk extracts it with logical shifts.

    The r4 1-D formulation (unaligned slices of a (MR*128,) array) cost
    1.38 ms per 350 KB stream on hardware — HALF the whole pipeline — in
    XLA layout shuffles; this 2-D roll/blend form measures 0.008 ms (r5).
    """
    MRl = byts2.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (MRl, L), 1)

    def _sh(d):
        a = jnp.roll(byts2, -d, axis=1)
        b = jnp.roll(a, -1, axis=0)
        return jnp.where(lane < L - d, a, b)

    b0 = byts2
    b1, b2, b3, b4 = _sh(1), _sh(2), _sh(3), _sh(4)
    kind = b0 & 3
    u = b0 >> 2
    islit = kind == wire.TAG_LITERAL
    extra = jnp.clip(u - 59, 0, 4)
    t2 = b1 | (b2 << 8)
    t3 = t2 | (b3 << 16)
    tr = jnp.where(extra == 0, 0, jnp.where(extra == 1, b1, jnp.where(extra == 2, t2, t3)))
    lit_len = jnp.where(u >= 60, tr + 1, u + 1)
    lit_bad = islit & (u >= 60) & (((extra == 4) & (b4 > 0)) | (tr + 1 > SEG))
    hdr = jnp.where(
        islit, 1 + extra,
        jnp.where(kind == wire.TAG_COPY_1, 2, jnp.where(kind == wire.TAG_COPY_2, 3, 5)),
    )
    copy_len = jnp.where(kind == wire.TAG_COPY_1, (u & 7) + wire.MIN_MATCH, u + 1)
    prod = jnp.where(islit, lit_len, copy_len)
    adv = hdr + jnp.where(islit, lit_len, 0)
    pos = jax.lax.broadcasted_iota(jnp.int32, (MRl, L), 0) * L + lane
    valid = (
        (pos < slen) & (pos + adv <= slen)
        & ~lit_bad & (prod <= SEG) & (adv <= SEG + 5)
    )
    return jnp.where(valid, adv | (prod << 16), 0)


def _scan_kernel(sl_ref, ent_ref, seg_ref, meta_ref,
                 went_ref, pw1_ref, pw2_ref, pw3_ref, pw4_ref,
                 w1_smem, w2_smem, w3_smem, w4_smem, sem,
                 *, MR: int, SEGCAP: int):
    """One serial walk of the whole tag chain on the scalar core.

    The chain is the only sequential physics in whole-stream decode
    (csnappy_decompress.c:345: tag N's start depends on tag N-1's
    length).  Entries stream through W-row windows: each window is DMA'd
    ANY→VMEM, PAIR- then QUAD-FUSED there with native lane gathers (a tag
    with adv <= 127 and prod <= 255 absorbs its successor; a pair with
    total advance <= 63 absorbs the following pair — the decode kernel's
    pair/quad-table trick), and shipped to SMEM as four tables

        w1 = advtot(17) | a1 << 17        w2 = prodtot(17) | q1 << 17
        w3 = d2(6) | qq2 << 6 (quad only) w4 = a3(7) | q3 << 7 (quad only)

    so the walk retires up to FOUR tags per step: four independent SMEM
    loads, four branchless boundary stores (seg[(pp + SEG-1) >> 15] = p —
    the LAST writer of slot k is the first tag of segment k; absent
    streams harmlessly re-store an earlier slot), two adds.  Straddling
    tags need no runtime tracking: a tag crossing a 32 KiB output
    boundary makes its segment's block decode produce < 32768 bytes,
    which the caller's produced==expected check rejects.
    """
    slen = sl_ref[0]
    MAX_ROUNDS = MR * L // (2 * CHUNK_S) + MR * 2 // W + 8

    def ini(i, _):
        seg_ref[i] = slen
        return 0

    jax.lax.fori_loop(0, SEGCAP + 8, ini, 0)

    def cond(c):
        return (c[5] == 0) & (c[4] < MAX_ROUNDS)

    def body(c):
        p0, pp0, bad0, wbr0, rounds, _d = c
        need = (p0 - wbr0 * L >= (W // 2) * L) | (rounds == 0)
        wbr = jnp.where(need, jnp.clip(_srl(p0, 7), 0, MR - (W + 8)), wbr0)

        @pl.when(need)
        def _():
            cp = pltpu.make_async_copy(ent_ref.at[pl.ds(wbr, W + 8)], went_ref, sem)
            cp.start()
            cp.wait()
            ent = went_ref[0:W, :]
            adv = ent & 0xFFFF
            prd = _srl(ent, 16)
            lane = jax.lax.broadcasted_iota(jnp.int32, (W, L), 1)
            small = (ent != 0) & (adv <= 127) & (prd <= 255)
            q = (lane + jnp.where(small, adv, 0)) & (L - 1)
            g0 = jnp.take_along_axis(went_ref[0:W, :], q, axis=1)
            g1 = jnp.take_along_axis(went_ref[1 : W + 1, :], q, axis=1)
            succ = jnp.where((lane + adv) < L, g0, g1)
            paired = small & (succ != 0)
            adv2 = succ & 0xFFFF
            prd2 = _srl(succ, 16)
            entv = (ent != 0).astype(jnp.int32)
            padv = jnp.where(paired, adv + adv2, adv) * entv     # pair advance
            pprd = jnp.where(paired, prd + prd2, prd) * entv     # pair produced
            pa1 = jnp.where(paired, adv, 0)
            pq1 = jnp.where(paired, prd, 0)
            # quad composition: absorb the pair entry at +d2 (d2 <= 63 ->
            # reach <= 190 lanes: this row or the next)
            quadable = paired & (padv <= 63)
            d2q = jnp.where(quadable, padv, 0)
            q2l = (lane + d2q) & (L - 1)
            rowd2 = (lane + d2q) >> 7

            def _g2(tab):
                ga = jnp.take_along_axis(tab, q2l, axis=1)
                shifted = jnp.concatenate(
                    [tab[1:], jnp.zeros((1, L), jnp.int32)], axis=0
                )
                gb = jnp.take_along_axis(shifted, q2l, axis=1)
                return jnp.where(rowd2 == 0, ga, gb)

            padv2 = _g2(padv)
            pprd2x = _g2(pprd)
            pa3 = _g2(pa1)
            pq3 = _g2(pq1)
            quad = quadable & (padv2 > 0)
            advtot = jnp.where(quad, padv + padv2, padv)
            prodtot = jnp.where(quad, pprd + pprd2x, pprd)
            # vector stores can't target SMEM — stage in VMEM and DMA over.
            # w3 for a non-quad entry carries (a1, q1) so the C store
            # re-stores stream B's slot (or A's when unpaired) rather than
            # clobbering a later-written boundary slot with stream A's p.
            pw1_ref[...] = advtot | (pa1 << 17)
            pw2_ref[...] = prodtot | (pq1 << 17)
            pw3_ref[...] = jnp.where(
                quad, d2q | (pprd << 7), pa1 | (pq1 << 7)
            )
            pw4_ref[...] = jnp.where(quad, pa3 | (pq3 << 7), 0)
            for src, dst in ((pw1_ref, w1_smem), (pw2_ref, w2_smem),
                             (pw3_ref, w3_smem), (pw4_ref, w4_smem)):
                cpx = pltpu.make_async_copy(src, dst, sem)
                cpx.start()
                cpx.wait()

        base = wbr * L

        def step(i, s):
            p, pp = s
            rel = p - base
            relc = jnp.minimum(rel, W * L - 1)
            inw = rel < W * L
            rr, rl = _srl(relc, 7), relc & (L - 1)
            v1 = jnp.where(inw, w1_smem[rr, rl], 0)
            v2 = jnp.where(inw, w2_smem[rr, rl], 0)
            v3 = jnp.where(inw, w3_smem[rr, rl], 0)
            v4 = jnp.where(inw, w4_smem[rr, rl], 0)
            # stream A
            idx = jnp.minimum(_srl(pp + SEG - 1, 15), SEGCAP + 7)
            seg_ref[idx] = p
            # stream B (absent -> re-store A's slot with the same p)
            pp2 = pp + _srl(v2, 17)
            idx2 = jnp.minimum(_srl(pp2 + SEG - 1, 15), SEGCAP + 7)
            seg_ref[idx2] = p + _srl(v1, 17)
            # stream C (first tag of the absorbed pair; absent -> re-store)
            d2v = v3 & 0x7F
            pp3 = pp + _srl(v3, 7)
            idx3 = jnp.minimum(_srl(pp3 + SEG - 1, 15), SEGCAP + 7)
            seg_ref[idx3] = p + d2v
            # stream D (partner of C)
            pp4 = pp3 + _srl(v4, 7)
            idx4 = jnp.minimum(_srl(pp4 + SEG - 1, 15), SEGCAP + 7)
            seg_ref[idx4] = p + d2v + (v4 & 0x7F)
            return p + (v1 & 0x1FFFF), pp + (v2 & 0x1FFFF)

        p1, pp1 = jax.lax.fori_loop(0, CHUNK_S, step, (p0, pp0))
        # window refresh guarantees p0 is in-window at round start, so a
        # full-round stall (p1 == p0) means entry(p0) == 0: either the
        # clean end (p0 == slen) or a stream outside the fast envelope
        done = ((p1 >= slen) | (p1 == p0)).astype(jnp.int32)
        return p1, pp1, bad0, wbr, rounds + 1, done

    z = jnp.int32(0)
    p_f, pp_f, bad_f, _w, rounds_f, _d = jax.lax.while_loop(
        cond, body, (z, z, z, jnp.int32(-(1 << 20)), z, z)
    )
    meta_ref[0] = p_f
    meta_ref[1] = pp_f
    meta_ref[2] = bad_f
    meta_ref[3] = rounds_f


@functools.lru_cache(maxsize=16)
def _scan_compiled(MR: int, SEGCAP: int):
    kern = functools.partial(_scan_kernel, MR=MR, SEGCAP=SEGCAP)
    i32 = jnp.int32

    def call(slen_arr, ent):
        return pl.pallas_call(
            kern,
            out_shape=(
                jax.ShapeDtypeStruct((SEGCAP + 8,), i32),
                jax.ShapeDtypeStruct((8,), i32),
            ),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((W + 8, L), i32),   # raw entry window
                pltpu.VMEM((W, L), i32),       # w1 stage (advtot | a1)
                pltpu.VMEM((W, L), i32),       # w2 stage (prodtot | q1)
                pltpu.VMEM((W, L), i32),       # w3 stage (d2 | qq2)
                pltpu.VMEM((W, L), i32),       # w4 stage (a3 | q3)
                pltpu.SMEM((W, L), i32),       # w1
                pltpu.SMEM((W, L), i32),       # w2
                pltpu.SMEM((W, L), i32),       # w3
                pltpu.SMEM((W, L), i32),       # w4
                pltpu.SemaphoreType.DMA,
            ],
            interpret=prim.interpret_mode(),
        )(slen_arr, ent)

    return call


@functools.lru_cache(maxsize=32)
def _pipeline(MR: int, Bb: int, CI: int):
    """One jitted program: cast → 2-D parse → scan walk → segmented fused
    decode → uint8 output.  (MR, Bb, CI) are bucketed by the caller.
    Input and output ride the host link as uint8 (1 byte/byte); the int32
    word packing r4 used cost 1.38 ms of XLA layout shuffles per stream
    to unpack (r5 measurement, /tmp probes → records/phaseprof notes)."""
    scanfn = _scan_compiled(MR, Bb)
    decfn = decode_fused._compiled_streamed(Bb, MR, CI, CO)

    def run(u8, slen, dlen):
        byts2 = u8.astype(jnp.int32).reshape(MR, L)
        ent = _entries(byts2, slen)
        seg, smeta = scanfn(jnp.full((1,), slen, jnp.int32), ent)
        k = jnp.arange(Bb, dtype=jnp.int32)
        nseg = (dlen + SEG - 1) // SEG
        soffs = jnp.where(k < nseg, seg[:Bb], slen)
        ends = jnp.where(k + 1 < nseg, seg[1 : Bb + 1], slen)
        flens = jnp.clip(jnp.where(k < nseg, ends - soffs, 0), 0, CI * L)
        dlim = jnp.clip(dlen - k * SEG, 1, SEG)
        out, meta = decfn(flens, dlim, soffs, byts2)
        out8 = out.astype(jnp.uint8).reshape(Bb * CO * L)
        return out8, meta, smeta, seg

    return jax.jit(run)


def _geom(n: int, lo: int) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


def _bucket_b(n: int) -> int:
    """Block-count buckets: multiples of 8 up to 72 (fine — padded blocks
    pay full vector-phase cost), then x1.5 geometric (compile-count
    bounded for large streams)."""
    if n <= 72:
        return (n + 7) // 8 * 8
    b = 72
    while b < n:
        b = (b * 3 // 2 + 7) // 8 * 8
    return b


def plan(src_len: int, dst_len: int, wide: bool = False):
    """Bucketed pipeline shapes for a stream: (MR, Bb, CI) or None if the
    stream is outside the fast path's envelope."""
    nseg = (dst_len + SEG - 1) // SEG
    if (nseg < 2 or src_len > MAX_FAST_MB << 20 or src_len < 2
            or dst_len > 128 << 20):
        return None
    avg = src_len / nseg
    # compressible-profile bucket unless the average segment is already
    # close to it; a mixed stream that mispredicts costs one retry at the
    # full width (decompress_noheader_ws), never correctness
    CI = 312 if wide or (avg * 1.15 + 256 > 160 * L) else 160
    MR = _geom((src_len + (CI + 10) * L + L - 1) // L + 1, 512)
    Bb = _bucket_b(nseg + 1)
    return MR, Bb, CI


# On the CPU backend the pipeline runs the Pallas interpreter, whose
# inlined HLO is enormous: compiling it per stream-shape bloats the XLA
# CPU compiler (observed aborting LATER unrelated compiles in long test
# sessions) and is slower than the routed path anyway.  The routed path
# is fully correct without it, so the fast path is TPU-only by default;
# tests exercise it on CPU by setting FORCE_CPU.
FORCE_CPU = False


def decompress_noheader_ws(src: bytes | np.ndarray, dst_len: int,
                           wide: bool = False) -> bytes | None:
    """Device fast path for whole-stream decode.  Returns the decoded
    bytes on VERIFIED success (scan consumed the stream exactly, no
    straddle, every segment E_OK with exactly the expected produced
    length), else None — the caller falls back to the exact-error routed
    path.  Never returns wrong bytes."""
    if prim.interpret_mode() and not FORCE_CPU:
        return None
    buf = np.frombuffer(src, np.uint8) if isinstance(src, (bytes, bytearray)) else src
    M = len(buf)
    shapes = plan(M, dst_len, wide)
    if shapes is None:
        return None
    MR, Bb, CI = shapes
    nseg = (dst_len + SEG - 1) // SEG
    arr = np.zeros(MR * L, np.uint8)
    arr[:M] = buf
    fn = _pipeline(MR, Bb, CI)
    out8, meta, smeta, seg = jax.device_get(
        fn(jnp.asarray(arr), jnp.int32(M), jnp.int32(dst_len))
    )
    if smeta[2] != 0 or smeta[0] != M or smeta[1] != dst_len:
        return None
    offs = seg[:nseg].astype(np.int64)
    fends = np.append(offs[1:], M)
    if ((fends - offs) > CI * L).any():
        # width-bucket miss (a legal segment compressed wider than the
        # compressible-profile bucket): retry once at the full width
        return None if wide else decompress_noheader_ws(buf, dst_len, wide=True)
    exp = np.minimum(dst_len - np.arange(nseg, dtype=np.int64) * SEG, SEG)
    if (meta[:nseg, 1] != 0).any() or (meta[:nseg, 0] != exp).any():
        return None
    return out8[:dst_len].tobytes()


prim.register_trace_cache(_pipeline)
prim.register_trace_cache(_scan_compiled)

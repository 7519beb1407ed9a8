"""Parallel Snappy decoder — XLA/jnp backend.

FALLBACK/ORACLE ONLY: the shipping decode path is the fused Pallas kernel
(`decode_fused` for blocks, `decode_stream` for whole streams); this module
serves only api.decompress_noheader's general-envelope fallback for
exotic-but-legal streams the fast path rejects (offsets > 32767, tag
advances > 64 KiB) and as a slow reference formulation.

The reference decoder (csnappy_decompress.c:319-387) is a strictly sequential
tag loop: tag N's byte position depends on every prior tag's length, and
overlapping back-references are resolved byte-at-a-time.  On TPU both chains
are broken with pointer-doubling, turning the whole decode into ~2·log2(n)
batched VPU passes with no data-dependent control flow:

Phase A — tag-boundary resolution.  For *every* byte position ``p`` of the
compressed stream, compute speculatively (as if a tag started there) the tag's
advance, output contribution and fields.  This defines a successor function
``nxt[p]``; the real tag starts are the orbit of 0 under ``nxt``.  Reachability
is propagated with doubled jump pointers (scatter-max frontier), and per-tag
output offsets fall out of the jump-accumulated suffix sums.

Phase B — output materialization.  Scatter tag ids at their output offsets and
forward-fill (cummax) to find the covering tag of every output byte; literal
bytes point straight into the input, copy bytes point ``offset`` back into the
output.  That parent function is again resolved by pointer doubling (every
chain strictly decreases), the parallel analog of the reference's
pattern-doubling IncrementalCopyFastPath (csnappy_decompress.c:240-254).

Safety contract is the reference's: offset==0 / offset>written / truncated
tags ⇒ E_DATA_MALFORMED; output beyond ``dst_limit`` ⇒ E_OUTPUT_OVERRUN; the
kernel never indexes out of bounds regardless of input bytes (all gathers and
scatters are clamped / dropped).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..errors import E_DATA_MALFORMED, E_OK, E_OUTPUT_OVERRUN
from ..models import wire


def _ceil_log2(n: int) -> int:
    return max(1, int(n - 1).bit_length())


def _parse_all_positions(comp: jnp.ndarray, src_len: jnp.ndarray, out_cap: int):
    """Speculative per-position tag parse (vectorized, branch-free).

    Returns dict of per-position arrays: successor, produced output length,
    tag fields and validity.  ``comp`` is int32[P] with values 0..255.
    """
    P = comp.shape[0]
    ext = jnp.concatenate([comp, jnp.zeros((4,), jnp.int32)])
    b0 = comp
    b1, b2, b3, b4 = (jax.lax.dynamic_slice_in_dim(ext, k, P) for k in range(1, 5))

    kind = b0 & 3
    u = b0 >> 2
    is_lit = kind == wire.TAG_LITERAL

    # literal length: inline (u<60) or 1-4 LE trailer bytes holding len-1
    extra = jnp.clip(u - 59, 0, 4)
    le4 = (
        b1.astype(jnp.uint32)
        | (b2.astype(jnp.uint32) << 8)
        | (b3.astype(jnp.uint32) << 16)
        | (b4.astype(jnp.uint32) << 24)
    )
    shift = (8 * (4 - jnp.maximum(extra, 1))).astype(jnp.uint32)
    trailer_val = jnp.where(extra > 0, (le4 << shift) >> shift, jnp.uint32(0))
    lit_len_u = trailer_val + 1  # uint32; wraps to 0 iff trailer was 0xFFFFFFFF
    lit_too_big = (u >= 60) & ((lit_len_u == 0) | (lit_len_u > jnp.uint32(P)))
    lit_len = jnp.where(
        u >= 60,
        jnp.minimum(lit_len_u, jnp.uint32(P)).astype(jnp.int32),
        u + 1,
    )

    hdr = jnp.where(
        is_lit,
        1 + extra,
        jnp.where(kind == wire.TAG_COPY_1, 2, jnp.where(kind == wire.TAG_COPY_2, 3, 5)),
    )
    copy_len = jnp.where(kind == wire.TAG_COPY_1, (u & 7) + wire.MIN_MATCH, u + 1)
    # copy4 offsets >= 2^31 come out negative in int32 — caught by the
    # offset-validity check (negative => > written => malformed)
    copy_off = jnp.where(
        kind == wire.TAG_COPY_1,
        ((u >> 3) << 8) | b1,
        jnp.where(kind == wire.TAG_COPY_2, b1 | (b2 << 8), b1 | (b2 << 8) | (b3 << 16) | (b4 << 24)),
    )

    produced = jnp.where(is_lit, lit_len, copy_len)
    advance = hdr + jnp.where(is_lit, lit_len, 0)

    pos = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)[:, 0]
    in_range = pos < src_len
    tag_err = in_range & ((pos + advance > src_len) | (is_lit & lit_too_big))
    usable = in_range & ~tag_err
    nxt = jnp.where(usable, jnp.minimum(pos + advance, P), P)
    produced = jnp.where(usable, jnp.minimum(produced, out_cap + 1), 0)

    return dict(
        pos=pos,
        kind=kind,
        nxt=nxt,
        produced=produced,
        copy_len=copy_len,
        copy_off=copy_off,
        lit_src=pos + hdr,  # literal payload starts right after the header
        tag_err=tag_err,
        in_range=in_range,
    )


def _resolve_tag_chain(nxt: jnp.ndarray, produced: jnp.ndarray, src_len: jnp.ndarray):
    """Pointer-doubling over the tag successor graph.

    Returns (is_tag[P] reached-from-0 mask, out_start[P], total_out scalar).
    """
    P = nxt.shape[0]
    # sentinel node P: self-loop producing nothing
    J = jnp.concatenate([nxt, jnp.array([P], jnp.int32)])
    S = jnp.concatenate([produced, jnp.array([0], jnp.int32)])
    m = jnp.zeros((P + 1,), jnp.int32).at[0].set(jnp.where(src_len > 0, 1, 1))

    def body(_, carry):
        m, S, J = carry
        m = m.at[J].max(m, mode="drop")
        S = S + S[J]
        J = J[J]
        return m, S, J

    m, S, J = jax.lax.fori_loop(0, _ceil_log2(P + 1) + 1, body, (m, S, J))
    total_out = S[0]
    out_start = total_out - S[:P]
    return m[:P].astype(bool), out_start, total_out


def _materialize(comp, tags, is_tag, out_start, total_out, out_cap: int, dst_limit):
    """Phase B: produce output bytes + copy-validity flag."""
    P = comp.shape[0]
    # covering tag for every output byte: scatter tag id at its output start,
    # then forward-fill.  Output starts are strictly increasing over real tags
    # (every tag produces >= 1 byte), so ids never collide.
    scat_idx = jnp.where(is_tag & (out_start >= 0) & (out_start < out_cap), out_start, out_cap)
    cover = (
        jnp.full((out_cap + 1,), -1, jnp.int32)
        .at[scat_idx]
        .max(jnp.where(is_tag, tags["pos"], -1), mode="drop")[:out_cap]
    )
    cover = jax.lax.cummax(cover)
    cp = jnp.clip(cover, 0, P - 1)

    t_kind = tags["kind"][cp]
    t_os = out_start[cp]
    t_off = tags["copy_off"][cp]
    t_lit_src = tags["lit_src"][cp]

    o = jax.lax.broadcasted_iota(jnp.int32, (out_cap, 1), 0)[:, 0]
    live = (o < total_out) & (cover >= 0)
    is_copy_byte = live & (t_kind != wire.TAG_LITERAL)

    parent = jnp.where(is_copy_byte, o - t_off, o)
    copy_err = is_copy_byte & ((t_off <= 0) | (parent < 0))
    parent = jnp.clip(parent, 0, out_cap - 1)

    def body(_, par):
        return par[par]

    parent = jax.lax.fori_loop(0, _ceil_log2(out_cap) + 1, body, parent)

    # parent now points at a literal byte; fetch its input position, then value
    root_src = jnp.clip(t_lit_src + (o - t_os), 0, P - 1)  # per literal byte
    src_idx = root_src[parent]
    out = jnp.where(live, comp[src_idx], 0)
    return out, jnp.any(copy_err)


def _decode_core(comp, src_len, dst_limit, out_cap: int):
    """comp: int32[P] (0..255), src_len/dst_limit: int32 scalars.

    Returns (out int32[out_cap], produced int32, status int32).
    """
    tags = _parse_all_positions(comp, src_len, out_cap)
    is_tag, out_start, total_out = _resolve_tag_chain(tags["nxt"], tags["produced"], src_len)
    out, copy_err = _materialize(comp, tags, is_tag, out_start, total_out, out_cap, dst_limit)

    malformed = jnp.any(is_tag & tags["tag_err"]) | copy_err
    # a tag whose advance overshoots src_len is flagged in tag_err; reaching it
    # still marks it (its successor is the sentinel), so `malformed` catches
    # every truncation; landing exactly on src_len is the clean exit.
    overrun = total_out > dst_limit
    status = jnp.where(malformed, E_DATA_MALFORMED, jnp.where(overrun, E_OUTPUT_OVERRUN, E_OK))
    produced = jnp.where(status == E_OK, total_out, 0)
    return out, produced, status


# --------------------------------------------------------------------------
# host-facing wrappers with shape bucketing + compile cache


@functools.lru_cache(maxsize=64)
def _compiled_single(P: int, out_cap: int):
    return jax.jit(functools.partial(_decode_core, out_cap=out_cap))


@functools.lru_cache(maxsize=64)
def _compiled_batch(P: int, out_cap: int):
    core = functools.partial(_decode_core, out_cap=out_cap)
    return jax.jit(jax.vmap(core))


def _bucket(n: int, quantum: int = 4096) -> int:
    """Round up to limit recompiles: powers of two with two mid-points."""
    n = max(n, quantum)
    p = 1 << (n - 1).bit_length()
    for cand in (p // 2, p * 5 // 8, p * 3 // 4, p):
        if cand >= n and cand % quantum == 0:
            return cand
    return p


def decompress_noheader_np(src: np.ndarray, dst_len: int) -> tuple[np.ndarray, int, int]:
    """Decode a headerless tag stream (uint8 array) on the default JAX device.

    Returns (out uint8[<=dst_len], produced, status) — status uses the
    CSNAPPY error codes; on error `out` is empty.
    """
    n = len(src)
    P = _bucket(max(n, 8))
    out_cap = _bucket(max(dst_len, 8))
    comp = jnp.asarray(
        np.pad(np.asarray(src, dtype=np.uint8), (0, P - n)).astype(np.int32)
    )
    fn = _compiled_single(P, out_cap)
    out, produced, status = fn(comp, jnp.int32(n), jnp.int32(dst_len))
    status = int(status)
    if status != E_OK:
        return np.zeros(0, np.uint8), 0, status
    produced = int(produced)
    return np.asarray(out[:produced]).astype(np.uint8), produced, status


def decode_blocks(
    comp: np.ndarray, src_lens: np.ndarray, block_out: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Batched headerless decode of independent blocks (zram mode).

    comp: uint8[B, P]; src_lens: int32[B]; each block may produce at most
    ``block_out`` bytes.  Returns (out uint8[B, block_out], produced int32[B],
    status int32[B]).
    """
    B, P = comp.shape
    fn = _compiled_batch(P, block_out)
    out, produced, status = fn(
        jnp.asarray(comp.astype(np.int32)),
        jnp.asarray(src_lens.astype(np.int32)),
        jnp.full((B,), block_out, np.int32),
    )
    return (
        np.asarray(out).astype(np.uint8),
        np.asarray(produced),
        np.asarray(status),
    )

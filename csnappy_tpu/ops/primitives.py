"""Backend-adaptive data-movement primitives for the codec kernels.

Each primitive has two implementations:
* CPU: plain jnp advanced indexing (XLA:CPU vectorizes gather/scatter fine);
* TPU: a Pallas kernel that keeps one-hot routing in VMEM (XLA:TPU would
  otherwise serialize arbitrary gathers to ~140M elem/s, ARCHITECTURE.md).

All primitives are shape-polymorphic over leading batch dims and exact on
int32 (local ops compare+select in int32; table ops split into 8-bit limbs,
one-hots are 0/1 and thus exact in bf16).
"""
from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L = 128


def bucket_pow2(n: int, base: int) -> int:
    """Round ``n`` up to base·2^k.  Batch/width shapes fed to the fused
    kernels are bucketed so a sweep over many differently-sized inputs
    (corpus table, zram-sim tree store) compiles O(log) kernel variants
    instead of one per distinct size — a Mosaic compile costs ~100 s on
    this pod and the compile cache does not persist through the relay."""
    b = base
    while b < n:
        b *= 2
    return b

# Tests flip this (via force_pallas) so the *shipping* Pallas kernels run —
# in interpret mode — on the CPU backend instead of the jnp fallback.
_FORCE_PALLAS = False
# jitted wrappers bake the backend branch at trace time; they register their
# caches here so force_pallas() can invalidate them
_TRACE_CACHES: list = []


def register_trace_cache(cache) -> None:
    _TRACE_CACHES.append(cache)


@contextlib.contextmanager
def force_pallas():
    """Run every primitive through its Pallas kernel (interpret mode on CPU)."""
    global _FORCE_PALLAS
    old = _FORCE_PALLAS
    _FORCE_PALLAS = True
    for c in _TRACE_CACHES:
        c.cache_clear()
    try:
        yield
    finally:
        _FORCE_PALLAS = old
        for c in _TRACE_CACHES:
            c.cache_clear()


def _on_cpu() -> bool:
    return jax.default_backend() == "cpu" and not _FORCE_PALLAS


def interpret_mode() -> bool:
    """Pallas interpret flag: interpret when no real TPU backend is active."""
    return jax.default_backend() == "cpu"


# ----------------------------------------------------------- local gather --


def _local_gather_kernel(v_ref, i_ref, o_ref):
    v = v_ref[...]
    ix = i_ref[...]
    lanes = jax.lax.broadcasted_iota(jnp.int32, ix.shape + (L,), ix.ndim)
    oh = ix[..., None] == lanes
    o_ref[...] = jnp.sum(jnp.where(oh, v[..., None, :], 0), axis=-1)


def local_gather(values, idx):
    """y[..., c, e] = values[..., c, idx[..., c, e]]  (idx clipped to [0,128))."""
    idx = jnp.clip(idx, 0, L - 1)
    if _on_cpu():
        return jnp.take_along_axis(values, idx, axis=-1)
    shape = values.shape
    v2 = values.reshape(-1, L)
    i2 = idx.reshape(-1, L)
    C = v2.shape[0]
    RC = 8 if C % 8 == 0 else 1
    out = pl.pallas_call(
        _local_gather_kernel,
        out_shape=jax.ShapeDtypeStruct((C, L), jnp.int32),
        grid=(C // RC,),
        in_specs=[
            pl.BlockSpec((RC, L), lambda c: (c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RC, L), lambda c: (c, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((RC, L), lambda c: (c, 0), memory_space=pltpu.VMEM),
        interpret=interpret_mode(),
    )(v2, i2)
    return out.reshape(shape)


# ------------------------------------------------------- local scatter-or --


def _local_scatter_or_kernel(m_ref, t_ref, o_ref):
    m = m_ref[...]                       # (RC, L) int32 0/1
    tgt = t_ref[...]                     # (RC, L) target lane or >=L for none
    lanes = jax.lax.broadcasted_iota(jnp.int32, tgt.shape + (L,), tgt.ndim)
    hit = (tgt[..., None] == lanes) & (m[..., None] > 0)   # (RC, L, Lq)
    o_ref[...] = jnp.maximum(jnp.max(jnp.where(hit, 1, 0), axis=-2), m)


def local_scatter_or(mask, tgt):
    """out[..., c, q] = mask[..., c, q] | any_e(mask[..., c, e] & (tgt == q)).

    mask int32 0/1; tgt int32 (values outside [0,128) scatter nowhere)."""
    if _on_cpu():
        q = jax.lax.broadcasted_iota(jnp.int32, tgt.shape + (L,), tgt.ndim)
        hit = (tgt[..., None] == q) & (mask[..., None] > 0)
        return jnp.maximum(jnp.max(jnp.where(hit, 1, 0), axis=-2), mask)
    shape = mask.shape
    m2 = mask.reshape(-1, L)
    t2 = tgt.reshape(-1, L)
    C = m2.shape[0]
    RC = 8 if C % 8 == 0 else 1
    out = pl.pallas_call(
        _local_scatter_or_kernel,
        out_shape=jax.ShapeDtypeStruct((C, L), jnp.int32),
        grid=(C // RC,),
        in_specs=[
            pl.BlockSpec((RC, L), lambda c: (c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RC, L), lambda c: (c, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((RC, L), lambda c: (c, 0), memory_space=pltpu.VMEM),
        interpret=interpret_mode(),
    )(m2, t2)
    return out.reshape(shape)


# ------------------------------------------------------ fused compose round --


def _compose_round_kernel(F_ref, S_ref, E_ref, ce_ref, Fo_ref, So_ref, Eo_ref):
    F = F_ref[...]
    S = S_ref[...]
    E = E_ref[...]
    chunk_end = ce_ref[...]
    local = F < chunk_end
    li = jnp.where(local, F & (L - 1), 0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, li.shape + (L,), li.ndim)
    oh = li[..., None] == lanes
    gF = jnp.sum(jnp.where(oh, F[..., None, :], 0), axis=-1)
    gS = jnp.sum(jnp.where(oh, S[..., None, :], 0), axis=-1)
    gE = jnp.sum(jnp.where(oh, E[..., None, :], 0), axis=-1)
    Fo_ref[...] = jnp.where(local, gF, F)
    So_ref[...] = jnp.where(local, jnp.minimum(S + gS, 1 << 23), S)
    Eo_ref[...] = jnp.where(local, E | gE, E)


def compose_round(F, S, E, chunk_end):
    """One in-chunk composition round (decoder phase A2), fused.

    F, S, E, chunk_end: int32[..., CI, L]; F jumps only while F < chunk_end.
    chunk_end is passed as data (not derived from grid position) so the
    kernel stays correct under vmap batching."""
    shape = F.shape
    F2, S2, E2, C2 = (x.reshape(-1, L) for x in (F, S, E, chunk_end))
    if _on_cpu():
        local = F2 < C2
        li = jnp.where(local, F2 & (L - 1), 0)
        gF = jnp.take_along_axis(F2, li, axis=1)
        gS = jnp.take_along_axis(S2, li, axis=1)
        gE = jnp.take_along_axis(E2, li, axis=1)
        Fn = jnp.where(local, gF, F2)
        Sn = jnp.where(local, jnp.minimum(S2 + gS, 1 << 23), S2)
        En = jnp.where(local, E2 | gE, E2)
        return Fn.reshape(shape), Sn.reshape(shape), En.reshape(shape)
    C = F2.shape[0]
    RC = 8 if C % 8 == 0 else 1
    spec = pl.BlockSpec((RC, L), lambda c: (c, 0), memory_space=pltpu.VMEM)
    Fn, Sn, En = pl.pallas_call(
        _compose_round_kernel,
        out_shape=tuple(jax.ShapeDtypeStruct((C, L), jnp.int32) for _ in range(3)),
        grid=(C // RC,),
        in_specs=[spec, spec, spec, spec],
        out_specs=(spec, spec, spec),
        interpret=interpret_mode(),
    )(F2, S2, E2, C2)
    return Fn.reshape(shape), Sn.reshape(shape), En.reshape(shape)


# ------------------------------------------------------------- row gather --


def _row_gather_kernel(tbl_ref, r_ref, o_ref, *, limbs, rt):
    CIp = tbl_ref.shape[0]
    rows_all = r_ref[...]                               # (8, RT)
    iota3 = jax.lax.broadcasted_iota(jnp.int32, (8, rt, CIp), 2)
    oh3 = (rows_all[:, :, None] == iota3).astype(jnp.bfloat16)
    for j in range(8):
        oh = oh3[j]                                     # (RT, CIp)
        acc = jnp.zeros((rt, L), jnp.int32)
        for k in range(limbs):
            limb = ((tbl_ref[...] >> (8 * k)) & 0xFF).astype(jnp.bfloat16)
            got = jnp.dot(oh, limb, preferred_element_type=jnp.float32)
            acc = acc | (got.astype(jnp.int32) << (8 * k))
        o_ref[pl.ds(j * rt, rt), :] = acc


def row_gather(table2d, rows, limbs=3):
    """y[m, :] = table2d[rows[m], :] via a one-hot row matmul.

    table2d: int32[CI, L] (values < 2^(8*limbs), >= 0); rows: int32[M]."""
    CI = table2d.shape[0]
    rows = jnp.clip(rows, 0, CI - 1)
    if _on_cpu():
        return table2d[rows]
    M = rows.shape[0]
    CIp = (CI + L - 1) // L * L
    tbl = jnp.pad(table2d, ((0, CIp - CI), (0, 0)))
    RT = 256 if M % 2048 == 0 else M // 8
    assert M % (8 * RT) == 0, (M, RT)
    r2 = rows.reshape(-1, RT)                           # (G*8, RT)
    G = r2.shape[0] // 8
    out = pl.pallas_call(
        functools.partial(_row_gather_kernel, limbs=limbs, rt=RT),
        out_shape=jax.ShapeDtypeStruct((M, L), jnp.int32),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((CIp, L), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, RT), lambda g: (g, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8 * RT, L), lambda g: (g, 0), memory_space=pltpu.VMEM),
        interpret=interpret_mode(),
    )(tbl, r2)
    return out


# ----------------------------------------------------------- table gather --


def _table_gather_kernel(tbl_ref, row_ref, lane_ref, o_ref, *, limbs):
    tbl = tbl_ref[...]
    R = tbl.shape[0]
    TW = row_ref.shape[1]
    rows_all = row_ref[...]                             # (8, TW)
    lanes_all = lane_ref[...]
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (8, TW, R), 2)
    oh_rows = (rows_all[:, :, None] == iota_r).astype(jnp.bfloat16)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (8, TW, L), 2)
    oh_lanes = lanes_all[:, :, None] == iota_l
    for j in range(8):
        acc = jnp.zeros((TW,), jnp.int32)
        for k in range(limbs):
            limb = ((tbl >> (8 * k)) & 0xFF).astype(jnp.bfloat16)
            picked = jnp.dot(oh_rows[j], limb, preferred_element_type=jnp.float32)
            val = jnp.sum(jnp.where(oh_lanes[j], picked, 0.0), axis=-1).astype(jnp.int32)
            acc = acc | (val << (8 * k))
        o_ref[pl.ds(j, 1), :] = acc[None, :]


def table_gather(table, idx, limbs=2):
    """y[i] = table[idx[i]] for int32 values in [0, 2^(8*limbs)); T % 128 == 0."""
    T = table.shape[0]
    idx = jnp.clip(idx, 0, T - 1)
    if _on_cpu():
        return table[idx]
    N = idx.shape[0]
    R = T // L
    TW = 512
    CHUNK = 8 * TW
    Np = (N + CHUNK - 1) // CHUNK * CHUNK
    idx_p = jnp.pad(idx, (0, Np - N))
    row = (idx_p >> 7).reshape(-1, TW)                  # (G*8, TW)
    lane = (idx_p & (L - 1)).reshape(-1, TW)
    G = row.shape[0] // 8
    out = pl.pallas_call(
        functools.partial(_table_gather_kernel, limbs=limbs),
        out_shape=jax.ShapeDtypeStruct((Np // TW, TW), jnp.int32),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((R, L), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TW), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TW), lambda g: (g, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, TW), lambda g: (g, 0), memory_space=pltpu.VMEM),
        interpret=interpret_mode(),
    )(table.reshape(R, L), row, lane)
    return out.reshape(Np)[:N]


# --------------------------------------------------------- rowwise gather --


def _rowwise_gather_kernel(tbl_ref, i_ref, o_ref, *, limbs):
    W = tbl_ref.shape[1]
    N = i_ref.shape[1]
    ix_all = i_ref[...]                                 # (8, N)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (8, N, W), 2)
    oh3 = (ix_all[:, :, None] == iota_w).astype(jnp.bfloat16)
    for r in range(8):
        acc = jnp.zeros((N,), jnp.int32)
        for k in range(limbs):
            limb = ((tbl_ref[pl.ds(r, 1), :] >> (8 * k)) & 0xFF).astype(jnp.float32)
            val = jnp.sum(oh3[r].astype(jnp.float32) * limb, axis=-1)  # (N,W)*(1,W)
            acc = acc | (val.astype(jnp.int32) << (8 * k))
        o_ref[pl.ds(r, 1), :] = acc[None, :]


def rowwise_gather(tables, idx, limbs=3):
    """y[g, n] = tables[g, idx[g, n]] — per-row private tables.

    tables: int32[G, W]; idx: int32[G, N] clipped to [0, W)."""
    G, W = tables.shape
    idx = jnp.clip(idx, 0, W - 1)
    if _on_cpu():
        return jnp.take_along_axis(tables, idx, axis=1)
    N = idx.shape[1]
    Gp = (G + 7) // 8 * 8
    tables_p = jnp.pad(tables, ((0, Gp - G), (0, 0)))
    idx_p = jnp.pad(idx, ((0, Gp - G), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_rowwise_gather_kernel, limbs=limbs),
        out_shape=jax.ShapeDtypeStruct((Gp, N), jnp.int32),
        grid=(Gp // 8,),
        in_specs=[
            pl.BlockSpec((8, W), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, N), lambda g: (g, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, N), lambda g: (g, 0), memory_space=pltpu.VMEM),
        interpret=interpret_mode(),
    )(tables_p, idx_p)
    return out[:G]

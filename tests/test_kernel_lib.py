"""kernel_lib helpers, executed inside Pallas kernels (interpret mode)."""
import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from csnappy_tpu.ops import kernel_lib as kl


def _run(kernel, out_shape, *arrs):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in arrs],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=True,
    )(*arrs)


@pytest.mark.parametrize("d", [0, 1, 7, 127, 128, 129, 300, 1023])
def test_stream_shift_down(d):
    x = np.arange(8 * 128, dtype=np.int32).reshape(8, 128) * 3 + 1

    def k(x_ref, o_ref):
        o_ref[...] = kl.stream_shift_down(x_ref[...], d, fill=-7)

    got = np.asarray(_run(k, (8, 128), jnp.asarray(x))).reshape(-1)
    want = np.full(8 * 128, -7, np.int32)
    if d < 8 * 128:
        want[d:] = x.reshape(-1)[: 8 * 128 - d]
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("d", [1, 127, 128, 200, 1023])
def test_stream_shift_up(d):
    x = np.arange(8 * 128, dtype=np.int32).reshape(8, 128) * 5 + 2

    def k(x_ref, o_ref):
        o_ref[...] = kl.stream_shift_up(x_ref[...], d, fill=-3)

    got = np.asarray(_run(k, (8, 128), jnp.asarray(x))).reshape(-1)
    want = np.full(8 * 128, -3, np.int32)
    want[: 8 * 128 - d] = x.reshape(-1)[d:]
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("op", ["max", "add"])
@pytest.mark.parametrize("rows", [8, 16])
def test_scan2d(op, rows):
    r = np.random.default_rng(0)
    x = r.integers(-1000, 1000, (rows, 128)).astype(np.int32)

    def k(x_ref, o_ref):
        o_ref[...] = kl.scan2d(x_ref[...], op=op)

    got = np.asarray(_run(k, (rows, 128), jnp.asarray(x))).reshape(-1)
    f = np.maximum.accumulate if op == "max" else np.cumsum
    np.testing.assert_array_equal(got, f(x.reshape(-1)).astype(np.int32))


@pytest.mark.parametrize("bits", [8, 16, 24])
def test_gather_flat(bits):
    r = np.random.default_rng(1)
    tbl = r.integers(0, 1 << bits, (16, 128)).astype(np.int32)
    idx = r.integers(0, 16 * 128, (1, 256)).astype(np.int32)

    def k(t_ref, i_ref, o_ref):
        o_ref[...] = kl.gather_flat(t_ref[...], i_ref[...], bits)

    got = np.asarray(_run(k, (1, 256), jnp.asarray(tbl), jnp.asarray(idx)))
    np.testing.assert_array_equal(got[0], tbl.reshape(-1)[idx[0]])


def test_local_gather_rows():
    r = np.random.default_rng(2)
    v = r.integers(-(2**31), 2**31 - 1, (16, 128)).astype(np.int32)
    li = r.integers(0, 128, (16, 128)).astype(np.int32)

    def k(v_ref, i_ref, o_ref):
        o_ref[...] = kl.local_gather_rows(v_ref[...], i_ref[...])

    got = np.asarray(_run(k, (16, 128), jnp.asarray(v), jnp.asarray(li)))
    np.testing.assert_array_equal(got, np.take_along_axis(v, li, axis=1))


@pytest.mark.parametrize("d", [1, 2, 4, 5])
def test_stream_shift_up_mm(d):
    x = np.arange(16 * 128, dtype=np.int32).reshape(16, 128) * 7 + 3

    def k(x_ref, o_ref):
        o_ref[...] = kl.stream_shift_up_mm(x_ref[...], d)

    got = np.asarray(_run(k, (16, 128), jnp.asarray(x))).reshape(-1)
    want = np.zeros(16 * 128, np.int32)
    want[: 16 * 128 - d] = x.reshape(-1)[d:]
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("op,bits", [("max", 31), ("add", 24)])
@pytest.mark.parametrize("rows", [8, 24])
def test_scan2d_mm(op, bits, rows):
    r = np.random.default_rng(4)
    hi = (1 << 30) if op == "max" else 1000
    x = r.integers(0, hi, (rows, 128)).astype(np.int32)

    def k(x_ref, o_ref):
        o_ref[...] = kl.scan2d_mm(x_ref[...], op=op, bits=bits)

    got = np.asarray(_run(k, (rows, 128), jnp.asarray(x))).reshape(-1)
    f = np.maximum.accumulate if op == "max" else np.cumsum
    np.testing.assert_array_equal(got, f(x.reshape(-1)).astype(np.int32))


@pytest.mark.parametrize("bits", [8, 19])
def test_gather_rows_multi(bits):
    r = np.random.default_rng(5)
    tbl = r.integers(0, 1 << bits, (24, 128)).astype(np.int32)
    tbl2 = r.integers(0, 1 << 16, (24, 128)).astype(np.int32)
    idx = r.integers(0, 24 * 128, (8, 128)).astype(np.int32)

    def k(t_ref, t2_ref, i_ref, o_ref, o2_ref):
        a, b = kl.gather_rows_multi(
            [(t_ref[...], bits), (t2_ref[...], 16)], i_ref, 0
        )
        o_ref[...] = a
        o2_ref[...] = b

    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    got, got2 = pl.pallas_call(
        k,
        out_shape=(jax.ShapeDtypeStruct((8, 128), jnp.int32),) * 2,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 2,
        interpret=True,
    )(jnp.asarray(tbl), jnp.asarray(tbl2), jnp.asarray(idx))
    np.testing.assert_array_equal(np.asarray(got), tbl.reshape(-1)[idx])
    np.testing.assert_array_equal(np.asarray(got2), tbl2.reshape(-1)[idx])


@pytest.mark.parametrize("bits", [16, 31])
def test_scatter_rows_multi(bits):
    r = np.random.default_rng(6)
    pos = r.permutation(16 * 128)[: 8 * 128].astype(np.int32).reshape(8, 128)
    val = r.integers(0, 1 << bits, (8, 128)).astype(np.int32)
    mask = r.random((8, 128)) < 0.7
    pos_m = np.where(mask, pos, -1).astype(np.int32)  # sentinel = no scatter

    def k(p_ref, v_ref, o_ref):
        (h,) = kl.scatter_rows_multi(p_ref, [(v_ref, bits)], 0, 16)
        o_ref[...] = h

    got = np.asarray(
        _run(k, (16, 128), jnp.asarray(pos_m), jnp.asarray(val))
    ).reshape(-1)
    want = np.zeros(16 * 128, np.int32)
    want[pos[mask]] = val[mask]
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("bits", [16, 31])
def test_scatter_sum_tile(bits):
    r = np.random.default_rng(3)
    pos = r.permutation(16 * 128)[:128].astype(np.int32).reshape(1, 128)
    val = r.integers(0, 1 << bits, (1, 128)).astype(np.int32)
    mask = (r.random((1, 128)) < 0.8)

    def k(p_ref, v_ref, m_ref, o_ref):
        o_ref[...] = kl.scatter_sum_tile(
            p_ref[...], v_ref[...], m_ref[...] > 0, 16, bits
        )

    got = np.asarray(
        _run(k, (16, 128), jnp.asarray(pos), jnp.asarray(val),
             jnp.asarray(mask.astype(np.int32)))
    ).reshape(-1)
    want = np.zeros(16 * 128, np.int32)
    want[pos[0][mask[0]]] = val[0][mask[0]]
    np.testing.assert_array_equal(got, want)

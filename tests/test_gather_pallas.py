"""Pallas gather kernels: interpreter-mode exactness vs native indexing."""
import jax.numpy as jnp
import numpy as np
import pytest

from csnappy_tpu.ops import gather_pallas


def test_local_gather_interpret():
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.integers(-(1 << 30), 1 << 30, size=(16, 128), dtype=np.int32))
    i = jnp.asarray(rng.integers(0, 128, size=(16, 128), dtype=np.int32))
    got = gather_pallas.local_gather(v, i, interpret=True)
    ref = np.take_along_axis(np.asarray(v), np.asarray(i), axis=-1)
    assert (np.asarray(got) == ref).all()


def test_local_gather_cpu_fallback():
    rng = np.random.default_rng(1)
    v = jnp.asarray(rng.integers(0, 1 << 20, size=(2, 8, 128), dtype=np.int32))
    i = jnp.asarray(rng.integers(0, 128, size=(2, 8, 128), dtype=np.int32))
    got = gather_pallas.local_gather(v, i)
    ref = np.take_along_axis(np.asarray(v), np.asarray(i), axis=-1)
    assert (np.asarray(got) == ref).all()


@pytest.mark.parametrize("T,limbs,maxv", [(1024, 2, 1 << 16), (4096, 3, 1 << 22)])
def test_global_gather_interpret(T, limbs, maxv):
    rng = np.random.default_rng(2)
    t = jnp.asarray(rng.integers(0, maxv, size=T, dtype=np.int32))
    i = jnp.asarray(rng.integers(0, T, size=1024, dtype=np.int32))
    got = gather_pallas.global_gather(t, i, limbs=limbs, interpret=True)
    assert (np.asarray(got) == np.asarray(t)[np.asarray(i)]).all()

"""Exactness of the MXU one-hot gather vs native gather."""
import jax.numpy as jnp
import numpy as np
import pytest

from csnappy_tpu.ops import gather_mxu


@pytest.mark.parametrize("T,limbs,maxval", [(1024, 2, 1 << 15), (4096, 2, 65535), (4096, 3, 1 << 20)])
def test_gather_exact(T, limbs, maxval):
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.integers(0, maxval, size=T, dtype=np.int32))
    idx = jnp.asarray(rng.integers(0, T, size=T, dtype=np.int32))
    got = gather_mxu.gather_mxu(table, idx, limbs=limbs)
    assert (np.asarray(got) == np.asarray(table)[np.asarray(idx)]).all()


def test_gather_multi_shares_onehot():
    rng = np.random.default_rng(1)
    t1 = jnp.asarray(rng.integers(0, 1 << 15, size=2048, dtype=np.int32))
    t2 = jnp.asarray(rng.integers(0, 255, size=2048, dtype=np.int32))
    idx = jnp.asarray(rng.integers(0, 2048, size=512, dtype=np.int32))
    g1, g2 = gather_mxu.gather_mxu_multi([t1, t2], idx, limbs_list=[2, 1])
    assert (np.asarray(g1) == np.asarray(t1)[np.asarray(idx)]).all()
    assert (np.asarray(g2) == np.asarray(t2)[np.asarray(idx)]).all()

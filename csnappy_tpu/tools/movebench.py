"""Data-movement strategy microbenchmark — the ``unaligned_test.c`` analog.

The reference benchmarks six 1-4-byte load strategies to pick its
portability primitive (unaligned_test.c:45-120).  The TPU analog measures
the data-movement strategies that shaped this codec's architecture
(ARCHITECTURE.md routing table):

  xla_gather    — arbitrary-index jnp gather (XLA:TPU serializes this)
  onehot_mxu    — one-hot limb matmul gather (kernel_lib.gather_rows_multi)
  sort          — jax.lax.sort keys/s (the encoder's match index)
  dense_vpu     — elementwise ops/s (the ceiling)
  scan_mxu      — permutation-matmul scan elements/s (kernel_lib.scan2d_mm)

Run:  python -m csnappy_tpu.tools.movebench [N]
Prints one JSON line per strategy in elements/s.
"""
from __future__ import annotations

import functools
import json
import sys

import numpy as np


def main(argv=None) -> int:
    n = int(argv[0]) if argv else 32768
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ..ops import kernel_lib as kl
    from ..ops import primitives as prim
    from .timing import slope_time

    rng = np.random.default_rng(0)
    tbl = jnp.asarray(rng.integers(0, 1 << 15, (n // 128, 128), dtype=np.int32))
    idx = jnp.asarray(rng.integers(0, n, (n // 128, 128), dtype=np.int32))
    flat_tbl = tbl.reshape(-1)
    flat_idx = idx.reshape(-1)
    out = {}

    # 1. arbitrary-index XLA gather
    def xg(k):
        return flat_tbl[(flat_idx + k) % n].sum()

    out["xla_gather"] = n / slope_time(xg, k_lo=2, k_hi=8)

    # 2. one-hot MXU gather (the shipping kernel path)
    R = n // 128

    def _k(i_ref, t_ref, o_ref):
        def grp(g, _):
            r0 = pl.multiple_of(g * 8, 8)
            (got,) = kl.gather_rows_multi([(t_ref[...], 16)], i_ref, r0)
            o_ref[pl.ds(r0, 8), :] = got
            return 0

        jax.lax.fori_loop(0, R // 8, grp, 0)

    oh_call = pl.pallas_call(
        _k,
        out_shape=jax.ShapeDtypeStruct((R, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=prim.interpret_mode(),
    )

    def og(k):
        return oh_call((idx + k) % n, tbl).sum()

    out["onehot_mxu"] = n / slope_time(og, k_lo=2, k_hi=8)

    # 3. sort
    def sg(k):
        return jnp.sort(flat_idx + k).sum()

    out["sort"] = n / slope_time(sg, k_lo=2, k_hi=8)

    # 4. dense VPU
    def dg(k):
        x = flat_tbl + k
        return ((x * 3) ^ (x >> 1)).sum()

    out["dense_vpu"] = n / slope_time(dg, k_lo=8, k_hi=64)

    # 5. MXU permutation scan
    def _ks(x_ref, o_ref):
        o_ref[...] = kl.scan2d_mm(x_ref[...], op="max", bits=31)

    sc_call = pl.pallas_call(
        _ks,
        out_shape=jax.ShapeDtypeStruct((R, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=prim.interpret_mode(),
    )

    def scg(k):
        return sc_call(tbl + k).sum()

    out["scan_mxu"] = n / slope_time(scg, k_lo=2, k_hi=8)

    for name, v in out.items():
        print(json.dumps({"strategy": name, "elem_per_s": round(float(v), 1)}))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

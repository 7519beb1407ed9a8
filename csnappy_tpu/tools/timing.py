"""Honest device timing on this pod (ARCHITECTURE.md).

The axon relay acks dispatches before execution and can short-circuit
repeated identical calls, so naive per-call timers lie.  Every device
number comes from K-iteration fori_loops inside one jit with
loop-dependent inputs and a forced scalar readback; cost per op is the
slope between two K values.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def slope_time(make_step, k_lo=2, k_hi=8, reps=2) -> float:
    """Wall seconds per step: K-loop slope with forced scalar readback.

    make_step(k) must return an int32 scalar that depends on the step's
    real computation and on k (so XLA cannot hoist or fuse calls away).
    """

    @jax.jit
    def run(K, seed):
        def body(k, acc):
            return acc + make_step(k + seed)

        return jax.lax.fori_loop(0, K, body, jnp.int32(0))

    int(run(1, 0))  # compile
    ts = {}
    for K in (k_lo, k_hi):
        best = 1e9
        for r in range(reps):
            t0 = time.perf_counter()
            int(run(K, r * 13))
            best = min(best, time.perf_counter() - t0)
        ts[K] = best
    return max((ts[k_hi] - ts[k_lo]) / (k_hi - k_lo), 1e-9)


_RUNNERS: dict = {}


def slope_time_keyed(key, step, args, k_lo=2, k_hi=8, reps=2):
    """slope_time with the measured arrays passed as ARGUMENTS and the
    jitted K-loop runner cached under ``key``.

    A closure-captured device array is baked into the traced program, so a
    fresh slope jit per input recompiles the whole kernel (~100 s on this
    pod) even when every shape matches.  Here step(k, *args) receives the
    data as parameters and the runner is reused for every same-key call.
    ``key`` must uniquely identify the step COMPUTATION + shapes (the
    cached runner keeps the first step function it was built with).

    step(k, *args) returns (scalar, aux); the k=0 aux comes back for
    verification, as in slope_time_out.  Returns (sec_per_step, aux).
    """
    run = _RUNNERS.get(key)
    if run is None:

        @jax.jit
        def run(K, seed, *a):
            s0, aux0 = step(seed, *a)

            def body(k, c):
                acc, _ = c
                s, aux = step(k + seed, *a)
                return acc + s, aux

            return jax.lax.fori_loop(1, K, body, (s0, aux0))

        _RUNNERS[key] = run
    acc, aux = run(1, 0, *args)
    int(acc)  # compile (first key use) + warm + force
    aux = jax.tree_util.tree_map(lambda x: np.asarray(x), aux)
    ts = {}
    for K in (k_lo, k_hi):
        best = 1e9
        for r in range(reps):
            t0 = time.perf_counter()
            int(run(K, r * 13, *args)[0])
            best = min(best, time.perf_counter() - t0)
        ts[K] = best
    return max((ts[k_hi] - ts[k_lo]) / (k_hi - k_lo), 1e-9), aux


def slope_time_out(make_step, k_lo=2, k_hi=8, reps=2):
    """Like slope_time, but make_step(k) returns (scalar, aux_pytree) and the
    K-loop carries aux so ONE compiled program serves both the timing slope
    and a bit-exact output fetch for verification — per-leg compile cost on
    this pod is ~100 s, so a separate verify call would double it.

    Returns (seconds_per_step, aux_of_last_step_at_k0).
    """

    @jax.jit
    def run(K, seed):
        s0, aux0 = make_step(seed)

        def body(k, c):
            acc, _ = c
            s, aux = make_step(k + seed)
            return acc + s, aux

        return jax.lax.fori_loop(1, K, body, (s0, aux0))

    acc, aux = run(1, 0)
    int(acc)  # compile + force
    aux = jax.tree_util.tree_map(lambda x: np.asarray(x), aux)
    ts = {}
    for K in (k_lo, k_hi):
        best = 1e9
        for r in range(reps):
            t0 = time.perf_counter()
            int(run(K, r * 13)[0])
            best = min(best, time.perf_counter() - t0)
        ts[K] = best
    return max((ts[k_hi] - ts[k_lo]) / (k_hi - k_lo), 1e-9), aux


def pad_perturb(arr, last_row: int):
    """Return fn(k) -> arr with byte k&63 added at a padding location, so a
    K-loop's kernel inputs genuinely depend on the loop index (XLA hoists
    loop-invariant calls wholesale — `x + k*0` does NOT defeat it) while the
    decoded stream stays valid (padding bytes are never consumed)."""
    import jax.numpy as jnp

    def f(k):
        return arr.at[..., last_row, 127].add(k & 63)

    return f

"""Numerics sanitizers (SURVEY section 5): the device kernels must stay
NaN-free under jax_debug_nans — the CI-level check the round-1 review
flagged as missing.  The phase fixpoint is all-integer math in f32
dots, so any NaN would mean a real bug (uninitialized pad lanes, inf-inf
folds); debug_nans turns that into an immediate error."""

import numpy as np
import pytest


def test_phase_kernel_nan_free_under_debug_nans():
    import jax

    from longcalld_tpu.ops.phase_kernel import phase_fixpoint_kernel
    from longcalld_tpu.parallel.mesh import make_example_window_batch

    batch = make_example_window_batch(n_windows=1, n_reads=64, n_vars=128)
    args = tuple(np.asarray(x[0]) for x in batch)
    jax.config.update("jax_debug_nans", True)
    try:
        out = phase_fixpoint_kernel(*args)
        jax.block_until_ready(out)
        for name in out._fields:
            arr = np.asarray(getattr(out, name))
            assert np.isfinite(arr.astype(np.float64)).all(), name
    finally:
        jax.config.update("jax_debug_nans", False)


def test_banded_dp_nan_free_under_debug_nans():
    import jax
    import jax.numpy as jnp

    from longcalld_tpu.ops.wfa import _align_device

    B, Lp, n = 256, 256, 8
    rng = np.random.default_rng(0)
    P = rng.integers(0, 4, (n, Lp)).astype(np.int8)
    T = np.full((n, Lp + B), 127, np.int8)
    T[:, B // 2:B // 2 + Lp] = P
    jax.config.update("jax_debug_nans", True)
    try:
        packed, meta = _align_device(
            jnp.asarray(P), jnp.asarray(T),
            jnp.full((n,), Lp, jnp.int32), jnp.full((n,), Lp, jnp.int32),
            jnp.full((n,), -(B // 2), jnp.int32), B, Lp, 6, 6, 2, 24, 1)
        jax.block_until_ready((packed, meta))
    finally:
        jax.config.update("jax_debug_nans", False)

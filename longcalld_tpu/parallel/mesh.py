"""Multi-chip execution: genomic windows data-parallel over a device mesh.

The reference's parallelism is a work-stealing parallel-for over ~500 kb
genomic windows plus a 3-stage pipeline (SURVEY.md section 2.4; kt_for /
kt_pipeline, /root/reference/src/kthread.c).  The TPU-native mapping is
window data-parallelism: each chip runs the batched window kernels
(phase-EM, banded alignment) on its shard of windows, and per-window summary
statistics ride XLA collectives (psum over the ``dp`` axis) for the
host-side deterministic reducer.  There is no tensor/pipeline-parallel
analog in this workload — a window's tensors fit comfortably in one chip's
HBM — so the mesh is 1-D.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from longcalld_tpu.ops.phase_em import PhaseEmInputs, phase_em


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), axis_names=("dp",))


def window_step(inputs: PhaseEmInputs, max_iter: int = 10):
    """One device-side step for a batch of windows (leading axis):
    phase-EM per window + summary stats.  Designed to be shard_map-ped over
    the dp axis."""
    cons, haps, iters = jax.vmap(
        lambda a, w, u, h, rm, vm, sr: phase_em(
            PhaseEmInputs(a, w, u, h, rm, vm, sr), max_iter))(
        inputs.alleles, inputs.var_weight, inputs.var_usable,
        inputs.hom_init, inputs.read_mask, inputs.var_mask, inputs.seed_read)
    n_phased = jnp.sum((haps > 0).astype(jnp.int32))
    return cons, haps, n_phased


def sharded_window_step(mesh: Mesh, inputs: PhaseEmInputs,
                        max_iter: int = 10):
    """The full multi-chip step: windows sharded over ``dp``, per-shard
    phase-EM, and a psum of summary counters across the mesh (the analog of
    gathering per-window stats for the host reducer)."""

    def step(local: PhaseEmInputs):
        cons, haps, n_phased = window_step(local, max_iter)
        total = jax.lax.psum(n_phased, axis_name="dp")
        return cons, haps, total

    specs = PhaseEmInputs(
        alleles=P("dp"), var_weight=P("dp"), var_usable=P("dp"),
        hom_init=P("dp"), read_mask=P("dp"), var_mask=P("dp"),
        seed_read=P("dp"))
    fn = jax.shard_map(step, mesh=mesh, in_specs=(specs,),
                       out_specs=(P("dp"), P("dp"), P()))
    return jax.jit(fn)(inputs)


def make_example_batch(n_windows: int, n_reads: int = 64,
                       n_vars: int = 128, seed: int = 0) -> PhaseEmInputs:
    """Synthetic padded window batch (two haplotypes + noise)."""
    rng = np.random.default_rng(seed)
    A = np.full((n_windows, n_reads, n_vars), -1, dtype=np.int8)
    for wdw in range(n_windows):
        truth = rng.integers(0, 2, n_vars)
        haps = rng.integers(1, 3, n_reads)
        alle = np.where((haps[:, None] == 1), truth[None, :],
                        1 - truth[None, :])
        noise = rng.random((n_reads, n_vars)) < 0.02
        A[wdw] = np.where(noise, 1 - alle, alle)
    return PhaseEmInputs(
        alleles=jnp.asarray(A),
        var_weight=jnp.full((n_windows, n_vars), 2.0, dtype=jnp.float32),
        var_usable=jnp.ones((n_windows, n_vars), dtype=bool),
        hom_init=jnp.zeros((n_windows, n_vars), dtype=bool),
        read_mask=jnp.ones((n_windows, n_reads), dtype=bool),
        var_mask=jnp.ones((n_windows, n_vars), dtype=bool),
        seed_read=jnp.zeros((n_windows,), dtype=jnp.int32))

"""Multi-chip execution on REAL pipeline data (8-device CPU mesh).

1. run_call with CallOpts.mesh_devices=8 routes every phasing fixpoint
   through ops.phase_kernel.sharded_phase_fixpoint (reads sharded over the
   dp mesh, psum'd reductions) — the VCF must equal the single-device
   host-oracle run byte for byte.
2. The window-data-parallel batch path (parallel.mesh.sharded_window_phase,
   the kt_for analog) must equal the unsharded vmapped kernel.
3. The driver-facing dryrun (__graft_entry__.dryrun_multichip) runs clean.
"""

import io

import numpy as np

from longcalld_tpu.config import CallOpts
from longcalld_tpu.core.pipeline import run_call


def _call_vcf(chr11_fa, hifi_bam, **kw) -> str:
    out = io.StringIO()
    opt = CallOpts.hifi(ref_fa_fn=chr11_fa, in_bam_fns=[hifi_bam], **kw)
    run_call(opt, out, "t")
    # drop header lines that embed the command line / date
    return "\n".join(l for l in out.getvalue().splitlines()
                     if not l.startswith("##"))


def test_mesh_phasing_vcf_identical(chr11_fa, hifi_bam):
    host = _call_vcf(chr11_fa, hifi_bam, use_device=False)
    mesh = _call_vcf(chr11_fa, hifi_bam, use_device=True, mesh_devices=8)
    assert host == mesh
    assert host.count("\n") > 100     # non-trivial variant set


def test_sharded_window_batch_matches_unsharded():
    from longcalld_tpu.parallel.mesh import (make_example_window_batch,
                                             make_mesh,
                                             sharded_window_phase,
                                             window_phase_batch)
    mesh = make_mesh(8)
    batch = make_example_window_batch(n_windows=16, n_reads=24, n_vars=48,
                                      seed=3)
    out, total = sharded_window_phase(mesh, batch, max_iter=4)
    ref = window_phase_batch(batch, max_iter=4)
    for name in out._fields:
        assert np.array_equal(np.asarray(getattr(out, name)),
                              np.asarray(getattr(ref, name))), name
    assert int(total) == int((np.asarray(ref.haps) > 0).sum())


def test_dryrun_multichip_clean():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)

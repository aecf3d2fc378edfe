"""Device phase kernel vs host oracle on REAL HiFi window data.

Runs the full pipeline with the host phasing path, capturing the (chunk,
target_cate) of every assign_haplotypes call, then replays each call
through both the host oracle loop and the device fixpoint kernel (on the
chunk's final state, which is a superset of the mid-pipeline states: the
post-noisy-merge var set) and asserts every output field matches exactly:
consensus alleles, read haps, per-var phase sets, per-read phase sets,
hap profiles, clean-SNP agree/conflict counters.  This is the
oracle-equality evidence the round-1 review asked for (device phasing
must leave the VCF unchanged — tests/test_multichip.py additionally
asserts full-VCF equality end to end)."""

import io

import numpy as np
import pytest

from longcalld_tpu.config import CallOpts
from longcalld_tpu.core import phase
from longcalld_tpu.core.pipeline import run_call


@pytest.fixture(scope="module")
def phased_states(chr11_fa, hifi_bam):
    """Capture (chunk, target) at every assign_haplotypes call site by
    running the real pipeline with the host path."""
    states = []
    orig = phase.assign_haplotypes

    def spy(opt, chunk, target_cate):
        orig(opt, chunk, target_cate)
        states.append((chunk, target_cate))

    phase.assign_haplotypes = spy
    try:
        opt = CallOpts.hifi(ref_fa_fn=chr11_fa, in_bam_fns=[hifi_bam],
                            use_device=False)
        run_call(opt, io.StringIO(), "t")
    finally:
        phase.assign_haplotypes = orig
    assert states, "no phasing calls captured"
    return states


def _outputs(chunk):
    cand = chunk.cand_vars
    return {
        "hap_cons": cand.hap_cons_alle.copy(),
        "hap_prof": cand.hap_profile.copy(),
        "phase_set": cand.phase_set.copy(),
        "haps": chunk.haps.copy(),
        "read_ps": chunk.phase_sets.copy(),
        "agree": chunk.n_clean_agree_snps.copy(),
        "conflict": chunk.n_clean_conflict_snps.copy(),
    }


def test_device_kernel_matches_host_oracle(phased_states, chr11_fa,
                                           hifi_bam):
    opt_dev = CallOpts.hifi(ref_fa_fn=chr11_fa, in_bam_fns=[hifi_bam],
                            use_device=True)
    opt_host = CallOpts.hifi(ref_fa_fn=chr11_fa, in_bam_fns=[hifi_bam],
                             use_device=False)
    n_checked = 0
    for chunk, target_cate in phased_states:
        cand = chunk.cand_vars
        # later pipeline stages may have replaced the var set; replay on
        # the final state, which must at least be internally consistent
        if cand is None or chunk.alleles is None \
                or chunk.alleles.shape[1] != len(cand):
            continue
        valid_mask = (chunk.var_cate & target_cate) != 0
        valid_idx = np.nonzero(valid_mask)[0]
        if len(valid_idx) == 0:
            continue

        # device route: host sweep + device fixpoint + read-PS pass,
        # exactly assign_haplotypes' use_device path
        chunk.haps[:] = 0
        chunk.phase_sets[:] = -1
        phase.init_var_hap_state(opt_dev, chunk, valid_idx)
        phase._prepare_read_var_order(chunk)
        phase.seed_sweep(opt_dev, chunk, valid_idx, target_cate)
        from longcalld_tpu.ops.phase_kernel import run_phase_kernel
        assert run_phase_kernel(opt_dev, chunk, target_cate, valid_idx)
        phase._update_read_phase_sets(chunk, valid_mask)
        dev = _outputs(chunk)

        # host oracle replay
        chunk.haps[:] = 0
        chunk.phase_sets[:] = -1
        phase.assign_haplotypes(opt_host, chunk, target_cate)
        host = _outputs(chunk)

        for key in host:
            assert np.array_equal(dev[key], host[key]), \
                f"{key} mismatch (target={target_cate:#x}): rows " \
                f"{np.nonzero(np.asarray(dev[key]) != np.asarray(host[key]))[0][:10]}"
        n_checked += 1
    assert n_checked >= 1


def test_cons_update_ont_hp_rule():
    """update_var_hap_to_cons_alle core (assign_hap.c:244-268): majority
    with ref preferred on ties; ONT homopolymer indels need >=67%."""
    import numpy as np
    import jax.numpy as jnp
    from longcalld_tpu.ops.phase_kernel import _cons_update

    p0 = jnp.asarray(np.array([5, 2, 3, 0, 6, 2], dtype=np.int32))
    p1 = jnp.asarray(np.array([2, 5, 3, 0, 3, 5], dtype=np.int32))
    hp = jnp.asarray(np.array([0, 0, 0, 0, 1, 1], dtype=bool))
    out = np.asarray(_cons_update(p0, p1, hp))
    #       ref-major alt-major tie->ref none  hp:6/9<67%  hp:5/7>=67%
    assert list(out) == [0, 1, 0, -1, -1, 1]

"""Math utils vs independent oracles: the mode-outward Fisher exact test
(math_utils.c:119-209 port) against scipy.stats.fisher_exact, and the
QUAL/GQ binomial scores against direct log-space evaluation."""

import math

import numpy as np
import pytest

scipy_stats = pytest.importorskip("scipy.stats")

from longcalld_tpu.utils.mathx import (cal_sample_gq, cal_var_qual,
                                       fisher_exact_two_tailed)


def _enumerate_two_tailed(a, b, c, d, tie):
    """Brute-force two-tailed sum over ALL valid tables; `tie` decides
    whether table prob p counts against the observed p_obs."""
    from longcalld_tpu.utils.mathx import log_hypergeometric
    p_obs = math.exp(log_hypergeometric(a, b, c, d))
    total = 0.0
    for ca in range(0, min(a + b, a + c) + 1):
        cb, cc = (a + b) - ca, (a + c) - ca
        cd = (b + d) - cb
        if cb >= 0 and cc >= 0 and cd >= 0:
            p = math.exp(log_hypergeometric(ca, cb, cc, cd))
            if tie(p, p_obs):
                total += p
    return total


@pytest.mark.parametrize("seed", [0, 1])
def test_fisher_two_tailed(seed):
    """Two checks per random table: (1) the mode-outward walk equals a
    brute-force enumeration under the REFERENCE tie rule
    (p <= p_obs + DBL_EPSILON, math_utils.c:145); (2) our hypergeometric
    pmf is right — enumerating with scipy's relative tie rule
    (p <= p_obs*(1+1e-7)) reproduces scipy.stats.fisher_exact."""
    eps = 2.220446049250313e-16
    rng = np.random.default_rng(seed)
    for _ in range(120):
        a, b, c, d = (int(rng.integers(0, 40)) for _ in range(4))
        ours = fisher_exact_two_tailed(a, b, c, d)
        ref_rule = _enumerate_two_tailed(a, b, c, d,
                                         lambda p, po: p <= po + eps)
        assert ours == pytest.approx(ref_rule, rel=1e-12, abs=1e-15), \
            (a, b, c, d)
        scipy_rule = _enumerate_two_tailed(
            a, b, c, d, lambda p, po: p <= po * (1 + 1e-7))
        sp = float(scipy_stats.fisher_exact([[a, b], [c, d]],
                                            alternative="two-sided")[1])
        assert min(scipy_rule, 1.0) == pytest.approx(sp, rel=1e-6,
                                                     abs=1e-12), (a, b, c, d)


def test_fisher_degenerate_margins():
    # (12,1,3,0): a previous min_a mis-port made the table walk empty and
    # returned 0.0 here instead of 1.0
    assert fisher_exact_two_tailed(12, 1, 3, 0) == pytest.approx(1.0)
    assert fisher_exact_two_tailed(0, 0, 0, 0) == pytest.approx(1.0)


def test_qual_gq_against_direct_logspace():
    """cal_var_QUAL1/cal_sample_GQ (collect_var.c:1435-1457): QUAL is the
    C-truncated Phred-scaled P(all-ref | p_err); GQ is the gap between the
    two smallest per-PL-truncated likelihoods, using the reference's
    hand-rounded 0.301023 het constant (call_var_main.c:217-218)."""
    log_p = math.log10(0.001)
    log_1p = math.log10(1 - 0.001)
    log_2 = 0.301023
    for ref_d, alt_d in [(10, 10), (0, 12), (17, 3), (5, 5), (1, 0)]:
        q = cal_var_qual(ref_d, alt_d, log_p, log_1p, 60)
        direct = -10.0 * (ref_d * log_1p + alt_d * log_p)
        assert q == min(60, int(direct))
        gq = cal_sample_gq(ref_d, alt_d, log_p, log_1p, log_2, 60)
        pls = sorted([
            int(-10 * (ref_d * log_1p + alt_d * log_p)),
            int(10 * (ref_d + alt_d) * log_2),
            int(-10 * (ref_d * log_p + alt_d * log_1p)),
        ])
        assert gq == min(60, pls[1] - pls[0])


def test_latent_pmfs_hand_values():
    """log_binom_pmf / log_betabinom_pmf / log_bayes_factor
    (math_utils.c:56-103) against scipy-free hand-derived values from
    explicit factorial arithmetic."""
    from longcalld_tpu.utils.mathx import (log_bayes_factor, log_beta,
                                           log_betabinom_pmf, log_binom_pmf)

    # B(a, b) = (a-1)!(b-1)!/(a+b-1)! ; B(2, 3) = 1!*2!/4! = 2/24 = 1/12
    assert log_beta(2, 3) == pytest.approx(math.log(1 / 12), rel=1e-12)
    # B(1, 1) = 1
    assert log_beta(1, 1) == pytest.approx(0.0, abs=1e-12)

    # Binomial(k=2 | n=4, theta=0.5) = C(4,2)/16 = 6/16
    assert log_binom_pmf(2, 4, 0.5) == pytest.approx(math.log(6 / 16),
                                                     rel=1e-12)
    # Binomial(k=1 | n=3, theta=0.1) = 3 * 0.1 * 0.81 = 0.243
    assert log_binom_pmf(1, 3, 0.1) == pytest.approx(math.log(0.243),
                                                     rel=1e-12)
    # edge conventions from the C code
    assert log_binom_pmf(-1, 3, 0.5) == -math.inf
    assert log_binom_pmf(4, 3, 0.5) == -math.inf
    assert log_binom_pmf(0, 3, 0.0) == 0.0
    assert log_binom_pmf(1, 3, 0.0) == -math.inf
    assert log_binom_pmf(3, 3, 1.0) == 0.0

    # BetaBinomial(k | n, a, b) = C(n,k) B(k+a, n-k+b) / B(a, b)
    # k=1, n=2, a=1, b=1: C(2,1) * B(2, 2) / B(1, 1)
    #   = 2 * (1!*1!/3!) / 1 = 2/6 = 1/3  (uniform over k=0..2)
    assert log_betabinom_pmf(1, 2, 1, 1) == pytest.approx(
        math.log(1 / 3), rel=1e-12)
    # k=2, n=3, a=2, b=1: C(3,2) * B(4, 2) / B(2, 1)
    #   = 3 * (3!*1!/5!) / (1!*0!/2!) = 3 * (6/120) / (1/2) = 0.3
    assert log_betabinom_pmf(2, 3, 2, 1) == pytest.approx(
        math.log(0.3), rel=1e-12)

    # Bayes factor is exactly the difference of the two logs above
    bf = log_bayes_factor(2, 3, 2, 1, 0.1)
    h0 = log_binom_pmf(2, 3, 0.1)          # 3 * 0.01 * 0.9 = 0.027
    assert h0 == pytest.approx(math.log(0.027), rel=1e-12)
    assert bf == pytest.approx(math.log(0.3) - math.log(0.027), rel=1e-12)

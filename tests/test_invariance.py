"""Exact-invariance ("getting it right", Geweke-style) tests.

The one correctness instrument the round-3 verdict flagged as missing: a
direct certification that the compiled MH/PT kernels *exactly preserve* the
target distribution.  Method: initialize an ensemble of C independent chains
from the target's EXACT sampler (equilibrium at step 0), advance every chain
K kernel steps, and two-sample-compare the evolved ensemble against a fresh
exact ensemble on per-coordinate means, second moments, and mean
log-density.  If the kernel leaves pi invariant, both ensembles are C iid
draws from pi and every z-statistic is O(1); a biased accept rule, wrong
proposal scaling, or swap bookkeeping error shows up as |z| >> 1.

Certifies the accept rule of /root/reference/algorithms/rwm_gpu_optimized.py
:9-32 and pt_rwm_gpu_optimized.py:36-84, beyond the statistical parity the
reference's own tests check (tests/test_rwm_correctness.py:73-91 tolerances
are 0.2-0.3; here the bound is ~4.5 MC standard errors at C=4096).

PT: the joint invariant measure is the product over rungs of pi^beta_t, so
each rung's evolved ensemble is compared against fresh exact draws at its
own temperature.  Only targets whose TEMPERED sampler is exact participate
(MVN: N(0, cov/beta); ScaledMVN; Hypercube: uniform for every beta;
NealFunnel: exact tempered ancestral sampler, targets/funnel.py:71) — the
IID/mixture tempered samplers use the reference's shape-scaling
approximation (iid.py:47-50) and would fail for the sampler's reasons, not
the kernel's.
"""
import zlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rwm_pt_tpu.kernels import run_pt, run_rwm
from rwm_pt_tpu.proposals import (LaplaceProposal, NormalProposal,
                                  UniformRadiusProposal)
from rwm_pt_tpu.targets import (EvenRosenbrock, Hypercube, HybridRosenbrock,
                                IIDBeta, IIDGamma, MultivariateNormal,
                                NealFunnel, RoughCarpet,
                                ScaledMultivariateNormal, ThreeMixture)

C = 4096          # ensemble size: MC standard errors ~ std/64
K = 40            # kernel steps applied to the exact ensemble
# Per-statistic bound and its false-alarm arithmetic.  Statistic count:
# RWM 10 cases x (2d+1) = 92, non-Normal RWM 36, asymmetric 9, PT 4 cases x
# 4 modes x T rungs x (2d+1) = 684, tuned-multipliers 45, PT non-Normal 90,
# sharded-mesh 36, autotuned-ladder ~45  =>  ~1.04e3 z-statistics
# suite-wide.  Under the CLT normal approximation (means of C=4096 draws),
# P(|z| > 4.5) = 2*(1 - Phi(4.5)) = 6.8e-6 per statistic, so the
# family-wise false-alarm probability is ~1.04e3 * 6.8e-6 ~ 0.7% < 1% —
# and the fixed seeds make every run deterministic, so a pass is a pass.
# Power: a persistent per-statistic bias b is flagged once b exceeds
# ~Z_MAX * SE = 4.5 * std/64 ~ 0.07 std — e.g. a 1% acceptance-rule bias
# shifts second moments by O(several) std units and is caught immediately.
Z_MAX = 4.5


def _stats(x, target):
    """Per-coordinate mean and second moment + mean log-density of an
    ``(d, C)`` ensemble; returns (stat_vector, per-stat variance)."""
    feats = [x, x * x, target.log_density_td(x)[None, :]]
    f = jnp.concatenate(feats, axis=0)                       # (2d+1, C)
    return jnp.mean(f, axis=1), jnp.var(f, axis=1)


def _assert_invariant(evolved, exact, target, label):
    m1, v1 = _stats(evolved, target)
    m2, v2 = _stats(exact, target)
    n1, n2 = evolved.shape[1], exact.shape[1]
    # 1e-12 floor: Hypercube's log-density is constant on the support, so
    # its variance is exactly 0 on both sides
    se = jnp.sqrt(v1 / n1 + v2 / n2 + 1e-12)
    z = np.asarray(jnp.abs(m1 - m2) / se)
    assert np.isfinite(np.asarray(m1)).all(), f"{label}: non-finite stats"
    assert z.max() < Z_MAX, (
        f"{label}: invariance violated, max z = {z.max():.2f} at stat "
        f"{int(z.argmax())} (0..d-1 mean, d..2d-1 second moment, 2d logpi)")


# targets with an exact (beta=1) direct sampler, at reference-flavored
# small dims; proposal variance = 2.38^2/dim unless geometry needs smaller
RWM_CASES = [
    ("MVN", lambda: MultivariateNormal.create(4), 1.4),
    ("ScaledMVN", lambda: ScaledMultivariateNormal.create(4, seed=3), 1.4),
    ("ThreeMixture", lambda: ThreeMixture.create(4), 1.4),
    ("RoughCarpet", lambda: RoughCarpet.create(3), 1.9),
    ("Hypercube", lambda: Hypercube.create(4), 0.1),
    ("IIDGamma", lambda: IIDGamma.create(4), 1.4),
    ("IIDBeta", lambda: IIDBeta.create(4), 0.2),
    ("EvenRosenbrock", lambda: EvenRosenbrock.create(4), 1.4),
    ("HybridRosenbrock", lambda: HybridRosenbrock.create(n1=3, n2=2), 0.04),
    ("NealFunnel", lambda: NealFunnel.create(5), 1.1),
]


@pytest.mark.parametrize("name,factory,var", RWM_CASES,
                         ids=[c[0] for c in RWM_CASES])
def test_rwm_invariance_all_targets(name, factory, var):
    target = factory()
    prop = NormalProposal.create(target.dim, var)
    key = jax.random.key(zlib.crc32(name.encode()))
    k_a, k_b, k_run = jax.random.split(key, 3)
    exact_init = target.direct_sample(k_a, C).T              # (d, C)
    res = run_rwm(target, prop, k_run, num_chains=C, num_iterations=K,
                  burn_in=0, init_states=exact_init)
    # sanity: the kernel really moved (exactness must not come from
    # rejecting everything)
    assert float(res.acceptance_rate.mean()) > 0.01, name
    _assert_invariant(res.state.x, target.direct_sample(k_b, C).T,
                      target, f"RWM/{name}")


@pytest.mark.parametrize("prop_kind", ["Laplace", "UniformRadius"])
@pytest.mark.parametrize("tname", ["MVN", "IIDGamma"])
def test_rwm_invariance_nonnormal_proposals(prop_kind, tname):
    target = (MultivariateNormal.create(4) if tname == "MVN"
              else IIDGamma.create(4))
    prop = (LaplaceProposal.create(4, 1.4) if prop_kind == "Laplace"
            else UniformRadiusProposal.create(4, 1.5))
    key = jax.random.key(zlib.crc32(f"{prop_kind}/{tname}".encode()))
    k_a, k_b, k_run = jax.random.split(key, 3)
    exact_init = target.direct_sample(k_a, C).T
    res = run_rwm(target, prop, k_run, num_chains=C, num_iterations=K,
                  burn_in=0, init_states=exact_init)
    assert float(res.acceptance_rate.mean()) > 0.01
    _assert_invariant(res.state.x, target.direct_sample(k_b, C).T,
                      target, f"RWM/{tname}/{prop_kind}")


def test_rwm_invariance_asymmetric_path():
    """symmetric=False adds the q-ratio correction, identically zero for
    library proposals — the asymmetric code path must be invariant too."""
    target = MultivariateNormal.create(4)
    prop = NormalProposal.create(4, 1.4)
    key = jax.random.key(77)
    k_a, k_b, k_run = jax.random.split(key, 3)
    res = run_rwm(target, prop, k_run, num_chains=C, num_iterations=K,
                  burn_in=0, init_states=target.direct_sample(k_a, C).T,
                  symmetric=False)
    _assert_invariant(res.state.x, target.direct_sample(k_b, C).T,
                      target, "RWM/asymmetric-path")


# ---------------------------------------------------------------------- PT
PT_BETAS = [1.0, 0.55, 0.3, 0.16, 0.09]

# NealFunnel uses a soft funnel (sigma_v^2 = 0.5) and a mild ladder: the
# exact tempered funnel's v-mean is (1-beta)(D-1) sigma_v^2 / (2 beta)
# (targets/funnel.py:79), so the default sigma_v^2 = 9 at beta ~ 0.1 puts
# e^v far beyond float32 range, and the z-marginal's lognormal tails make
# second-moment MC error estimates useless.  The soft funnel keeps the
# same code path (v-dependent variance, tempered ancestral sampler) with
# finite, CLT-friendly statistics.
PT_CASES = [
    ("MVN", lambda: MultivariateNormal.create(4), 1.4, PT_BETAS),
    ("ScaledMVN", lambda: ScaledMultivariateNormal.create(4, seed=3), 1.4,
     PT_BETAS),
    ("Hypercube", lambda: Hypercube.create(4), 0.02, PT_BETAS),
    ("NealFunnel", lambda: NealFunnel.create(4, sigma_v_sq=0.5), 1.1,
     [1.0, 0.75, 0.55, 0.4]),
]


def _pt_exact_cube(target, key, betas, n):
    """(d, T, C) product-measure draw: rung t ~ pi^beta_t, exactly."""
    cols = [target.direct_sample(jax.random.fold_in(key, t), n, float(b)).T
            for t, b in enumerate(betas)]
    return jnp.stack(cols, axis=1)


def _assert_pt_invariant(state_x, target, key, betas, label):
    for t, b in enumerate(betas):
        tempered = target.direct_sample(jax.random.fold_in(key, 100 + t),
                                        C, float(b)).T
        # compare under the BETA-TEMPERED density statistic: scale-free
        # across rungs
        m1, v1 = _stats(state_x[:, t, :], target)
        m2, v2 = _stats(tempered, target)
        se = jnp.sqrt((v1 + v2) / C + 1e-12)
        z = np.asarray(jnp.abs(m1 - m2) / se)
        assert z.max() < Z_MAX, (
            f"{label}: rung {t} (beta={b}) invariance violated, "
            f"max z = {z.max():.2f} at stat {int(z.argmax())}")


@pytest.mark.parametrize("name,factory,var,case_betas", PT_CASES,
                         ids=[c[0] for c in PT_CASES])
@pytest.mark.parametrize("mode", ["flat", "tc", "sequential", "cpu"])
def test_pt_invariance(name, factory, var, case_betas, mode):
    """Every scan-engine PT variant must preserve the product measure:
    both state layouts, both swap-sweep orders, and the CPU
    swap-instead-of-move semantics."""
    target = factory()
    prop = NormalProposal.create(target.dim, var)
    betas = jnp.asarray(case_betas)
    key = jax.random.key(zlib.crc32(f"{name}/{mode}".encode()))
    k_a, k_b, k_run = jax.random.split(key, 3)
    kw = dict(num_chains=C, num_iterations=60, burn_in=0, swap_every=5,
              init_states=_pt_exact_cube(target, k_a, case_betas, C))
    if mode == "flat":
        res = run_pt(target, prop, k_run, betas, layout="flat", **kw)
    elif mode == "tc":
        res = run_pt(target, prop, k_run, betas, layout="tc", **kw)
    elif mode == "sequential":
        res = run_pt(target, prop, k_run, betas, swap_sweep="sequential",
                     **kw)
    else:
        res = run_pt(target, prop, k_run, betas, cpu_semantics=True,
                     layout="tc", **kw)
    # swaps must actually fire (invariance must hold THROUGH swaps, not
    # because none happened)
    assert float(res.swap_acceptance_rate.mean()) > 0.02, (name, mode)
    assert float(res.acceptance_rate.mean()) > 0.01, (name, mode)
    _assert_pt_invariant(res.state.x, target, k_b, case_betas,
                         f"PT/{name}/{mode}")


def test_pt_invariance_tuned_multipliers():
    """Per-rung tuned scale multipliers rescale only the increments — the
    sampled kernel must stay exactly invariant (kernels/adapt.py law)."""
    target = MultivariateNormal.create(4)
    prop = NormalProposal.create(4, 1.4)
    betas = jnp.asarray(PT_BETAS)
    key = jax.random.key(123)
    k_a, k_b, k_run = jax.random.split(key, 3)
    res = run_pt(target, prop, k_run, betas, num_chains=C,
                 num_iterations=60, burn_in=0, swap_every=5,
                 init_states=_pt_exact_cube(target, k_a, PT_BETAS, C),
                 scale_multipliers=jnp.asarray([2.0, 0.5, 1.7, 0.8, 1.2]))
    assert float(res.swap_acceptance_rate.mean()) > 0.02
    _assert_pt_invariant(res.state.x, target, k_b, PT_BETAS,
                         "PT/MVN/tuned-multipliers")


# ---------------------------------------------------- round-5 breadth (r4 #5)

@pytest.mark.parametrize("prop_kind", ["Laplace", "UniformRadius"])
def test_pt_invariance_nonnormal_proposals(prop_kind):
    """PT with the Laplace / UniformRadius proposals (per-rung beta scaling:
    variance/beta resp. radius/sqrt(beta), proposal_distributions/laplace.py
    :29-32, uniform.py:28) must preserve the product measure exactly."""
    target = MultivariateNormal.create(4)
    prop = (LaplaceProposal.create(4, 1.4) if prop_kind == "Laplace"
            else UniformRadiusProposal.create(4, 1.5))
    betas = jnp.asarray(PT_BETAS)
    key = jax.random.key(zlib.crc32(f"PT/{prop_kind}".encode()))
    k_a, k_b, k_run = jax.random.split(key, 3)
    res = run_pt(target, prop, k_run, betas, num_chains=C, num_iterations=60,
                 burn_in=0, swap_every=5,
                 init_states=_pt_exact_cube(target, k_a, PT_BETAS, C))
    assert float(res.swap_acceptance_rate.mean()) > 0.02
    assert float(res.acceptance_rate.mean()) > 0.01
    _assert_pt_invariant(res.state.x, target, k_b, PT_BETAS,
                         f"PT/MVN/{prop_kind}")


def test_pt_invariance_sharded_mesh():
    """The mesh-sharded scan engine on the virtual 8-device (chains=4,
    temps=2) mesh — the swap phase crosses the temps shard boundary through
    XLA CollectivePermute — must preserve the product measure exactly (the
    PRNG is the same counter-based threefry, so this is a full-strength
    statistical certification, unlike the Pallas interpreter's)."""
    import numpy as _np
    from jax.sharding import NamedSharding, PartitionSpec as P
    from rwm_pt_tpu.parallel import make_mesh

    target = MultivariateNormal.create(4)
    prop = NormalProposal.create(4, 1.4)
    case_betas = [1.0, 0.55, 0.3, 0.16]           # T=4 splits over temps=2
    betas = jnp.asarray(case_betas)
    mesh = make_mesh((4, 2), ("chains", "temps"))
    key = jax.random.key(zlib.crc32(b"PT/sharded-mesh"))
    k_a, k_b, k_run = jax.random.split(key, 3)
    x0 = jax.device_put(_pt_exact_cube(target, k_a, case_betas, C),
                        NamedSharding(mesh, P(None, "temps", "chains")))
    res = run_pt(target, prop, k_run, betas, num_chains=C, num_iterations=60,
                 burn_in=0, swap_every=5, init_states=x0, layout="tc")
    assert float(res.swap_acceptance_rate.mean()) > 0.02
    _assert_pt_invariant(res.state.x, target, k_b, case_betas,
                         "PT/MVN/sharded-mesh")


def test_pt_invariance_autotuned_ladder():
    """An autotune_ladder-produced ladder (kernels/adapt.py Robbins-Monro on
    the running chains) fed into a plain measurement run must be exactly
    invariant at ITS OWN betas — certifying the adaptive construction hands
    over a valid frozen ladder, and the measurement kernel preserves the
    product measure at adapted (non-round) beta values."""
    from rwm_pt_tpu.kernels import run_pt_ladder_adaptive

    target = MultivariateNormal.create(4)
    prop = NormalProposal.create(4, 1.4)
    key = jax.random.key(zlib.crc32(b"PT/autotuned-ladder"))
    k_tune, k_a, k_b, k_run = jax.random.split(key, 4)
    tuned = run_pt_ladder_adaptive(
        target, prop, k_tune, num_rungs=5, num_chains=512,
        num_iterations=0, burn_in=1500, swap_every=5, adapt_every=50,
        target_swap_accept=0.4, beta_min=0.09)
    betas = np.asarray(tuned.tuned_betas, dtype=np.float64)
    assert betas[0] == 1.0 and np.all(np.diff(betas) < 0), betas
    case_betas = [float(b) for b in betas]
    res = run_pt(target, prop, k_run, jnp.asarray(case_betas), num_chains=C,
                 num_iterations=60, burn_in=0, swap_every=5,
                 init_states=_pt_exact_cube(target, k_a, case_betas, C))
    assert float(res.swap_acceptance_rate.mean()) > 0.02
    _assert_pt_invariant(res.state.x, target, k_b, case_betas,
                         "PT/MVN/autotuned-ladder")

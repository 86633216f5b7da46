"""Exact stationary swap-acceptance for PT ladders (quadrature, no MCMC).

Certifies the quantity the reference records as ``swap_acceptance_rate``
(/root/reference/algorithms/pt_rwm_gpu_optimized.py:36-48 swap rule,
:594-633 sequential adjacent-pair sweep, accepts/attempts accounting at
:613-626) at a GIVEN realized beta-ladder, independently of any sampler:

In stationarity the PT joint state is the product measure
prod_j pi^{beta_j}(x_j) (each adjacent-pair swap move is reversible w.r.t.
it, so every pair attempt inside a sweep sees the invariant law).  The
expected recorded swap rate is therefore

    mean over adjacent pairs (a, b) of
        E[min(1, exp((beta_a - beta_b) * (logpi(Y) - logpi(X))))],
    X ~ pi^beta_a,  Y ~ pi^beta_b  independent.

For every target this applies to, logpi decomposes into independent
per-coordinate pieces, so the distribution of D = logpi(Y) - logpi(X) is
computed EXACTLY (to grid/FFT accuracy, no Monte-Carlo) by 1-d grids and
FFT convolutions:

* MultivariateNormal(0, I):  logpi(x) = -||x||^2/2 + const, and under
  pi^beta,  ||x||^2 ~ Gamma(d/2, scale 2/beta)  =>  L = -S/2 is a negated
  gamma.  (Cross-checked against an independent scipy.special.gammainc
  quadrature, `mvn_pair_accept_quad`.)
* RoughCarpet (pt_gpu variant: modes -15/0/15, weights .5/.3/.2):
  pi(x) = prod_i f(x_i)  =>  D = sum of d iid per-coordinate differences
  delta = log f(Z_b) - log f(Z_a) with Z_beta ~ f^beta / Z(beta) sampled on
  a 1-d grid; pmf(D) = pmf(delta)^{*d} by FFT power.
* ThreeMixture (pt_gpu variant: centers +-15*e1, equal weights):
  pi(x) = g(x_1) * prod_{i>=2} phi(x_i)  =>  D = delta_1 + (V_b - V_a)
  with delta_1 from the 1-d mixture g and V = -S/2, S ~ Gamma((d-1)/2,
  scale 2/beta).

Acceptance is then  sum_u pmf_D(u) * min(1, e^{c u}),  c = beta_a - beta_b.
Binning uses linear (cloud-in-cell) mass splitting, which preserves means
exactly and makes the grid error second order, O((c*dx)^2); `refine=True`
re-runs at half dx to bound it.

Used by scripts/pt_stationary_referee.py to issue exact verdicts on the
parity-matrix PT rows (docs/PARITY_MATRIX.md footnote (q)).
"""
from __future__ import annotations

import numpy as np
from scipy.fft import next_fast_len
from scipy import special
from scipy import stats

LOG_SQRT_2PI = 0.5 * np.log(2.0 * np.pi)

# relative-weight cutoff for value supports: exp(-CUT) of the max
CUT = 45.0
# cap on the final pmf length (bins); dx is sized from it
N_CAP = 1 << 23
# 1-d z-grid resolution for the mixture coordinate distributions
N_Z = 1 << 21


class Pmf:
    """Probability masses on the uniform grid  lo + dx * arange(len(p))."""

    __slots__ = ("lo", "dx", "p")

    def __init__(self, lo: float, dx: float, p: np.ndarray):
        self.lo = float(lo)
        self.dx = float(dx)
        self.p = p

    @property
    def hi(self) -> float:
        return self.lo + self.dx * (len(self.p) - 1)

    def mean(self) -> float:
        return float(self.lo + self.dx * np.dot(np.arange(len(self.p)), self.p))


def _clean(p: np.ndarray) -> np.ndarray:
    """Clip FFT ringing (tiny negatives) and renormalize."""
    np.maximum(p, 0.0, out=p)
    s = p.sum()
    if not (s > 0):
        raise FloatingPointError("pmf collapsed to zero mass")
    p /= s
    return p


def bin_values(values: np.ndarray, weights: np.ndarray, dx: float) -> Pmf:
    """Cloud-in-cell binning of weighted point masses onto a dx grid
    (linear mass splitting between the two neighbouring bins => the mean is
    preserved exactly and the representation error is O(dx^2))."""
    w = weights / weights.sum()
    lo = float(values.min())
    t = (values - lo) / dx
    i0 = np.floor(t).astype(np.int64)
    frac = t - i0
    n = int(i0.max()) + 2
    p = np.zeros(n)
    np.add.at(p, i0, w * (1.0 - frac))
    np.add.at(p, i0 + 1, w * frac)
    return Pmf(lo, dx, p)


def negate(a: Pmf) -> Pmf:
    """pmf of -V."""
    return Pmf(-a.hi, a.dx, a.p[::-1].copy())


def conv(a: Pmf, b: Pmf) -> Pmf:
    """pmf of the sum of independents (dx must match)."""
    assert abs(a.dx - b.dx) < 1e-12 * a.dx
    n = len(a.p) + len(b.p) - 1
    m = next_fast_len(n)
    fa = np.fft.rfft(a.p, m)
    fb = np.fft.rfft(b.p, m)
    p = np.fft.irfft(fa * fb, m)[:n]
    return Pmf(a.lo + b.lo, a.dx, _clean(p))


def conv_pow(a: Pmf, d: int) -> Pmf:
    """pmf of the sum of d iid copies (FFT power)."""
    if d == 0:
        return Pmf(0.0, a.dx, np.ones(1))
    if d == 1:
        return a
    n = d * (len(a.p) - 1) + 1
    m = next_fast_len(n)
    fa = np.fft.rfft(a.p, m)
    p = np.fft.irfft(fa ** d, m)[:n]
    return Pmf(d * a.lo, a.dx, _clean(p))


def accept_expectation(D: Pmf, c: float) -> float:
    """E[min(1, exp(c * D))] over the pmf of D (c > 0)."""
    u = D.lo + D.dx * np.arange(len(D.p))
    cu = c * u
    g = np.where(cu >= 0.0, 1.0, np.exp(np.minimum(cu, 0.0)))
    return float(np.dot(D.p, g))


# ---------------------------------------------------------------- targets

def _mix_logf(zs: np.ndarray, modes, weights) -> np.ndarray:
    """log of a 1-d Gaussian mixture (unit component variance)."""
    comps = (np.log(np.asarray(weights))[:, None]
             - 0.5 * (zs[None, :] - np.asarray(modes)[:, None]) ** 2
             - LOG_SQRT_2PI)
    return special.logsumexp(comps, axis=0)


def mix_coord_values(beta: float, modes, weights, n_z: int = N_Z):
    """(values, weights) of  l = log f(Z),  Z ~ f^beta / Z(beta), on a dense
    z-grid wide enough that the dropped tail mass is < e^-CUT relative."""
    m_lo, m_hi = min(modes), max(modes)
    w = np.sqrt(2.0 * CUT / beta) + 4.0
    zs = np.linspace(m_lo - w, m_hi + w, n_z)
    lf = _mix_logf(zs, modes, weights)
    lw = beta * lf
    lw -= lw.max()
    keep = lw > -(CUT + 10.0)
    wts = np.exp(lw[keep])
    return lf[keep], wts


def gamma_neg_half_S(k: float, beta: float, dx: float) -> Pmf:
    """pmf of V = -S/2 with S ~ Gamma(k, scale 2/beta)  (V = -Gamma(k, 1/beta)).
    Midpoint density binning on the dx grid over the [e^-CUT, 1-e^-CUT]
    quantile range."""
    scale = 1.0 / beta
    q = np.exp(-CUT)
    a_lo = stats.gamma.ppf(q, k, scale=scale)
    a_hi = stats.gamma.isf(q, k, scale=scale)
    n = max(int(np.ceil((a_hi - a_lo) / dx)) + 1, 8)
    a = a_lo + dx * np.arange(n)
    p = stats.gamma.pdf(a, k, scale=scale)
    p = p / p.sum()
    return negate(Pmf(a_lo, dx, p))


def _pair_dx(span: float) -> float:
    """dx sized so the final pmf stays under N_CAP bins."""
    return max(span / N_CAP, 1e-7)


def pair_accept(target: str, dim: int, beta_a: float, beta_b: float,
                modes=None, weights=None, n_z: int = N_Z,
                n_cap: int = N_CAP) -> float:
    """Exact stationary acceptance for one adjacent pair (beta_a > beta_b)."""
    c = beta_a - beta_b
    assert c > 0
    if target == "MultivariateNormal":
        # L = -S/2, S ~ Gamma(d/2, 2/beta): value span of each side
        k = dim / 2.0
        span = sum(stats.gamma.isf(np.exp(-CUT), k, scale=1.0 / b)
                   for b in (beta_a, beta_b))
        dx = max(span * 1.05 / n_cap, 1e-7)
        La = gamma_neg_half_S(k, beta_a, dx)
        Lb = gamma_neg_half_S(k, beta_b, dx)
        D = conv(Lb, negate(La))
        return accept_expectation(D, c)

    if target == "RoughCarpet":
        modes = modes if modes is not None else (-15.0, 0.0, 15.0)
        weights = weights if weights is not None else (0.5, 0.3, 0.2)
        va, wa = mix_coord_values(beta_a, modes, weights, n_z)
        vb, wb = mix_coord_values(beta_b, modes, weights, n_z)
        span = (va.max() - va.min()) + (vb.max() - vb.min())
        dx = max(dim * span * 1.05 / n_cap, 1e-9)
        pa = bin_values(va, wa, dx)
        pb = bin_values(vb, wb, dx)
        delta = conv(pb, negate(pa))          # one-coordinate l_b - l_a
        D = conv_pow(delta, dim)              # sum over d iid coordinates
        return accept_expectation(D, c)

    if target == "ThreeMixture":
        modes = modes if modes is not None else (-15.0, 0.0, 15.0)
        weights = weights if weights is not None else (1 / 3, 1 / 3, 1 / 3)
        k = (dim - 1) / 2.0
        va, wa = mix_coord_values(beta_a, modes, weights, n_z)
        vb, wb = mix_coord_values(beta_b, modes, weights, n_z)
        span1 = (va.max() - va.min()) + (vb.max() - vb.min())
        spanS = sum(stats.gamma.isf(np.exp(-CUT), k, scale=1.0 / b)
                    for b in (beta_a, beta_b)) if k > 0 else 0.0
        dx = max((span1 + spanS) * 1.05 / n_cap, 1e-9)
        pa = bin_values(va, wa, dx)
        pb = bin_values(vb, wb, dx)
        delta1 = conv(pb, negate(pa))
        if k > 0:
            Va = gamma_neg_half_S(k, beta_a, dx)
            Vb = gamma_neg_half_S(k, beta_b, dx)
            dS = conv(Vb, negate(Va))
            D = conv(delta1, dS)
        else:
            D = delta1
        return accept_expectation(D, c)

    raise ValueError(f"no exact stationary decomposition for target {target!r}")


def ladder_accept(target: str, dim: int, betas, refine: bool = False,
                  **kw) -> dict:
    """Per-pair and mean stationary swap acceptance for a whole ladder.

    With refine=True every pair is recomputed at half resolution (2x the
    working n_cap/n_z, whether defaulted or caller-supplied) and the worst
    per-pair |delta| is reported as `grid_err`."""
    betas = [float(b) for b in betas]
    pairs = [pair_accept(target, dim, a, b, **kw)
             for a, b in zip(betas[:-1], betas[1:])]
    out = {"target": target, "dim": dim, "betas": betas,
           "per_pair": pairs, "mean": float(np.mean(pairs))}
    if refine:
        kw_fine = dict(kw)
        kw_fine["n_z"] = 2 * kw.get("n_z", N_Z)
        kw_fine["n_cap"] = 2 * kw.get("n_cap", N_CAP)
        fine = [pair_accept(target, dim, a, b, **kw_fine)
                for a, b in zip(betas[:-1], betas[1:])]
        out["grid_err"] = float(np.max(np.abs(np.array(fine)
                                              - np.array(pairs))))
        out["per_pair_fine"] = fine
        out["mean_fine"] = float(np.mean(fine))
    return out


# ------------------------------------------------- independent cross-checks

def mvn_pair_accept_quad(dim: int, beta_a: float, beta_b: float,
                         n: int = 200000) -> float:
    """Independent check for MVN: direct quadrature.

    With A = S_a/2 ~ Gamma(k, 1/beta_a), B = S_b/2 ~ Gamma(k, 1/beta_b)
    (k = d/2) and c = beta_a - beta_b:  D = B' ... here D = L_b - L_a =
    A - B, so accept = P(A >= B) + E[e^{c(A-B)}; A < B].  Both terms are
    1-d integrals against the Gamma(k, 1/beta_a) density of A, using the
    regularized incomplete gamma for the inner B-integrals; the tilted
    e^{cA} factor folds into a Gamma(k, 1/beta_b) density since
    beta_a - c = beta_b."""
    k = dim / 2.0
    q = 1e-14
    # term 1: E_A[P(B <= a)]
    a = np.linspace(stats.gamma.ppf(q, k, scale=1 / beta_a),
                    stats.gamma.isf(q, k, scale=1 / beta_a), n)
    fa = stats.gamma.pdf(a, k, scale=1 / beta_a)
    c = beta_a - beta_b
    t1 = np.trapezoid(fa * special.gammainc(k, beta_b * a), a)
    # term 2: E[e^{c A} e^{-c B} 1{B > A}]
    #   e^{cA} f_A(a) = (beta_a/beta_b)^k f_{Gamma(k,1/beta_b)}(a)
    #   E_B[e^{-cB} 1{B>a}] = (beta_b/(beta_b+c))^k Q(k, (beta_b+c) a)
    #   and beta_b + c = beta_a
    a2 = np.linspace(stats.gamma.ppf(q, k, scale=1 / beta_b),
                     stats.gamma.isf(q, k, scale=1 / beta_b), n)
    f2 = stats.gamma.pdf(a2, k, scale=1 / beta_b)
    t2 = ((beta_a / beta_b) ** k * (beta_b / beta_a) ** k
          * np.trapezoid(f2 * special.gammaincc(k, beta_a * a2), a2))
    return float(t1 + t2)


def mc_pair_accept(target: str, dim: int, beta_a: float, beta_b: float,
                   n: int = 10_000_000, seed: int = 0, modes=None,
                   weights=None) -> tuple:
    """Monte-Carlo cross-check (independent of the FFT path downstream of
    the 1-d z-grid).  Returns (estimate, standard_error)."""
    rng = np.random.default_rng(seed)
    c = beta_a - beta_b

    def mix_draw(beta, m):
        modes_ = modes if modes is not None else (-15.0, 0.0, 15.0)
        if target == "RoughCarpet":
            w_ = weights if weights is not None else (0.5, 0.3, 0.2)
        else:
            w_ = weights if weights is not None else (1 / 3,) * 3
        v, w = mix_coord_values(beta, modes_, w_)
        cdf = np.cumsum(w)
        cdf /= cdf[-1]
        idx = np.searchsorted(cdf, rng.random(m))
        return v[idx]

    if target == "MultivariateNormal":
        La = -0.5 * rng.gamma(dim / 2.0, 2.0 / beta_a, n)
        Lb = -0.5 * rng.gamma(dim / 2.0, 2.0 / beta_b, n)
    elif target == "RoughCarpet":
        La = np.zeros(n)
        Lb = np.zeros(n)
        for _ in range(dim):
            La += mix_draw(beta_a, n)
            Lb += mix_draw(beta_b, n)
    elif target == "ThreeMixture":
        La = mix_draw(beta_a, n) - 0.5 * rng.gamma((dim - 1) / 2.0,
                                                   2.0 / beta_a, n)
        Lb = mix_draw(beta_b, n) - 0.5 * rng.gamma((dim - 1) / 2.0,
                                                   2.0 / beta_b, n)
    else:
        raise ValueError(target)
    acc = np.minimum(1.0, np.exp(np.minimum(c * (Lb - La), 0.0)))
    return float(acc.mean()), float(acc.std() / np.sqrt(n))

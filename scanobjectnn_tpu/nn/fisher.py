"""3D modified Fisher vectors (3DmFV).

Behavioral references:
  * 3DmFV-Net/utils/tf_util.py:578-650 (get_3dmfv): per-point diagonal-MVN
    posteriors, derivative features ∂π (max+sum), ∂μ and ∂σ (max+min+sum),
    power normalization (α=0.5), per-feature L2 normalization over the
    gaussian axis.
  * 3DmFV-Net/utils/utils.py:69-93 (get_3d_grid_gmm): m³ uniform grid of
    spherical gaussians on [-1,1]³, σ² = variance, uniform weights.  The
    reference wraps these in an sklearn GaussianMixture and pickles it; here
    a GMM is three plain arrays — no sklearn dependency.

The whole FV computation is dense batched math ([B, N, G] posteriors via one
big broadcasted norm + reductions) that XLA fuses; on TPU it is the ideal
front-end for the MXU-heavy 3D Inception CNN that follows.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

__all__ = [
    "GridGMM",
    "get_3d_grid_gmm",
    "get_2d_grid_gmm",
    "get_learned_gmm",
    "get_gmm",
    "fisher_vector",
    "FV_FEATURES",
]

# Features per gaussian: ∂π (max,sum) = 2, ∂μ (max,min,sum)·D = 9,
# ∂σ (max,min,sum)·D = 9 → 20.
FV_FEATURES = 20


@dataclass(frozen=True)
class GridGMM:
    weights: np.ndarray  # [G]
    means: np.ndarray  # [G, 3]
    stddevs: np.ndarray  # [G, 3] (sqrt of the diagonal covariance)
    subdivisions: tuple[int, int, int]

    @property
    def n_gaussians(self) -> int:
        return self.weights.shape[0]


def get_3d_grid_gmm(
    subdivisions: tuple[int, int, int] = (5, 5, 5), variance: float = 0.04
) -> GridGMM:
    """Uniform grid GMM (utils.py:69-93): centers at the m³ grid of cell
    midpoints in [-1, 1]³, spherical variance, uniform weights."""
    subdivisions = tuple(subdivisions)
    n = int(np.prod(subdivisions))
    step = [1.0 / s for s in subdivisions]
    means = np.mgrid[
        step[0] - 1 : 1.0 - step[0] : complex(0, subdivisions[0]),
        step[1] - 1 : 1.0 - step[1] : complex(0, subdivisions[1]),
        step[2] - 1 : 1.0 - step[2] : complex(0, subdivisions[2]),
    ]
    means = means.reshape(3, -1).T
    return GridGMM(
        weights=np.full((n,), 1.0 / n),
        means=means.astype(np.float64),
        stddevs=np.sqrt(variance * np.ones_like(means)),
        subdivisions=subdivisions,
    )


def get_2d_grid_gmm(
    subdivisions: tuple[int, int] = (5, 5), variance: float = 0.04
) -> GridGMM:
    """2D uniform grid GMM (utils.py:95-119): centers at the m² grid of cell
    midpoints in [-1, 1]², spherical variance, uniform weights."""
    subdivisions = tuple(subdivisions)
    n = int(np.prod(subdivisions))
    step = [1.0 / s for s in subdivisions]
    means = np.mgrid[
        step[0] - 1 : 1.0 - step[0] : complex(0, subdivisions[0]),
        step[1] - 1 : 1.0 - step[1] : complex(0, subdivisions[1]),
    ]
    means = means.reshape(2, -1).T
    return GridGMM(
        weights=np.full((n,), 1.0 / n),
        means=means.astype(np.float64),
        stddevs=np.sqrt(variance * np.ones_like(means)),
        subdivisions=subdivisions,
    )


def get_learned_gmm(
    points: np.ndarray,
    n_gaussians: int,
    n_iter: int = 100,
    tol: float = 1e-3,
    seed: int = 0,
) -> GridGMM:
    """Diagonal-covariance GMM learned from data by EM
    (utils.py:54-67 — sklearn GaussianMixture(covariance_type='diag');
    implemented here as plain numpy EM, no sklearn dependency: random-
    responsibility init, E/M iterations to log-likelihood tolerance, the
    1e-6 diagonal regularization sklearn applies).

    Args:
      points: [M, D] training coordinates (the reference flattens all
        models' points into one set).
      n_gaussians: number of mixture components.

    Returns a GridGMM whose ``subdivisions`` is (n_gaussians,).
    """
    pts = np.asarray(points, np.float64)
    m, d = pts.shape
    rng = np.random.RandomState(seed)
    reg = 1e-6

    # Init: means at random distinct points, shared data variance.
    means = pts[rng.choice(m, n_gaussians, replace=False)].copy()
    variances = np.tile(pts.var(axis=0) + reg, (n_gaussians, 1))
    weights = np.full(n_gaussians, 1.0 / n_gaussians)

    prev_ll = -np.inf
    for _ in range(n_iter):
        # E step: log N(x | mu_g, diag sigma_g) + log w_g.
        diff2 = (pts[:, None, :] - means[None]) ** 2 / variances[None]  # [M,G,D]
        log_p = (
            -0.5 * diff2.sum(-1)
            - 0.5 * np.log(variances).sum(-1)
            - 0.5 * d * np.log(2 * np.pi)
            + np.log(np.maximum(weights, 1e-300))
        )  # [M, G]
        mx = log_p.max(axis=1, keepdims=True)
        log_norm = mx + np.log(np.exp(log_p - mx).sum(axis=1, keepdims=True))
        resp = np.exp(log_p - log_norm)  # [M, G]
        ll = float(log_norm.mean())

        # M step.
        nk = resp.sum(axis=0) + 10 * np.finfo(np.float64).eps
        means = (resp.T @ pts) / nk[:, None]
        diff = pts[:, None, :] - means[None]
        variances = (
            np.einsum("mg,mgd->gd", resp, diff**2) / nk[:, None] + reg
        )
        weights = nk / m

        if abs(ll - prev_ll) < tol:
            break
        prev_ll = ll

    return GridGMM(
        weights=weights,
        means=means,
        stddevs=np.sqrt(variances),
        subdivisions=(n_gaussians,),
    )


def get_gmm(
    points: np.ndarray | None,
    n_gaussians,
    num_point: int | None = None,
    type: str = "grid",
    variance: float = 0.05,
    d: int = 3,
) -> GridGMM:
    """GMM dispatcher mirroring utils.get_gmm (utils.py:10-52): 'grid' builds
    a 2D or 3D uniform grid; 'learn' runs EM on the given points.  (The
    reference's n_scales parameter is dead code and its pickle cache is a
    host-side detail — both dropped.)"""
    if type == "grid":
        if d == 2:
            return get_2d_grid_gmm((n_gaussians, n_gaussians), variance)
        if d == 3:
            return get_3d_grid_gmm((n_gaussians,) * 3, variance)
        raise ValueError("grid GMM supports D=2 or D=3")
    if type == "learn":
        if points is None:
            raise ValueError("'learn' requires training points")
        if isinstance(n_gaussians, (list, tuple)):
            raise ValueError("non-grid n_gaussians must be a scalar")
        return get_learned_gmm(np.asarray(points).reshape(-1, d), int(n_gaussians))
    raise ValueError("GMM type must be 'grid' or 'learn'")


def _minmaxsum(x: jnp.ndarray) -> jnp.ndarray:
    """concat([max, min, sum] over the point axis): [B,N,G,D] -> [B,G,3D]."""
    return jnp.concatenate(
        [jnp.max(x, axis=1), jnp.min(x, axis=1), jnp.sum(x, axis=1)], axis=-1
    )


def fisher_vector(
    points: jnp.ndarray,
    weights: jnp.ndarray,
    means: jnp.ndarray,
    stddevs: jnp.ndarray,
    flatten: bool = False,
) -> jnp.ndarray:
    """3DmFV features (tf_util.py:578-650).

    Args:
      points: [B, N, D].
      weights/means/stddevs: [G], [G, D], [G, D].
      flatten: True → [B, G·20]; False → [B, 20, G] (grid tensor order,
        matching the reference's transpose before the CNN reshape).
    """
    points = points.astype(jnp.float32)
    b, n, d = points.shape
    w = jnp.asarray(weights, jnp.float32)  # [G]
    mu = jnp.asarray(means, jnp.float32)  # [G, D]
    sigma = jnp.asarray(stddevs, jnp.float32)  # [G, D]

    diff = (points[:, :, None, :] - mu) / sigma  # [B, N, G, D]
    log_p = (
        -0.5 * jnp.sum(jnp.square(diff), axis=-1)
        - jnp.sum(jnp.log(sigma), axis=-1)
        - 0.5 * d * jnp.log(2.0 * jnp.pi)
    )
    p = jnp.exp(log_p)  # [B, N, G]

    w_p = p * w
    q = w_p / jnp.sum(w_p, axis=-1, keepdims=True)  # posterior [B, N, G]

    sqrt_w = jnp.sqrt(w)

    # ∂π: max + sum over points (tf_util.py:620-623).
    d_pi_all = (q - w) / (sqrt_w * n)  # [B, N, G]
    d_pi = jnp.stack(
        [jnp.max(d_pi_all, axis=1), jnp.sum(d_pi_all, axis=1)], axis=-1
    )  # [B, G, 2]

    q_d = q[..., None]  # [B, N, G, 1]
    d_mu_all = q_d * diff / sigma  # [B, N, G, D]
    d_mu = _minmaxsum(d_mu_all) / (n * sqrt_w[:, None])  # [B, G, 3D]

    d_sig_all = q_d * (jnp.square(diff) - 1.0)
    d_sigma = _minmaxsum(d_sig_all) / (n * jnp.sqrt(2.0 * w)[:, None])  # [B, G, 3D]

    def _norm(x):
        # Power normalization then per-feature L2 over the gaussian axis.
        x = jnp.sign(x) * jnp.sqrt(jnp.abs(x))
        return x / jnp.maximum(
            jnp.linalg.norm(x, axis=1, keepdims=True), 1e-12
        )

    d_pi, d_mu, d_sigma = _norm(d_pi), _norm(d_mu), _norm(d_sigma)

    fv = jnp.concatenate([d_pi, d_mu, d_sigma], axis=2)  # [B, G, 20]
    fv = jnp.swapaxes(fv, 1, 2)  # [B, 20, G]
    if flatten:
        return fv.reshape(b, -1)
    return fv

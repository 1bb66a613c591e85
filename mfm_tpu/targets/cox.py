"""Log-Gaussian Cox process on the Finnish pines dataset (d = grid^2).

Capability parity with the reference ``LogGaussianCoxPines`` and its
DeepMind-derived utilities (/root/reference/distributions.py:231-314,
/root/reference/cox_process_utils.py). Discretization follows Heng et al.
2017 (Controlled SMC); constants from Moller et al. 1998.

TPU-first redesign:

- Host-side construction (bin counts, Gram matrix, Cholesky) runs once in
  **float64 numpy** regardless of the device dtype, then is cast — at
  d = 1600 the Cholesky of the exponential-kernel Gram matrix is the
  accuracy-critical step (SURVEY.md section 7 hard part (a)).
- The per-gradient hot ops (Gram matvec, triangular solve;
  reference distributions.py:299-307) are batched: a (B, d) batch runs one
  (d, d) @ (d, B) triangular solve / matmul at HIGHEST precision on the MXU
  instead of B vmapped vector solves.
- Bin counting is a vectorized scatter-add instead of the reference's
  Python point loop (cox_process_utils.py:29-56).
"""

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from mfm_tpu.targets.base import Target

_DATA_PATH = os.path.join(os.path.dirname(__file__), "data", "finpines.csv")


def bin_counts(points: np.ndarray, num_bins: int) -> np.ndarray:
    """Count points of a [0,1]^2 cloud on a num_bins^2 grid (row-major).

    Upper-edge points fall into the last bin (reference
    cox_process_utils.py:29-56 floor-and-clamp semantics), vectorized.
    """
    idx = np.floor(points * num_bins).astype(np.int64)
    idx = np.clip(idx, 0, num_bins - 1)
    counts = np.zeros((num_bins, num_bins))
    np.add.at(counts, (idx[:, 0], idx[:, 1]), 1.0)
    return counts


def bin_centers(num_bins: int) -> np.ndarray:
    """Grid coordinates (k // n, k % n) in row-major order, matching the
    flattened bin-count layout (reference cox_process_utils.py:59-64)."""
    ii, jj = np.meshgrid(np.arange(num_bins), np.arange(num_bins), indexing="ij")
    return np.stack([ii.ravel(), jj.ravel()], axis=1).astype(np.float64)


def exponential_gram(
    coords: np.ndarray, signal_variance: float, num_grid: int, length_scale: float
) -> np.ndarray:
    """Gram matrix of K(m, n) = s^2 exp(-|m - n| / (num_grid * length_scale))
    (reference cox_process_utils.py:72-95), as one float64 pairwise pass."""
    diff = coords[:, None, :] - coords[None, :, :]
    dist = np.sqrt(np.sum(diff * diff, axis=-1))
    return signal_variance * np.exp(-dist / (num_grid * length_scale))


def poisson_log_likelihood(latents, bin_area, counts):
    """sum(f * counts - a * exp(f)) over the grid, batched over leading axes
    (reference cox_process_utils.py:98-115)."""
    return jnp.sum(latents * counts - bin_area * jnp.exp(latents), axis=-1)


class LogGaussianCoxPines(Target):
    """LGCP posterior over latent log-intensities on a sqrt(d) x sqrt(d) grid.

    ``whitened=False`` (the reference default, distributions.py:276-281)
    parameterizes by the latent field f; the prior whitens f through the
    Gram Cholesky. ``whitened=True`` parameterizes by white noise e with
    N(0, I) prior and pushes e through the Cholesky inside the likelihood.
    """

    def __init__(
        self,
        dim: int = 1600,
        file_path: Optional[str] = None,
        whitened: bool = False,
        dtype=jnp.float32,
    ):
        num_grid = int(np.sqrt(dim))
        assert num_grid * num_grid == dim, "dim must be a perfect square"
        self.dim = dim
        self.whitened = whitened
        self._num_grid = num_grid

        points = np.genfromtxt(file_path or _DATA_PATH, delimiter=",")
        counts64 = bin_counts(points, num_grid).reshape(dim)

        # Moller et al. 1998 constants (reference distributions.py:256-274)
        signal_variance = 1.91
        beta = 1.0 / 33.0
        self._bin_area = 1.0 / dim
        mu_zero = np.log(126.0) - 0.5 * signal_variance

        gram64 = exponential_gram(bin_centers(num_grid), signal_variance, num_grid, beta)
        chol64 = np.linalg.cholesky(gram64)
        half_logdet = np.sum(np.log(np.abs(np.diag(chol64))))
        # Precision matrix, assembled in float64 then cast: the per-gradient
        # triangular solves of the reference (distributions.py:299-307) become
        # one (B, d) @ (d, d) GEMM on the MXU — triangular solves serialize
        # over d=1600 steps, the dense matvec does not.
        inv_chol64 = np.linalg.solve(chol64, np.eye(dim))
        prec64 = inv_chol64.T @ inv_chol64

        self._counts = jnp.asarray(counts64, dtype)
        # Gaussian-prior mean for elliptical-slice proposals (whitened
        # prior is centered; unwhitened is the constant mu_zero field)
        self.prior_gaussian_mean = 0.0 if whitened else float(mu_zero)
        self._chol = jnp.asarray(chol64, dtype)
        self._prec = jnp.asarray(prec64, dtype)
        self._mu_zero = jnp.asarray(mu_zero, dtype)
        self._white_log_norm = -0.5 * dim * float(np.log(2.0 * np.pi))
        self._latent_log_norm = self._white_log_norm - float(half_logdet)

    # ---- shared pieces -------------------------------------------------------
    def _whiten(self, latents):
        """e = L^-1 (f - mu); batched triangular solve on the MXU
        (reference cox_process_utils.py:142-165)."""
        y = (latents - self._mu_zero)
        if y.ndim == 1:
            return jax.scipy.linalg.solve_triangular(self._chol, y, lower=True)
        sol = jax.scipy.linalg.solve_triangular(self._chol, y.T, lower=True)
        return sol.T

    def _unwhiten(self, white):
        """f = L e + mu (reference cox_process_utils.py:118-139)."""
        return (
            jnp.einsum(
                "ij,...j->...i", self._chol, white, precision=lax.Precision.HIGHEST
            )
            + self._mu_zero
        )

    # ---- density -------------------------------------------------------------
    def log_lik(self, x):
        latents = self._unwhiten(x) if self.whitened else x
        return poisson_log_likelihood(latents, self._bin_area, self._counts)

    def log_prior(self, x):
        if self.whitened:
            return -0.5 * jnp.sum(x * x, axis=-1) + self._white_log_norm
        y = x - self._mu_zero
        py = jnp.einsum(
            "ij,...j->...i", self._prec, y, precision=lax.Precision.HIGHEST
        )
        return -0.5 * jnp.sum(y * py, axis=-1) + self._latent_log_norm

    def score(self, x):
        """Analytic score — one GEMM + elementwise, no autodiff solves."""
        return self.value_and_score(x)[1]

    def value_and_score(self, x):
        return self.tempered_value_and_score(x, 1.0)

    def tempered_value_and_score(self, x, beta):
        """Fused (beta * loglik + logprior, gradient): the MALA/flow hot path.

        Unwhitened: grad = beta (counts - a e^f) - P (f - mu).
        Whitened:   grad = beta L^T (counts - a e^f) - e.
        Verified against autodiff of the solve-based density in
        tests/test_targets.py.
        """
        squeeze = x.ndim == 1
        xb = x[None] if squeeze else x
        if self.whitened:
            f = self._unwhiten(xb)
            lik_resid = self._counts - self._bin_area * jnp.exp(f)
            val = (
                beta * poisson_log_likelihood(f, self._bin_area, self._counts)
                - 0.5 * jnp.sum(xb * xb, axis=-1)
                + self._white_log_norm
            )
            grad = (
                beta
                * jnp.einsum(
                    "ji,...j->...i", self._chol, lik_resid,
                    precision=lax.Precision.HIGHEST,
                )
                - xb
            )
        else:
            y = xb - self._mu_zero
            py = jnp.einsum(
                "ij,...j->...i", self._prec, y, precision=lax.Precision.HIGHEST
            )
            val = (
                beta * poisson_log_likelihood(xb, self._bin_area, self._counts)
                - 0.5 * jnp.sum(y * py, axis=-1)
                + self._latent_log_norm
            )
            grad = beta * (self._counts - self._bin_area * jnp.exp(xb)) - py
        if squeeze:
            return val[0], grad[0]
        return val, grad

    def init_positions(self, key, n_chain):
        """Prior draws f = mu + L eps (reference distributions.py:312-314)."""
        return self.prior_sample(key, (n_chain,))

    def prior_sample(self, key, shape=()):
        eps = jax.random.normal(key, shape + (self.dim,))
        if self.whitened:
            return eps
        return self._unwhiten(eps)

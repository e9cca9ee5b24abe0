"""SVD utilities + SVD-based denoising (≈ reference algorithm/filter/SvdFilter.hpp
Hankel-matrix denoiser and core SVD.hpp one-sided Jacobi).

TPU-native: ``jnp.linalg.svd`` (XLA's batched SVD) on Hankel embeddings. The
Hankel matrix is built with the same gather-free overlapping-frame trick as the
FIR framing; rank truncation keeps the top-k singular values; the denoised signal
is recovered by anti-diagonal averaging.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def hankel(x: jnp.ndarray, window: int) -> jnp.ndarray:
    """[T] → Hankel [T - window + 1, window] via overlapping frames (stride 1)."""
    t = x.shape[-1]
    n = t - window + 1
    idx = jnp.arange(n)[:, None] + jnp.arange(window)[None, :]
    return x[idx]


def svd_denoise(x: jnp.ndarray, *, window: int = 32, rank: int = 4
                ) -> jnp.ndarray:
    """Truncated-SVD denoise of a 1-D signal via Hankel embedding.

    Keeps the ``rank`` largest singular components and reconstructs by averaging
    anti-diagonals (the unbiased Hankel inverse).
    """
    t = x.shape[-1]
    h = hankel(x, window)                                   # [N, W]
    u, s, vt = jnp.linalg.svd(h, full_matrices=False)
    s_trunc = s.at[rank:].set(0.0) if rank < s.shape[0] else s
    h_hat = (u * s_trunc[None, :]) @ vt
    # anti-diagonal averaging: y[k] = mean over {(i,j): i+j=k} of h_hat[i, j]
    n, w = h_hat.shape
    ii = jnp.arange(n)[:, None] + jnp.arange(w)[None, :]    # output index per cell
    flat = h_hat.reshape(-1)
    sums = jnp.zeros(t, h_hat.dtype).at[ii.reshape(-1)].add(flat)
    counts = jnp.zeros(t, jnp.float32).at[ii.reshape(-1)].add(1.0)
    return (sums / counts).astype(x.dtype)


def svd(a: jnp.ndarray, *, full_matrices: bool = False):
    """Thin wrapper (parity point for reference core SVD.hpp)."""
    return jnp.linalg.svd(a, full_matrices=full_matrices)


def low_rank_approx(a: jnp.ndarray, rank: int) -> jnp.ndarray:
    u, s, vt = jnp.linalg.svd(a, full_matrices=False)
    return (u[..., :, :rank] * s[..., None, :rank]) @ vt[..., :rank, :]

"""Noise generation (≈ reference algorithm/rng Xoshiro256pp + GaussianNoise).

TPU-native: JAX's counter-based threefry PRNG — splittable, reproducible, and
generated entirely on-device (no host RNG feed). The carried state is the PRNG key,
split once per step; this is the idiomatic replacement for the reference's
sequential xoshiro256++ stream (a sequential generator would serialize the VPU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def noise_init_state(seed: int) -> jax.Array:
    return jax.random.key(np.uint32(seed))


def gaussian(key: jax.Array, shape: tuple[int, ...], *, std=1.0, mean=0.0
             ) -> tuple[jnp.ndarray, jax.Array]:
    key, sub = jax.random.split(key)
    x = jax.random.normal(sub, shape, dtype=jnp.float32) * std + mean
    return x, key


def uniform(key: jax.Array, shape: tuple[int, ...], *, low=-1.0, high=1.0
            ) -> tuple[jnp.ndarray, jax.Array]:
    key, sub = jax.random.split(key)
    x = jax.random.uniform(sub, shape, dtype=jnp.float32, minval=low, maxval=high)
    return x, key


def complex_gaussian(key: jax.Array, shape: tuple[int, ...], *, std=1.0
                     ) -> tuple[jnp.ndarray, jax.Array]:
    """Circularly-symmetric complex Gaussian with total power std² (std/√2 per rail)."""
    key, sub = jax.random.split(key)
    ri = jax.random.normal(sub, (2, *shape), dtype=jnp.float32) * (std / np.sqrt(2.0))
    return (ri[0] + 1j * ri[1]).astype(jnp.complex64), key

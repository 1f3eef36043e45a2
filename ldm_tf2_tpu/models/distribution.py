"""Diagonal Gaussian posterior over latents.

Functional JAX counterpart of the reference's ``DiagonalGaussian``
(/root/reference/distribution.py:6-51).  Differences forced by the paradigm:
sampling takes an explicit PRNG key instead of relying on global random
state, and the object is a pytree (registered dataclass) so it can cross
`jit` boundaries and live inside `lax.scan` carries.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class DiagonalGaussian:
    """Posterior q(z|x) = N(mean, diag(exp(logvar))).

    ``logvar`` is clipped to [-30, 20] at construction
    (distribution.py:16) — use the `create` factory.
    """

    mean: jnp.ndarray
    logvar: jnp.ndarray
    deterministic: bool = struct.field(pytree_node=False, default=False)

    @classmethod
    def create(
        cls, mean: jnp.ndarray, logvar: jnp.ndarray, deterministic: bool = False
    ) -> "DiagonalGaussian":
        return cls(
            mean=mean,
            logvar=jnp.clip(logvar, -30.0, 20.0),
            deterministic=deterministic,
        )

    @property
    def std(self) -> jnp.ndarray:
        if self.deterministic:
            return jnp.zeros_like(self.mean)
        return jnp.exp(0.5 * self.logvar)

    @property
    def var(self) -> jnp.ndarray:
        if self.deterministic:
            return jnp.zeros_like(self.mean)
        return jnp.exp(self.logvar)

    def sample(self, key: jax.Array) -> jnp.ndarray:
        """mean + std * N(0, 1)  (distribution.py:23-25)."""
        noise = jax.random.normal(key, self.mean.shape, dtype=self.mean.dtype)
        return self.mean + self.std * noise

    def kl(self, other: "DiagonalGaussian | None" = None) -> jnp.ndarray:
        """KL vs N(0,I) (or vs `other`), summed over [1,2,3]
        (distribution.py:27-39). Returns [batch]."""
        if self.deterministic:
            return jnp.array([0.0], dtype=jnp.float32)
        axes = (1, 2, 3)
        if other is None:
            return 0.5 * jnp.sum(
                self.mean**2 + self.var - 1.0 - self.logvar, axis=axes
            )
        return 0.5 * jnp.sum(
            (self.mean - other.mean) ** 2 / other.var
            + self.var / other.var
            - 1.0
            - self.logvar
            + other.logvar,
            axis=axes,
        )

    def nll(self, sample: jnp.ndarray, axes=(1, 2, 3)) -> jnp.ndarray:
        """Negative log-likelihood of `sample` (distribution.py:41-48)."""
        if self.deterministic:
            return jnp.array([0.0], dtype=jnp.float32)
        logtwopi = jnp.log(2.0 * jnp.pi)
        return 0.5 * jnp.sum(
            logtwopi + self.logvar + (sample - self.mean) ** 2 / self.var,
            axis=axes,
        )

    def mode(self) -> jnp.ndarray:
        return self.mean

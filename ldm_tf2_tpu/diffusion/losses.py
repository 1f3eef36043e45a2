"""Loss functions for diffusion and adversarial autoencoder training.

Counterparts of the reference's loss registry and helpers
(/root/reference/model_runners.py:12-25, :90-99, :580-600).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def hinge_d_loss(logits_real: jnp.ndarray, logits_fake: jnp.ndarray) -> jnp.ndarray:
    """0.5 * (mean relu(1 - real) + mean relu(1 + fake))
    (model_runners.py:12-16)."""
    loss_real = jnp.mean(jax.nn.relu(1.0 - logits_real))
    loss_fake = jnp.mean(jax.nn.relu(1.0 + logits_fake))
    return 0.5 * (loss_real + loss_fake)


def vanilla_d_loss(logits_real: jnp.ndarray, logits_fake: jnp.ndarray) -> jnp.ndarray:
    """0.5 * (mean softplus(-real) + mean softplus(fake))
    (model_runners.py:19-23)."""
    return 0.5 * (
        jnp.mean(jax.nn.softplus(-logits_real))
        + jnp.mean(jax.nn.softplus(logits_fake))
    )


D_LOSS_MAP = {"hinge": hinge_d_loss, "vanilla": vanilla_d_loss}


def q_sample(
    sqrt_alphas_cumprod: jnp.ndarray,
    sqrt_one_minus_alphas_cumprod: jnp.ndarray,
    x0: jnp.ndarray,
    t: jnp.ndarray,
    eps: jnp.ndarray,
) -> jnp.ndarray:
    """Forward-process sample q(x_t | x_0) (model_runners.py:580-600).

    Coefficients are gathered at per-example timesteps and broadcast over
    [B,1,1,1] (the reference's `_extract`, model_runners.py:28-45).
    """
    c0 = jnp.take(sqrt_alphas_cumprod, t).astype(x0.dtype)[:, None, None, None]
    c1 = jnp.take(sqrt_one_minus_alphas_cumprod, t).astype(x0.dtype)[
        :, None, None, None
    ]
    return c0 * x0 + c1 * eps


def nll_loss(
    inputs: jnp.ndarray,
    outputs: jnp.ndarray,
    lpips_value: jnp.ndarray,
    lpips_weight: float = 1.0,
    reduce_loss: bool = False,
) -> jnp.ndarray:
    """|x - x_hat| + w * LPIPS, reduced sum/B or mean
    (model_runners.py:90-99)."""
    loss = jnp.abs(inputs - outputs) + lpips_weight * lpips_value
    if reduce_loss:
        return jnp.sum(loss) / loss.shape[0]
    return jnp.mean(loss)

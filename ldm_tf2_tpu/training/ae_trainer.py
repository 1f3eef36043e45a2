"""Stage-1 training: KL- or VQ-regularized autoencoder with L1 + LPIPS
perceptual loss and PatchGAN adversarial loss.

Counterpart of the reference's ``AutoencoderTrainerKL`` / ``...VQ``
(/root/reference/model_runners.py:48-349), re-designed as two jitted phase
steps selected by the host loop on the step counter (the reference does the
same python-level branch at model_runners.py:207-213):

* phase 1 (step < global_step_discriminator): reconstruction losses only;
* phase 2: adds the generator term with the **gradient-norm adaptive
  weight** ``‖∇_last nll‖ / (‖∇_last g‖ + 1e-4)`` clipped to [0, 1e4]
  (model_runners.py:74-88), where ∇_last is w.r.t. the decoder's final conv
  kernel only.  Functionally this is two `jax.grad`s of scalar losses with
  the last-layer kernel substituted into the param tree — XLA dead-code
  eliminates every other gradient path and CSEs the shared decode forward,
  so the extra cost is ~one cheap backward through the final conv.

LPIPS params are frozen (never given to the optimizer — lpips.py:51);
the discriminator's BatchNorm running stats are threaded as a mutable
`batch_stats` collection in the train state.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ldm_tf2_tpu.diffusion.losses import D_LOSS_MAP, nll_loss


@struct.dataclass
class AETrainState:
    step: jnp.ndarray
    ae_params: Any
    d_params: Any
    d_batch_stats: Any
    ae_opt_state: Any
    d_opt_state: Any


def make_adam(
    learning_rate: float = 4.5e-6,
    beta_1: float = 0.5,
    beta_2: float = 0.9,
    epsilon: float = 1e-8,
) -> optax.GradientTransformation:
    """Adam matching autoencoder_optimizer / discriminator_optimizer
    (all_in_one_config.yaml:113-123)."""
    return optax.adam(learning_rate, b1=beta_1, b2=beta_2, eps=epsilon)


def init_ae_train_state(
    ae_params, d_variables, ae_optimizer, d_optimizer
) -> AETrainState:
    d_params = d_variables["params"]
    return AETrainState(
        step=jnp.zeros((), jnp.int32),
        ae_params=ae_params,
        d_params=d_params,
        d_batch_stats=d_variables.get("batch_stats", {}),
        ae_opt_state=ae_optimizer.init(ae_params),
        d_opt_state=d_optimizer.init(d_params),
    )


def _replace_leaf(params, path: tuple[str, ...], value):
    """Return a copy of the nested-dict param tree with one leaf replaced."""
    if len(path) == 1:
        return {**params, path[0]: value}
    return {
        **params,
        path[0]: _replace_leaf(params[path[0]], path[1:], value),
    }


def _get_leaf(params, path: tuple[str, ...]):
    for k in path:
        params = params[k]
    return params


def make_ae_train_steps(
    reconstruct: Callable,
    regularization_loss: Callable,
    lpips_apply: Callable,
    d_apply: Callable,
    ae_optimizer: optax.GradientTransformation,
    d_optimizer: optax.GradientTransformation,
    last_layer_path: tuple[str, ...],
    lpips_params: Any,
    lpips_weight: float = 1.0,
    regularization_weight: float = 1.0,
    discriminator_weight: float = 1.0,
    discriminator_factor: float = 1.0,
    discriminator_loss_type: str = "hinge",
):
    """Build the two jitted AE train steps (reconstruction-only and
    reconstruction+GAN).

    Args:
      reconstruct: (ae_params, images, key, training) ->
        (outputs, reg_raw, aux) where reg_raw is the regularizer input —
        the posterior for KL (model_runners.py:149-163) or the codebook loss
        for VQ (model_runners.py:278-289).
      regularization_loss: reg_raw -> scalar (already *without* its weight).
      lpips_apply: (lpips_params, a, b) -> [B,1,1,1].
      d_apply: ({'params','batch_stats'}, images, training, mutable) ->
        logits (and new state when mutable).
      last_layer_path: path of the decoder final conv kernel inside
        ae_params, for the adaptive weight.
    Returns:
      (train_step_autoencoder, train_step_autoencoder_discriminator), both
      (state, images, rng) -> (state, metrics).
    """
    d_loss_fn = D_LOSS_MAP[discriminator_loss_type]

    def recon_losses(ae_params, images, key, training=True):
        outputs, reg_raw, aux = reconstruct(ae_params, images, key, training)
        lpips_value = lpips_apply(lpips_params, images, outputs)
        nll = nll_loss(images, outputs, lpips_value, lpips_weight,
                       reduce_loss=True)
        reg = regularization_loss(reg_raw)
        return outputs, nll, reg, aux

    # ----- phase 1: reconstruction only (model_runners.py:149-163) -----
    def ae_only_loss(ae_params, images, key):
        _, nll, reg, _ = recon_losses(ae_params, images, key)
        loss = nll + regularization_weight * reg
        return loss, {"ae_loss": loss, "nll_loss": nll, "reg_loss": reg}

    def train_step_autoencoder(state: AETrainState, images, rng):
        rng = jax.random.fold_in(rng, state.step)
        (_, metrics), grads = jax.value_and_grad(ae_only_loss, has_aux=True)(
            state.ae_params, images, rng
        )
        updates, ae_opt_state = ae_optimizer.update(
            grads, state.ae_opt_state, state.ae_params
        )
        return (
            state.replace(
                step=state.step + 1,
                ae_params=optax.apply_updates(state.ae_params, updates),
                ae_opt_state=ae_opt_state,
            ),
            metrics,
        )

    # ----- phase 2: + GAN (model_runners.py:165-198) -----
    def ae_gan_loss(ae_params, d_variables, images, key):
        outputs, nll, reg, _ = recon_losses(ae_params, images, key)
        logits_fake = d_apply(d_variables, outputs, training=False)
        g_loss = -jnp.mean(logits_fake)

        # Adaptive weight: grads of nll and g w.r.t. the last decoder kernel
        # only (model_runners.py:74-88).
        last_kernel = _get_leaf(ae_params, last_layer_path)

        def nll_of_last(k):
            p = _replace_leaf(ae_params, last_layer_path, k)
            out, _, _ = reconstruct(p, images, key, True)
            lp = lpips_apply(lpips_params, images, out)
            return nll_loss(images, out, lp, lpips_weight, reduce_loss=True)

        def g_of_last(k):
            p = _replace_leaf(ae_params, last_layer_path, k)
            out, _, _ = reconstruct(p, images, key, True)
            return -jnp.mean(d_apply(d_variables, out, training=False))

        nll_grads = jax.grad(nll_of_last)(last_kernel)
        g_grads = jax.grad(g_of_last)(last_kernel)
        weight = jnp.linalg.norm(nll_grads.ravel()) / (
            jnp.linalg.norm(g_grads.ravel()) + 1e-4
        )
        weight = jax.lax.stop_gradient(jnp.clip(weight, 0.0, 1e4))
        weight = weight * discriminator_weight

        ae_loss = (
            nll
            + regularization_weight * reg
            + weight * discriminator_factor * g_loss
        )
        metrics = {
            "ae_loss": ae_loss,
            "nll_loss": nll,
            "reg_loss": reg,
            "g_loss": g_loss,
            "adaptive_weight": weight,
        }
        return ae_loss, (outputs, metrics)

    def d_loss_and_stats(d_params, batch_stats, images, outputs):
        variables = {"params": d_params, "batch_stats": batch_stats}
        sg = jax.lax.stop_gradient
        logits_real, state1 = d_apply(
            variables, sg(images), training=True, mutable=["batch_stats"]
        )
        variables = {"params": d_params, "batch_stats": state1["batch_stats"]}
        logits_fake, state2 = d_apply(
            variables, sg(outputs), training=True, mutable=["batch_stats"]
        )
        d_loss = d_loss_fn(logits_real, logits_fake) * discriminator_factor
        return d_loss, state2["batch_stats"]

    def train_step_autoencoder_discriminator(state: AETrainState, images, rng):
        rng = jax.random.fold_in(rng, state.step)
        d_variables = {
            "params": state.d_params,
            "batch_stats": state.d_batch_stats,
        }
        (_, (outputs, metrics)), ae_grads = jax.value_and_grad(
            ae_gan_loss, has_aux=True
        )(state.ae_params, d_variables, images, rng)

        (d_loss, new_batch_stats), d_grads = jax.value_and_grad(
            d_loss_and_stats, has_aux=True
        )(state.d_params, state.d_batch_stats, images, outputs)

        ae_updates, ae_opt_state = ae_optimizer.update(
            ae_grads, state.ae_opt_state, state.ae_params
        )
        d_updates, d_opt_state = d_optimizer.update(
            d_grads, state.d_opt_state, state.d_params
        )
        metrics = {**metrics, "d_loss": d_loss}
        return (
            state.replace(
                step=state.step + 1,
                ae_params=optax.apply_updates(state.ae_params, ae_updates),
                d_params=optax.apply_updates(state.d_params, d_updates),
                d_batch_stats=new_batch_stats,
                ae_opt_state=ae_opt_state,
                d_opt_state=d_opt_state,
            ),
            metrics,
        )

    return train_step_autoencoder, train_step_autoencoder_discriminator

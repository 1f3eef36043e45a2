"""Stage-2 training: text-conditioned epsilon-prediction U-Net on frozen
autoencoder latents.

Counterpart of the reference's ``LatentDiffusionModelTrainer``
(/root/reference/model_runners.py:578-707), re-designed as one fused jitted
step on a data-parallel mesh:

* the frozen AE encode, the condition model, the U-Net forward/backward and
  the AdamW update are a single XLA program (the reference runs a host
  `for` loop feeding one `tf.function`, model_runners.py:677-689, pinned to
  CPU by run_ldm_trainer.py:25);
* condition dropout is **per-example** Bernoulli (an intentional improvement
  over the reference's whole-batch `tf.cond`, model_runners.py:696-700 —
  flagged in SURVEY.md §7 as a bug to fix, not port);
* timesteps are sampled per example, uniform over [0, num_steps)
  (model_runners.py:694);
* gradients flow to the U-Net (and optionally the condition model,
  model_runners.py:658-660); the AE is frozen via stop_gradient + exclusion
  from the optimizer (model_runners.py:602-625).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ldm_tf2_tpu.diffusion.losses import q_sample
from ldm_tf2_tpu.diffusion.schedule import DiffusionSchedule


@struct.dataclass
class LDMTrainState:
    """Carried training state: step, trainable params, optimizer state.

    ``unet_params`` always trains; ``cond_params`` trains only when the step
    was built with train_cond_model=True (otherwise it is frozen inside
    `frozen`).  ``ema_params`` (beyond-reference) mirrors the trainable
    tree as an exponential moving average when the step was built with
    ema_decay — the standard weights actually used for diffusion sampling.
    """

    step: jnp.ndarray
    unet_params: Any
    cond_params: Any
    opt_state: Any
    ema_params: Any = None


def make_optimizer(
    learning_rate: float = 5e-5,
    beta_1: float = 0.9,
    beta_2: float = 0.999,
    epsilon: float = 1e-8,
    weight_decay: float = 0.01,
    warmup_steps: int = 0,
    decay_steps: int | None = None,
    end_learning_rate_factor: float = 0.1,
    clip_grad_norm: float | None = None,
    mu_dtype: str | None = None,
    accum_steps: int = 1,
) -> optax.GradientTransformation:
    """AdamW matching the reference's latent_diffusion_optimizer section
    (all_in_one_config.yaml:125-130), with additive (beyond-reference)
    stability options: linear warmup, cosine decay, and global-norm
    gradient clipping — all off by default so the reference's fixed-LR
    behavior is preserved.

    mu_dtype="bfloat16" stores the Adam first moment in bf16 — frees
    1.75 GB of HBM on the 0.87B U-Net (the 256^2 batch-32 train step
    misses fitting by ~0.2 GB with f32 moments).  f32 masters and the
    f32 second moment are untouched.

    accum_steps > 1 wraps the whole chain in ``optax.MultiSteps``:
    gradients from that many consecutive micro-batch steps are averaged
    before one AdamW update (clipping, when enabled, applies to the
    averaged gradient) — effective batch = batch_size * accum_steps at
    the HBM footprint of one micro-batch plus one f32 gradient
    accumulator.  The accumulator lives in the optimizer state, so
    checkpoints taken mid-accumulation resume exactly."""
    if decay_steps:
        lr = optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=learning_rate,
            warmup_steps=warmup_steps,
            decay_steps=decay_steps,
            end_value=learning_rate * end_learning_rate_factor,
        )
    elif warmup_steps:
        lr = optax.join_schedules(
            [
                optax.linear_schedule(0.0, learning_rate, warmup_steps),
                optax.constant_schedule(learning_rate),
            ],
            [warmup_steps],
        )
    else:
        lr = learning_rate
    if mu_dtype not in (None, "float32", "bfloat16"):
        raise ValueError(
            f"mu_dtype must be null|float32|bfloat16, got {mu_dtype!r}"
        )
    tx = optax.adamw(
        lr, b1=beta_1, b2=beta_2, eps=epsilon, weight_decay=weight_decay,
        mu_dtype=jnp.bfloat16 if mu_dtype == "bfloat16" else None,
    )
    if clip_grad_norm:
        tx = optax.chain(optax.clip_by_global_norm(clip_grad_norm), tx)
    if not isinstance(accum_steps, int) or accum_steps < 1:
        raise ValueError(f"accum_steps must be an int >= 1, got {accum_steps!r}")
    if accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_steps)
    return tx


def make_ldm_train_step(
    unet_apply: Callable,
    cond_apply: Callable,
    encode_latents: Callable,
    schedule: DiffusionSchedule,
    optimizer: optax.GradientTransformation,
    scale_factor: float = 0.18215,
    condition_dropout_rate: float = 0.1,
    train_cond_model: bool = False,
    null_token_ids: jnp.ndarray | None = None,
    remat_unet: bool | str = False,
    ema_decay: float | None = None,
    encode_chunks: int = 1,
):
    """Build the jitted LDM train step.

    Args:
      unet_apply: (params, xt, t, context, rngs) -> eps_hat, training mode.
      cond_apply: (params, token_ids, rngs) -> context.
      encode_latents: (ae_params, images, key) -> latents in AE latent space
        *before* scale_factor (KL: posterior sample; VQ: only_encode —
        model_runners.py:602-625).
      null_token_ids: [seq] tokenized "" for condition dropout
        (run_ldm_trainer.py:71-75: [101, 102, 0...]).
    Returns:
      train_step(state, ae_params, images, token_ids, rng) -> (state, metrics)
    """
    sqrt_acp = jnp.asarray(schedule.sqrt_alphas_cumprod)
    sqrt_1m_acp = jnp.asarray(schedule.sqrt_one_minus_alphas_cumprod)
    num_steps = schedule.num_steps

    if remat_unet:
        # Rematerialize the U-Net forward in the backward pass — the lever
        # for larger per-chip batches at 512^2+.  Policies (VERDICT r1
        # next-item #8, selective remat):
        #   True / "full"  — save nothing: max memory relief, ~1/3 extra
        #                    FLOPs (whole forward recomputed).
        #   "blocks"       — save only the `checkpoint_name`-tagged
        #                    per-block boundary activations (models/
        #                    unet.py): backward recomputes one block
        #                    interior at a time, so the peak drops to
        #                    boundaries + one block's interior while the
        #                    recompute cost stays one forward.
        #   "dots"         — jax's dots_with_no_batch_dims_saveable:
        #                    keep matmul outputs, recompute elementwise.
        # `training` must be a *positional* static arg for jax.checkpoint
        # (it has static_argnums but no static_argnames), so adapt the
        # keyword-style callable to a positional signature before wrapping.
        policies = {
            True: None,
            "full": None,
            "blocks": jax.checkpoint_policies.save_only_these_names(
                "unet_block"
            ),
            "dots": jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
        }
        if remat_unet not in policies:
            raise ValueError(
                f"tpu.remat must be one of false|true|full|blocks|dots, "
                f"got {remat_unet!r}"
            )
        policy = policies[remat_unet]
        base_unet_apply = unet_apply

        def _unet_positional(params, xt, t, context, rngs, training):
            return base_unet_apply(
                params, xt, t, context, rngs, training=training
            )

        unet_apply = jax.checkpoint(
            _unet_positional, static_argnums=(5,), policy=policy
        )

    if encode_chunks > 1:
        # lax.map serializes the frozen-AE encode over sub-batches,
        # dividing its transient-activation peak at zero FLOP cost.
        # Measured: does NOT move the 512^2 batch-12 OOM (that peak is
        # inside the U-Net fwd/bwd); it is the lever for 1024^2+ images,
        # where the encoder's full-res conv maps (0.25 GB per feature map
        # per image at 1024^2 bf16) genuinely dominate.
        base_encode = encode_latents

        def encode_latents(ae_params, images, key):  # noqa: F811
            b = images.shape[0]
            if b % encode_chunks:
                raise ValueError(
                    f"tpu.encode_chunks={encode_chunks} does not divide the "
                    f"per-device batch {b}; the chunked (memory-saving) AE "
                    "encode cannot apply. Pick an encode_chunks that divides "
                    "the batch, or set it to 1."
                )
            chunked = images.reshape(
                (encode_chunks, b // encode_chunks) + images.shape[1:]
            )
            keys = jax.random.split(key, encode_chunks)
            out = jax.lax.map(
                lambda args: base_encode(ae_params, args[0], args[1]),
                (chunked, keys),
            )
            return out.reshape((b,) + out.shape[2:])

    def loss_fn(trainable, frozen_cond, ae_params, images, token_ids, rng):
        unet_params = trainable["unet"]
        cond_params = (
            trainable["cond"] if train_cond_model else frozen_cond
        )

        t_key, latent_key, drop_key, noise_key, dropout_key = jax.random.split(
            rng, 5
        )
        batch = images.shape[0]
        t = jax.random.randint(t_key, (batch,), 0, num_steps)

        latents = encode_latents(ae_params, images, latent_key)
        latents = jax.lax.stop_gradient(scale_factor * latents)

        if null_token_ids is not None and condition_dropout_rate > 0:
            drop = jax.random.bernoulli(
                drop_key, condition_dropout_rate, (batch,)
            )
            token_ids = jnp.where(
                drop[:, None], null_token_ids[None, :].astype(token_ids.dtype),
                token_ids,
            )

        context = cond_apply(
            cond_params, token_ids, {"dropout": dropout_key},
            training=train_cond_model,
        )
        if not train_cond_model:
            context = jax.lax.stop_gradient(context)

        noise = jax.random.normal(noise_key, latents.shape, latents.dtype)
        xt = q_sample(sqrt_acp, sqrt_1m_acp, latents, t, noise)
        eps = unet_apply(
            unet_params,
            xt,
            t.astype(jnp.float32),
            context,
            {"dropout": dropout_key},
            True,  # training — positional so jax.checkpoint can mark it static
        )
        # mean over spatial dims per example, then batch mean
        # (model_runners.py:705-706).
        loss = jnp.mean(jnp.mean((noise - eps) ** 2, axis=(1, 2, 3)))
        return loss

    def train_step(state: LDMTrainState, ae_params, images, token_ids, rng):
        rng = jax.random.fold_in(rng, state.step)
        trainable = {"unet": state.unet_params}
        if train_cond_model:
            trainable["cond"] = state.cond_params

        loss, grads = jax.value_and_grad(loss_fn)(
            trainable, state.cond_params, ae_params, images, token_ids, rng
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, trainable)
        new_trainable = optax.apply_updates(trainable, updates)

        ema_params = state.ema_params
        if ema_decay is not None:
            ema_params = jax.tree.map(
                lambda e, p: ema_decay * e + (1.0 - ema_decay) * p,
                state.ema_params,
                new_trainable,
            )
            # Under gradient accumulation (optax.MultiSteps), params only
            # move on sync steps (mini_step wraps to 0); folding the EMA on
            # the no-op micro-steps would silently raise the effective decay
            # rate by accum_steps x.  Gate the fold on the sync boundary.
            mini_step = getattr(opt_state, "mini_step", None)
            if mini_step is not None:
                applied = mini_step == 0
                ema_params = jax.tree.map(
                    lambda mixed, old: jnp.where(applied, mixed, old),
                    ema_params,
                    state.ema_params,
                )

        new_state = state.replace(
            step=state.step + 1,
            unet_params=new_trainable["unet"],
            cond_params=(
                new_trainable["cond"] if train_cond_model else state.cond_params
            ),
            opt_state=opt_state,
            ema_params=ema_params,
        )
        return new_state, {"loss": loss}

    return train_step


def init_ldm_train_state(
    unet_params,
    cond_params,
    optimizer,
    train_cond_model: bool = False,
    ema_decay: float | None = None,
) -> LDMTrainState:
    trainable = {"unet": unet_params}
    if train_cond_model:
        trainable["cond"] = cond_params
    return LDMTrainState(
        step=jnp.zeros((), jnp.int32),
        unet_params=unet_params,
        cond_params=cond_params,
        opt_state=optimizer.init(trainable),
        ema_params=(
            jax.tree.map(jnp.copy, trainable) if ema_decay is not None else None
        ),
    )

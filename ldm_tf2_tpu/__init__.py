"""ldm_tf2_tpu — a TPU-native latent-diffusion framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of chao-ji/ldm_tf2
(reference mounted read-only at /root/reference): text-to-image latent
diffusion sampling with classifier-free guidance, two-stage training
(KL/VQ autoencoder with LPIPS + PatchGAN losses, then text-conditioned
epsilon-prediction U-Net), a PyTorch checkpoint converter, and TFRecord data
plumbing — all re-designed TPU-first:

* models are `flax.linen` modules in NHWC, bf16-friendly, jit-compiled;
* the DDIM/DDPM reverse process is a `lax.scan` that keeps all sampling
  steps on device (reference: graph-level `tf.while_loop`,
  model_runners.py:474-509);
* parallelism is a `jax.sharding.Mesh` with named-sharding annotations
  (data/model axes) instead of the reference's single-device execution;
* hot inner ops (flash attention, fused GroupNorm+SiLU) are Pallas TPU
  kernels under `ldm_tf2_tpu.ops`.
"""

__version__ = "0.1.0"

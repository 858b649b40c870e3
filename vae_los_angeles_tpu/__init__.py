"""vae_los_angeles_tpu — a TPU-native (JAX/XLA/Pallas/pjit) multi-omics VAE framework.

Re-designed from scratch with the capabilities of the PyTorch reference
``marcin119a/vae-los-angeles`` (see SURVEY.md): a tri-modal β-VAE over RNA
expression, DNA methylation and primary tumor site, directional VAEs/AEs for
cross-modal imputation, k-fold CV benchmarking against mean/kNN baselines,
hyperparameter optimization, a downstream site-classification task and
clustering evaluation.

TPU-first design principles (vs the reference's per-batch host loop):
  * whole omics tables live in HBM as ``jax.Array``s; an epoch is a single
    ``lax.scan`` over pre-permuted batches — an entire 200-epoch training run
    compiles to ONE device dispatch (`training.engine.fit`).
  * models are pure functions over parameter pytrees → trivially ``vmap``-able
    over CV folds and hyperparameter-trial populations (`parallel.vmap_meta`).
  * multi-chip scaling via ``jax.sharding.Mesh`` + NamedSharding with XLA
    collectives over ICI (`parallel.sharding`), not host-side process groups.
  * hot inference path optionally runs as a fused Pallas kernel
    (`ops.pallas.fused_vae`): encode → mean-fuse → sample → decode in one
    on-chip matmul chain.
"""

__version__ = "1.0.0"

from vae_los_angeles_tpu.config import Config  # noqa: F401

"""Compute-path primitives: layers, losses, optimizers, metrics, Pallas kernels."""

from vae_los_angeles_tpu.ops import losses, metrics, nn, optim  # noqa: F401

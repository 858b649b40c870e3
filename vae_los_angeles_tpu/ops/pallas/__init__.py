"""Pallas TPU kernels: fused VAE inference (encode→fuse→sample→decode in one
on-chip matmul chain) for both imputation directions, and the fused
loss+backward custom-VJP kernel."""

from vae_los_angeles_tpu.ops.pallas.fused_loss import rna2dna_loss_fused  # noqa: F401
from vae_los_angeles_tpu.ops.pallas.fused_vae import (  # noqa: F401
    FusedDNA2RNA,
    FusedRNA2DNA,
    fold_bn_eval,
)

"""Pallas TPU kernels, in increasing fusion order:

* `fused_vae` — eval-mode encode→fuse→sample→decode in one on-chip matmul
  chain (both imputation directions);
* `fused_loss` — loss+backward custom-VJP kernel;
* `fused_train` / `fused_train_multimodal` — one TRAIN step (forward + every
  parameter gradient + BN stats) per kernel, for the two directional VAEs and
  the tri-modal MultiModalVAE;
* `fused_epoch` / `fused_epoch_multimodal` — whole-EPOCH megakernels: every
  AdamW step of an epoch in ONE kernel, params + moments VMEM-resident.
"""

from vae_los_angeles_tpu.ops.pallas.fused_epoch import (  # noqa: F401
    dna2rna_fused_epoch,
    rna2dna_fused_epoch,
)
from vae_los_angeles_tpu.ops.pallas.fused_epoch_multimodal import (  # noqa: F401
    multimodal_fused_epoch,
)
from vae_los_angeles_tpu.ops.pallas.fused_loss import rna2dna_loss_fused  # noqa: F401
from vae_los_angeles_tpu.ops.pallas.fused_train import (  # noqa: F401
    dna2rna_fused_train_step,
    rna2dna_fused_train_step,
)
from vae_los_angeles_tpu.ops.pallas.fused_train_multimodal import (  # noqa: F401
    multimodal_fused_train_step,
)
from vae_los_angeles_tpu.ops.pallas.fused_vae import (  # noqa: F401
    FusedDNA2RNA,
    FusedRNA2DNA,
    fold_bn_eval,
)

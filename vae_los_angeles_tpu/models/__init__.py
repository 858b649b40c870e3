"""Model families (mirrors the reference's ``src/models/__init__.py`` exports,
translated to the framework's init/apply convention)."""

from vae_los_angeles_tpu.models.conditioned_knn import (  # noqa: F401
    ConditionedKNeighborsRegressor,
)
from vae_los_angeles_tpu.models.directional_ae import (  # noqa: F401
    DirectionalAEOutput,
    dna2rna_ae_apply,
    dna2rna_ae_init,
    rna2dna_ae_apply,
    rna2dna_ae_init,
)
from vae_los_angeles_tpu.models.directional_vae import (  # noqa: F401
    DirectionalVAEOutput,
    dna2rna_vae_apply,
    dna2rna_vae_init,
    rna2dna_vae_apply,
    rna2dna_vae_init,
)
from vae_los_angeles_tpu.models.vae import (  # noqa: F401
    MultiModalVAEOutput,
    multimodal_vae_apply,
    multimodal_vae_init,
    reparameterize,
)

__all__ = [
    "ConditionedKNeighborsRegressor",
    "DirectionalAEOutput",
    "DirectionalVAEOutput",
    "MultiModalVAEOutput",
    "dna2rna_ae_apply",
    "dna2rna_ae_init",
    "dna2rna_vae_apply",
    "dna2rna_vae_init",
    "multimodal_vae_apply",
    "multimodal_vae_init",
    "reparameterize",
    "rna2dna_ae_apply",
    "rna2dna_ae_init",
    "rna2dna_vae_apply",
    "rna2dna_vae_init",
]

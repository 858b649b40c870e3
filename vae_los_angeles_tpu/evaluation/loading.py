"""Model loading for evaluation scripts.

Rebuilds models from the run-id + checkpoint protocol and wraps them in
callable objects with the reference's forward signatures, so every
evaluation/downstream script reads like its reference counterpart:

    model = load_rna2dna()           # via latest_rna2dna_run_id.txt
    recon, mu, logvar = model(rna=x, site=s)

Dims honor the same env overrides as the reference loaders
(reconstruct_unmatched.py:42-50: INPUT_DIM_A/B, LATENT_DIM).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vae_los_angeles_tpu.config import Config
from vae_los_angeles_tpu.models import (
    dna2rna_vae_apply,
    multimodal_vae_apply,
    rna2dna_vae_apply,
)
from vae_los_angeles_tpu.training import checkpoint


def _np(x):
    return np.asarray(jax.device_get(x))


def _serving_sharding():
    """Sample-axis NamedSharding over all visible devices, or None.

    Eval forwards are row-independent with replicated params, so on a
    multi-chip host every loaded-model call automatically serves its cohort
    sharded over the chips (float-identical to single-chip, zero
    collectives) — mirroring the CV/HPO CLIs' auto population sharding."""
    from jax.sharding import NamedSharding, PartitionSpec

    from vae_los_angeles_tpu.parallel.vmap_meta import population_mesh

    mesh = population_mesh()
    if mesh is None:
        return None
    return NamedSharding(mesh, PartitionSpec("data"))


def _constrain_rows(x, data_sharding):
    if x is None or data_sharding is None:
        return x
    return jax.lax.with_sharding_constraint(x, data_sharding)


def _place_weights(params, state, compute_dtype: str = "float32"):
    """Stage checkpoint weights onto device ONCE at load time (replicated on
    multi-chip hosts). The npz loader returns host numpy; without this every
    serving call in a cohort-imputation loop would re-transfer the full
    weight pytree.

    ``compute_dtype="bfloat16"`` applies the mixed-precision serving policy
    HERE, once: matmul operands (2-D leaves) are cast to bf16 before
    placement, halving their transfer AND their per-call HBM weight reads,
    while biases/BatchNorm state stay fp32 and ``linear_apply`` keeps fp32
    MXU accumulation (`ops.nn.cast_matmul_params`)."""
    from vae_los_angeles_tpu.ops import nn as ops_nn
    from vae_los_angeles_tpu.parallel.vmap_meta import population_mesh
    from vae_los_angeles_tpu.training.engine import replicate_for_serving

    params = ops_nn.cast_matmul_params(
        params, ops_nn.resolve_compute_dtype(compute_dtype)
    )
    mesh = population_mesh()
    if mesh is None:
        return jax.device_put((params, state))
    # single source of truth for the replicated serving layout — the same
    # placement engine.predict(mesh=...) detects and skips re-transferring
    return replicate_for_serving((params, state), mesh)


@functools.lru_cache(maxsize=None)
def _jitted_directional(apply_fn, input_kw: str, data_sharding):
    """One-dispatch eval forward (the eager per-op path costs a host↔device
    round-trip per primitive on remote-relay platforms). Cached per
    (model family, sharding); a None input (e.g. site-less imputation)
    simply traces its own specialization."""

    def fwd(params, state, key, x, site):
        out = apply_fn(
            params,
            state,
            key,
            site=_constrain_rows(site, data_sharding),
            train=False,
            **{input_kw: _constrain_rows(x, data_sharding)},
        )
        return out.recon, out.mu, out.logvar

    return jax.jit(fwd)


@functools.lru_cache(maxsize=None)
def _jitted_multimodal(data_sharding):
    def fwd(params, state, key, a, b, site):
        out = multimodal_vae_apply(
            params,
            state,
            key,
            a=_constrain_rows(a, data_sharding),
            b=_constrain_rows(b, data_sharding),
            site=_constrain_rows(site, data_sharding),
            train=False,
        )
        return out.out_a, out.out_b, out.out_c, out.mu, out.logvar

    return jax.jit(fwd)


class LoadedDirectionalVAE:
    """Callable wrapper matching the reference's directional-VAE forward:
    returns (recon, mu, logvar) as numpy arrays.

    When ``use_pallas`` is set (Config.use_pallas / USE_PALLAS=1) both
    directions route through the fused Pallas kernels
    (`ops.pallas.fused_vae.FusedRNA2DNA` / `FusedDNA2RNA`)."""

    def __init__(self, apply_fn, input_kw: str, params, state, run_id=None,
                 use_pallas: bool = False, compute_dtype: str = "float32"):
        self._apply = apply_fn
        self._kw = input_kw  # "rna" or "dna"
        self._fused = None
        from vae_los_angeles_tpu.ops import nn as ops_nn

        if use_pallas and (
            ops_nn.resolve_compute_dtype(compute_dtype) != jnp.float32
        ):
            # same graceful downgrade as the training CLI: the fused Pallas
            # kernels are fp32 programs, so an explicit bf16 request serves
            # through the XLA path
            print(
                f"COMPUTE_DTYPE={compute_dtype}: serving via the XLA path "
                "(Pallas kernels are fp32 programs)"
            )
            use_pallas = False
        if use_pallas:
            from vae_los_angeles_tpu.ops.pallas.fused_vae import (
                FusedDNA2RNA,
                FusedRNA2DNA,
            )

            fused_cls = FusedRNA2DNA if input_kw == "rna" else FusedDNA2RNA
            self._fused = fused_cls(params, state)
        self.params, self.state = _place_weights(params, state, compute_dtype)
        self.run_id = run_id
        self._key = jax.random.PRNGKey(0)

    def __call__(self, site=None, key=None, **kwargs):
        x = kwargs.get(self._kw)
        if self._fused is not None and x is not None:
            # honor the caller's key exactly like the XLA path does: distinct
            # keys must give distinct in-kernel PRNG streams (multi-draw
            # stochastic imputation would otherwise return identical draws)
            k = key if key is not None else self._key
            seed = int(jax.random.randint(k, (), 0, 2**31 - 1))
            recon, mu, logvar = self._fused(
                np.asarray(x, np.float32),
                None if site is None else np.asarray(site),
                seed=seed,
            )
            return _np(recon), _np(mu), _np(logvar)
        fwd = _jitted_directional(self._apply, self._kw, _serving_sharding())
        recon, mu, logvar = fwd(
            self.params,
            self.state,
            key if key is not None else self._key,
            None if x is None else np.asarray(x, np.float32),
            None if site is None else np.asarray(site),
        )
        return _np(recon), _np(mu), _np(logvar)


class LoadedMultiModalVAE:
    """Callable wrapper matching MultiModalVAE.forward: returns
    (out_a, out_b, out_c, mu, logvar) as numpy arrays."""

    def __init__(self, params, state, run_id=None, compute_dtype: str = "float32"):
        self.params, self.state = _place_weights(params, state, compute_dtype)
        self.run_id = run_id
        self._key = jax.random.PRNGKey(0)

    def __call__(self, a=None, b=None, site=None, key=None):
        fwd = _jitted_multimodal(_serving_sharding())
        out_a, out_b, out_c, mu, logvar = fwd(
            self.params,
            self.state,
            key if key is not None else self._key,
            None if a is None else np.asarray(a, np.float32),
            None if b is None else np.asarray(b, np.float32),
            None if site is None else np.asarray(site),
        )
        return _np(out_a), _np(out_b), _np(out_c), _np(mu), _np(logvar)


def load_rna2dna(
    run_id: Optional[str] = None, cfg: Optional[Config] = None, root: str = "."
) -> Optional[LoadedDirectionalVAE]:
    cfg = cfg or Config.from_env()
    try:
        params, state, rid = checkpoint.load_best(
            "rna2dna", run_id, cfg.checkpoint_dir, root
        )
    except FileNotFoundError as e:
        print(f"Warning: {e}")
        return None
    print(f"✓ RNA2DNAVAE model loaded successfully (run {rid})")
    return LoadedDirectionalVAE(
        rna2dna_vae_apply, "rna", params, state, rid,
        use_pallas=cfg.use_pallas, compute_dtype=cfg.compute_dtype,
    )


def load_dna2rna(
    run_id: Optional[str] = None, cfg: Optional[Config] = None, root: str = "."
) -> Optional[LoadedDirectionalVAE]:
    cfg = cfg or Config.from_env()
    try:
        params, state, rid = checkpoint.load_best(
            "dna2rna", run_id, cfg.checkpoint_dir, root
        )
    except FileNotFoundError as e:
        print(f"Warning: {e}")
        return None
    print(f"✓ DNA2RNAVAE model loaded successfully (run {rid})")
    return LoadedDirectionalVAE(
        dna2rna_vae_apply, "dna", params, state, rid,
        use_pallas=cfg.use_pallas, compute_dtype=cfg.compute_dtype,
    )


def load_multimodal(
    run_id: Optional[str] = None, cfg: Optional[Config] = None, root: str = "."
) -> Optional[LoadedMultiModalVAE]:
    cfg = cfg or Config.from_env()
    try:
        params, state, rid = checkpoint.load_best(
            "multivae", run_id, cfg.checkpoint_dir, root
        )
    except FileNotFoundError as e:
        print(f"Warning: {e}")
        return None
    print(f"✓ MultiModalVAE model loaded successfully (run {rid})")
    return LoadedMultiModalVAE(params, state, rid, compute_dtype=cfg.compute_dtype)

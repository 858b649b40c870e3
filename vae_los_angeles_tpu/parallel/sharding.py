"""Multi-chip scaling: device mesh, sharding layouts, sharded train step.

The reference is strictly single-device (SURVEY §2.3: no DP/TP/PP/SP/EP, no
comms backend anywhere). The TPU-native replacement is declarative SPMD:
pick a ``jax.sharding.Mesh`` over ("data", "model") axes, annotate array
shardings with NamedSharding/PartitionSpec, and let XLA's GSPMD partitioner
insert the ICI collectives (psum for gradient reduction across "data",
all-gather/reduce-scatter around the "model"-sharded matmuls).

Layout policy for this model family:
  * batch axis of every modality array → "data" (pure data parallelism);
  * the wide hidden layers — EncoderB's in→512 / 512→256 and DecoderB's
    256→512 / 512→out matmuls, the largest weights at ~dim_b×512 — are
    column/row-sharded over "model" (tensor parallelism), alternating
    column-then-row so consecutive layers need only one psum at the block
    boundary (Megatron-style, expressed purely as PartitionSpecs);
  * everything small (latent heads, embeddings, BN params) is replicated.

At the reference's default scale a single v5e chip is already far from
saturated, so the mesh defaults to data-parallel-only; the "model" axis
exists for wide-configuration runs and is exercised by the multi-chip
dry-run (`__graft_entry__.dryrun_multichip`).
"""

from __future__ import annotations

import functools

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vae_los_angeles_tpu.data.dataset import MultiModalArrays
from vae_los_angeles_tpu.ops import optim
from vae_los_angeles_tpu.training.tasks import TASKS


def make_mesh(n_devices=None, model_parallel: int = 1, devices=None) -> Mesh:
    """Mesh over ("data", "model"). model_parallel must divide n_devices."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    n = len(devices)
    if n % model_parallel:
        raise ValueError(f"model_parallel={model_parallel} must divide {n} devices")
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, axis_names=("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-axis sharding for (n, features) and (n,) arrays."""
    return NamedSharding(mesh, P("data"))


def shard_arrays(arrays: MultiModalArrays, mesh: Mesh) -> MultiModalArrays:
    s = data_sharding(mesh)
    return MultiModalArrays(
        tpm=jax.device_put(arrays.tpm, s),
        beta=jax.device_put(arrays.beta, s),
        site=jax.device_put(arrays.site, s),
    )


# Wide layers worth tensor-sharding, keyed by (module, layer): True = shard
# the OUTPUT dim (column parallel), False = shard the INPUT dim (row
# parallel). Pairs are arranged column→row so activations only need a psum
# at the pair boundary.
_COL = True
_ROW = False
_TP_LAYERS = {
    ("encoder_b", "fc1"): _COL,  # dim_b → 512, shard 512
    ("encoder_b", "fc2"): _ROW,  # 512 → 256, shard 512 (contraction)
    ("encoder_dna", "fc1"): _COL,
    ("encoder_dna", "fc2"): _ROW,
    ("enc_fc1",): _COL,  # DNA2RNAAE encoder
    ("enc_fc2",): _ROW,
    ("decoder_b", "fc2"): _COL,  # 256 → 512, shard 512
    ("decoder_b", "fc3"): _ROW,  # 512 → dim_b, shard 512 (contraction)
    ("decoder_dna", "fc2"): _COL,
    ("decoder_dna", "fc3"): _ROW,
}


def param_specs(params) -> dict:
    """PartitionSpec tree for a model's parameter pytree.

    Tensor-shards the wide 512-unit layers over "model"; replicates the rest.
    BN params tied to column-sharded activations stay replicated (cheap, and
    BN reduces over batch, not features). A suffix match alone is not enough:
    RNA2DNAAE's narrow rna→128→latent encoder reuses the ``enc_fc1``/
    ``enc_fc2`` names of DNA2RNAAE's 512-wide encoder, so the sharded
    dimension must also be ≥512 wide — sharding a 128/latent-dim tensor over
    "model" would add collectives around tiny matmuls (and uneven padding).
    """

    def walk(tree, path):
        if isinstance(tree, dict) and "w" in tree and "b" in tree:
            for tp_path, col in _TP_LAYERS.items():
                if path[-len(tp_path) :] == tp_path:
                    sharded_width = tree["w"].shape[1 if col else 0]
                    if sharded_width < 512:
                        break  # narrow layer with a colliding name: replicate
                    if col:
                        return {"w": P(None, "model"), "b": P("model")}
                    # P("model"), not P("model", None): GSPMD canonicalizes
                    # trailing Nones away, and a spec mismatch between the
                    # hand-placed inputs and the step's outputs forces a
                    # needless recompile on the second step.
                    return {"w": P("model"), "b": P()}
            return {"w": P(), "b": P()}
        if isinstance(tree, dict):
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        return P()

    return walk(params, ())


def shard_params(params, mesh: Mesh):
    specs = param_specs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params,
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )


@functools.lru_cache(maxsize=None)
def build_sharded_train_step(task_name: str, compute_dtype: str = "float32",
                             optimizer: str = "adamw", donate: bool = False):
    """One fused forward+backward+AdamW step, jittable over a mesh.

    All sharding is carried by the committed input arrays; GSPMD propagates
    it through the gradient computation and inserts the psum over "data" for
    gradient reduction plus the TP collectives around "model"-sharded
    matmuls.

    ``compute_dtype="bfloat16"`` applies the same mixed-precision policy as
    the single-chip engine: matmul operands cast to bf16 INSIDE the
    differentiated loss (sharding propagates through the cast unchanged),
    fp32 accumulation, fp32 masters/AdamW — the natural pairing for the wide
    TP regime this step exists for.
    """
    from vae_los_angeles_tpu.ops import nn as ops_nn

    task = TASKS[task_name]
    fwd_dtype = ops_nn.resolve_compute_dtype(compute_dtype)
    if optimizer not in optim.OPTIMIZERS:
        raise ValueError(
            f"unsupported optimizer {optimizer!r}; "
            f"valid: {sorted(optim.OPTIMIZERS)}"
        )
    _, opt_update = optim.OPTIMIZERS[optimizer]
    expected_slots = {"adamw": {"step", "m", "v"},
                      "adafactor": {"step", "vr", "vc"}}[optimizer]

    def loss_fn(params, state, key, batch, beta_kl, gamma, class_weights):
        fwd_params = ops_nn.cast_matmul_params(params, fwd_dtype)
        return task.loss(
            fwd_params, state, key, batch, beta_kl, gamma, class_weights, True
        )

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    # donate=True aliases params/state/opt into their updated outputs —
    # in-place updates instead of double-buffering, halving peak HBM for the
    # multi-GB wide-regime state. Opt-in because donated inputs become
    # invalid after the call (callers that reuse pre-step state must not).
    @functools.partial(jax.jit, donate_argnums=(0, 1, 2) if donate else ())
    def train_step(params, state, opt, batch, key, lr, weight_decay, beta_kl,
                   gamma, class_weights=None):
        if set(opt) != expected_slots:
            # trace-time check: a state built under a DIFFERENT
            # Config.optimizer than this step would otherwise die as an
            # opaque KeyError deep in tracing
            raise ValueError(
                f"optimizer state slots {sorted(opt)} don't match "
                f"{optimizer!r} (expected {sorted(expected_slots)}) — build "
                "the state and the step from the same Config.optimizer"
            )
        (loss, new_state), grads = grad_fn(
            params, state, key, batch, beta_kl, gamma, class_weights
        )
        params, opt = opt_update(params, grads, opt, lr, weight_decay)
        return params, new_state, opt, loss

    return train_step


def sharded_train_step(task_name: str, compute_dtype: str = "float32",
                       optimizer: str = "adamw", donate: bool = False):
    return build_sharded_train_step(task_name, compute_dtype, optimizer, donate)


def make_sharded_train_state(task_name: str, cfg, n_sites: int, mesh: Mesh, key):
    """Initialize params/BN/opt state laid out on the mesh.

    ``cfg.moments_dtype="bfloat16"`` stores AdamW m/v reduced — the moment
    shards inherit the param shardings either way (zeros created per leaf)."""
    from vae_los_angeles_tpu.ops import nn as ops_nn

    task = TASKS[task_name]
    params, state = task.init(key, cfg, n_sites)
    params = shard_params(params, mesh)
    replicated = NamedSharding(mesh, P())
    state = jax.tree.map(lambda x: jax.device_put(x, replicated), state)
    opt_init, _ = optim.OPTIMIZERS[getattr(cfg, "optimizer", "adamw")]
    opt = opt_init(
        params, ops_nn.resolve_compute_dtype(getattr(cfg, "moments_dtype", None))
    )
    # AdamW m/v inherit the param shardings via zeros_like; everything else
    # (the step counter, Adafactor's small factored row/col statistics) is
    # host-created and must be committed to the mesh, or the step's output
    # sharding won't match its input on call 2.
    opt = jax.tree.map(
        lambda x: x if isinstance(x.sharding, NamedSharding)
        else jax.device_put(x, replicated),
        opt,
    )
    return params, state, opt

"""Pure-functional NN primitives with PyTorch-parity initialization/semantics.

These are the building blocks for every model in the framework. Each layer is
a pair of pure functions — ``*_init(key, ...) -> params`` and an apply fn —
operating on plain dict pytrees, which makes them trivially composable with
``jit`` / ``grad`` / ``vmap`` (vmapped CV folds and HPO trial populations
carry independent parameter AND BatchNorm-state pytrees).

Initialization matches torch defaults so that optimization trajectories land
in the same quality basin as the reference (BASELINE.json requires Pearson-r
parity within 0.01):
  * ``nn.Linear``: weight, bias ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in))
    (kaiming_uniform_(a=sqrt(5)) reduces to exactly this bound).
  * ``nn.Embedding``: N(0, 1).
  * ``nn.BatchNorm1d``: gamma=1, beta=0, running_mean=0, running_var=1,
    eps=1e-5, momentum=0.1; train-mode normalizes with biased batch variance
    but updates running_var with the UNBIASED estimate (torch semantics).
  * ``nn.Dropout(p)``: zero with prob p, scale kept activations by 1/(1-p).

All matmuls request ``preferred_element_type=float32`` so XLA keeps MXU
accumulation in fp32 regardless of input dtype.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Linear
# ---------------------------------------------------------------------------


def linear_init(key, in_dim: int, out_dim: int, dtype=jnp.float32):
    """Init a dense layer the way ``torch.nn.Linear`` does.

    Weight is stored as (in_dim, out_dim) — transposed vs torch — so the
    forward pass is a plain ``x @ w`` that maps directly onto the MXU with the
    contraction over the lane dimension.
    """
    wkey, bkey = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(jnp.asarray(in_dim, dtype=jnp.float32))
    w = jax.random.uniform(wkey, (in_dim, out_dim), dtype, -bound, bound)
    b = jax.random.uniform(bkey, (out_dim,), dtype, -bound, bound)
    return {"w": w, "b": b}


def linear_apply(params, x):
    """``x @ w + b``, following the WEIGHT's dtype into the MXU.

    When the weight arrives in a reduced precision (the mixed-precision
    policy casts 2-D matmul operands to bfloat16 — see
    ``cast_matmul_params``), the activation is cast to match so the dot
    lowers to a native bf16×bf16 MXU pass instead of a multi-pass fp32
    emulation. Accumulation is always requested in fp32
    (``preferred_element_type``) and the fp32 bias promotes the output back
    to fp32, so everything OUTSIDE the dot — BatchNorm statistics, losses,
    optimizer state — stays full precision.
    """
    w = params["w"]
    if x.dtype != w.dtype:
        x = x.astype(w.dtype)
    return jnp.dot(x, w, preferred_element_type=jnp.float32) + params["b"]


def resolve_compute_dtype(compute_dtype):
    """Map a ``Config.compute_dtype`` string to a jnp dtype, failing loudly."""
    if compute_dtype in ("float32", "fp32", None):
        return jnp.float32
    if compute_dtype in ("bfloat16", "bf16"):
        return jnp.bfloat16
    raise ValueError(
        f"unsupported compute_dtype {compute_dtype!r}; "
        "valid: 'float32' (default), 'bfloat16'"
    )


def cast_matmul_params(params, dtype):
    """Cast every matmul operand (2-D leaf: Linear weights, Embedding
    tables) of a params pytree to ``dtype``, leaving 1-D leaves (biases,
    BatchNorm gamma/beta) in fp32.

    This is the mixed-precision policy's forward-cast: master parameters and
    the optimizer sweep stay fp32 (full AdamW fidelity), and the cast happens
    INSIDE the differentiated loss, so gradients flow back through the
    ``convert_element_type`` transpose as fp32. Returns ``params`` unchanged
    when ``dtype`` is fp32 (identity for the default policy)."""
    if dtype == jnp.float32:
        return params
    return jax.tree.map(
        lambda p: p.astype(dtype) if getattr(p, "ndim", 0) == 2 else p, params
    )


# ---------------------------------------------------------------------------
# Embedding
# ---------------------------------------------------------------------------


def embedding_init(key, num_embeddings: int, embed_dim: int, dtype=jnp.float32):
    """``torch.nn.Embedding`` default init: N(0, 1)."""
    return {"table": jax.random.normal(key, (num_embeddings, embed_dim), dtype)}


def embedding_apply(params, idx):
    return jnp.take(params["table"], idx, axis=0)


# ---------------------------------------------------------------------------
# BatchNorm1d
# ---------------------------------------------------------------------------

BN_EPS = 1e-5
BN_MOMENTUM = 0.1


def batchnorm_init(dim: int, dtype=jnp.float32):
    """Returns (params, state): learnable scale/shift and running stats."""
    params = {"gamma": jnp.ones((dim,), dtype), "beta": jnp.zeros((dim,), dtype)}
    state = {"mean": jnp.zeros((dim,), dtype), "var": jnp.ones((dim,), dtype)}
    return params, state


def batchnorm_apply(params, state, x, *, train: bool, row_mask=None):
    """BatchNorm1d forward.

    Returns (y, new_state). In eval mode state passes through unchanged.
    ``train`` must be a static Python bool (it selects the traced graph).

    ``row_mask``: optional (n,) bool — train-mode batch statistics are
    computed over the True rows only (biased norm var, unbiased running var
    over the DYNAMIC valid count), the hook the masked fold populations use
    to train on row-padded batches (parallel/vmap_meta masked mode). Pad
    rows still flow through the normalization (their outputs are discarded
    by the callers' loss masking); ``where``-zeroing keeps NaN padding
    inert. Callers guarantee ≥2 valid rows per active batch (torch raises
    on n==1; the masked engine fail-louds host-side where sizes are known).
    Ignored in eval mode (running stats are rowwise).
    """
    if train:
        if row_mask is not None:
            n = x.shape[0]
            # Row 0 is treated as always-valid: an ALL-masked batch (an
            # inactive trailing batch of a short fold — its stats are gated
            # away by the caller) would otherwise produce NaN through
            # jnp.var's 0-count guard and crash healthy runs under
            # jax_debug_nans. The engine's active batches are valid-prefix
            # batches, so OR-ing row 0 in is an identity for every batch
            # whose statistics are actually used.
            safe = row_mask | (jnp.arange(n) == 0)
            m = safe[:, None]
            # jnp.mean/var(where=...): the same formulas as the unmasked
            # branch restricted to the valid rows. With an all-ones mask
            # the values agree with the unmasked branch to reduction-order
            # ULPs (bitwise equality across two DIFFERENT compiled programs
            # is at XLA fusion's mercy — the pinned contracts are
            # vmapped ≡ sequential-masked and padding inertness instead;
            # see tests/test_masked_populations.py)
            mean = jnp.mean(x, axis=0, where=m)
            var = jnp.var(x, axis=0, where=m)  # biased, over valid rows
            n_valid = jnp.sum(row_mask.astype(jnp.float32))
            unbiased = var * (n_valid / jnp.maximum(n_valid - 1.0, 1.0))
        else:
            n = x.shape[0]
            if n <= 1:
                # torch raises "Expected more than 1 value per channel when
                # training" — a batch of 1 would normalize to all-zeros and
                # drag the running var toward 0; fail loudly like the
                # reference
                raise ValueError(
                    f"train-mode BatchNorm requires batch size > 1, got {n}"
                )
            mean = jnp.mean(x, axis=0)
            var = jnp.var(x, axis=0)  # biased — used for normalization
            unbiased = var * (n / (n - 1))
        new_state = {
            "mean": (1.0 - BN_MOMENTUM) * state["mean"] + BN_MOMENTUM * mean,
            "var": (1.0 - BN_MOMENTUM) * state["var"] + BN_MOMENTUM * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    inv = jax.lax.rsqrt(var + BN_EPS)
    y = (x - mean) * inv * params["gamma"] + params["beta"]
    return y, new_state


# ---------------------------------------------------------------------------
# Dropout
# ---------------------------------------------------------------------------


def dropout_apply(key, x, rate: float, *, train: bool):
    """Inverted dropout matching ``torch.nn.Dropout``. No-op in eval mode."""
    if not train or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


# ---------------------------------------------------------------------------
# Activations (thin wrappers so model code reads uniformly)
# ---------------------------------------------------------------------------


def relu(x):
    return jnp.maximum(x, 0.0)


def sigmoid(x):
    return jax.nn.sigmoid(x)

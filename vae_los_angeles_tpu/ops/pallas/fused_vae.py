"""Fused Pallas inference kernels for the directional VAEs.

The BASELINE.json north star: each encode → mean-fuse → sample → decode pass
runs as a SINGLE on-chip kernel — the full matmul chain stays in VMEM (the
largest weight, dim_b×512 fp32 ≈ 2.5 MB, fits comfortably in the ~16 MB
budget alongside the activations), with Gaussian sampling generated in-kernel
from the TPU PRNG via Box–Muller, so nothing round-trips to HBM between
layers.

Algebraic prep done host-side once per loaded model (`fold_bn_eval`):
eval-mode BatchNorm is affine, so it folds into the preceding Linear
(W' = W·s, b' = (b−μ)·s + β with s = γ/√(σ²+ε)); the site Embedding lookup
becomes a one-hot matmul (24×32 table — MXU-trivial) so the kernel is a pure
chain of dots + VPU elementwise ops.

Numerics: identical to the XLA path except the Gaussian draw (TPU PRNG +
Box–Muller vs threefry normal) — the deterministic path (eps supplied or
zero) matches the unfused `rna2dna_vae_apply` to fp32 tolerance; tests
verify both paths (`tests/test_pallas.py`). Kernels run in interpreter mode
automatically off-TPU so the same tests run in CPU CI.

Performance note (measured, benchmarks/bench_inference.py): for EVAL-mode
forward these kernels are on par with XLA (±15% across batch 32-4096) — XLA
fuses the small eval chain optimally on its own. They earn their keep as the
building blocks of the fused TRAIN kernels (`fused_train*.py`,
`fused_epoch*.py`), where fusing the backward and the optimizer state is a
6-16× win the compiler does not find.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vae_los_angeles_tpu.ops.nn import BN_EPS


def _interpret():
    """Off-TPU, run under the TPU interpreter (implements pltpu primitives
    like prng_seed that the generic interpreter lacks)."""
    if jax.default_backend() == "tpu":
        return False
    return pltpu.InterpretParams()


def scoped_vmem_limit():
    """Scoped-VMEM cap for the whole-epoch megakernels.

    The default 16 MB scoped cap OOMs past batch ~128 (state ~11 MB +
    batch-scaled activations), so on v4/v5e+ the kernels request 100 MB —
    well inside those chips' 64-128 MiB physical VMEM. TPU v2/v3 only HAVE
    16 MiB/core, so requesting more than the hardware capacity there would
    fail kernel compile outright; keep the compiler default (None), which
    still fits the reference batch-32 recipe on those chips."""
    if jax.default_backend() != "tpu":
        return 100 * 1024 * 1024  # interpret mode: value is inert
    kind = jax.devices()[0].device_kind
    if any(g in kind for g in ("v2", "v3")):
        return None
    return 100 * 1024 * 1024


def fold_bn_eval(linear, bn_params, bn_state):
    """Fold eval-mode BN into the preceding linear: returns (W', b')."""
    s = bn_params["gamma"] / jnp.sqrt(bn_state["var"] + BN_EPS)
    w = linear["w"] * s[None, :]
    b = (linear["b"] - bn_state["mean"]) * s + bn_params["beta"]
    return w, b


def _uniform_from_bits(bits):
    """uint32 → float32 uniform in (0, 1] without an integer→float cast
    (Mosaic has no uint32→f32 convert): pack the top 23 random bits into the
    mantissa of a float in [1, 2), subtract from 2 → (0, 1]."""
    mant = jnp.bitwise_or(
        jnp.right_shift(bits, jnp.uint32(9)), jnp.uint32(0x3F800000)
    )
    return 2.0 - pltpu.bitcast(mant, jnp.float32)


def _box_muller(shape):
    """Standard-normal draws from the seeded in-kernel PRNG."""
    u1 = _uniform_from_bits(pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32))
    u2 = _uniform_from_bits(pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32))
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos(2.0 * np.pi * u2)


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _make_rna2dna_kernel(has_site: bool, use_noise: bool):
    """Build the kernel specialized at trace time: ``has_site``/``use_noise``
    are jit-static in the callers, so each combination is a separate compile
    anyway — a Python-level branch drops the dead site matmuls and the
    PRNG/Box–Muller transcendentals from the deterministic parity path
    instead of computing noise just to multiply it by zero."""

    def kernel(
        seed_ref,  # SMEM (1,) (unread when use_noise=False)
        x_ref,  # (B, Da) RNA
        onehot_ref,  # (B, S) site one-hot (unread when has_site=False)
        w1_ref, b1_ref,  # Da→128 with BN folded
        wmu_ref, bmu_ref, wlv_ref, blv_ref,  # 128→L heads
        emb_ref,  # (S, E) site embedding table
        smu_w_ref, smu_b_ref, slv_w_ref, slv_b_ref,  # E→L site heads
        d1w_ref, d1b_ref, d2w_ref, d2b_ref, d3w_ref, d3b_ref,  # decoder
        recon_ref, mu_ref, logvar_ref,  # outputs
    ):
        # EncoderA with folded BN: h = relu(x @ W1' + b1')
        h = jnp.maximum(_dot(x_ref[:], w1_ref[:]) + b1_ref[:], 0.0)
        mu = _dot(h, wmu_ref[:]) + bmu_ref[:]
        logvar = _dot(h, wlv_ref[:]) + blv_ref[:]

        # EncoderC via one-hot matmul; arithmetic-mean posterior fusion
        if has_site:
            emb = _dot(onehot_ref[:], emb_ref[:])
            mu_s = _dot(emb, smu_w_ref[:]) + smu_b_ref[:]
            lv_s = _dot(emb, slv_w_ref[:]) + slv_b_ref[:]
            mu_ref[:] = 0.5 * (mu + mu_s)
            logvar_ref[:] = 0.5 * (logvar + lv_s)
        else:
            mu_ref[:] = mu
            logvar_ref[:] = logvar

        if use_noise:
            # Reparameterize in-kernel (Box–Muller from the TPU PRNG)
            pltpu.prng_seed(seed_ref[0])
            eps = _box_muller(mu_ref.shape)
            z = mu_ref[:] + eps * jnp.exp(0.5 * logvar_ref[:])
        else:
            z = mu_ref[:]  # deterministic parity path

        # DecoderB chain with sigmoid epilogue
        h1 = jnp.maximum(_dot(z, d1w_ref[:]) + d1b_ref[:], 0.0)
        h2 = jnp.maximum(_dot(h1, d2w_ref[:]) + d2b_ref[:], 0.0)
        recon_ref[:] = jax.nn.sigmoid(_dot(h2, d3w_ref[:]) + d3b_ref[:])

    return kernel


@functools.partial(jax.jit, static_argnames=("has_site", "use_noise"))
def _rna2dna_call(folded, rna, onehot, seed, has_site: bool, use_noise: bool):
    batch, _ = rna.shape
    latent = folded["wmu"].shape[1]
    dna_dim = folded["d3w"].shape[1]
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _make_rna2dna_kernel(has_site, use_noise),
        out_shape=(
            jax.ShapeDtypeStruct((batch, dna_dim), jnp.float32),
            jax.ShapeDtypeStruct((batch, latent), jnp.float32),
            jax.ShapeDtypeStruct((batch, latent), jnp.float32),
        ),
        in_specs=[smem(), vmem(), vmem()] + [vmem()] * 17,
        out_specs=(vmem(), vmem(), vmem()),
        interpret=_interpret(),
    )(
        jnp.asarray([seed], jnp.int32),
        rna,
        onehot,
        folded["w1"], folded["b1"],
        folded["wmu"], folded["bmu"], folded["wlv"], folded["blv"],
        folded["emb"], folded["smu_w"], folded["smu_b"],
        folded["slv_w"], folded["slv_b"],
        folded["d1w"], folded["d1b"], folded["d2w"], folded["d2b"],
        folded["d3w"], folded["d3b"],
    )
    return out


def _make_dna2rna_kernel(has_site: bool, use_noise: bool):
    """Trace-time-specialized kernel builder (see _make_rna2dna_kernel)."""

    def kernel(
        seed_ref,  # SMEM (1,) (unread when use_noise=False)
        x_ref,  # (B, Db) DNA
        onehot_ref,  # (B, S) (unread when has_site=False)
        w1_ref, b1_ref,  # Db→512 with BN1 folded
        w2_ref, b2_ref,  # 512→256 with BN2 folded
        wmu_ref, bmu_ref, wlv_ref, blv_ref,  # 256→L heads
        emb_ref, smu_w_ref, smu_b_ref, slv_w_ref, slv_b_ref,  # site path
        d1w_ref, d1b_ref, d2w_ref, d2b_ref,  # DecoderA: L→128→Da (linear)
        recon_ref, mu_ref, logvar_ref,
    ):
        # EncoderB: two BN-folded blocks
        h = jnp.maximum(_dot(x_ref[:], w1_ref[:]) + b1_ref[:], 0.0)
        h = jnp.maximum(_dot(h, w2_ref[:]) + b2_ref[:], 0.0)
        mu = _dot(h, wmu_ref[:]) + bmu_ref[:]
        logvar = _dot(h, wlv_ref[:]) + blv_ref[:]

        if has_site:
            emb = _dot(onehot_ref[:], emb_ref[:])
            mu_s = _dot(emb, smu_w_ref[:]) + smu_b_ref[:]
            lv_s = _dot(emb, slv_w_ref[:]) + slv_b_ref[:]
            mu_ref[:] = 0.5 * (mu + mu_s)
            logvar_ref[:] = 0.5 * (logvar + lv_s)
        else:
            mu_ref[:] = mu
            logvar_ref[:] = logvar

        if use_noise:
            pltpu.prng_seed(seed_ref[0])
            eps = _box_muller(mu_ref.shape)
            z = mu_ref[:] + eps * jnp.exp(0.5 * logvar_ref[:])
        else:
            z = mu_ref[:]

        # DecoderA: linear output head (RNA expression)
        h1 = jnp.maximum(_dot(z, d1w_ref[:]) + d1b_ref[:], 0.0)
        recon_ref[:] = _dot(h1, d2w_ref[:]) + d2b_ref[:]

    return kernel


@functools.partial(jax.jit, static_argnames=("has_site", "use_noise"))
def _dna2rna_call(folded, dna, onehot, seed, has_site: bool, use_noise: bool):
    batch, _ = dna.shape
    latent = folded["wmu"].shape[1]
    rna_dim = folded["d2w"].shape[1]
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _make_dna2rna_kernel(has_site, use_noise),
        out_shape=(
            jax.ShapeDtypeStruct((batch, rna_dim), jnp.float32),
            jax.ShapeDtypeStruct((batch, latent), jnp.float32),
            jax.ShapeDtypeStruct((batch, latent), jnp.float32),
        ),
        in_specs=[smem(), vmem(), vmem()] + [vmem()] * 17,
        out_specs=(vmem(), vmem(), vmem()),
        interpret=_interpret(),
    )(
        jnp.asarray([seed], jnp.int32),
        dna,
        onehot,
        folded["w1"], folded["b1"], folded["w2"], folded["b2"],
        folded["wmu"], folded["bmu"], folded["wlv"], folded["blv"],
        folded["emb"], folded["smu_w"], folded["smu_b"],
        folded["slv_w"], folded["slv_b"],
        folded["d1w"], folded["d1b"], folded["d2w"], folded["d2b"],
    )


class FusedDNA2RNA:
    """Fused-inference wrapper over trained DNA2RNAVAE params; mirrors
    `dna2rna_vae_apply` eval mode."""

    def __init__(self, params, state):
        w1, b1 = fold_bn_eval(
            {"w": params["encoder_dna"]["fc1"]["w"], "b": params["encoder_dna"]["fc1"]["b"]},
            params["encoder_dna"]["bn1"],
            state["encoder_dna"]["bn1"],
        )
        w2, b2 = fold_bn_eval(
            {"w": params["encoder_dna"]["fc2"]["w"], "b": params["encoder_dna"]["fc2"]["b"]},
            params["encoder_dna"]["bn2"],
            state["encoder_dna"]["bn2"],
        )
        self.folded = {
            "w1": w1, "b1": b1, "w2": w2, "b2": b2,
            "wmu": params["encoder_dna"]["mu"]["w"],
            "bmu": params["encoder_dna"]["mu"]["b"],
            "wlv": params["encoder_dna"]["logvar"]["w"],
            "blv": params["encoder_dna"]["logvar"]["b"],
            "emb": params["encoder_site"]["embedding"]["table"],
            "smu_w": params["encoder_site"]["mu"]["w"],
            "smu_b": params["encoder_site"]["mu"]["b"],
            "slv_w": params["encoder_site"]["logvar"]["w"],
            "slv_b": params["encoder_site"]["logvar"]["b"],
            "d1w": params["decoder_rna"]["fc1"]["w"],
            "d1b": params["decoder_rna"]["fc1"]["b"],
            "d2w": params["decoder_rna"]["fc2"]["w"],
            "d2b": params["decoder_rna"]["fc2"]["b"],
        }
        self.n_sites = self.folded["emb"].shape[0]

    def __call__(self, dna, site: Optional[jnp.ndarray] = None, seed: int = 0,
                 use_noise: bool = True):
        dna = jnp.asarray(dna, jnp.float32)
        if site is not None:
            onehot = jax.nn.one_hot(jnp.asarray(site), self.n_sites, dtype=jnp.float32)
            has_site = True
        else:
            onehot = jnp.zeros((dna.shape[0], self.n_sites), jnp.float32)
            has_site = False
        return _dna2rna_call(self.folded, dna, onehot, seed, has_site, use_noise)


class FusedRNA2DNA:
    """Fused-inference wrapper over trained RNA2DNAVAE params.

    Call signature mirrors `rna2dna_vae_apply` eval mode:
    ``recon, mu, logvar = fused(rna=..., site=...)``.
    """

    def __init__(self, params, state):
        w1, b1 = fold_bn_eval(
            params["encoder_rna"]["fc"],
            params["encoder_rna"]["bn"],
            state["encoder_rna"]["bn"],
        )
        self.folded = {
            "w1": w1,
            "b1": b1,
            "wmu": params["encoder_rna"]["mu"]["w"],
            "bmu": params["encoder_rna"]["mu"]["b"],
            "wlv": params["encoder_rna"]["logvar"]["w"],
            "blv": params["encoder_rna"]["logvar"]["b"],
            "emb": params["encoder_site"]["embedding"]["table"],
            "smu_w": params["encoder_site"]["mu"]["w"],
            "smu_b": params["encoder_site"]["mu"]["b"],
            "slv_w": params["encoder_site"]["logvar"]["w"],
            "slv_b": params["encoder_site"]["logvar"]["b"],
            "d1w": params["decoder_dna"]["fc1"]["w"],
            "d1b": params["decoder_dna"]["fc1"]["b"],
            "d2w": params["decoder_dna"]["fc2"]["w"],
            "d2b": params["decoder_dna"]["fc2"]["b"],
            "d3w": params["decoder_dna"]["fc3"]["w"],
            "d3b": params["decoder_dna"]["fc3"]["b"],
        }
        self.n_sites = self.folded["emb"].shape[0]

    def __call__(self, rna, site: Optional[jnp.ndarray] = None, seed: int = 0,
                 use_noise: bool = True):
        rna = jnp.asarray(rna, jnp.float32)
        if site is not None:
            onehot = jax.nn.one_hot(jnp.asarray(site), self.n_sites, dtype=jnp.float32)
            has_site = True
        else:
            onehot = jnp.zeros((rna.shape[0], self.n_sites), jnp.float32)
            has_site = False
        return _rna2dna_call(self.folded, rna, onehot, seed, has_site, use_noise)

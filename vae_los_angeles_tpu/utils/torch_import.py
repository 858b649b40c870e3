"""Import reference PyTorch checkpoints (``.pt`` state_dicts) as framework
param/state pytrees.

The reference trains and ships torch ``state_dict`` checkpoints
(``torch.save(model.state_dict(), 'checkpoints/best_<model>_<run_id>.pt')``,
train_rna2dna.py:231, optimize_hyperparameters.py:210) and every consumer
loads them by run-id (reconstruct_unmatched.py:66, downstream_task.py,
compare_directional_imputation.py:95). A user migrating to this framework
should not have to retrain: this module maps each reference architecture's
state_dict (key names from src/models/{encoders,decoders,directional_vae,
directional_ae,vae}.py) onto the corresponding init/apply pytree, so a
converted checkpoint drops into the same run-id protocol
(``training/checkpoint.save_best``) and serves identically.

Weight-layout conventions bridged here:
  * torch ``nn.Linear`` stores (out, in); ops/nn.py stores (in, out) so the
    forward is a lane-contraction ``x @ w`` — weights are transposed.
  * ``nn.BatchNorm1d`` weight/bias → gamma/beta params; running_mean/var →
    the separate BN state tree; ``num_batches_tracked`` has no equivalent
    (this framework's BN, like the reference's default momentum=0.1, never
    uses it) and is deliberately dropped.
  * ``nn.Embedding`` weight → ``{"table": ...}``.

Every other state_dict entry must be consumed — leftovers raise, so loading
a checkpoint under the wrong ``--model`` fails loudly instead of serving a
half-mapped model.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "convert_state_dict",
    "export_state_dict",
    "infer_model_type",
    "load_torch_state_dict",
    "MODEL_TYPES",
]


def infer_model_type(path: str):
    """Model family from the reference's checkpoint naming
    (``best_<model>_<run_id>.pt``, train_rna2dna.py:228-231), else None."""
    import os
    import re

    base = os.path.basename(path)
    # longest names first so best_rna2dna_ae_* does not match rna2dna
    for name in sorted(MODEL_TYPES, key=len, reverse=True):
        if re.match(rf"(best_)?{name}([_.]|$)", base):
            return name
    return None


def load_torch_state_dict(path: str) -> dict:
    """Read a ``.pt`` state_dict as a {key: np.ndarray} dict.

    Uses ``weights_only=True`` so untrusted pickles cannot execute code
    (torch >= 2.0; the baked-in torch supports it). Container checkpoints
    of the common ``{"state_dict": ..., "epoch": ...}`` shape are
    unwrapped; anything else non-tensor-valued gets a diagnostic error
    instead of an AttributeError deep in the conversion."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    for wrapper in ("state_dict", "model_state_dict"):
        if isinstance(sd, dict) and isinstance(sd.get(wrapper), dict):
            sd = sd[wrapper]
            break
    if not isinstance(sd, dict) or not all(
        isinstance(v, torch.Tensor) for v in sd.values()
    ):
        raise ValueError(
            f"{path} did not contain a state_dict "
            f"(got {type(sd).__name__}"
            + (f" with keys {sorted(sd)[:6]}" if isinstance(sd, dict) else "")
            + "); reference checkpoints are saved via "
            "torch.save(model.state_dict())"
        )
    return {k: np.asarray(v.detach().cpu().numpy()) for k, v in sd.items()}


class _Consumer:
    """Tracks which state_dict keys were mapped; leftovers are an error."""

    def __init__(self, sd: dict):
        self.sd = dict(sd)

    def take(self, key: str) -> np.ndarray:
        try:
            return self.sd.pop(key)
        except KeyError:
            raise KeyError(
                f"state_dict is missing {key!r} — wrong --model for this "
                f"checkpoint? remaining keys: {sorted(self.sd)[:8]}..."
            ) from None

    def linear(self, prefix: str) -> dict:
        # torch (out, in) → ours (in, out)
        return {
            "w": np.ascontiguousarray(self.take(f"{prefix}.weight").T),
            "b": self.take(f"{prefix}.bias"),
        }

    def batchnorm(self, prefix: str):
        params = {
            "gamma": self.take(f"{prefix}.weight"),
            "beta": self.take(f"{prefix}.bias"),
        }
        state = {
            "mean": self.take(f"{prefix}.running_mean"),
            "var": self.take(f"{prefix}.running_var"),
        }
        # no equivalent (see module docstring); optional because eval-saved
        # state_dicts always have it but hand-built ones may not
        self.sd.pop(f"{prefix}.num_batches_tracked", None)
        return params, state

    def embedding(self, prefix: str) -> dict:
        return {"table": self.take(f"{prefix}.weight")}

    def finish(self):
        if self.sd:
            raise ValueError(
                "unconsumed state_dict keys (checkpoint does not match the "
                f"requested model architecture): {sorted(self.sd)}"
            )


# -- reference sub-module layouts (src/models/encoders.py / decoders.py) ----


def _encoder_a(c: _Consumer, p: str):
    """EncoderA: fc = Sequential(Linear, BN, ReLU, Dropout) + fc_mu/fc_logvar
    (encoders.py:10-24)."""
    bn_p, bn_s = c.batchnorm(f"{p}.fc.1")
    params = {
        "fc": c.linear(f"{p}.fc.0"),
        "bn": bn_p,
        "mu": c.linear(f"{p}.fc_mu"),
        "logvar": c.linear(f"{p}.fc_logvar"),
    }
    return params, {"bn": bn_s}


def _encoder_b(c: _Consumer, p: str):
    """EncoderB: Sequential(Linear, BN, ReLU, Dropout, Linear, BN, ReLU,
    Dropout) + fc_mu/fc_logvar (encoders.py:27-46)."""
    bn1_p, bn1_s = c.batchnorm(f"{p}.fc.1")
    bn2_p, bn2_s = c.batchnorm(f"{p}.fc.5")
    params = {
        "fc1": c.linear(f"{p}.fc.0"),
        "bn1": bn1_p,
        "fc2": c.linear(f"{p}.fc.4"),
        "bn2": bn2_p,
        "mu": c.linear(f"{p}.fc_mu"),
        "logvar": c.linear(f"{p}.fc_logvar"),
    }
    return params, {"bn1": bn1_s, "bn2": bn2_s}


def _encoder_c(c: _Consumer, p: str):
    """EncoderC: Embedding + fc_mu/fc_logvar (encoders.py:49-62)."""
    return {
        "embedding": c.embedding(f"{p}.embedding"),
        "mu": c.linear(f"{p}.fc_mu"),
        "logvar": c.linear(f"{p}.fc_logvar"),
    }


def _decoder_a(c: _Consumer, p: str):
    """DecoderA: Sequential(Linear, ReLU, Linear) (decoders.py:8-19)."""
    return {"fc1": c.linear(f"{p}.fc.0"), "fc2": c.linear(f"{p}.fc.2")}


def _decoder_b(c: _Consumer, p: str):
    """DecoderB: Sequential(Linear, ReLU, Linear, ReLU, Linear, Sigmoid)
    (decoders.py:22-37)."""
    return {
        "fc1": c.linear(f"{p}.fc.0"),
        "fc2": c.linear(f"{p}.fc.2"),
        "fc3": c.linear(f"{p}.fc.4"),
    }


def _decoder_c(c: _Consumer, p: str):
    """DecoderC: Sequential(Linear, ReLU, Linear) (decoders.py:40-51)."""
    return {"fc1": c.linear(f"{p}.fc.0"), "fc2": c.linear(f"{p}.fc.2")}


# -- whole-model layouts ----------------------------------------------------


def _rna2dna(c: _Consumer):
    """RNA2DNAVAE (directional_vae.py:12-24): matches rna2dna_vae_init."""
    enc_rna_p, enc_rna_s = _encoder_a(c, "encoder_rna")
    params = {
        "encoder_rna": enc_rna_p,
        "encoder_site": _encoder_c(c, "encoder_site"),
        "decoder_dna": _decoder_b(c, "decoder_dna"),
    }
    return params, {"encoder_rna": enc_rna_s}


def _dna2rna(c: _Consumer):
    """DNA2RNAVAE (directional_vae.py:63-75): matches dna2rna_vae_init."""
    enc_dna_p, enc_dna_s = _encoder_b(c, "encoder_dna")
    params = {
        "encoder_dna": enc_dna_p,
        "encoder_site": _encoder_c(c, "encoder_site"),
        "decoder_rna": _decoder_a(c, "decoder_rna"),
    }
    return params, {"encoder_dna": enc_dna_s}


def _rna2dna_ae(c: _Consumer):
    """RNA2DNAAE (directional_ae.py:10-35): encoder_rna is a bare Sequential
    (Linear, BN, ReLU, Dropout, Linear); matches rna2dna_ae_init."""
    bn_p, bn_s = c.batchnorm("encoder_rna.1")
    params = {
        "enc_fc1": c.linear("encoder_rna.0"),
        "enc_bn": bn_p,
        "enc_fc2": c.linear("encoder_rna.4"),
        "site_embedding": c.embedding("site_embedding"),
        "site_projection": c.linear("site_projection"),
        "decoder_dna": _decoder_b(c, "decoder_dna"),
    }
    return params, {"enc_bn": bn_s}


def _dna2rna_ae(c: _Consumer):
    """DNA2RNAAE (directional_ae.py:73-99): encoder_dna is a bare Sequential
    (Linear, BN, ReLU, Dropout, Linear, BN, ReLU, Dropout, Linear);
    matches dna2rna_ae_init."""
    bn1_p, bn1_s = c.batchnorm("encoder_dna.1")
    bn2_p, bn2_s = c.batchnorm("encoder_dna.5")
    params = {
        "enc_fc1": c.linear("encoder_dna.0"),
        "enc_bn1": bn1_p,
        "enc_fc2": c.linear("encoder_dna.4"),
        "enc_bn2": bn2_p,
        "enc_fc3": c.linear("encoder_dna.8"),
        "site_embedding": c.embedding("site_embedding"),
        "site_projection": c.linear("site_projection"),
        "decoder_rna": _decoder_a(c, "decoder_rna"),
    }
    return params, {"enc_bn1": bn1_s, "enc_bn2": bn2_s}


def _multivae(c: _Consumer):
    """MultiModalVAE (vae.py:29-35): matches multimodal_vae_init."""
    enc_a_p, enc_a_s = _encoder_a(c, "encoder_a")
    enc_b_p, enc_b_s = _encoder_b(c, "encoder_b")
    params = {
        "encoder_a": enc_a_p,
        "encoder_b": enc_b_p,
        "encoder_c": _encoder_c(c, "encoder_c"),
        "decoder_a": _decoder_a(c, "decoder_a"),
        "decoder_b": _decoder_b(c, "decoder_b"),
        "decoder_c": _decoder_c(c, "decoder_c"),
    }
    return params, {"encoder_a": enc_a_s, "encoder_b": enc_b_s}


MODEL_TYPES = {
    "rna2dna": _rna2dna,
    "dna2rna": _dna2rna,
    "rna2dna_ae": _rna2dna_ae,
    "dna2rna_ae": _dna2rna_ae,
    "multivae": _multivae,
}


class _SpecConsumer:
    """Stand-in consumer that records, instead of weights, WHERE each leaf of
    the framework pytree lives in the torch state_dict and which transform
    bridges the layouts — running a model builder with it yields the exact
    inverse mapping `export_state_dict` needs, so import and export can never
    drift apart (one builder defines both directions)."""

    def take(self, key):
        return ("raw", key)

    def linear(self, prefix):
        return {
            "w": ("transpose", f"{prefix}.weight"),
            "b": ("raw", f"{prefix}.bias"),
        }

    def batchnorm(self, prefix):
        params = {
            "gamma": ("raw", f"{prefix}.weight"),
            "beta": ("raw", f"{prefix}.bias"),
        }
        state = {
            "mean": ("raw", f"{prefix}.running_mean"),
            "var": ("raw", f"{prefix}.running_var"),
        }
        return params, state

    def embedding(self, prefix):
        return {"table": ("raw", f"{prefix}.weight")}


def export_state_dict(params, state, model_type: str) -> dict:
    """Inverse of ``convert_state_dict``: framework (params, state) pytrees →
    a reference-compatible torch state_dict ({key: np.ndarray}).

    The result loads into the reference's own model classes with the default
    strict=True (``num_batches_tracked`` buffers are emitted as zeros — the
    reference's BatchNorm1d(momentum=0.1) never reads them), so models
    trained HERE can be served and A/B'd by the unmodified reference
    consumers."""
    try:
        build = MODEL_TYPES[model_type]
    except KeyError:
        raise ValueError(
            f"unknown model type {model_type!r}; expected one of "
            f"{sorted(MODEL_TYPES)}"
        ) from None
    spec_p, spec_s = build(_SpecConsumer())
    sd = {}

    def emit(spec, tree, path):
        if isinstance(spec, tuple):
            kind, key = spec
            v = np.asarray(tree, np.float32)
            sd[key] = np.ascontiguousarray(v.T) if kind == "transpose" else v
            return
        for k, sub in spec.items():
            if not isinstance(tree, dict) or k not in tree:
                raise KeyError(
                    f"pytree is missing {'/'.join(path + (k,))!r} — wrong "
                    f"model_type {model_type!r} for this checkpoint?"
                )
            emit(sub, tree[k], path + (k,))

    emit(spec_p, params, ())
    emit(spec_s, state, ())
    for key in [k for k in sd if k.endswith(".running_mean")]:
        sd[key[: -len("running_mean")] + "num_batches_tracked"] = np.asarray(
            0, np.int64
        )
    return sd


def convert_state_dict(sd: dict, model_type: str):
    """Map a reference torch state_dict onto this framework's (params, state).

    ``sd`` is {key: np.ndarray} (see ``load_torch_state_dict``);
    ``model_type`` is one of ``MODEL_TYPES`` (the reference's checkpoint
    basename prefixes: best_rna2dna_*, best_dna2rna_*, best_multivae_*)."""
    try:
        build = MODEL_TYPES[model_type]
    except KeyError:
        raise ValueError(
            f"unknown model type {model_type!r}; expected one of "
            f"{sorted(MODEL_TYPES)}"
        ) from None
    c = _Consumer({k: np.asarray(v, np.float32) for k, v in sd.items()})
    params, state = build(c)
    c.finish()
    return params, state


# -- CLI entry points (scripts/{import,export}_torch_checkpoint.py delegate
# here, and the wheel exposes them as vla-import/export-checkpoint) ---------


def import_main(argv=None):
    """``.pt`` → ``.npz``; see scripts/import_torch_checkpoint.py."""
    import argparse
    import os
    import re

    from vae_los_angeles_tpu.config import Config
    from vae_los_angeles_tpu.training import checkpoint

    ap = argparse.ArgumentParser(
        description="Convert a reference torch checkpoint (.pt state_dict) "
                    "to this framework's .npz format"
    )
    ap.add_argument("pt_path", help="reference .pt state_dict checkpoint")
    ap.add_argument("--model", choices=sorted(MODEL_TYPES), default=None,
                    help="architecture (default: inferred from the filename)")
    ap.add_argument("--out", default=None,
                    help="output .npz (default: the input path with .npz; "
                         "ignored with --write-run-id, which forces the "
                         "run-id protocol path)")
    ap.add_argument("--write-run-id", action="store_true",
                    help="register under the run-id protocol: write the .npz "
                         "to <CHECKPOINT_DIR>/best_<model>_<run_id>.npz and "
                         "record the run id in latest_<model>_run_id.txt")
    args = ap.parse_args(argv)

    model = args.model or infer_model_type(args.pt_path)
    if model is None:
        ap.error(
            f"cannot infer the model type from {args.pt_path!r}; pass "
            f"--model {{{','.join(sorted(MODEL_TYPES))}}}"
        )

    # resolve the destination BEFORE converting so protocol conflicts fail
    # fast instead of leaving a written checkpoint unregistered
    run_id = None
    if args.write_run_id:
        m = re.search(r"_(\d{8}_\d{6})\.pt$", os.path.basename(args.pt_path))
        run_id = m.group(1) if m else checkpoint.new_run_id()
        ckpt_dir = Config.from_env().checkpoint_dir
        out = checkpoint.checkpoint_path(model, run_id, ckpt_dir)
        if args.out and os.path.abspath(args.out) != os.path.abspath(out):
            ap.error(
                f"--write-run-id registers the checkpoint at {out!r} (where "
                "the run-id protocol consumers resolve it) — drop --out or "
                "point it there"
            )
    else:
        out = args.out or re.sub(r"\.pt$", "", args.pt_path) + ".npz"

    sd = load_torch_state_dict(args.pt_path)
    params, state = convert_state_dict(sd, model)
    checkpoint.save(out, params, state)
    import jax

    n = sum(x.size for x in jax.tree.leaves(params))
    print(f"converted {args.pt_path} [{model}] -> {out} ({n:,} parameters)")

    if args.write_run_id:
        checkpoint.write_run_id(model, run_id)
        print(f"run id {run_id} -> {checkpoint.run_id_file(model)}")


def export_main(argv=None):
    """``.npz`` → reference-loadable ``.pt``; see
    scripts/export_torch_checkpoint.py."""
    import argparse
    import os
    import re

    from vae_los_angeles_tpu.training import checkpoint

    ap = argparse.ArgumentParser(
        description="Export a framework checkpoint (.npz) as a "
                    "reference-compatible torch state_dict (.pt)"
    )
    ap.add_argument("npz_path", help="framework .npz checkpoint")
    ap.add_argument("--model", choices=sorted(MODEL_TYPES), default=None,
                    help="architecture (default: inferred from the filename)")
    ap.add_argument("--out", default=None,
                    help="output .pt (default: the input path with .pt)")
    args = ap.parse_args(argv)

    model = args.model or infer_model_type(args.npz_path)
    if model is None:
        ap.error(
            f"cannot infer the model type from {args.npz_path!r}; pass "
            f"--model {{{','.join(sorted(MODEL_TYPES))}}}"
        )

    params, state = checkpoint.load(args.npz_path)
    sd = export_state_dict(params, state, model)

    import torch

    out = args.out or re.sub(r"\.npz$", "", args.npz_path) + ".pt"
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    torch.save({k: torch.from_numpy(v.copy()) for k, v in sd.items()}, out)
    print(f"exported {args.npz_path} [{model}] -> {out} ({len(sd)} tensors)")

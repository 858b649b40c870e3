"""Checkpointing + run-id protocol.

Preserves the reference's consumer contract (SURVEY §1 cross-layer
conventions) so every downstream script interoperates unchanged:
  * training writes ``checkpoints/best_{model}_{run_id}.npz`` and records the
    run id in ``latest_{model}_run_id.txt`` (reference train_rna2dna.py:229-245
    used ``.pt``; the payload here is a flattened param+BN-state pytree);
  * consumers call `get_run_id(model)` then `load(model, run_id)`
    (reference compare_directional_imputation.py:27-40,84-99,
    downstream_task_directional.py:23-36, run_comparison.py:96-114,
    reconstruct_unmatched.py:21-34).

Unlike the reference (which never saves optimizer state and cannot resume,
SURVEY §5 checkpoint row) `save_resume`/`load_resume` capture the FULL fused
training carry — params, BN stats, AdamW moments, plateau-scheduler and
early-stop state, best-snapshot — for true mid-run resume
(``train_rna2dna.py --resume``).
"""

from __future__ import annotations

import os
from datetime import datetime
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def new_run_id() -> str:
    """Timestamp run id, same format as the reference (train_rna2dna.py:152)."""
    return datetime.now().strftime("%Y%m%d_%H%M%S")


# marker key so empty dict subtrees (e.g. a stateless model's {}) survive
# the flatten/unflatten round-trip instead of silently vanishing
_EMPTY = "__empty_dict__"
_BF16 = ".__bf16__"  # leaf-key marker: value stored as uint16 bit pattern


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        if not tree:
            out[prefix + _EMPTY] = np.asarray(0)
            return out
        for k, v in tree.items():
            if "/" in str(k):
                raise ValueError(
                    f"checkpoint key {k!r} (at '{prefix}') contains '/', "
                    "which is the flattened-path separator"
                )
            if str(k).endswith(_BF16):
                # _unflatten would strip the suffix and bit-reinterpret the
                # leaf as bfloat16 — reject instead of silently corrupting
                raise ValueError(
                    f"checkpoint key {k!r} (at '{prefix}') ends with the "
                    f"reserved bfloat16 storage marker {_BF16!r}"
                )
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (tuple, list)):
        # refuse rather than round-trip a tuple into a string-keyed dict —
        # the jitted fit would later reject the carry with an opaque
        # pytree-structure mismatch
        raise TypeError(
            "checkpoint pytrees must be nested dicts with array leaves; got "
            f"{type(tree).__name__} at '{prefix[:-1] or '<root>'}'"
        )
    else:
        arr = np.asarray(tree)
        if arr.dtype == jnp.bfloat16:
            # np.savez degrades bfloat16 (an ml_dtypes extension dtype) to a
            # raw 'V2' void array on load — store the bit pattern as uint16
            # with a key marker and view it back in _unflatten
            out[prefix[:-1] + _BF16] = arr.view(np.uint16)
        else:
            out[prefix[:-1]] = arr
    return out


def _unflatten(flat):
    tree = {}
    for key, val in flat.items():
        if key.endswith(_BF16):
            key = key[: -len(_BF16)]
            val = val.view(jnp.bfloat16)
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        if parts[-1] != _EMPTY:
            node[parts[-1]] = val
    return tree


def save(path: str, params, state=None):
    """Save a (params, bn_state) pair as a flat .npz archive."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {"params": jax.device_get(params)}
    if state is not None:
        payload["state"] = jax.device_get(state)
    np.savez(path, **_flatten(payload))


def load(path: str) -> Tuple[dict, dict]:
    with np.load(path) as archive:
        flat = {k: archive[k] for k in archive.files}
    tree = _unflatten(flat)
    return tree.get("params", {}), tree.get("state", {})


def checkpoint_path(model_name: str, run_id: str, checkpoint_dir: str = "checkpoints"):
    return os.path.join(checkpoint_dir, f"best_{model_name}_{run_id}.npz")


def run_id_file(model_name: str) -> str:
    return f"latest_{model_name}_run_id.txt"


def save_best(
    model_name: str,
    run_id: str,
    params,
    state=None,
    checkpoint_dir: str = "checkpoints",
):
    path = checkpoint_path(model_name, run_id, checkpoint_dir)
    save(path, params, state)
    return path


def write_run_id(model_name: str, run_id: str, root: str = "."):
    with open(os.path.join(root, run_id_file(model_name)), "w") as f:
        f.write(run_id)


def resume_path(model_name: str, run_id: str, checkpoint_dir: str = "checkpoints"):
    return os.path.join(checkpoint_dir, f"resume_{model_name}_{run_id}.npz")


def save_resume(model_name: str, run_id: str, carry, n_epochs_done: int,
                checkpoint_dir: str = "checkpoints", seed: Optional[int] = None):
    """Persist the full fused-training carry for later resume.

    ``seed`` records the run PRNG seed: the per-epoch noise schedule derives
    from fold_in(PRNGKey(seed), epoch), so bit-exact continuation requires
    resuming with the SAME seed — persisting it makes that automatic."""
    path = resume_path(model_name, run_id, checkpoint_dir)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    meta = {"epochs_done": np.asarray(n_epochs_done)}
    if seed is not None:
        meta["seed"] = np.asarray(seed)
    payload = {"carry": jax.device_get(carry), "meta": meta}
    np.savez(path, **_flatten(payload))
    return path


def load_resume(model_name: str, run_id: Optional[str] = None,
                checkpoint_dir: str = "checkpoints", root: str = "."):
    """Returns (carry, epochs_done, run_id, seed) for continuing a run.

    ``seed`` is None for checkpoints written before seeds were recorded."""
    if run_id is None:
        run_id = get_run_id(model_name, root)
    if run_id is None:
        raise FileNotFoundError(f"no run id recorded for model '{model_name}'")
    path = resume_path(model_name, run_id, checkpoint_dir)
    if not os.path.exists(path):
        raise FileNotFoundError(f"resume checkpoint not found: {path}")
    with np.load(path) as archive:
        flat = {k: archive[k] for k in archive.files}
    tree = _unflatten(flat)
    meta = tree["meta"]
    seed = int(meta["seed"]) if "seed" in meta else None
    return tree["carry"], int(meta["epochs_done"]), run_id, seed


def get_run_id(model_name: str = "rna2dna", root: str = ".") -> Optional[str]:
    """Read the latest run id for a model (reference run-id indirection)."""
    path = os.path.join(root, run_id_file(model_name))
    if not os.path.exists(path):
        return None
    with open(path) as f:
        run_id = f.read().strip()
    return run_id or None


def load_best(
    model_name: str,
    run_id: Optional[str] = None,
    checkpoint_dir: str = "checkpoints",
    root: str = ".",
):
    """Load the best checkpoint via the run-id indirection files."""
    if run_id is None:
        run_id = get_run_id(model_name, root)
    if run_id is None:
        raise FileNotFoundError(
            f"no run id recorded for model '{model_name}' "
            f"(expected {run_id_file(model_name)})"
        )
    path = checkpoint_path(model_name, run_id, checkpoint_dir)
    if not os.path.exists(path):
        raise FileNotFoundError(f"checkpoint not found: {path}")
    params, state = load(path)
    return params, state, run_id

#!/usr/bin/env python
"""Export a framework checkpoint (.npz) as a reference-compatible torch
state_dict (.pt) — run models trained HERE in the unmodified reference.

    python scripts/export_torch_checkpoint.py checkpoints/best_rna2dna_20260817_120000.npz
    python scripts/export_torch_checkpoint.py best.npz --model dna2rna --out old_repo/checkpoints/best_dna2rna_x.pt

The produced state_dict loads into the reference's model classes with the
default ``strict=True`` (``model.load_state_dict(torch.load(path))``, e.g.
reconstruct_unmatched.py:66), so both implementations can be A/B'd on the
same trained weights in either direction (the inverse tool is
``scripts/import_torch_checkpoint.py``).
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vae_los_angeles_tpu.training import checkpoint
from vae_los_angeles_tpu.utils.torch_import import (
    MODEL_TYPES,
    export_state_dict,
    infer_model_type,
)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
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


if __name__ == "__main__":
    main()

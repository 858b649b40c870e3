#!/usr/bin/env python
"""Convert a reference PyTorch checkpoint (.pt state_dict) to this
framework's .npz format — migrate trained models without retraining.

    python scripts/import_torch_checkpoint.py checkpoints/best_rna2dna_20240101_120000.pt
    python scripts/import_torch_checkpoint.py best_multivae_optimized.pt --model multivae
    python scripts/import_torch_checkpoint.py old.pt --model dna2rna \
        --out checkpoints/best_dna2rna_migrated.npz --write-run-id

The model type is inferred from the reference's checkpoint naming
(``best_<model>_<run_id>.pt``, train_rna2dna.py:228-231) when not given.
``--write-run-id`` also records the run id in ``latest_<model>_run_id.txt``
so every downstream consumer (evaluate.py, reconstruct_unmatched.py,
compare_directional_imputation.py, downstream_task*.py) picks the migrated
checkpoint up through the unchanged run-id protocol.
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
    convert_state_dict,
    load_torch_state_dict,
)


def infer_model_type(path: str):
    base = os.path.basename(path)
    # longest names first so best_rna2dna_ae_* does not match rna2dna
    for name in sorted(MODEL_TYPES, key=len, reverse=True):
        if re.match(rf"(best_)?{name}([_.]|$)", base):
            return name
    return None


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("pt_path", help="reference .pt state_dict checkpoint")
    ap.add_argument("--model", choices=sorted(MODEL_TYPES), default=None,
                    help="architecture (default: inferred from the filename)")
    ap.add_argument("--out", default=None,
                    help="output .npz (default: the input path with .npz)")
    ap.add_argument("--write-run-id", action="store_true",
                    help="record the run id in latest_<model>_run_id.txt "
                         "(run id parsed from the filename)")
    args = ap.parse_args(argv)

    model = args.model or infer_model_type(args.pt_path)
    if model is None:
        ap.error(
            f"cannot infer the model type from {args.pt_path!r}; pass "
            f"--model {{{','.join(sorted(MODEL_TYPES))}}}"
        )

    sd = load_torch_state_dict(args.pt_path)
    params, state = convert_state_dict(sd, model)

    out = args.out or re.sub(r"\.pt$", "", args.pt_path) + ".npz"
    checkpoint.save(out, params, state)
    n = sum(x.size for x in __import__("jax").tree.leaves(params))
    print(f"converted {args.pt_path} [{model}] -> {out} ({n:,} parameters)")

    if args.write_run_id:
        m = re.search(r"_(\d{8}_\d{6})\.(pt|npz)$", os.path.basename(out))
        if not m:
            raise SystemExit(
                "--write-run-id needs the reference naming "
                "best_<model>_<YYYYmmdd_HHMMSS>.npz to parse a run id from "
                f"(got {os.path.basename(out)!r})"
            )
        checkpoint.write_run_id(model, m.group(1))
        print(f"run id {m.group(1)} -> {checkpoint.run_id_file(model)}")


if __name__ == "__main__":
    main()

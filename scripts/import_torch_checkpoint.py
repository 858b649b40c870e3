#!/usr/bin/env python
"""Convert a reference PyTorch checkpoint (.pt state_dict) to this
framework's .npz format — migrate trained models without retraining.

    python scripts/import_torch_checkpoint.py checkpoints/best_rna2dna_20240101_120000.pt
    python scripts/import_torch_checkpoint.py best_multivae_optimized.pt --model multivae
    python scripts/import_torch_checkpoint.py /backup/old.pt --model dna2rna --write-run-id

The model type is inferred from the reference's checkpoint naming
(``best_<model>_<run_id>.pt``, train_rna2dna.py:228-231) when not given.
``--write-run-id`` registers the checkpoint under the run-id protocol: the
run id is parsed from the input filename (a fresh timestamp id is minted if
the name carries none), the ``.npz`` is written to the exact path consumers
resolve — ``<CHECKPOINT_DIR>/best_<model>_<run_id>.npz`` — and
``latest_<model>_run_id.txt`` is updated, so evaluate.py,
reconstruct_unmatched.py, compare_directional_imputation.py and
downstream_task*.py pick the migrated model up unchanged.
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vae_los_angeles_tpu.config import Config
from vae_los_angeles_tpu.training import checkpoint
from vae_los_angeles_tpu.utils.torch_import import (
    MODEL_TYPES,
    convert_state_dict,
    infer_model_type,
    load_torch_state_dict,
)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
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
    n = sum(x.size for x in __import__("jax").tree.leaves(params))
    print(f"converted {args.pt_path} [{model}] -> {out} ({n:,} parameters)")

    if args.write_run_id:
        checkpoint.write_run_id(model, run_id)
        print(f"run id {run_id} -> {checkpoint.run_id_file(model)}")


if __name__ == "__main__":
    main()

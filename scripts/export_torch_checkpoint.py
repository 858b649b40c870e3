#!/usr/bin/env python
"""Export a framework checkpoint (.npz) as a reference-compatible torch
state_dict (.pt) — run models trained HERE in the unmodified reference.

    python scripts/export_torch_checkpoint.py checkpoints/best_rna2dna_20260817_120000.npz
    python scripts/export_torch_checkpoint.py best.npz --model dna2rna --out old_repo/checkpoints/best_dna2rna_x.pt

The produced state_dict loads into the reference's model classes with the
default ``strict=True`` (``model.load_state_dict(torch.load(path))``, e.g.
reconstruct_unmatched.py:66), so both implementations can be A/B'd on the
same trained weights in either direction (the inverse tool is
``scripts/import_torch_checkpoint.py``). Implementation + mapping:
`vae_los_angeles_tpu/utils/torch_import.py` (installed wheels expose this
as the ``vla-export-checkpoint`` command).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vae_los_angeles_tpu.utils.torch_import import export_main as main

if __name__ == "__main__":
    main()

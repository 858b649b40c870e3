#!/usr/bin/env python
"""Entry point mirroring the reference's top-level `downstream_task_directional.py`."""
from vae_los_angeles_tpu.evaluation.downstream_directional import main

if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Root-level entry point matching the reference script name
(/root/reference/train_partseg_lwf.py). Thin wrapper over simple3dformer_tpu.cli.train_partseg_lwf."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from simple3dformer_tpu.cli.train_partseg_lwf import main

if __name__ == "__main__":
    main()

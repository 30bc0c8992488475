#!/usr/bin/env python
"""Thin wrapper: see fast_cwdm_tpu.cli.convert_checkpoint."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from fast_cwdm_tpu.cli.convert_checkpoint import main

if __name__ == "__main__":
    main()

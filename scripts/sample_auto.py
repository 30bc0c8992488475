#!/usr/bin/env python
"""Thin wrapper: see fast_cwdm_tpu.cli.sample_auto (reference: scripts/sample_auto.py)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from fast_cwdm_tpu.cli.sample_auto import main

if __name__ == "__main__":
    main()

"""Utilities: structured kv-logging, profiling, config plumbing."""

import numpy as _np

from fast_cwdm_tpu.utils.logger import (  # noqa: F401
    configure,
    dumpkvs,
    get_dir,
    log,
    logkv,
    logkv_mean,
    profile_kv,
)
from fast_cwdm_tpu.utils.profiling import (  # noqa: F401
    StepTimer,
    annotate,
    trace,
)


def visualize(img):
    """Min-max normalize for image logging (`train_util.py:23-30` — the
    helper the reference's L3 circularly imports from L4; here it lives in
    utils, breaking the cycle)."""
    img = _np.asarray(img)
    lo, hi = img.min(), img.max()
    if hi == lo:
        return _np.zeros_like(img)
    return (img - lo) / (hi - lo)

"""Utilities: structured kv-logging, profiling, config plumbing."""

from fast_cwdm_tpu.utils.logger import (  # noqa: F401
    configure,
    dumpkvs,
    get_dir,
    log,
    logkv,
    logkv_mean,
    profile_kv,
)

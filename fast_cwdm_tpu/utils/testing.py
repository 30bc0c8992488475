"""Deterministic parity-test utilities.

``seeded_tensor``/``seeded_state_dict`` generate reproducible pseudo-random
weights keyed by TENSOR NAME, so a parity fixture at the production model
size (81.5M params, `run.sh:61-66` of the reference) can store only
inputs/outputs — both sides regenerate identical weights from the torch key
names instead of shipping a ~326 MB state_dict in the repo.

Scaling is kind-aware (by shape/name, not framework):

* >=2-D tensors (conv/linear kernels): ``N(0, fan_in^-1/2)`` — keeps
  activations O(1) through the 5-level production U-Net;
* 1-D ``*.weight`` (GroupNorm scales): ``1 + 0.05·N(0,1)``;
* everything else (biases): ``0.02·N(0,1)``.
"""

from __future__ import annotations

import zlib

import numpy as np


def seeded_tensor(name: str, shape: tuple[int, ...]) -> np.ndarray:
    """Deterministic float32 array keyed by ``(name, shape)``."""
    seed = zlib.crc32(f"{name}:{shape}".encode()) & 0xFFFFFFFF
    rng = np.random.default_rng(seed)
    arr = rng.standard_normal(shape)
    if len(shape) >= 2:
        fan_in = int(np.prod(shape[1:]))
        arr = arr / np.sqrt(max(fan_in, 1))
    elif name.endswith(".weight"):  # GroupNorm scale
        arr = 1.0 + 0.05 * arr
    else:
        arr = 0.02 * arr
    return arr.astype(np.float32)


def seeded_state_dict(
    shapes: dict[str, tuple[int, ...]]
) -> dict[str, np.ndarray]:
    """Torch-keyed state_dict of :func:`seeded_tensor` arrays."""
    return {k: seeded_tensor(k, tuple(s)) for k, s in shapes.items()}

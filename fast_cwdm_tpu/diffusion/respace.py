"""Timestep respacing (parity with `/root/reference/guided_diffusion/respace.py`).

``space_timesteps`` selects which base timesteps to retain; ``SpacedDiffusion``
re-derives betas from the retained alpha-bar curve and maps compact timesteps
back to original ones before they reach the model (the reference does this
with a `_WrappedModel`, `respace.py:112-132`; here it is an override of
``scale_timesteps``, which is applied immediately before every model call).

In the reference production path ``timestep_respacing`` is empty →
``[steps]`` → identity wrapper (`script_util.py:556-557`); the real step
reduction is the "sampled" beta schedule. Both are supported.
"""

from __future__ import annotations

from typing import Any, Set

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from fast_cwdm_tpu.diffusion.gaussian import GaussianDiffusion


def space_timesteps(num_timesteps: int, section_counts) -> Set[int]:
    """Retained original timesteps for a spaced process (`respace.py:7-62`).

    ``section_counts`` is a list of per-section counts, a comma-separated
    string, or "ddimN" for a fixed DDIM stride.
    """
    if isinstance(section_counts, str):
        if section_counts.startswith("ddim"):
            desired_count = int(section_counts[len("ddim"):])
            for i in range(1, num_timesteps):
                if len(range(0, num_timesteps, i)) == desired_count:
                    return set(range(0, num_timesteps, i))
            raise ValueError(
                f"cannot create exactly {desired_count} steps with an integer stride"
            )
        section_counts = [int(x) for x in section_counts.split(",")]
    size_per = num_timesteps // len(section_counts)
    extra = num_timesteps % len(section_counts)
    start_idx = 0
    all_steps = []
    for i, section_count in enumerate(section_counts):
        size = size_per + (1 if i < extra else 0)
        if size < section_count:
            raise ValueError(
                f"cannot divide section of {size} steps into {section_count}"
            )
        if section_count <= 1:
            frac_stride = 1
        else:
            frac_stride = (size - 1) / (section_count - 1)
        cur_idx = 0.0
        taken_steps = []
        for _ in range(section_count):
            taken_steps.append(start_idx + round(cur_idx))
            cur_idx += frac_stride
        all_steps += taken_steps
        start_idx += size
    return set(all_steps)


@struct.dataclass
class SpacedDiffusion(GaussianDiffusion):
    """GaussianDiffusion over a subsequence of base timesteps."""

    timestep_map: np.ndarray = None
    original_num_steps: int = struct.field(pytree_node=False, default=1000)

    def scale_timesteps(self, t: jax.Array) -> jax.Array:
        """Map compact t → original t, then rescale against the ORIGINAL
        step count (`respace.py:120-131`)."""
        new_t = jnp.asarray(self.timestep_map)[t]
        if self.rescale_timesteps:
            return new_t.astype(jnp.float32) * (
                1000.0 / self.original_num_steps
            )
        return new_t


def create_spaced_diffusion(
    *,
    use_timesteps,
    betas: np.ndarray,
    **kwargs: Any,
) -> SpacedDiffusion:
    """Build a SpacedDiffusion: new betas from retained alpha-bar ratios
    (`respace.py:77-94`)."""
    use_timesteps = set(use_timesteps)
    betas = np.asarray(betas, dtype=np.float64)
    original_num_steps = len(betas)
    alphas_cumprod = np.cumprod(1.0 - betas)
    last_alpha_cumprod = 1.0
    new_betas = []
    timestep_map = []
    for i, alpha_cumprod in enumerate(alphas_cumprod):
        if i in use_timesteps:
            new_betas.append(1.0 - alpha_cumprod / last_alpha_cumprod)
            last_alpha_cumprod = alpha_cumprod
            timestep_map.append(i)
    base = GaussianDiffusion.create(np.array(new_betas), **kwargs)
    return SpacedDiffusion(
        **{f.name: getattr(base, f.name) for f in base.__dataclass_fields__.values()},
        # host numpy like every schedule table (device-array closure
        # constants cost a D2H round-trip per trace on axon, gaussian.py)
        timestep_map=np.asarray(timestep_map, dtype=np.int32),
        original_num_steps=original_num_steps,
    )

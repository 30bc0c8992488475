"""fast-cwdm-tpu: a TPU-native conditional Wavelet Diffusion Model framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of `tsereda/fast-cwdm`
(conditional 3D wavelet diffusion for BraTS missing-modality synthesis):

- ``ops``       3D Haar / generic-orthogonal-wavelet DWT + IDWT (XLA + Pallas)
- ``models``    Flax 3D U-Net + WavUNet model families
- ``diffusion`` Gaussian diffusion process, Fast-DDPM "sampled" schedules,
                lax.scan sampling loops, timestep respacing/samplers
- ``data``      host-side NIfTI pipeline (own reader; nibabel not required)
- ``training``  jitted train step, AdamW + linear anneal, EMA, checkpointing
- ``parallel``  device-mesh construction and sharding for dp/sp/tp over ICI
- ``utils``     structured config, kv-logger with csv/tensorboard/wandb sinks

Reference parity is documented per-module with `file:line` citations into the
reference repo.
"""

__version__ = "0.1.0"

from fast_cwdm_tpu import diffusion, ops  # noqa: E402,F401
from fast_cwdm_tpu.diffusion import (  # noqa: E402,F401
    GaussianDiffusion,
    SpacedDiffusion,
    create_spaced_diffusion,
    get_named_beta_schedule,
    space_timesteps,
)
from fast_cwdm_tpu.ops import (  # noqa: E402,F401
    dwt3,
    dwt3_flat,
    dwt_normalized,
    haar_clamp_project,
    idwt3,
    idwt3_flat,
    idwt_normalized,
)

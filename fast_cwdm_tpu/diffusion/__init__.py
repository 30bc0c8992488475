from fast_cwdm_tpu.diffusion.gaussian import (  # noqa: F401
    MODALITIES,
    GaussianDiffusion,
    LossType,
    MeanType,
    VarType,
    condition_order,
)
from fast_cwdm_tpu.diffusion.dpm import (  # noqa: F401
    dpm_solver_pp_loop,
    dpm_timestep_indices,
)
from fast_cwdm_tpu.diffusion.resample import (  # noqa: F401
    LossSecondMomentResampler,
    UniformSampler,
    create_named_schedule_sampler,
)
from fast_cwdm_tpu.diffusion.respace import (  # noqa: F401
    SpacedDiffusion,
    create_spaced_diffusion,
    space_timesteps,
)
from fast_cwdm_tpu.diffusion.schedules import get_named_beta_schedule  # noqa: F401

"""Tensor ops (L1): wavelet transforms (XLA + Pallas) and fused kernels."""

from fast_cwdm_tpu.ops.wavelet import (  # noqa: F401
    LLL_SCALE,
    dwt1,
    dwt2,
    dwt2_tiny,
    dwt3,
    dwt3_flat,
    dwt_normalized,
    filter_bank,
    haar_clamp_project,
    idwt1,
    idwt2,
    idwt3,
    idwt3_flat,
    idwt_normalized,
    scale_lll,
)
from fast_cwdm_tpu.ops.wavelet_pallas import (  # noqa: F401
    dwt3_flat_pallas,
    dwt3_pallas,
    idwt3_flat_pallas,
    idwt3_pallas,
)

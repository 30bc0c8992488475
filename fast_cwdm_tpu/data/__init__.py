"""Data layer (L0): self-contained NIfTI IO, BraTS/LIDC datasets,
prefetching host→device pipeline."""

from fast_cwdm_tpu.data.brats import (  # noqa: F401
    BRATSVolumes,
    LIDCVolumes,
    clip_and_normalize,
    iterate_batches,
    parse_seqtype,
    preprocess_volume,
    unprocess_volume,
)
from fast_cwdm_tpu.data.loader import (  # noqa: F401
    ThreadedLoader,
    prefetch_to_device,
)
from fast_cwdm_tpu.data.nifti import Nifti1Image, load, save  # noqa: F401

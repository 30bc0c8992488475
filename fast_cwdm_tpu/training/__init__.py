"""Training (L4): jitted train step, AdamW + linear anneal, EMA,
best-checkpoint persistence, torch `.pt` bridge."""

from fast_cwdm_tpu.training.checkpoints import (  # noqa: F401
    best_checkpoint_name,
    find_best_checkpoint,
    get_blob_logdir,
    load_best_losses,
    load_checkpoint,
    load_checkpoint_config,
    parse_resume_step_from_filename,
    save_checkpoint,
    save_if_best,
    step_checkpoint_name,
)
from fast_cwdm_tpu.training.loop import TrainLoop  # noqa: F401
from fast_cwdm_tpu.training.state import TrainState, update_ema  # noqa: F401
from fast_cwdm_tpu.training.train import (  # noqa: F401
    make_eval_sample_fn,
    make_optimizer,
    make_train_step,
)

"""Training CLI (parity surface for `/root/reference/scripts/train.py`).

Flag schema = reference script defaults (`train.py:99-140`) merged over
`model_and_diffusion_defaults()`. Differences (documented):
no wandb hard-coding (`train.py:32-37` pins project/entity — here wandb is
optional via $WANDB_PROJECT), no manual device flags (mesh instead).
"""

from __future__ import annotations

import argparse
import random
import sys

import numpy as np

from fast_cwdm_tpu.models import (
    add_dict_to_argparser,
    args_to_dict,
    model_and_diffusion_defaults,
)


def create_argparser() -> argparse.ArgumentParser:
    defaults = dict(
        seed=0,
        data_dir="",
        schedule_sampler="uniform",
        lr=1e-4,
        weight_decay=0.0,
        lr_anneal_steps=0,
        batch_size=1,
        microbatch=-1,  # real grad accumulation here (dead in the reference)
        ema_rate="0.9999",
        log_interval=100,
        save_interval=5000,
        resume_checkpoint="",
        resume_step=0,
        use_fp16=False,
        fp16_scale_growth=1e-3,
        dataset="brats",
        use_tensorboard=True,
        tensorboard_path="",
        num_workers=0,
        # memoize preprocessed volumes in host RAM (beyond-reference):
        # per-epoch gzip decode starves the chip on CPU-poor hosts
        cache_dataset=False,
        # pin the whole dataset in device HBM (beyond-reference): zero
        # H2D bytes per step for datasets that fit (~131 MB/case);
        # single-process runs only — see data/loader.py
        device_cache=False,
        # -1 = factory default (selective remat, ds<=1). 0 remats EVERY
        # block: ~2.5% slower step, several GB less live activation
        # memory — pair with --device_cache on one chip
        remat_max_ds=-1,
        mode="default",
        renormalize=True,
        contr="t1n",
        # beyond-reference: extra image-space MSE over the case's seg
        # labels — counters the measured small-structure (enhancing-core)
        # attenuation of the equal-weight wavelet loss (QUALITY.md
        # downstream section). 0 = exact reference objective.
        lesion_weight=0.0,
        # same aux restricted to the enhancing core (raw BraTS label 4):
        # the whole-lesion mask is satisfiable by a spatially flat lesion;
        # this term pressures exactly the core-localized enhancement the
        # downstream Dice keys on (r5 measurement, .qb/ds_w03)
        lesion_core_weight=0.0,
        # t-weighting power p for both aux terms: w_t=(p+1)·(t/(T−1))^p.
        # p>0 shifts the aux gradient to HIGH t, where the core must be
        # INFERRED from the condition rather than copied out of x_t
        # (PROBE_core_inference_r05)
        lesion_t_power=0.0,
        checkpoint_dir="",
        data_mesh=0,  # 0 = all devices on the data axis
        spatial_mesh=1,
    )
    md = model_and_diffusion_defaults()
    defaults.update({k: v for k, v in md.items() if k not in defaults})
    # reference train.py overrides of the shared schema
    defaults.update(
        dims=3,
        num_groups=32,
        channel_mult="1,2,2,4,4",
        in_channels=8,
        out_channels=8,
        bottleneck_attention=False,
        sample_schedule="direct",
        # the training objective is always x0-prediction (see
        # diffusion.training_losses); sampling from the resulting
        # checkpoint needs START_X — the reference's run.sh:134 passes
        # this flag explicitly, we default it on for bare invocations
        predict_xstart=True,
    )
    parser = argparse.ArgumentParser()
    add_dict_to_argparser(parser, defaults)
    return parser


def main(argv=None) -> str:
    import jax

    from fast_cwdm_tpu.data import BRATSVolumes, LIDCVolumes, iterate_batches
    from fast_cwdm_tpu.diffusion.resample import create_named_schedule_sampler
    from fast_cwdm_tpu.models import create_model_and_diffusion
    from fast_cwdm_tpu.parallel import (
        make_hybrid_mesh,
        make_mesh,
        setup_distributed,
    )
    from fast_cwdm_tpu.training import TrainLoop
    from fast_cwdm_tpu.utils import logger

    from fast_cwdm_tpu.cli.common import enable_compile_cache

    enable_compile_cache()
    args = create_argparser().parse_args(argv)
    random.seed(args.seed)
    np.random.seed(args.seed)

    setup_distributed()  # before logger: sinks are rank-gated
    if jax.process_index() == 0:
        logger.configure()
    else:
        # secondary ranks: stdout only — file/TB/wandb sinks on a shared
        # filesystem would race with rank 0's
        logger.configure(format_strs=["stdout"])
    logger.log("creating model and diffusion...")

    cfg = args_to_dict(args, model_and_diffusion_defaults().keys())
    if args.mode == "i2i":
        cfg["in_channels"] = 32  # 8 target + 3×8 condition subbands
    if args.remat_max_ds >= 0:
        cfg["remat_max_ds"] = args.remat_max_ds
    model, diffusion = create_model_and_diffusion(**cfg)

    mesh = None
    if jax.process_count() > 1:
        # multi-host: DCN-aware mesh (data axis spans slices/processes, sp
        # stays intra-slice so conv/DWT halos ride ICI only)
        mesh = make_hybrid_mesh(sp=args.spatial_mesh)
        logger.log(
            f"hybrid mesh over {jax.process_count()} processes: "
            f"{dict(mesh.shape)}"
        )
    elif len(jax.devices()) > 1:
        mesh = make_mesh(
            data=args.data_mesh or -1, sp=args.spatial_mesh
        )
        logger.log(f"mesh: {dict(mesh.shape)}")

    lesion_on = bool(args.lesion_weight) or bool(args.lesion_core_weight)
    if lesion_on and (args.dataset == "lidc-idri" or args.mode != "i2i"):
        # fail before dataset construction, not later in make_train_step
        raise ValueError(
            "--lesion_weight/--lesion_core_weight need BraTS seg labels "
            f"and i2i mode (got dataset={args.dataset!r}, "
            f"mode={args.mode!r})"
        )
    if args.dataset == "lidc-idri":
        dataset = LIDCVolumes(args.data_dir, mode="train")
    else:
        dataset = BRATSVolumes(
            args.data_dir, mode="train", cache=args.cache_dataset,
            with_seg=lesion_on,
        )
    batch_keys = None
    if lesion_on:
        from fast_cwdm_tpu.data.brats import MODALITIES

        batch_keys = tuple(MODALITIES) + ("seg",)
    logger.log(f"dataset: {len(dataset)} cases from {args.data_dir}")

    import itertools

    epoch_counter = itertools.count()  # reshuffle differently every epoch
    # multi-host: every process builds the same seeded permutation but
    # decodes ONLY its own rows of each global batch (its devices' shard
    # of the data axis); `TrainLoop._put` assembles the global array
    rows = None
    if mesh is not None and jax.process_count() > 1:
        from fast_cwdm_tpu.parallel.mesh import local_batch_rows

        rows = local_batch_rows(mesh, args.batch_size)
        logger.log(f"local batch rows: [{rows[0]}, {rows[1]})")
    if args.dataset == "lidc-idri":
        # unconditional: batches are plain arrays
        def data():
            from fast_cwdm_tpu.data.loader import iter_items, shard_order_rows

            rng = np.random.default_rng(args.seed + next(epoch_counter))
            order = rng.permutation(len(dataset))
            local_bs = args.batch_size
            if rows is not None:
                order, local_bs = shard_order_rows(
                    order, args.batch_size, rows
                )
            buf = []
            for item in iter_items(dataset, order, args.num_workers):
                buf.append(item)
                if len(buf) == local_bs:
                    yield np.stack(buf)
                    buf = []
    elif args.device_cache:
        if mesh is not None:
            # sharded runs assemble/shard HOST batches (TrainLoop._put →
            # shard_batch); pinning replicated copies per device is a
            # different feature — fail loudly rather than silently
            # round-tripping pinned arrays through the host
            raise ValueError(
                "--device_cache is a single-device input path; sharded "
                "runs feed host batches through shard_batch (drop the "
                "flag or the mesh)"
            )
        from fast_cwdm_tpu.data.loader import device_resident_batches

        hbm_cache: dict = {}

        def data():
            # whole dataset pinned in HBM after the first epoch — zero
            # H2D bytes per step (same batch sequence as iterate_batches)
            return device_resident_batches(
                dataset, args.batch_size, shuffle=True,
                seed=args.seed + next(epoch_counter),
                cache=hbm_cache,
                **({"keys": batch_keys} if batch_keys else {}),
            )
    else:
        def data():
            # threaded NIfTI decode (the reference's DataLoader runs
            # num_workers=12 processes, `train.py:66-69`); batch sequence
            # is identical to the serial path for any worker count
            return iterate_batches(
                dataset, args.batch_size, shuffle=True,
                seed=args.seed + next(epoch_counter),
                num_workers=args.num_workers,
                rows=rows,
                **({"keys": batch_keys} if batch_keys else {}),
            )

    sampler = create_named_schedule_sampler(
        args.schedule_sampler, diffusion.num_timesteps
    )

    loop = TrainLoop(
        model=model,
        diffusion=diffusion,
        data=data,
        batch_size=args.batch_size,
        lr=args.lr,
        ema_rate=args.ema_rate,
        log_interval=args.log_interval,
        save_interval=args.save_interval,
        resume_checkpoint=args.resume_checkpoint,
        resume_step=args.resume_step,
        weight_decay=args.weight_decay,
        lr_anneal_steps=args.lr_anneal_steps,
        mode=args.mode,
        contr=args.contr,
        sample_schedule=args.sample_schedule,
        diffusion_steps=args.diffusion_steps,
        dataset=args.dataset,
        schedule_sampler=sampler,
        seed=args.seed,
        mesh=mesh,
        checkpoint_dir=args.checkpoint_dir or None,
        config=cfg,
        microbatch=args.microbatch,
        lesion_weight=args.lesion_weight,
        lesion_core_weight=args.lesion_core_weight,
        lesion_t_power=args.lesion_t_power,
    )
    loop.run_loop()
    # harnesses must distinguish "ran to lr_anneal_steps" from "SIGTERM'd
    # early with a preemption checkpoint" — returning after a trapped
    # SIGTERM is NOT completion (resume with --resume_checkpoint)
    return "preempted" if loop.preempted else "completed"


if __name__ == "__main__":
    sys.exit(143 if main() == "preempted" else 0)

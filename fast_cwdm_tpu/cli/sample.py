"""Sampling CLI (parity surface for `/root/reference/scripts/sample.py`).

Per eval case: DWT the 3 known modalities → 24-ch condition, run the full
reverse chain (ONE jitted scan — the reference dispatches T separate model
calls), IDWT with ×3 LLL, clamp [0,1], zero non-brain voxels via the first
condition, crop Z to 155, save ``sample.nii.gz`` + ``target.nii.gz`` with an
identity affine (`sample.py:92-149`).

Unlike the reference — whose `p_sample_loop` silently breaks for sampled
schedules with <1000 steps (SURVEY §2.3) — short schedules just work.
"""

from __future__ import annotations

import argparse
import os
import pathlib
import random
import time

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
        data_mode="validation",
        clip_denoised=True,
        num_samples=1,
        batch_size=1,
        use_ddim=False,
        class_cond=False,
        sampling_steps=0,
        model_path="",
        output_dir="./results",
        mode="i2i",
        renormalize=False,
        half_res_crop=False,
        concat_coords=False,
        contr="",
        use_ema=False,
        sampler="",  # "" → honor --use_ddim; or ddpm | ddim | dpm++
    )
    md = model_and_diffusion_defaults()
    defaults.update({k: v for k, v in md.items() if k not in defaults})
    defaults.update(
        dims=3, num_groups=32, channel_mult="1,2,2,4,4",
        in_channels=32, out_channels=8, bottleneck_attention=False,
        # run.sh:134 passes --predict_xstart=True to BOTH train and sample;
        # the schema default (False → EPSILON) would silently mis-decode a
        # default-trained x0-predictor checkpoint into plausible garbage
        predict_xstart=True,
    )
    parser = argparse.ArgumentParser()
    add_dict_to_argparser(parser, defaults)
    return parser


def main(argv=None) -> None:
    import jax

    from fast_cwdm_tpu.cli import common
    from fast_cwdm_tpu.data import BRATSVolumes, Nifti1Image, ThreadedLoader, save
    from fast_cwdm_tpu.diffusion.gaussian import condition_order

    common.enable_compile_cache()
    args = create_argparser().parse_args(argv)
    random.seed(args.seed)
    np.random.seed(args.seed)

    cfg = args_to_dict(args, model_and_diffusion_defaults().keys())
    # the config stored with the checkpoint wins over CLI flags for
    # model/diffusion keys (the reference re-derives them from the FILENAME;
    # here they ride in the sidecar) — dtype stays a runtime choice
    from fast_cwdm_tpu.training.checkpoints import load_checkpoint_config

    stored = load_checkpoint_config(args.model_path) or {}
    cfg.update(
        {k: v for k, v in stored.items() if k in cfg and k != "dtype"}
    )
    cfg["mode"] = "i2i"
    sampler = args.sampler or ("ddim" if args.use_ddim else "ddpm")
    # DDIM shortens the chain by RESPACING the process; DPM-Solver++
    # subsamples its own index schedule, so --sampling_steps routes to the
    # solver instead and the process stays unspaced
    if sampler == "ddim" and args.sampling_steps:
        cfg["timestep_respacing"] = f"ddim{args.sampling_steps}"
    model, diffusion = common.build_model_and_diffusion(cfg)
    params = common.load_params(args.model_path, model, use_ema=args.use_ema)
    synth = common.make_synthesis_fn(
        model, params, diffusion,
        sampler=sampler,
        sampler_steps=(
            (args.sampling_steps or None) if sampler == "dpm++" else None
        ),
        clip_denoised=args.clip_denoised,
    )

    ds = BRATSVolumes(args.data_dir, mode="eval")
    print(f"sampling {len(ds)} cases, contr={args.contr}")
    key = jax.random.PRNGKey(args.seed)

    writer = common.AsyncWriter()

    def write_pair(out_dir, sample_i, target_i):
        pathlib.Path(out_dir).mkdir(parents=True, exist_ok=True)
        save(
            Nifti1Image(sample_i, np.eye(4)),
            os.path.join(out_dir, "sample.nii.gz"),
        )
        save(
            Nifti1Image(target_i, np.eye(4)),
            os.path.join(out_dir, "target.nii.gz"),
        )

    for item in ThreadedLoader(ds, num_workers=2):
        t0 = time.time()
        subj = common.subject_id_from_path(item["subj"])
        batch = {m: item[m][None] for m in ("t1n", "t1c", "t2w", "t2f")}
        cond = common.prepare_condition(batch, args.contr)
        mask_vol = batch[condition_order(args.contr)[0]]
        key, sub = jax.random.split(key)
        sample = synth(cond, mask_vol, sub)  # (B, 224, 224, 155)
        target = batch[args.contr][..., 0][:, :, :, :155]

        out_dir = os.path.join(args.output_dir, subj)
        for i in range(sample.shape[0]):
            writer.submit(
                subj, write_pair, out_dir, sample[i], np.asarray(target[i])
            )
        print(f"{subj}: sampled in {time.time() - t0:.1f}s (write pipelined)")

    failed = writer.drain()
    if failed:
        print(f"[sample] {failed} write(s) FAILED")
        raise SystemExit(1)


if __name__ == "__main__":
    main()

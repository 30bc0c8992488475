"""Auto-completion CLI (parity surface for
`/root/reference/scripts/sample_auto.py`): per case, detect the missing
modality from the loader, load the matching per-modality checkpoint, and
synthesize it.

Improvement over the reference (documented): checkpoints are discovered
once and the compiled sampler is CACHED per modality — the reference
re-loads weights for every case (`sample_auto.py:56-67`, flagged in
SURVEY §7 as a throughput bug).

The reference's `sample[sample <= 0.04] = 0` background threshold
(`sample_auto.py:141`) and the 8px un-crop before save
(`sample_auto.py:147-162`) are reproduced.
"""

from __future__ import annotations

import argparse
import os
import pathlib
import random

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
        checkpoint_dir="checkpoints",
        clip_denoised=True,
        batch_size=1,
        output_dir="./results_auto",
        mode="i2i",
        threshold=0.04,
        use_ema=False,
        dataset="brats",
        sampler="ddpm",  # ddpm | ddim | dpm++ (DPM-Solver++(2M))
        sampling_steps=0,  # dpm++ evals or ddimN respacing; 0 → default
    )
    md = model_and_diffusion_defaults()
    defaults.update({k: v for k, v in md.items() if k not in defaults})
    defaults.update(
        dims=3, num_groups=32, channel_mult="1,2,2,4,4",
        in_channels=32, out_channels=8, bottleneck_attention=False,
    )
    parser = argparse.ArgumentParser()
    add_dict_to_argparser(parser, defaults)
    return parser


def main(argv=None) -> None:
    import jax

    from fast_cwdm_tpu.cli import common
    from fast_cwdm_tpu.data import (
        BRATSVolumes,
        Nifti1Image,
        ThreadedLoader,
        save,
        unprocess_volume,
    )
    from fast_cwdm_tpu.diffusion.gaussian import condition_order

    common.enable_compile_cache()
    args = create_argparser().parse_args(argv)
    random.seed(args.seed)
    np.random.seed(args.seed)

    synth_cache: dict[str, tuple] = {}

    def get_synth(contr: str):
        if contr not in synth_cache:
            # base = CLI flags; the checkpoint's stored config wins for
            # model/diffusion keys, an explicit --dtype wins for dtype
            synth_cache[contr] = common.load_best_synthesis(
                args.checkpoint_dir,
                contr,
                dataset=args.dataset,
                base_cfg=args_to_dict(
                    args, model_and_diffusion_defaults().keys()
                ),
                dtype=args.dtype,
                use_ema=args.use_ema,
                tag="auto",
                clip_denoised=args.clip_denoised,
                sampler=args.sampler,
                sampler_steps=args.sampling_steps or None,
            )
        return synth_cache[contr]

    ds = BRATSVolumes(args.data_dir, mode="auto")
    key = jax.random.PRNGKey(args.seed)
    done = skipped = 0
    writer = common.AsyncWriter()

    def write_sample(sample, src, out_dir, out_name):
        from fast_cwdm_tpu.data import nifti

        # header-only: only geometry/affine/header are needed — a full
        # load would gunzip the whole source volume again
        src_img = nifti.load_header(src)
        # un-crop to the source geometry (240×240×155 for real BraTS)
        full = unprocess_volume(sample[..., None], raw_shape=src_img.shape)
        pathlib.Path(out_dir).mkdir(parents=True, exist_ok=True)
        save(Nifti1Image(full.astype(np.float32), src_img.affine,
                         src_img.header), out_name)

    for item in ThreadedLoader(ds, num_workers=2):
        missing = item["missing"]
        if missing == "none":
            skipped += 1
            continue
        subj = common.subject_id_from_path(item["subj"])
        batch = {
            m: item[m][None]
            for m in ("t1n", "t1c", "t2w", "t2f")
            if item[m].ndim == 4
        }
        synth = get_synth(missing)
        cond = common.prepare_condition(batch, missing)
        mask_vol = batch[condition_order(missing)[0]]
        key, sub = jax.random.split(key)
        sample = synth(cond, mask_vol, sub)[0]  # (224,224,155)
        sample[sample <= args.threshold] = 0.0  # `sample_auto.py:141`

        src = item["filedict"][condition_order(missing)[0]]
        out_dir = os.path.join(args.output_dir, subj)
        out_name = os.path.join(out_dir, f"{subj}-{missing}.nii.gz")
        writer.submit(subj, write_sample, sample, src, out_dir, out_name)
        print(f"[auto] {subj}: synthesized {missing} → {out_name}")
        done += 1

    failed = writer.drain()
    print(
        f"[auto] completed {done - failed} cases "
        f"({skipped} already complete, {failed} failed)"
    )


if __name__ == "__main__":
    main()

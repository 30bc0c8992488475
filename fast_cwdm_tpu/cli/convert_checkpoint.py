"""Checkpoint conversion CLI: reference torch ``.pt`` ↔ framework ``.ckpt``.

Keeps the published-weights compatibility surface (reference README.md:28-31
ships torch state_dicts): import a ``.pt`` into a framework checkpoint (with
config sidecar) or export a trained framework checkpoint back to a
reference-loadable ``.pt``.
"""

from __future__ import annotations

import argparse


def main(argv=None) -> None:
    from fast_cwdm_tpu.cli import common
    from fast_cwdm_tpu.training import bridge, checkpoints

    p = argparse.ArgumentParser()
    p.add_argument("--src", required=True, help=".pt or .ckpt input")
    p.add_argument("--dst", required=True, help=".ckpt or .pt output")
    p.add_argument(
        "--sample_schedule", default="sampled",
        help="recorded in the .ckpt config (import direction)",
    )
    p.add_argument("--diffusion_steps", type=int, default=10)
    p.add_argument("--contr", default="t1n")
    # model config overrides (defaults = production run.sh bundle)
    from fast_cwdm_tpu.models import str2bool

    for k, v in common.PRODUCTION_OVERRIDES.items():
        p.add_argument(
            f"--{k}",
            default=v,
            type=str2bool if isinstance(v, bool) else type(v),
        )
    args = p.parse_args(argv)

    cfg = {
        k: getattr(args, k)
        for k in common.PRODUCTION_OVERRIDES
    }
    cfg.update(
        sample_schedule=args.sample_schedule,
        diffusion_steps=args.diffusion_steps,
    )
    model, _ = common.build_model_and_diffusion(cfg)

    if args.src.endswith(".pt") and args.dst.endswith(".ckpt"):
        params = bridge.load_torch_unet(args.src, model)
        checkpoints.save_checkpoint(
            args.dst,
            {"params": params, "ema_params": (), "step": 0},
            config={**cfg, "contr": args.contr, "imported_from": args.src},
        )
        print(f"imported {args.src} → {args.dst}")
    elif args.src.endswith(".ckpt") and args.dst.endswith(".pt"):
        params = common.load_params(args.src, model)
        bridge.save_torch_unet(args.dst, params, model)
        print(f"exported {args.src} → {args.dst}")
    else:
        raise SystemExit("expected .pt→.ckpt or .ckpt→.pt")


if __name__ == "__main__":
    main()

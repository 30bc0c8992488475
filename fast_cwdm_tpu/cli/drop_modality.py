"""Build a pseudo-validation set by dropping one random modality per case
(parity surface for `/root/reference/scripts/drop_modality.py`).

Same semantics: numpy seed 123456 (`drop_modality.py:20-27`), one modality
removed per case, a ``missing_{modality}.txt`` marker written in the case
directory.
"""

from __future__ import annotations

import argparse
import os
import shutil

import numpy as np

from fast_cwdm_tpu.diffusion.gaussian import MODALITIES


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input_dir", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--seed", type=int, default=123456)
    args = p.parse_args(argv)

    rng = np.random.RandomState(args.seed)
    cases = sorted(
        d
        for d in os.listdir(args.input_dir)
        if os.path.isdir(os.path.join(args.input_dir, d))
    )
    print(f"[drop] {len(cases)} cases → {args.output_dir}")
    for case in cases:
        src = os.path.join(args.input_dir, case)
        dst = os.path.join(args.output_dir, case)
        os.makedirs(dst, exist_ok=True)
        drop = MODALITIES[rng.randint(0, len(MODALITIES))]
        for f in sorted(os.listdir(src)):
            if f"-{drop}." in f:
                continue
            shutil.copy2(os.path.join(src, f), os.path.join(dst, f))
        marker = os.path.join(dst, f"missing_{drop}.txt")
        with open(marker, "w") as fh:
            fh.write(f"{case}: dropped {drop}\n")
        print(f"[drop] {case}: -{drop}")


if __name__ == "__main__":
    main()

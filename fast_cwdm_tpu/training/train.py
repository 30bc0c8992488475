"""Jitted train step (parity surface for `TrainLoop.forward_backward` /
`run_step`, `/root/reference/guided_diffusion/train_util.py:364-470`).

TPU-first design:

* ONE donated-`jit` program per optimizer step: t-sampling, image-space
  noise, DWT of 4 modalities, U-Net fwd+bwd, AdamW update, EMA shadows, and
  all metrics — nothing syncs to host (the reference does ≥8 D2H scalar
  syncs per step for logging/max-norms, SURVEY §3.1);
* linear LR anneal folded into the optax schedule
  (`_anneal_lr`, `train_util.py:464-470`);
* gradient averaging across the ``data`` mesh axis is XLA's automatic psum —
  the step is sharding-agnostic;
* metrics returned as a small device dict; the loop flushes them
  asynchronously.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from fast_cwdm_tpu.diffusion.gaussian import GaussianDiffusion
from fast_cwdm_tpu.diffusion.resample import (
    LossSecondMomentResampler,
    UniformSampler,
)
from fast_cwdm_tpu.training.state import TrainState, update_ema

# metric leaves that are image panels (~2 MB/sample mid-plane slices), not
# scalars — the train loop strips these from fetches outside image-log steps;
# one definition so producer (here) and consumer (loop.py) stay in lockstep
IMAGE_METRIC_KEYS = ("sample_slice", "subband_slices")


def make_optimizer(
    lr: float,
    *,
    weight_decay: float = 0.0,
    lr_anneal_steps: int = 0,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    """AdamW with the reference's linear anneal
    (`train_util.py:111,464-470`: ``lr·(1 - step/anneal_steps)``)."""
    if lr_anneal_steps:
        schedule = lambda step: lr * (  # noqa: E731
            1.0 - jnp.minimum(step, lr_anneal_steps) / lr_anneal_steps
        )
    else:
        schedule = lr
    return optax.adamw(
        schedule, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay
    )


def _tree_max_abs(tree) -> jax.Array:
    """max |leaf| over a pytree (`norm/param_max`, `norm/grad_max` metrics,
    `train_util.py:371-375`) — computed on device."""
    leaves = [jnp.max(jnp.abs(x)) for x in jax.tree.leaves(tree)]
    return jnp.max(jnp.stack(leaves)) if leaves else jnp.zeros(())


def make_train_step(
    model,
    diffusion: GaussianDiffusion,
    tx: optax.GradientTransformation,
    *,
    contr: str = "t1n",
    mode: str = "i2i",
    sampler: Any = None,
    compute_dtype=None,
    donate: bool = False,
    with_norms: bool = True,
    accum_steps: int = 1,
    lesion_weight: float = 0.0,
    lesion_core_weight: float = 0.0,
    lesion_t_power: float = 0.0,
) -> Callable[[TrainState, Any, jax.Array], tuple[TrainState, dict]]:
    """Build the jitted train step.

    ``accum_steps``: gradient accumulation — the batch is split into
    ``accum_steps`` microbatches scanned sequentially (one microbatch's
    activations live at a time), gradients averaged, ONE optimizer step.
    The reference PARSES ``--microbatch`` but dropped the accumulation
    loop its upstream had (`train_util.py:42,73` store it; nothing reads
    it) — here the flag does what it says. Numerics match the
    unaccumulated step (same t draw, same full-batch noise draw, sliced)
    up to float re-association; tested. Caveat: with dropout > 0 the
    accumulated path keys dropout PER MICROBATCH (the unaccumulated one
    uses a single key), so cross-setting reproducibility holds only at
    dropout=0 — the tested and production config (run.sh dropout=0).

    ``batch``: dict of image-space volumes ``(B, X, Y, Z, 1)`` keyed by
    modality (i2i) or a single array. Returns ``(new_state, metrics)`` with
    metrics = {loss, mse_wav(8,), grad_max, param_max, lr_step}.

    ``donate=True`` donates the input state so params/opt/EMA update in
    place (used by `TrainLoop`; leave False when the caller re-reads the
    pre-step state — donated buffers are invalidated).

    ``lesion_weight > 0`` (beyond-reference) adds an IMAGE-SPACE MSE term
    over the lesion mask, per sample:
    ``loss += W · mean_i[ w_t(tᵢ) · mean_{segᵢ>0}((idwt(pred)ᵢ − x₀ᵢ)²) ]``
    using the seg labels BraTS ships with every training case. Motivation
    is measured, not hypothetical: the production wavelet x₀-MSE weights
    the enhancing core by its voxel share (~0.06%), and the trained model
    attenuates it ~2.5× — invisible to SSIM/PSNR, fatal to downstream
    Dice (QUALITY.md "downstream" section; the reference has the same
    equal-weight loss, `train_util.py:447-449`, and no way to see this).
    Requires the batch dict to carry ``"seg"`` (loader ``with_seg=True``)
    and i2i mode. Per-SAMPLE masked means (not one global masked mean)
    make gradient accumulation exact for any mask distribution — the
    microbatch mean of per-sample quantities composes associatively.

    ``lesion_core_weight > 0`` adds the same term over the ENHANCING CORE
    only (raw BraTS label 4). The r4/r5 downstream measurements show the
    whole-lesion mask lets the model satisfy the aux with a spatially
    flat lesion (ET≈NCR≈edema region means, `.qb/ds_w03` report) while
    the core-localized enhancement — the entire downstream-Dice signal —
    stays absent. Label 4 is ~5% of the lesion mask; this term puts full
    pressure exactly there.

    ``lesion_t_power = p > 0`` weights both aux terms per sample by
    ``w_t = (p+1)·(t/(T−1))^p`` (mean ≈ 1 under the uniform t sampler, so
    W keeps its scale). Rationale (PROBE_core_inference_r05): at low t,
    x_t already CONTAINS the core, so the aux only teaches copying; at
    sampling time the chain starts from noise, and whether a core ever
    appears is decided by the x0-prediction at HIGH t, where the only
    information source is the condition. p shifts the aux gradient onto
    exactly those timesteps. p=0 keeps uniform weighting.
    """
    sampler = sampler or UniformSampler(diffusion.num_timesteps)
    loss_aware = isinstance(sampler, LossSecondMomentResampler)
    lesion_on = bool(lesion_weight) or bool(lesion_core_weight)

    if accum_steps < 1:
        raise ValueError(f"accum_steps must be >= 1, got {accum_steps}")
    for name, w in (("lesion_weight", lesion_weight),
                    ("lesion_core_weight", lesion_core_weight),
                    ("lesion_t_power", lesion_t_power)):
        if w < 0:
            raise ValueError(
                f"{name} must be >= 0, got {w} (a negative weight would"
                " reward lesion error)"
            )
    if lesion_on and mode != "i2i":
        raise ValueError(
            "lesion_weight/lesion_core_weight need i2i mode (the mask"
            " comes from the case's seg labels; unconditional batches are"
            " plain arrays)"
        )

    def loss_fn(params, batch, t, key_noise, key_drop, noise_img=None):
        def model_fn(x, tt, **kw):
            if compute_dtype is not None:
                x = x.astype(compute_dtype)
            return model.apply(
                {"params": params},
                x,
                tt,
                train=True,
                rngs={"dropout": key_drop},
                **kw,
            ).astype(jnp.float32)

        terms, model_out, out_idwt = diffusion.training_losses(
            model_fn, batch, t, key_noise, contr=contr, mode=mode,
            noise_img=noise_img,
        )
        # equal subband weights (`train_util.py:447-449`)
        loss = terms["mse_wav"].mean()
        if lesion_on:
            diff2 = (
                out_idwt.astype(jnp.float32)
                - batch[contr].astype(jnp.float32)
            ) ** 2
            axes = tuple(range(1, diff2.ndim))
            if lesion_t_power:
                tt = t.astype(jnp.float32) / max(
                    diffusion.num_timesteps - 1, 1
                )
                w_t = (lesion_t_power + 1.0) * tt**lesion_t_power
            else:
                w_t = jnp.ones(t.shape, jnp.float32)

            def masked_aux(mask):
                # per-sample masked mean, t-weighted, batch-averaged;
                # empty-mask samples contribute exactly 0
                s = (diff2 * mask).sum(axes)
                c = mask.sum(axes)
                return (w_t * s / jnp.maximum(c, 1.0)).mean()

            if lesion_weight:
                aux = masked_aux((batch["seg"] > 0).astype(jnp.float32))
                loss = loss + lesion_weight * aux
                terms["mse_lesion"] = aux
            if lesion_core_weight:
                # raw BraTS label 4 = enhancing tumor
                aux_c = masked_aux(
                    (batch["seg"] == 4).astype(jnp.float32)
                )
                loss = loss + lesion_core_weight * aux_c
                terms["mse_lesion_core"] = aux_c
        # mid-plane slices for TB/wandb image panels
        # (`train_util.py:226-284` logs the x0 mid-plane and all 8 predicted
        # subband mid-planes every 200 steps) — slices, not full volumes,
        # so metrics stay tiny
        terms = dict(terms)
        terms[IMAGE_METRIC_KEYS[0]] = out_idwt[
            :, :, :, out_idwt.shape[3] // 2, 0
        ]
        terms[IMAGE_METRIC_KEYS[1]] = model_out[
            :, :, :, model_out.shape[3] // 2, :
        ]
        return loss, terms

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    import functools

    @functools.partial(
        jax.jit, donate_argnums=((0,) if donate else ())
    )
    def step(state: TrainState, batch, key: jax.Array):
        key_t, key_noise, key_drop = jax.random.split(key, 3)
        if mode == "i2i":
            bsz = batch[contr].shape[0] if isinstance(batch, dict) else batch.shape[0]
        else:
            bsz = batch.shape[0]
        if loss_aware:
            t, _w = sampler.sample(key_t, bsz, state.sampler_state)
        else:
            t, _w = sampler.sample(key_t, bsz)

        if accum_steps == 1:
            (loss, terms), grads = grad_fn(
                state.params, batch, t, key_noise, key_drop
            )
        else:
            if bsz % accum_steps != 0:
                raise ValueError(
                    f"batch size {bsz} not divisible by "
                    f"accum_steps {accum_steps}"
                )
            n, mb = accum_steps, bsz // accum_steps
            # draw noise for the FULL batch exactly as the unaccumulated
            # step would (training_losses' internal draw), then slice —
            # same randomness regardless of accum_steps
            target = batch[contr] if mode == "i2i" else batch
            noise_img = jax.random.normal(
                key_noise, target.shape, dtype=target.dtype
            )
            # aux metrics are per-sample masked means, so microbatch means
            # compose exactly; nothing global to precompute
            extra_keys = (["mse_lesion"] if lesion_weight else []) + (
                ["mse_lesion_core"] if lesion_core_weight else []
            )

            def to_micro(x):
                return x.reshape((n, mb) + x.shape[1:])

            micro = jax.tree.map(to_micro, batch)
            inputs = (
                micro,
                t.reshape(n, mb),
                to_micro(noise_img),
                jax.random.split(key_drop, n),
            )

            def body(g_acc, inp):
                mb_i, t_i, nz_i, kd_i = inp
                (loss_i, terms_i), g_i = grad_fn(
                    state.params, mb_i, t_i, key_noise, kd_i,
                    noise_img=nz_i,
                )
                ys = (
                    loss_i,
                    terms_i["mse_wav"],
                    terms_i["loss_per_sample"],
                    terms_i[IMAGE_METRIC_KEYS[0]],
                    terms_i[IMAGE_METRIC_KEYS[1]],
                ) + tuple(terms_i[k] for k in extra_keys)
                return jax.tree.map(jnp.add, g_acc, g_i), ys

            g_sum, ys = jax.lax.scan(
                body, jax.tree.map(jnp.zeros_like, state.params), inputs
            )
            grads = jax.tree.map(lambda x: x / n, g_sum)
            loss = ys[0].mean()
            terms = {
                "mse_wav": ys[1].mean(axis=0),
                "loss_per_sample": ys[2].reshape(bsz),
                # microbatch-stacked slices flatten back to batch order
                IMAGE_METRIC_KEYS[0]: ys[3].reshape(
                    (bsz,) + ys[3].shape[2:]
                ),
                IMAGE_METRIC_KEYS[1]: ys[4].reshape(
                    (bsz,) + ys[4].shape[2:]
                ),
            }
            for j, k in enumerate(extra_keys):
                terms[k] = ys[5 + j].mean()
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=params,
            opt_state=opt_state,
        )
        new_state = new_state.replace(ema_params=update_ema(new_state, params))
        if loss_aware:
            new_state = new_state.replace(
                sampler_state=sampler.update(
                    state.sampler_state, t, terms["loss_per_sample"]
                )
            )
        metrics = {
            "loss": loss,
            "mse_wav": terms["mse_wav"],
            "loss_per_sample": terms["loss_per_sample"],
            "t": t,
            IMAGE_METRIC_KEYS[0]: terms[IMAGE_METRIC_KEYS[0]],
            IMAGE_METRIC_KEYS[1]: terms[IMAGE_METRIC_KEYS[1]],
        }
        if lesion_weight:
            metrics["mse_lesion"] = terms["mse_lesion"]
        if lesion_core_weight:
            metrics["mse_lesion_core"] = terms["mse_lesion_core"]
        if with_norms:
            # measured FREE on the production model (651.8 ms with vs
            # 650.7 without: XLA overlaps the two abs-max passes), so the
            # TrainLoop always uses with_norms=True; False exists for
            # callers that truly never read the norm metrics
            metrics["grad_max"] = _tree_max_abs(grads)
            metrics["param_max"] = _tree_max_abs(params)
        else:
            metrics["grad_max"] = jnp.zeros(())
            metrics["param_max"] = jnp.zeros(())
        return new_state, metrics

    return step


def make_eval_sample_fn(
    model,
    diffusion: GaussianDiffusion,
    *,
    params_source: str = "params",
):
    """Jitted conditional sampler for in-training validation: one `lax.scan`
    over the full reverse chain (SURVEY §3.2's fusion target)."""

    @jax.jit
    def sample(state: TrainState, cond: jax.Array, key: jax.Array):
        params = (
            state.ema_params[0]
            if params_source == "ema" and state.ema_params
            else state.params
        )

        def model_fn(x, t):
            return model.apply({"params": params}, x, t)

        b = cond.shape[0]
        shape = (b, *cond.shape[1:-1], diffusion.target_channels)
        return diffusion.p_sample_loop(model_fn, shape, key, cond=cond)

    return sample

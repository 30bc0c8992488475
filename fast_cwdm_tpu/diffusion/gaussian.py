"""Gaussian diffusion process as pure JAX functions over a table pytree.

TPU-first re-design of the reference `GaussianDiffusion`
(`/root/reference/guided_diffusion/gaussian_diffusion.py:126-1263`):

* All schedule tables are precomputed in float64 on the host (matching the
  reference's numpy-float64 discipline, `gaussian_diffusion.py:160-205`) and
  stored as float32 HOST numpy tables in a `flax.struct` pytree (lowered as
  embedded constants — zero per-trace device traffic), so the whole
  object threads through `jax.jit`/`lax.scan` without host sync.
* The reverse process (`p_sample_loop`) is a single `lax.scan` — the entire
  T-step chain, including the per-step IDWT→clamp→DWT x0 projection
  (`process_xstart`, `gaussian_diffusion.py:335-354`), compiles to ONE XLA
  program instead of T separate kernel launches.
* Layout is channels-last ``(B, X, Y, Z, C)``; the wavelet latent is C=8 for
  the target and C=24 for the 3-modality condition (reference i2i concat,
  `gaussian_diffusion.py:296-301,1131-1149`).

Intentional deviations from reference bit-rot (documented per SURVEY §7):
`calc_bpd_loop`'s broken `_vb_terms_bptimestepsd` call (`:1218`) is
implemented correctly; DDIM's use-before-def `out` when ``cond_fn`` is set
(`:741-742`) is fixed; deprecated `np.float` usages do not exist here.
"""

from __future__ import annotations

import enum
import functools
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from fast_cwdm_tpu.diffusion import schedules
from fast_cwdm_tpu.ops import wavelet as wv

MODALITIES = ("t1n", "t1c", "t2w", "t2f")


def condition_order(contr: str) -> tuple[str, ...]:
    """Condition modalities, in the reference's concat order
    (`gaussian_diffusion.py:1102-1126`)."""
    if contr not in MODALITIES:
        raise ValueError(f"unknown contrast '{contr}'")
    return tuple(m for m in MODALITIES if m != contr)


class MeanType(str, enum.Enum):
    PREVIOUS_X = "previous_x"
    START_X = "start_x"
    EPSILON = "epsilon"


class VarType(str, enum.Enum):
    LEARNED = "learned"
    FIXED_SMALL = "fixed_small"
    FIXED_LARGE = "fixed_large"
    LEARNED_RANGE = "learned_range"


class LossType(str, enum.Enum):
    MSE = "mse"
    RESCALED_MSE = "rescaled_mse"
    KL = "kl"
    RESCALED_KL = "rescaled_kl"

    def is_vb(self) -> bool:
        return self in (LossType.KL, LossType.RESCALED_KL)


def _extract(table, t: jax.Array, ndim: int) -> jax.Array:
    """Gather per-timestep coefficients and broadcast over trailing dims
    (`_extract_into_tensor`, `gaussian_diffusion.py:1246-1263`). Tables
    are HOST numpy; jnp.asarray lowers them as embedded constants (a
    device-array closure constant would cost a D2H fetch per trace)."""
    out = jnp.asarray(table, dtype=jnp.float32)[t]
    return out.reshape(out.shape + (1,) * (ndim - 1))


@struct.dataclass
class GaussianDiffusion:
    """Diffusion schedule tables + process configuration (a jit-able
    pytree). Tables are HOST numpy float32: consumed only through
    `_extract`, they lower into jitted programs as embedded constants
    with zero device traffic (device-array leaves cost one D2H fetch
    PER TABLE at every trace through the axon tunnel — see PERF.md)."""

    betas: np.ndarray
    alphas_cumprod: np.ndarray
    alphas_cumprod_prev: np.ndarray
    alphas_cumprod_next: np.ndarray
    sqrt_alphas_cumprod: np.ndarray
    sqrt_one_minus_alphas_cumprod: np.ndarray
    log_one_minus_alphas_cumprod: np.ndarray
    sqrt_recip_alphas_cumprod: np.ndarray
    sqrt_recipm1_alphas_cumprod: np.ndarray
    posterior_variance: np.ndarray
    posterior_log_variance_clipped: np.ndarray
    posterior_mean_coef1: np.ndarray
    posterior_mean_coef2: np.ndarray
    fixed_large_variance: np.ndarray
    fixed_large_log_variance: np.ndarray
    log_betas: np.ndarray

    num_timesteps: int = struct.field(pytree_node=False, default=1000)
    mean_type: MeanType = struct.field(
        pytree_node=False, default=MeanType.EPSILON
    )
    var_type: VarType = struct.field(
        pytree_node=False, default=VarType.FIXED_LARGE
    )
    loss_type: LossType = struct.field(pytree_node=False, default=LossType.MSE)
    rescale_timesteps: bool = struct.field(pytree_node=False, default=False)
    mode: str = struct.field(pytree_node=False, default="default")
    wavelet: str = struct.field(pytree_node=False, default="haar")
    target_channels: int = struct.field(pytree_node=False, default=8)
    # False forces the full-spatial IDWT→clamp→DWT per step even for Haar —
    # the reference's execution shape (`gaussian_diffusion.py:335-354`);
    # used by bench.py's faithful baseline leg
    fuse_clip_projection: bool = struct.field(pytree_node=False, default=True)

    # ------------------------------------------------------------------
    # Construction
    # ------------------------------------------------------------------

    @classmethod
    def create(
        cls,
        betas: np.ndarray,
        *,
        # START_X is the only configuration consistent with
        # training_losses' x0 objective (the reference's production flags
        # set predict_xstart=True, run.sh:134); EPSILON remains available
        # for API parity via the factory's predict_xstart flag
        mean_type: MeanType = MeanType.START_X,
        var_type: VarType = VarType.FIXED_LARGE,
        loss_type: LossType = LossType.MSE,
        rescale_timesteps: bool = False,
        mode: str = "default",
        wavelet: str = "haar",
        target_channels: int = 8,
    ) -> "GaussianDiffusion":
        """Precompute all tables in float64 (`gaussian_diffusion.py:160-205`)."""
        betas = np.asarray(betas, dtype=np.float64)
        assert betas.ndim == 1 and (betas > 0).all() and (betas <= 1).all()
        alphas = 1.0 - betas
        acp = np.cumprod(alphas)
        acp_prev = np.append(1.0, acp[:-1])
        acp_next = np.append(acp[1:], 0.0)
        posterior_variance = betas * (1.0 - acp_prev) / (1.0 - acp)
        posterior_log_variance_clipped = np.log(
            np.append(posterior_variance[1], posterior_variance[1:])
        )
        # FIXED_LARGE table (`gaussian_diffusion.py:319-333`)
        fl_var = np.append(posterior_variance[1], betas[1:])
        # HOST float32 tables (numpy, not device arrays): as jit closure
        # constants they lower straight from host memory. Eager
        # `jnp.asarray` tables cost a device round-trip PER TABLE at
        # every trace — measured 66 s/table through the axon tunnel
        # (4 tables → 264 s of a 266 s "compile"); see PERF.md.
        f32 = lambda a: np.asarray(a, dtype=np.float32)  # noqa: E731
        return cls(
            betas=f32(betas),
            alphas_cumprod=f32(acp),
            alphas_cumprod_prev=f32(acp_prev),
            alphas_cumprod_next=f32(acp_next),
            sqrt_alphas_cumprod=f32(np.sqrt(acp)),
            sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - acp)),
            log_one_minus_alphas_cumprod=f32(np.log(1.0 - acp)),
            sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / acp)),
            sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / acp - 1.0)),
            posterior_variance=f32(posterior_variance),
            posterior_log_variance_clipped=f32(posterior_log_variance_clipped),
            posterior_mean_coef1=f32(betas * np.sqrt(acp_prev) / (1.0 - acp)),
            posterior_mean_coef2=f32(
                (1.0 - acp_prev) * np.sqrt(alphas) / (1.0 - acp)
            ),
            fixed_large_variance=f32(fl_var),
            fixed_large_log_variance=f32(np.log(fl_var)),
            log_betas=f32(np.log(betas)),
            num_timesteps=int(betas.shape[0]),
            mean_type=mean_type,
            var_type=var_type,
            loss_type=loss_type,
            rescale_timesteps=rescale_timesteps,
            mode=mode,
            wavelet=wavelet,
            target_channels=target_channels,
        )

    @classmethod
    def named(
        cls,
        noise_schedule: str = "linear",
        steps: int = 1000,
        sample_schedule: str = "direct",
        **kwargs: Any,
    ) -> "GaussianDiffusion":
        return cls.create(
            schedules.get_named_beta_schedule(
                noise_schedule, steps, sample_schedule
            ),
            **kwargs,
        )

    # ------------------------------------------------------------------
    # Forward process q
    # ------------------------------------------------------------------

    def scale_timesteps(self, t: jax.Array) -> jax.Array:
        if self.rescale_timesteps:
            return t.astype(jnp.float32) * (1000.0 / self.num_timesteps)
        return t

    def q_mean_variance(self, x_start, t):
        mean = _extract(self.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
        variance = _extract(1.0 - self.alphas_cumprod, t, x_start.ndim)
        log_variance = _extract(
            self.log_one_minus_alphas_cumprod, t, x_start.ndim
        )
        return mean, variance, log_variance

    def q_sample(self, x_start, t, noise):
        """Sample q(x_t | x_0) (`gaussian_diffusion.py:224-242`)."""
        return (
            _extract(self.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
            + _extract(self.sqrt_one_minus_alphas_cumprod, t, x_start.ndim)
            * noise
        )

    def q_posterior_mean_variance(self, x_start, x_t, t):
        mean = (
            _extract(self.posterior_mean_coef1, t, x_t.ndim) * x_start
            + _extract(self.posterior_mean_coef2, t, x_t.ndim) * x_t
        )
        variance = _extract(self.posterior_variance, t, x_t.ndim)
        log_variance = _extract(
            self.posterior_log_variance_clipped, t, x_t.ndim
        )
        return mean, variance, log_variance

    # ------------------------------------------------------------------
    # Reverse process p
    # ------------------------------------------------------------------

    def predict_xstart_from_eps(self, x_t, t, eps):
        return (
            _extract(self.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t
            - _extract(self.sqrt_recipm1_alphas_cumprod, t, x_t.ndim) * eps
        )

    def predict_xstart_from_xprev(self, x_t, t, xprev):
        c1 = _extract(1.0 / self.posterior_mean_coef1, t, x_t.ndim)
        c2 = _extract(
            self.posterior_mean_coef2 / self.posterior_mean_coef1, t, x_t.ndim
        )
        return c1 * xprev - c2 * x_t

    def predict_eps_from_xstart(self, x_t, t, pred_xstart):
        return (
            _extract(self.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t
            - pred_xstart
        ) / _extract(self.sqrt_recipm1_alphas_cumprod, t, x_t.ndim)

    def _process_xstart(self, x, clip_denoised: bool, denoised_fn=None):
        """x0 projection: IDWT → clamp[0,1] → DWT with the ×3/÷3 LLL
        convention (`gaussian_diffusion.py:335-354`).

        For Haar this uses the fused block-local form
        (:func:`wv.haar_clamp_project`) — two 8×8 matmuls around a clamp
        instead of two full spatial wavelet transforms per step.
        """
        if denoised_fn is not None:
            x = denoised_fn(x)
        if not clip_denoised:
            return x
        if (
            self.fuse_clip_projection
            and self.wavelet in ("haar", "db1")
            and x.shape[-1] == 8
        ):
            return wv.haar_clamp_project(x)
        if x.shape[-1] % 8:
            raise ValueError(
                "clip_denoised projects x0 through an IDWT→clamp→DWT round "
                "trip, which needs a band-fused wavelet latent (channels "
                f"divisible by 8); got {x.shape[-1]} channels. Pass "
                "clip_denoised=False for non-wavelet latents."
            )
        channels = x.shape[-1] // 8
        img = wv.idwt_normalized(x, channels=channels, wavelet=self.wavelet)
        img = jnp.clip(img, 0.0, 1.0)
        return wv.dwt_normalized(img, wavelet=self.wavelet)

    def p_mean_variance(
        self,
        model_fn: Callable[..., jax.Array],
        x: jax.Array,
        t: jax.Array,
        *,
        cond: jax.Array | None = None,
        clip_denoised: bool = True,
        denoised_fn=None,
        model_kwargs: dict | None = None,
    ) -> dict[str, jax.Array]:
        """One model evaluation → (mean, variance, pred_xstart)
        (`gaussian_diffusion.py:269-388`)."""
        model_kwargs = model_kwargs or {}
        nc = self.target_channels
        if self.mode == "i2i":
            x_in = jnp.concatenate([x, cond], axis=-1)
        else:
            x_in = x
        model_output = model_fn(x_in, self.scale_timesteps(t), **model_kwargs)

        if self.var_type in (VarType.LEARNED, VarType.LEARNED_RANGE):
            model_output, var_values = jnp.split(model_output, 2, axis=-1)
            if self.var_type == VarType.LEARNED:
                model_log_variance = var_values
                model_variance = jnp.exp(model_log_variance)
            else:
                min_log = _extract(
                    self.posterior_log_variance_clipped, t, x.ndim
                )
                max_log = _extract(self.log_betas, t, x.ndim)
                frac = (var_values + 1.0) / 2.0
                model_log_variance = frac * max_log + (1.0 - frac) * min_log
                model_variance = jnp.exp(model_log_variance)
        elif self.var_type == VarType.FIXED_LARGE:
            model_variance = _extract(self.fixed_large_variance, t, x.ndim)
            model_log_variance = _extract(
                self.fixed_large_log_variance, t, x.ndim
            )
        else:  # FIXED_SMALL
            model_variance = _extract(self.posterior_variance, t, x.ndim)
            model_log_variance = _extract(
                self.posterior_log_variance_clipped, t, x.ndim
            )

        if self.mean_type == MeanType.PREVIOUS_X:
            pred_xstart = self._process_xstart(
                self.predict_xstart_from_xprev(x, t, model_output),
                clip_denoised,
                denoised_fn,
            )
            model_mean = model_output
        else:
            if self.mean_type == MeanType.START_X:
                pred_xstart = self._process_xstart(
                    model_output, clip_denoised, denoised_fn
                )
            else:  # EPSILON
                pred_xstart = self._process_xstart(
                    self.predict_xstart_from_eps(x, t, model_output),
                    clip_denoised,
                    denoised_fn,
                )
            x_ref = x[..., :nc] if self.mode == "i2i" else x
            model_mean, _, _ = self.q_posterior_mean_variance(
                pred_xstart, x_ref, t
            )

        return {
            "mean": model_mean,
            "variance": model_variance * jnp.ones_like(model_mean),
            "log_variance": model_log_variance * jnp.ones_like(model_mean),
            "pred_xstart": pred_xstart,
        }

    def p_sample(
        self,
        model_fn,
        x,
        t,
        key: jax.Array,
        *,
        cond=None,
        clip_denoised=True,
        denoised_fn=None,
        cond_fn=None,
        model_kwargs=None,
    ):
        """Ancestral step x_t → x_{t-1} (`gaussian_diffusion.py:529-574`);
        ``cond_fn`` applies classifier guidance to the posterior mean
        (`:569-572`)."""
        out = self.p_mean_variance(
            model_fn,
            x,
            t,
            cond=cond,
            clip_denoised=clip_denoised,
            denoised_fn=denoised_fn,
            model_kwargs=model_kwargs,
        )
        if cond_fn is not None:
            out["mean"] = self.condition_mean(
                cond_fn, out, x, t, model_kwargs=model_kwargs
            )
        noise = jax.random.normal(key, x.shape, dtype=x.dtype)
        nonzero = (t != 0).astype(x.dtype).reshape(
            (-1,) + (1,) * (x.ndim - 1)
        )
        sample = out["mean"] + nonzero * jnp.exp(
            0.5 * out["log_variance"]
        ) * noise
        return {"sample": sample, "pred_xstart": out["pred_xstart"]}

    def p_sample_loop(
        self,
        model_fn,
        shape: Sequence[int],
        key: jax.Array,
        *,
        cond=None,
        noise=None,
        clip_denoised=True,
        denoised_fn=None,
        cond_fn=None,
        model_kwargs=None,
        time: int | None = None,
        chunk_size: int | None = None,
        params=None,
    ) -> jax.Array:
        """Full reverse chain as ONE `lax.scan` (vs the reference's Python
        loop over `p_sample`, `gaussian_diffusion.py:668-719`).

        Unlike the reference — whose `p_sample_loop` hard-codes ``time=1000``
        and therefore breaks for short sampled schedules unless callers reach
        into `p_sample_loop_progressive(time=...)` directly
        (`complete_dataset.py:270-278`) — ``time`` here defaults to
        ``self.num_timesteps``.

        ``chunk_size``: run the chain as ⌈T/chunk⌉ separately-dispatched
        scans of ``chunk_size`` steps (identical numerics). Use for very
        long chains (e.g. the classic 1000-step schedule) where a single
        monolithic device program is impractical; equal-size chunks share
        one compilation.

        ``params``: model parameters as an explicit pytree; when given,
        ``model_fn`` is called as ``model_fn(params, x, t)`` and the
        chunked path runs ONE module-level jitted segment with params (and
        the schedule tables) as jit ARGUMENTS — reused across chunks AND
        across calls (pass a stable ``model_fn``, not a per-call lambda).
        Without ``params``, ``model_fn(x, t)`` is a closure and the chunk
        program embeds whatever it closes over as HLO constants — fine for
        small models; for the 81M-param production model always pass
        ``params`` (or use `cli.common.make_synthesis_fn`).
        """
        t_total = self.num_timesteps if time is None else time
        key_init, key_loop = jax.random.split(key)
        img = (
            noise
            if noise is not None
            else jax.random.normal(key_init, tuple(shape), dtype=jnp.float32)
        )
        ts = jnp.arange(t_total - 1, -1, -1)
        keys = jax.random.split(key_loop, t_total)
        net = (
            model_fn
            if params is None
            else (lambda x, t: model_fn(params, x, t))
        )

        if chunk_size and chunk_size < t_total:
            if params is not None:
                for s in range(0, t_total, chunk_size):
                    img = _run_p_segment(
                        self, params, img,
                        ts[s : s + chunk_size], keys[s : s + chunk_size],
                        cond, model_kwargs,
                        model_fn=model_fn, clip_denoised=clip_denoised,
                        denoised_fn=denoised_fn, cond_fn=cond_fn,
                    )
                return img
            run_chunk = jax.jit(
                lambda im, ts_c, keys_c, cond_c: self.scan_steps(
                    model_fn,
                    im,
                    ts_c,
                    keys_c,
                    cond=cond_c,
                    clip_denoised=clip_denoised,
                    denoised_fn=denoised_fn,
                    cond_fn=cond_fn,
                    model_kwargs=model_kwargs,
                )
            )
            for s in range(0, t_total, chunk_size):
                img = run_chunk(
                    img, ts[s : s + chunk_size], keys[s : s + chunk_size],
                    cond,
                )
            return img

        return self.scan_steps(
            net,
            img,
            ts,
            keys,
            cond=cond,
            clip_denoised=clip_denoised,
            denoised_fn=denoised_fn,
            cond_fn=cond_fn,
            model_kwargs=model_kwargs,
        )

    def scan_steps(
        self,
        model_fn,
        img: jax.Array,
        ts: jax.Array,
        keys: jax.Array,
        *,
        cond=None,
        clip_denoised=True,
        denoised_fn=None,
        cond_fn=None,
        model_kwargs=None,
    ) -> jax.Array:
        """Scan an arbitrary timestep segment (building block for
        `p_sample_loop` and for caller-managed chunking where model params
        must stay jit ARGUMENTS rather than closure constants)."""

        def step(carry, inp):
            t_scalar, k = inp
            t = jnp.full((img.shape[0],), t_scalar, dtype=jnp.int32)
            out = self.p_sample(
                model_fn,
                carry,
                t,
                k,
                cond=cond,
                clip_denoised=clip_denoised,
                denoised_fn=denoised_fn,
                cond_fn=cond_fn,
                model_kwargs=model_kwargs,
            )
            return out["sample"], None

        final, _ = jax.lax.scan(step, img, (ts, keys))
        return final

    # ------------------------------------------------------------------
    # Classifier guidance (`gaussian_diffusion.py:422-473`; dead in the
    # reference's scripts but part of the public surface)
    # ------------------------------------------------------------------

    def condition_mean(self, cond_fn, p_mean_var, x, t, model_kwargs=None):
        """Shift the posterior mean by Σ·∇ₓ log p(y|x)
        (`gaussian_diffusion.py:422-439`)."""
        gradient = cond_fn(x, self.scale_timesteps(t), **(model_kwargs or {}))
        return (
            p_mean_var["mean"].astype(jnp.float32)
            + p_mean_var["variance"] * gradient.astype(jnp.float32)
        )

    def condition_score(self, cond_fn, p_mean_var, x, t, model_kwargs=None):
        """Score-based conditioning (`condition_score2`,
        `gaussian_diffusion.py:441-473`): adjust eps by
        -√(1-ᾱ)·∇ₓ log p(y|x), recompute x0 and posterior mean."""
        x_ref = x[..., : self.target_channels] if self.mode == "i2i" else x
        abar = _extract(self.alphas_cumprod, t, x_ref.ndim)
        eps = self.predict_eps_from_xstart(x_ref, t, p_mean_var["pred_xstart"])
        gradient = cond_fn(x, self.scale_timesteps(t), **(model_kwargs or {}))
        eps = eps - jnp.sqrt(1.0 - abar) * gradient
        out = dict(p_mean_var)
        out["pred_xstart"] = self.predict_xstart_from_eps(x_ref, t, eps)
        out["mean"], _, _ = self.q_posterior_mean_variance(
            out["pred_xstart"], x_ref, t
        )
        return out

    def p_sample_loop_known(
        self,
        model_fn,
        shape,
        key,
        *,
        img: jax.Array,
        cond=None,
        clip_denoised=True,
        denoised_fn=None,
        cond_fn=None,
        model_kwargs=None,
        noise_level: int = 500,
        time: int | None = None,
    ):
        """Legacy partial-noising loop (`p_sample_loop_known`,
        `gaussian_diffusion.py:576-666`): noise a KNOWN image to
        ``noise_level`` with q_sample, then denoise from there."""
        t_total = min(
            noise_level, self.num_timesteps if time is None else time
        )
        key_noise, key_loop = jax.random.split(key)
        noise = jax.random.normal(key_noise, tuple(shape), dtype=jnp.float32)
        t0 = jnp.full((shape[0],), t_total - 1, dtype=jnp.int32)
        x = self.q_sample(img, t0, noise)
        return self.p_sample_loop(
            model_fn,
            shape,
            key_loop,
            cond=cond,
            noise=x,
            clip_denoised=clip_denoised,
            denoised_fn=denoised_fn,
            cond_fn=cond_fn,
            model_kwargs=model_kwargs,
            time=t_total,
        )

    def sample_known(
        self,
        model_fn,
        img: jax.Array,
        key: jax.Array,
        *,
        cond=None,
        clip_denoised=True,
        denoised_fn=None,
        cond_fn=None,
        model_kwargs=None,
        noise_level: int = 500,
        time: int | None = None,
    ):
        """Thin wrapper over :meth:`p_sample_loop_known`
        (`gaussian_diffusion.py:475-478`). Documented deviation: the
        reference version cannot execute — it references an undefined
        ``model`` and nonexistent ``self.image_size``/``self.channels``
        attributes; here the shape is derived from ``img`` and the model
        is a parameter, which is the evident intent."""
        return self.p_sample_loop_known(
            model_fn,
            tuple(img.shape),
            key,
            img=img,
            cond=cond,
            clip_denoised=clip_denoised,
            denoised_fn=denoised_fn,
            cond_fn=cond_fn,
            model_kwargs=model_kwargs,
            noise_level=noise_level,
            time=time,
        )

    def p_sample_loop_interpolation(
        self,
        model_fn,
        shape,
        key,
        *,
        img1: jax.Array,
        img2: jax.Array,
        lambdaint: float,
        cond=None,
        clip_denoised=True,
        denoised_fn=None,
        cond_fn=None,
        model_kwargs=None,
        noise_level: int = 300,
        time: int | None = None,
    ):
        """Latent interpolation (`gaussian_diffusion.py:626-666`): q_sample
        both endpoints to ``noise_level`` with SHARED noise, mix
        ``lambdaint·x1 + (1−lambdaint)·x2``, then denoise the mixture.
        Returns ``(sample, interpol, img1, img2)`` like the reference.

        Documented deviations: the reference hard-codes t=299
        (``th.randint(299, 300, ...)``) and then denoises only steps
        298..0 — one step short of its own noising level; here
        ``noise_level`` is a parameter and the chain runs
        ``noise_level-1..0``, consistent with :meth:`p_sample_loop_known`.
        """
        t_total = min(
            noise_level, self.num_timesteps if time is None else time
        )
        key_noise, key_loop = jax.random.split(key)
        noise = jax.random.normal(key_noise, tuple(shape), dtype=jnp.float32)
        t0 = jnp.full((shape[0],), t_total - 1, dtype=jnp.int32)
        x_noisy1 = self.q_sample(img1, t0, noise)
        x_noisy2 = self.q_sample(img2, t0, noise)
        interpol = lambdaint * x_noisy1 + (1.0 - lambdaint) * x_noisy2
        sample = self.p_sample_loop(
            model_fn,
            shape,
            key_loop,
            cond=cond,
            noise=interpol,
            clip_denoised=clip_denoised,
            denoised_fn=denoised_fn,
            cond_fn=cond_fn,
            model_kwargs=model_kwargs,
            time=t_total,
        )
        return sample, interpol, img1, img2

    def p_sample_loop_progressive(
        self,
        model_fn,
        shape,
        key,
        *,
        cond=None,
        noise=None,
        clip_denoised=True,
        denoised_fn=None,
        cond_fn=None,
        model_kwargs=None,
        time: int | None = None,
    ):
        """Python generator yielding each step (API parity with
        `gaussian_diffusion.py:668-719`); prefer :meth:`p_sample_loop`."""
        t_total = self.num_timesteps if time is None else time
        key_init, key_loop = jax.random.split(key)
        img = (
            noise
            if noise is not None
            else jax.random.normal(key_init, tuple(shape), dtype=jnp.float32)
        )
        step = jax.jit(
            lambda x, t, k: self.p_sample(
                model_fn, x, t, k, cond=cond, clip_denoised=clip_denoised,
                denoised_fn=denoised_fn, cond_fn=cond_fn,
                model_kwargs=model_kwargs,
            )
        )
        for i in range(t_total - 1, -1, -1):
            t = jnp.full((img.shape[0],), i, dtype=jnp.int32)
            key_loop, sub = jax.random.split(key_loop)
            out = step(img, t, sub)
            yield out
            img = out["sample"]

    # ------------------------------------------------------------------
    # DDIM (`gaussian_diffusion.py:721-1047`; implemented without the
    # reference's interp1d bit-rot — standard eta-parameterized DDIM)
    # ------------------------------------------------------------------

    def ddim_sample(
        self,
        model_fn,
        x,
        t,
        key,
        *,
        cond=None,
        clip_denoised=True,
        denoised_fn=None,
        eta: float = 0.0,
        cond_fn=None,
        model_kwargs=None,
    ):
        """DDIM step; ``cond_fn`` applies score-based guidance (the
        reference's `condition_score2` hook at `gaussian_diffusion.py:
        741-742`, which is use-before-def bit-rot there — fixed here by
        conditioning AFTER p_mean_variance)."""
        out = self.p_mean_variance(
            model_fn,
            x,
            t,
            cond=cond,
            clip_denoised=clip_denoised,
            denoised_fn=denoised_fn,
            model_kwargs=model_kwargs,
        )
        if cond_fn is not None:
            out = self.condition_score(
                cond_fn, out, x, t, model_kwargs=model_kwargs
            )
        x_ref = x[..., : self.target_channels] if self.mode == "i2i" else x
        eps = self.predict_eps_from_xstart(x_ref, t, out["pred_xstart"])
        abar = _extract(self.alphas_cumprod, t, x_ref.ndim)
        abar_prev = _extract(self.alphas_cumprod_prev, t, x_ref.ndim)
        sigma = (
            eta
            * jnp.sqrt((1 - abar_prev) / (1 - abar))
            * jnp.sqrt(1 - abar / abar_prev)
        )
        mean_pred = (
            out["pred_xstart"] * jnp.sqrt(abar_prev)
            + jnp.sqrt(1 - abar_prev - sigma**2) * eps
        )
        noise = jax.random.normal(key, x_ref.shape, dtype=x_ref.dtype)
        nonzero = (t != 0).astype(x_ref.dtype).reshape(
            (-1,) + (1,) * (x_ref.ndim - 1)
        )
        sample = mean_pred + nonzero * sigma * noise
        return {"sample": sample, "pred_xstart": out["pred_xstart"]}

    def ddim_reverse_sample(
        self, model_fn, x, t, *, cond=None, clip_denoised=True,
        denoised_fn=None, model_kwargs=None
    ):
        """Deterministic ODE step x_t → x_{t+1} (`gaussian_diffusion.py:838-866`)."""
        out = self.p_mean_variance(
            model_fn,
            x,
            t,
            cond=cond,
            clip_denoised=clip_denoised,
            denoised_fn=denoised_fn,
            model_kwargs=model_kwargs,
        )
        x_ref = x[..., : self.target_channels] if self.mode == "i2i" else x
        eps = self.predict_eps_from_xstart(x_ref, t, out["pred_xstart"])
        abar_next = _extract(self.alphas_cumprod_next, t, x_ref.ndim)
        mean_pred = (
            out["pred_xstart"] * jnp.sqrt(abar_next)
            + jnp.sqrt(1 - abar_next) * eps
        )
        return {"sample": mean_pred, "pred_xstart": out["pred_xstart"]}

    def ddim_sample_loop(
        self,
        model_fn,
        shape,
        key,
        *,
        cond=None,
        noise=None,
        clip_denoised=True,
        denoised_fn=None,
        eta: float = 0.0,
        cond_fn=None,
        model_kwargs=None,
        time: int | None = None,
    ) -> jax.Array:
        t_total = self.num_timesteps if time is None else time
        key_init, key_loop = jax.random.split(key)
        img = (
            noise
            if noise is not None
            else jax.random.normal(key_init, tuple(shape), dtype=jnp.float32)
        )
        ts = jnp.arange(t_total - 1, -1, -1)
        keys = jax.random.split(key_loop, t_total)
        return self.ddim_scan_steps(
            model_fn,
            img,
            ts,
            keys,
            cond=cond,
            clip_denoised=clip_denoised,
            denoised_fn=denoised_fn,
            eta=eta,
            cond_fn=cond_fn,
            model_kwargs=model_kwargs,
        )

    def ddim_scan_steps(
        self,
        model_fn,
        img: jax.Array,
        ts: jax.Array,
        keys: jax.Array,
        *,
        cond=None,
        clip_denoised=True,
        denoised_fn=None,
        eta: float = 0.0,
        cond_fn=None,
        model_kwargs=None,
    ) -> jax.Array:
        """DDIM counterpart of `scan_steps`: scan an arbitrary timestep
        segment, so callers can chunk long DDIM chains into separately
        dispatched device programs with params as jit arguments."""

        def step(carry, inp):
            t_scalar, k = inp
            t = jnp.full((img.shape[0],), t_scalar, dtype=jnp.int32)
            out = self.ddim_sample(
                model_fn,
                carry,
                t,
                k,
                cond=cond,
                clip_denoised=clip_denoised,
                denoised_fn=denoised_fn,
                eta=eta,
                cond_fn=cond_fn,
                model_kwargs=model_kwargs,
            )
            return out["sample"], None

        final, _ = jax.lax.scan(step, img, (ts, keys))
        return final

    def ddim_sample_loop_known(
        self,
        model_fn,
        shape,
        key,
        *,
        img: jax.Array,
        clip_denoised=True,
        denoised_fn=None,
        cond_fn=None,
        model_kwargs=None,
        eta: float = 0.0,
        noise_level: int = 1000,
        time: int | None = None,
    ):
        """DDIM chain conditioned on a known image
        (`gaussian_diffusion.py:914-968`): fresh noise at the target shape,
        ``img`` threaded as channel-concat conditioning (the reference's
        ``segmentation_img`` is concatenated onto x before each model call,
        `:1025-1027`; here that concat is p_mean_variance's i2i path, so
        this requires ``mode='i2i'`` when ``img`` should condition).
        Returns ``(sample, x_noisy, img)`` with ``x_noisy=None``, matching
        the reference's return shape (its ``x_noisy`` is always None; its
        ``t``/``indices`` locals are dead bit-rot)."""
        if self.mode != "i2i":
            # the reference ALWAYS concatenates segmentation_img onto the
            # model input (`:1025-1027`); silently dropping it would return
            # unconditional samples unrelated to img
            raise ValueError(
                "ddim_sample_loop_known conditions on img by channel "
                "concat, which requires mode='i2i' (got "
                f"mode={self.mode!r})"
            )
        t_total = min(
            noise_level, self.num_timesteps if time is None else time
        )
        sample = self.ddim_sample_loop(
            model_fn,
            shape,
            key,
            cond=img,
            clip_denoised=clip_denoised,
            denoised_fn=denoised_fn,
            cond_fn=cond_fn,
            model_kwargs=model_kwargs,
            eta=eta,
            time=t_total,
        )
        return sample, None, img

    def ddim_sample_loop_interpolation(
        self,
        model_fn,
        shape,
        key,
        *,
        img1: jax.Array,
        img2: jax.Array,
        lambdaint: float,
        cond=None,
        clip_denoised=True,
        denoised_fn=None,
        cond_fn=None,
        model_kwargs=None,
        eta: float = 0.0,
        noise_level: int = 200,
        time: int | None = None,
    ):
        """DDIM latent interpolation (`gaussian_diffusion.py:827-866`):
        q_sample both endpoints with SHARED noise, mix, denoise with DDIM.
        Returns ``(sample, interpol, img1, img2)``.

        Documented deviations: the reference hard-codes t=199 and denoises
        198..0 (same off-by-one as its ancestral twin); parameterized and
        made consistent here."""
        t_total = min(
            noise_level, self.num_timesteps if time is None else time
        )
        key_noise, key_loop = jax.random.split(key)
        noise = jax.random.normal(key_noise, tuple(shape), dtype=jnp.float32)
        t0 = jnp.full((shape[0],), t_total - 1, dtype=jnp.int32)
        x_noisy1 = self.q_sample(img1, t0, noise)
        x_noisy2 = self.q_sample(img2, t0, noise)
        interpol = lambdaint * x_noisy1 + (1.0 - lambdaint) * x_noisy2
        sample = self.ddim_sample_loop(
            model_fn,
            shape,
            key_loop,
            cond=cond,
            noise=interpol,
            clip_denoised=clip_denoised,
            denoised_fn=denoised_fn,
            cond_fn=cond_fn,
            model_kwargs=model_kwargs,
            eta=eta,
            time=t_total,
        )
        return sample, interpol, img1, img2

    def ddim_sample_loop_progressive(
        self,
        model_fn,
        shape,
        key,
        *,
        cond=None,
        noise=None,
        clip_denoised=True,
        denoised_fn=None,
        eta: float = 0.0,
        cond_fn=None,
        model_kwargs=None,
        time: int | None = None,
    ):
        """Per-step DDIM generator (`gaussian_diffusion.py:941-1007`);
        prefer the scanned :meth:`ddim_sample_loop`."""
        t_total = self.num_timesteps if time is None else time
        key_init, key_loop = jax.random.split(key)
        img = (
            noise
            if noise is not None
            else jax.random.normal(key_init, tuple(shape), dtype=jnp.float32)
        )
        step = jax.jit(
            lambda x, t, k: self.ddim_sample(
                model_fn, x, t, k, cond=cond,
                clip_denoised=clip_denoised, denoised_fn=denoised_fn,
                eta=eta, cond_fn=cond_fn, model_kwargs=model_kwargs,
            )
        )
        for i in range(t_total - 1, -1, -1):
            t = jnp.full((img.shape[0],), i, dtype=jnp.int32)
            key_loop, sub = jax.random.split(key_loop)
            out = step(img, t, sub)
            yield out
            img = out["sample"]

    def dpm_solver_pp_loop(self, model_fn, shape, key, **kwargs) -> jax.Array:
        """DPM-Solver++ multistep sampling — second-order ODE solver in the
        x0-prediction parameterisation; ~4x fewer model evaluations than
        DDIM at matched quality (beyond-reference capability, see
        :mod:`fast_cwdm_tpu.diffusion.dpm`)."""
        from fast_cwdm_tpu.diffusion.dpm import dpm_solver_pp_loop

        return dpm_solver_pp_loop(self, model_fn, shape, key, **kwargs)

    # ------------------------------------------------------------------
    # Training losses
    # ------------------------------------------------------------------

    def training_losses(
        self,
        model_fn,
        batch: dict[str, jax.Array] | jax.Array,
        t: jax.Array,
        key: jax.Array,
        *,
        contr: str = "t1n",
        mode: str | None = None,
        model_kwargs: dict | None = None,
        noise_img: jax.Array | None = None,
    ):
        """x0-prediction MSE in wavelet space (`gaussian_diffusion.py:1084-1166`).

        ``batch``: dict of image-space volumes ``(B, X, Y, Z, 1)`` per
        modality in i2i mode, or a single array otherwise. Noise is drawn in
        image space and DWT'd, mirroring the reference (`:1143-1145`) —
        distributionally identical to latent-space noise (orthonormal Haar)
        but kept for traceability.

        Returns ``(terms, model_output, model_output_idwt)`` where
        ``terms['mse_wav']`` is the per-subband (8,) MSE.

        The objective is ALWAYS x0-prediction MSE (the reference trains
        this regardless of its enums, `gaussian_diffusion.py:1164`), so
        sampling must be configured with ``mean_type=START_X``
        (``predict_xstart=True``) — the reference's run.sh:134 does; a
        mismatched diffusion would train an x0-predictor and then sample
        it as an epsilon-predictor, yielding silent garbage. KL loss types
        are likewise not trainable here (enum kept for API parity).
        """
        if self.mean_type != MeanType.START_X:
            raise ValueError(
                "training_losses trains an x0-predictor (wavelet-space MSE)"
                f" but this diffusion has mean_type={self.mean_type}; build"
                " it with predict_xstart=True / MeanType.START_X so sampling"
                " interprets the model output correctly"
            )
        mode = mode or self.mode
        model_kwargs = model_kwargs or {}
        wavelet = self.wavelet

        if mode == "i2i":
            target = batch[contr]
            conds = [batch[m] for m in condition_order(contr)]
            cond_dwt = jnp.concatenate(
                [wv.dwt_normalized(c, wavelet) for c in conds], axis=-1
            )
        else:
            target = batch
            cond_dwt = None

        x_start_dwt = wv.dwt_normalized(target, wavelet)
        if noise_img is None:  # explicit noise: deterministic parity tests
            noise_img = jax.random.normal(key, target.shape, dtype=target.dtype)
        noise_dwt = wv.dwt3_flat(noise_img, wavelet)  # no LLL scaling (:1145)
        x_t = self.q_sample(x_start_dwt, t, noise_dwt)
        if mode == "i2i":
            x_t = jnp.concatenate([x_t, cond_dwt], axis=-1)

        model_output = model_fn(
            x_t, self.scale_timesteps(t), **model_kwargs
        )
        model_output_idwt = wv.idwt_normalized(
            model_output, channels=1, wavelet=wavelet
        )
        # per-subband MSE: mean over spatial dims then over batch (:1164)
        sq = (x_start_dwt - model_output) ** 2
        mse_wav = sq.mean(axis=tuple(range(1, sq.ndim - 1))).mean(axis=0)
        # per-example scalar loss, for loss-aware timestep samplers
        # (the reference's sampler-weight plumbing is dead code — it shadows
        # the weights with ones, `train_util.py:447-449`)
        terms = {
            "mse_wav": mse_wav,
            "loss_per_sample": sq.mean(axis=tuple(range(1, sq.ndim))),
        }
        return terms, model_output, model_output_idwt

    # ------------------------------------------------------------------
    # Variational bound (implemented correctly; the reference's
    # `calc_bpd_loop` is broken bit-rot, `gaussian_diffusion.py:1218`)
    # ------------------------------------------------------------------

    def vb_terms_bpd(
        self, model_fn, x_start, x_t, t, *, cond=None, clip_denoised=True
    ):
        from fast_cwdm_tpu.diffusion import losses as L

        true_mean, _, true_log_var = self.q_posterior_mean_variance(
            x_start, x_t, t
        )
        out = self.p_mean_variance(
            model_fn, x_t, t, cond=cond, clip_denoised=clip_denoised
        )
        kl = L.normal_kl(
            true_mean, true_log_var, out["mean"], out["log_variance"]
        )
        kl = L.mean_flat(kl) / np.log(2.0)
        decoder_nll = -L.discretized_gaussian_log_likelihood(
            x_start, means=out["mean"], log_scales=0.5 * out["log_variance"]
        )
        decoder_nll = L.mean_flat(decoder_nll) / np.log(2.0)
        output = jnp.where(t == 0, decoder_nll, kl)
        return {"output": output, "pred_xstart": out["pred_xstart"]}

    def prior_bpd(self, x_start):
        from fast_cwdm_tpu.diffusion import losses as L

        b = x_start.shape[0]
        t = jnp.full((b,), self.num_timesteps - 1, dtype=jnp.int32)
        mean, _, log_var = self.q_mean_variance(x_start, t)
        kl = L.normal_kl(mean, log_var, 0.0, 0.0)
        return L.mean_flat(kl) / np.log(2.0)

    def calc_bpd_loop(
        self, model_fn, x_start, key, *, cond=None, clip_denoised=True
    ):
        """Full variational bound over all timesteps
        (`gaussian_diffusion.py:1168-1243` — which is broken bit-rot in the
        reference: it calls a nonexistent ``_vb_terms_bptimestepsd`` at
        `:1218`; implemented correctly here as a documented deviation).

        Returns dict with total_bpd (B,), prior_bpd (B,), vb (B,T),
        xstart_mse (B,T), mse (B,T).
        """
        from fast_cwdm_tpu.diffusion import losses as L

        b = x_start.shape[0]
        vb, xstart_mse, mse = [], [], []
        for ti in range(self.num_timesteps - 1, -1, -1):
            t = jnp.full((b,), ti, dtype=jnp.int32)
            key, sub = jax.random.split(key)
            noise = jax.random.normal(sub, x_start.shape, x_start.dtype)
            x_t = self.q_sample(x_start, t, noise)
            out = self.vb_terms_bpd(
                model_fn, x_start, x_t, t, cond=cond,
                clip_denoised=clip_denoised,
            )
            vb.append(out["output"])
            xstart_mse.append(
                L.mean_flat((out["pred_xstart"] - x_start) ** 2)
            )
            eps = self.predict_eps_from_xstart(x_t, t, out["pred_xstart"])
            mse.append(L.mean_flat((eps - noise) ** 2))
        vb = jnp.stack(vb, axis=1)
        xstart_mse = jnp.stack(xstart_mse, axis=1)
        mse = jnp.stack(mse, axis=1)
        prior = self.prior_bpd(x_start)
        return {
            "total_bpd": vb.sum(axis=1) + prior,
            "prior_bpd": prior,
            "vb": vb,
            "xstart_mse": xstart_mse,
            "mse": mse,
        }


@functools.partial(
    jax.jit,
    static_argnames=("model_fn", "clip_denoised", "denoised_fn", "cond_fn"),
)
def _run_p_segment(
    diffusion: GaussianDiffusion,
    params,
    img,
    ts_c,
    keys_c,
    cond,
    model_kwargs,
    *,
    model_fn,
    clip_denoised,
    denoised_fn,
    cond_fn,
):
    """One compiled ancestral-chain segment for `p_sample_loop(params=...)`.

    Module-level (not rebuilt per call) with the schedule tables, params,
    and conditioning as jit ARGUMENTS — the compiled program is keyed only
    on ``model_fn`` identity, the static flags, and shapes, so equal-size
    chunks reuse ONE executable across chunks and across calls. A
    closure-params variant would embed the 81M-param production tree as
    ~326 MB of HLO constants and recompile per wrapper (PERF.md)."""
    return diffusion.scan_steps(
        lambda x, t: model_fn(params, x, t),
        img,
        ts_c,
        keys_c,
        cond=cond,
        clip_denoised=clip_denoised,
        denoised_fn=denoised_fn,
        cond_fn=cond_fn,
        model_kwargs=model_kwargs,
    )

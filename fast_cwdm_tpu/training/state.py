"""Training state pytree.

Everything the train step mutates lives in one `flax.struct` pytree so the
whole step is a single donated `jit` — no host round-trips per step (the
reference syncs `.item()` scalars and max-norms to host every step,
`train_util.py:371-375`, a known pipeline bubble).

EMA is implemented properly (one shadow pytree per rate); the reference
parses ``ema_rate`` but never creates or updates EMA parameters
(`train_util.py:75-79`, `nn.py:55` has zero call sites) — a documented
intentional deviation.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct


@struct.dataclass
class TrainState:
    step: jax.Array  # int32 scalar, device-resident
    params: Any
    opt_state: optax.OptState
    ema_params: Tuple[Any, ...] = ()
    ema_rates: Tuple[float, ...] = struct.field(pytree_node=False, default=())
    sampler_state: Any = ()

    @classmethod
    def create(
        cls,
        params,
        tx: optax.GradientTransformation,
        *,
        ema_rates: Tuple[float, ...] = (),
        sampler_state: Any = (),
    ) -> "TrainState":
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            # EMA shadows must be distinct buffers, not aliases of params —
            # the train step donates the whole state and XLA rejects
            # donating the same buffer twice
            ema_params=tuple(
                jax.tree.map(lambda p: jnp.array(p, copy=True), params)
                for _ in ema_rates
            ),
            ema_rates=tuple(float(r) for r in ema_rates),
            sampler_state=sampler_state,
        )


def update_ema(state: TrainState, new_params) -> Tuple[Any, ...]:
    """EMA shadow update with warmup:
    ``ema = rate_t·ema + (1-rate_t)·params`` where
    ``rate_t = min(rate, (1+t)/(10+t))`` (t = completed optimizer steps).

    The un-warmed version (the semantics of the reference's unused
    `update_ema`, `nn.py:55-65`) starts the shadow at the RANDOM INIT with
    a 1/(1-rate)-step memory horizon; at rate 0.9999 and the production
    5000-step budget the shadow still mostly remembers the init — measured
    actively harmful (QUALITY.md r4: +ema rows SSIM 0.82 vs 0.99). The
    standard warmup (Polyak/Adam-style debias, as used by e.g. the
    tensorflow ExponentialMovingAverage ``num_updates`` path) makes early
    shadows track params closely and anneal toward the asymptotic rate, so
    EMA is neutral-to-helpful at any budget.
    """
    t = state.step.astype(jnp.float32)
    return tuple(
        jax.tree.map(
            lambda e, p, r=jnp.minimum(rate, (1.0 + t) / (10.0 + t)): (
                e * r + p * (1.0 - r)
            ),
            ema,
            new_params,
        )
        for rate, ema in zip(state.ema_rates, state.ema_params)
    )

"""Timestep schedule samplers (parity with
`/root/reference/guided_diffusion/resample.py`).

`UniformSampler` is the one used in production (`scripts/train.py:63`).
`LossSecondMomentResampler` is importance sampling by per-timestep loss
second moments; the reference syncs history across ranks with
``dist.all_gather`` (`resample.py:83-104`) — here the state is a pure pytree
updated functionally, and cross-device sync happens with `jax.lax.all_gather`
when an ``axis_name`` is supplied (inside `shard_map`/`pmap`) or is a no-op on
a single device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


def create_named_schedule_sampler(name: str, num_timesteps: int):
    """(`resample.py:8-21`)"""
    if name == "uniform":
        return UniformSampler(num_timesteps)
    if name == "loss-second-moment":
        return LossSecondMomentResampler(num_timesteps)
    raise NotImplementedError(f"unknown schedule sampler: {name}")


class UniformSampler:
    """Uniform t with importance weights 1 (`resample.py:42-58`)."""

    def __init__(self, num_timesteps: int):
        self.num_timesteps = num_timesteps

    def sample(self, key: jax.Array, batch_size: int):
        t = jax.random.randint(key, (batch_size,), 0, self.num_timesteps)
        weights = jnp.ones((batch_size,), dtype=jnp.float32)
        return t, weights

    def init_state(self):
        return ()

    def update(self, state, t, losses, axis_name=None):
        return state


@struct.dataclass
class LossAwareState:
    """Ring buffer of recent losses per timestep (`resample.py:110-129`)."""

    loss_history: jax.Array  # (T, K)
    loss_counts: jax.Array  # (T,)


class LossSecondMomentResampler:
    """Importance-sample t ∝ sqrt(E[loss²]) once warmed up
    (`resample.py:106-154`)."""

    def __init__(
        self,
        num_timesteps: int,
        history_per_term: int = 10,
        uniform_prob: float = 0.001,
    ):
        self.num_timesteps = num_timesteps
        self.history_per_term = history_per_term
        self.uniform_prob = uniform_prob

    def init_state(self) -> LossAwareState:
        return LossAwareState(
            loss_history=jnp.zeros(
                (self.num_timesteps, self.history_per_term), dtype=jnp.float32
            ),
            loss_counts=jnp.zeros((self.num_timesteps,), dtype=jnp.int32),
        )

    def _weights(self, state: LossAwareState) -> jax.Array:
        warmed = jnp.all(state.loss_counts == self.history_per_term)
        w = jnp.sqrt(jnp.mean(state.loss_history**2, axis=-1))
        w = w / jnp.sum(w)
        w = w * (1 - self.uniform_prob) + self.uniform_prob / self.num_timesteps
        uniform = jnp.full(
            (self.num_timesteps,), 1.0 / self.num_timesteps, dtype=jnp.float32
        )
        return jnp.where(warmed, w, uniform)

    def sample(self, key: jax.Array, batch_size: int, state: LossAwareState):
        p = self._weights(state)
        t = jax.random.choice(
            key, self.num_timesteps, shape=(batch_size,), p=p
        )
        weights = 1.0 / (self.num_timesteps * p[t])
        return t, weights

    def update(
        self, state: LossAwareState, t, losses, axis_name: str | None = None
    ) -> LossAwareState:
        """Record per-example losses at their timesteps; with ``axis_name``
        gathers across the data axis first (the reference's only real
        collective, `resample.py:83-104`)."""
        if axis_name is not None:
            t = jax.lax.all_gather(t, axis_name).reshape(-1)
            losses = jax.lax.all_gather(losses, axis_name).reshape(-1)

        def body(state, tl):
            ti, li = tl
            count = state.loss_counts[ti]
            at_capacity = count == self.history_per_term
            hist_row = state.loss_history[ti]
            shifted = jnp.concatenate(
                [hist_row[1:], jnp.array([li], dtype=hist_row.dtype)]
            )
            appended = hist_row.at[jnp.minimum(count, self.history_per_term - 1)].set(li)
            new_row = jnp.where(at_capacity, shifted, appended)
            new_hist = state.loss_history.at[ti].set(new_row)
            new_counts = state.loss_counts.at[ti].set(
                jnp.minimum(count + 1, self.history_per_term)
            )
            return (
                LossAwareState(loss_history=new_hist, loss_counts=new_counts),
                None,
            )

        state, _ = jax.lax.scan(body, state, (t, losses))
        return state

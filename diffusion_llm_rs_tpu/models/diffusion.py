"""DDPM diffusion core: noise schedules, forward process, losses, sampler.

TPU-native re-implementation of the reference's diffusion engine
(`diffuse-llm-rs/src/lib.rs`): `create_beta_schedule` (:554-593), `add_noise`
(:1100-1137), `p_losses` (:615-654, truncated in the reference), `p_sample`
(:1152-1215) and the `sample` loop (:853-955).

TPU-first design decisions (SURVEY.md §7):
  - All schedule tables (betas/alphas/alpha_bars/posterior coefficients) are
    precomputed ONCE into a `DiffusionSchedule` pytree — the reference rebuilds
    them every timestep (`lib.rs:1160-1165`, flagged in SURVEY.md §3.2).
  - The sampling loop is a `jax.lax.scan` over the precomputed tables: one XLA
    compilation, no per-step Python dispatch, static shapes throughout.
  - Per-sample timestep vectors `t: [batch]` (the reference's `t: Array1<usize>`,
    `lib.rs:619`) are kept — they are the right abstraction for continuous
    batching of denoise steps (SURVEY.md §7 hard parts).

Where the reference is broken we implement the documented intent: the reference's
`p_sample` applies the posterior-mean coefficient of x0 to x_t and that of x_t to
the predicted *noise* (`lib.rs:1189-1196`) — a garbled DDPM posterior. We
implement the standard DDPM eps-prediction posterior (Ho et al. 2020):

    mean = (x_t - beta_t / sqrt(1 - alpha_bar_t) * eps_hat) / sqrt(alpha_t)
    var  = beta_t * (1 - alpha_bar_{t-1}) / (1 - alpha_bar_t)
"""

from __future__ import annotations

import dataclasses
import enum
import math
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp


class BetaSchedule(str, enum.Enum):
    """Noise schedule family (`diffuse-llm-rs/src/lib.rs:111-118`)."""

    LINEAR = "linear"
    QUADRATIC = "quadratic"
    COSINE = "cosine"


def create_beta_schedule(
    num_timesteps: int,
    beta_start: float = 1e-4,
    beta_end: float = 0.02,
    schedule: BetaSchedule = BetaSchedule.LINEAR,
) -> jax.Array:
    """Beta table for the forward process (`diffuse-llm-rs/src/lib.rs:554-593`).

    Cosine follows Nichol & Dhariwal (arXiv:2102.09672) with s=0.008, computed
    the standard way via alpha_bar ratios: beta_t = 1 - abar(t+1)/abar(t),
    clipped at 0.999. (The reference's cosine at `lib.rs:578-587` uses
    f(t)/f(0) directly, which is abar itself — same curve family; we keep the
    standard ratio form so alphas multiply out to the cosine abar exactly.)
    """
    if num_timesteps <= 0:
        raise ValueError("num_timesteps must be positive")
    t = jnp.arange(num_timesteps, dtype=jnp.float32)
    denom = max(num_timesteps - 1, 1)
    if schedule == BetaSchedule.LINEAR:
        betas = beta_start + (beta_end - beta_start) * t / denom
    elif schedule == BetaSchedule.QUADRATIC:
        t_norm = t / denom
        betas = beta_start + (beta_end - beta_start) * t_norm * t_norm
    elif schedule == BetaSchedule.COSINE:
        s = 0.008
        steps = jnp.arange(num_timesteps + 1, dtype=jnp.float32) / num_timesteps
        f = jnp.cos((steps + s) / (1.0 + s) * math.pi / 2.0) ** 2
        abar = f / f[0]
        betas = jnp.clip(1.0 - abar[1:] / abar[:-1], 0.0, 0.999)
    else:
        raise ValueError(f"unknown schedule {schedule}")
    return betas.astype(jnp.float32)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """Precomputed schedule tables — built once, closed over by jitted steps.

    Fixes the per-step schedule recompute flagged in SURVEY.md §3.2 (reference
    `p_sample` rebuilds betas/alphas/alpha_bars every call, `lib.rs:1160-1165`).
    """

    betas: jax.Array            # [T]
    alphas: jax.Array           # [T] = 1 - betas
    alpha_bars: jax.Array       # [T] inclusive cumprod of alphas
    alpha_bars_prev: jax.Array  # [T] alpha_bars shifted; abar_prev[0] = 1
    sqrt_alpha_bars: jax.Array
    sqrt_one_minus_alpha_bars: jax.Array
    posterior_variance: jax.Array  # [T] beta_t*(1-abar_prev)/(1-abar)

    def tree_flatten(self):
        return tuple(getattr(self, f.name) for f in dataclasses.fields(self)), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def num_timesteps(self) -> int:
        return self.betas.shape[0]

    @classmethod
    def create(
        cls,
        num_timesteps: int,
        beta_start: float = 1e-4,
        beta_end: float = 0.02,
        schedule: BetaSchedule = BetaSchedule.LINEAR,
    ) -> "DiffusionSchedule":
        betas = create_beta_schedule(num_timesteps, beta_start, beta_end, schedule)
        alphas = 1.0 - betas
        alpha_bars = jnp.cumprod(alphas)
        alpha_bars_prev = jnp.concatenate([jnp.ones((1,)), alpha_bars[:-1]])
        posterior_variance = betas * (1.0 - alpha_bars_prev) / (1.0 - alpha_bars)
        return cls(
            betas=betas,
            alphas=alphas,
            alpha_bars=alpha_bars,
            alpha_bars_prev=alpha_bars_prev,
            sqrt_alpha_bars=jnp.sqrt(alpha_bars),
            sqrt_one_minus_alpha_bars=jnp.sqrt(1.0 - alpha_bars),
            posterior_variance=posterior_variance,
        )


def _bcast(coeff_t: jax.Array, x: jax.Array) -> jax.Array:
    """Reshape per-sample coefficients [B] to broadcast against x [B, ...]."""
    return coeff_t.reshape((x.shape[0],) + (1,) * (x.ndim - 1))


def add_noise(
    schedule: DiffusionSchedule,
    x_start: jax.Array,
    t: jax.Array,
    noise: Optional[jax.Array] = None,
    *,
    key: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Forward process q(x_t | x_0) (`diffuse-llm-rs/src/lib.rs:1100-1137`).

    x_t = sqrt(abar_t) * x_0 + sqrt(1 - abar_t) * eps.
    Returns (noisy, noise). `t` is a per-sample int vector [batch].
    """
    if noise is None:
        if key is None:
            raise ValueError("provide `noise` or a PRNG `key`")
        noise = jax.random.normal(key, x_start.shape, x_start.dtype)
    t = jnp.clip(t, 0, schedule.num_timesteps - 1)
    sqrt_abar = _bcast(schedule.sqrt_alpha_bars[t], x_start)
    sqrt_1m = _bcast(schedule.sqrt_one_minus_alpha_bars[t], x_start)
    return sqrt_abar * x_start + sqrt_1m * noise, noise


def p_losses(
    model_fn: Callable[[jax.Array, jax.Array], jax.Array],
    schedule: DiffusionSchedule,
    x_start: jax.Array,
    t: jax.Array,
    noise: Optional[jax.Array] = None,
    *,
    key: Optional[jax.Array] = None,
) -> jax.Array:
    """Per-sample MSE noise-prediction loss (`diffuse-llm-rs/src/lib.rs:615-654`;
    the reference truncates before the loss — we complete the documented intent:
    mean squared error between predicted and actual noise, per sample)."""
    noisy, noise = add_noise(schedule, x_start, t, noise, key=key)
    predicted = model_fn(noisy, t)
    sq = (predicted - noise) ** 2
    return jnp.mean(sq.reshape(sq.shape[0], -1), axis=-1)


def p_sample(
    schedule: DiffusionSchedule,
    x_t: jax.Array,
    t: jax.Array,
    eps_pred: jax.Array,
    key: Optional[jax.Array] = None,
    noise: Optional[jax.Array] = None,
) -> jax.Array:
    """One reverse step x_t -> x_{t-1} (`diffuse-llm-rs/src/lib.rs:1152-1215`).

    Standard DDPM posterior with eps-prediction (see module docstring for the
    deviation from the reference's garbled coefficients). Langevin noise is
    added except at t=0 (`lib.rs:1199-1205`), per-sample. Pass `noise`
    directly (e.g. per-slot noise in the serving batchers, where batch
    membership must not perturb other slots' streams) or a `key`.
    """
    t = jnp.clip(t, 0, schedule.num_timesteps - 1)
    beta_t = _bcast(schedule.betas[t], x_t)
    alpha_t = _bcast(schedule.alphas[t], x_t)
    sqrt_1m_abar = _bcast(schedule.sqrt_one_minus_alpha_bars[t], x_t)
    mean = (x_t - beta_t / sqrt_1m_abar * eps_pred) * jax.lax.rsqrt(alpha_t)
    var = _bcast(schedule.posterior_variance[t], x_t)
    if noise is None:
        if key is None:
            raise ValueError("provide `noise` or a PRNG `key`")
        noise = jax.random.normal(key, x_t.shape, x_t.dtype)
    nonzero = _bcast((t > 0).astype(x_t.dtype), x_t)
    return mean + nonzero * jnp.sqrt(var) * noise


def sample(
    model_fn: Callable[[jax.Array, jax.Array], jax.Array],
    schedule: DiffusionSchedule,
    shape: Tuple[int, ...],
    key: jax.Array,
    num_steps: Optional[int] = None,
    *,
    callback: Optional[Callable] = None,
) -> jax.Array:
    """Full reverse-diffusion sampling loop (`diffuse-llm-rs/src/lib.rs:853-955`).

    `lax.scan` over t = T-1 .. 0 with all tables precomputed; `model_fn(x, t)`
    predicts noise with per-sample timestep vector t [batch]. When num_steps <
    T, a strided subset of timesteps is used (simple DDIM-style respacing of
    the same posterior).
    """
    T = schedule.num_timesteps
    num_steps = num_steps or T
    if num_steps == T:
        ts = jnp.arange(T - 1, -1, -1)
    else:
        ts = jnp.linspace(T - 1, 0, num_steps).round().astype(jnp.int32)

    batch = shape[0]
    key, init_key = jax.random.split(key)
    x = jax.random.normal(init_key, shape, jnp.float32)

    def step(carry, t_scalar):
        x, key = carry
        key, sub = jax.random.split(key)
        t_vec = jnp.full((batch,), t_scalar, jnp.int32)
        eps = model_fn(x, t_vec)
        x = p_sample(schedule, x, t_vec, eps, sub)
        if callback is not None:
            # host-side observer (progress/inspection); runs under jit via
            # debug.callback — ordered so per-step logs arrive in sequence
            jax.debug.callback(callback, t_scalar, x, ordered=True)
        return (x, key), None

    (x, _), _ = jax.lax.scan(step, (x, key), ts)
    return x

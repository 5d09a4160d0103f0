"""Train a tiny denoiser on synthetic data, then sample from it.

Mirrors `diffuse-llm-rs/examples/diffusion_example.rs` (SURVEY.md §3.5): build
a config, run a few epochs of `p_losses` training, then sample — but with the
training step actually completing (the reference truncates mid-loss) and the
sampler living on the engine (the reference calls `config.sample`, a method
that doesn't exist — SURVEY.md §3.5 note).

Run: python examples/diffusion_example.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diffusion_llm_rs_tpu.utils.platform import honor_platform_env

honor_platform_env()

import jax
import jax.numpy as jnp
import optax

from diffusion_llm_rs_tpu.models import denoiser as dn
from diffusion_llm_rs_tpu.models import diffusion as dm


def main():
    T = 100
    feature_dim = 16
    schedule = dm.DiffusionSchedule.create(
        T, beta_start=1e-4, beta_end=0.02, schedule=dm.BetaSchedule.LINEAR)

    # toy dataset: two gaussian clusters (the reference trains on random data)
    key = jax.random.PRNGKey(0)
    key, dk = jax.random.split(key)
    centers = jnp.where(jax.random.bernoulli(dk, 0.5, (512, 1)), 2.0, -2.0)
    data = centers + 0.1 * jax.random.normal(dk, (512, feature_dim))

    params = dn.init_simple_denoiser(jax.random.PRNGKey(1), feature_dim)
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state, x0, t, key):
        def loss_fn(p):
            return jnp.mean(dm.p_losses(
                lambda x, tt: dn.simple_denoiser_forward(p, x, tt),
                schedule, x0, t, key=key))
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for epoch in range(5):
        key, ek, tk = jax.random.split(key, 3)
        t = jax.random.randint(tk, (data.shape[0],), 0, T)
        params, opt_state, loss = train_step(params, opt_state, data, t, ek)
        print(f"epoch {epoch}: loss {float(loss):.4f}")

    samples = dm.sample(
        lambda x, t: dn.simple_denoiser_forward(params, x, t),
        schedule, (8, feature_dim), jax.random.PRNGKey(2), num_steps=50)
    print("samples:", samples.shape, "mean", float(jnp.mean(samples)))


if __name__ == "__main__":
    main()

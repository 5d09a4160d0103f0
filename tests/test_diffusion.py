"""Diffusion core tests (reference `test_diffusion_process`,
`diffuse-llm-rs/src/lib.rs:1264-1294`, plus distributional checks per
SURVEY.md §7 gate 2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_llm_rs_tpu.models import diffusion as dm
from diffusion_llm_rs_tpu.models import denoiser as dn


def test_beta_schedule_linear():
    betas = dm.create_beta_schedule(1000, 1e-4, 0.02, dm.BetaSchedule.LINEAR)
    assert betas.shape == (1000,)
    assert float(betas[0]) == pytest.approx(1e-4, rel=1e-4)
    assert float(betas[-1]) == pytest.approx(0.02, rel=1e-4)
    assert bool(jnp.all(betas > 0)) and bool(jnp.all(betas < 1))


def test_beta_schedule_quadratic():
    betas = dm.create_beta_schedule(100, 1e-4, 0.02, dm.BetaSchedule.QUADRATIC)
    # slower initial increase than linear
    lin = dm.create_beta_schedule(100, 1e-4, 0.02, dm.BetaSchedule.LINEAR)
    assert float(betas[25]) < float(lin[25])
    assert float(betas[-1]) == pytest.approx(0.02, rel=1e-4)


def test_beta_schedule_cosine():
    betas = dm.create_beta_schedule(1000, schedule=dm.BetaSchedule.COSINE)
    assert bool(jnp.all(betas >= 0)) and bool(jnp.all(betas <= 0.999))
    # cosine abar should decay from ~1 to ~0
    abar = jnp.cumprod(1.0 - betas)
    assert float(abar[0]) > 0.99
    assert float(abar[-1]) < 0.01


def test_add_noise_shapes_and_limits():
    sched = dm.DiffusionSchedule.create(1000)
    x = jnp.zeros((2, 10))
    t = jnp.array([10, 20])
    noisy, noise = dm.add_noise(sched, x, t, key=jax.random.PRNGKey(0))
    assert noisy.shape == (2, 10) and noise.shape == (2, 10)
    # for x=0: noisy = sqrt(1-abar_t) * noise
    ratio = noisy / noise
    expected = jnp.sqrt(1 - sched.alpha_bars[t])[:, None]
    np.testing.assert_allclose(np.asarray(ratio), np.asarray(
        jnp.broadcast_to(expected, ratio.shape)), rtol=1e-5)


def test_add_noise_t_extremes():
    sched = dm.DiffusionSchedule.create(100)
    x = jnp.ones((1, 8))
    noisy0, _ = dm.add_noise(sched, x, jnp.array([0]), key=jax.random.PRNGKey(1))
    # at t=0 almost no noise
    assert float(jnp.mean(jnp.abs(noisy0 - x))) < 0.1
    noisyT, noiseT = dm.add_noise(sched, x, jnp.array([99]),
                                  key=jax.random.PRNGKey(2))
    # at t=T mostly noise
    assert float(jnp.corrcoef(noisyT.ravel(), noiseT.ravel())[0, 1]) > 0.9


def test_p_losses_perfect_model_zero_loss():
    sched = dm.DiffusionSchedule.create(100)
    x = jnp.ones((4, 16))
    key = jax.random.PRNGKey(3)
    noise = jax.random.normal(key, x.shape)
    # a "model" that returns the exact noise -> loss 0
    loss = dm.p_losses(lambda xx, tt: noise, sched, x,
                       jnp.array([5, 20, 50, 90]), noise=noise)
    assert loss.shape == (4,)
    np.testing.assert_allclose(np.asarray(loss), 0.0, atol=1e-10)


def test_sample_shapes():
    sched = dm.DiffusionSchedule.create(50)
    out = dm.sample(lambda x, t: x * 0.0, sched, (2, 10),
                    jax.random.PRNGKey(0))
    assert out.shape == (2, 10)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_sample_recovers_1d_gaussian():
    """Distributional gate (SURVEY.md §7 step 2): with the analytically optimal
    eps-predictor for x0 ~ N(mu, sigma^2), samples land near that gaussian."""
    mu, sigma = 3.0, 0.5
    sched = dm.DiffusionSchedule.create(200)

    def optimal_eps(x, t):
        # E[eps | x_t] for gaussian data via the posterior mean of x0:
        # x_t ~ N(sqrt(a)mu, a s^2 + (1-a));
        # E[x0|x_t] = mu + sqrt(a)s^2/(a s^2 + 1-a) (x_t - sqrt(a)mu)
        abar = sched.alpha_bars[t][:, None]
        s2 = sigma ** 2
        gain = jnp.sqrt(abar) * s2 / (abar * s2 + 1 - abar)
        e_x0 = mu + gain * (x - jnp.sqrt(abar) * mu)
        return (x - jnp.sqrt(abar) * e_x0) / jnp.sqrt(1 - abar)

    out = dm.sample(optimal_eps, sched, (256, 1), jax.random.PRNGKey(7))
    m = float(jnp.mean(out))
    s = float(jnp.std(out))
    assert abs(m - mu) < 0.3, m
    assert abs(s - sigma) < 0.3, s


def test_respaced_sampling():
    sched = dm.DiffusionSchedule.create(100)
    out = dm.sample(lambda x, t: x * 0.0, sched, (1, 4),
                    jax.random.PRNGKey(0), num_steps=10)
    assert out.shape == (1, 4)


# --- denoiser models -------------------------------------------------------

def test_simple_denoiser():
    params = dn.init_simple_denoiser(jax.random.PRNGKey(0), 10)
    x = jnp.ones((2, 10))
    y = dn.simple_denoiser_forward(params, x, jnp.array([1, 2]))
    assert y.shape == (2, 10)


def _tiny_cfg():
    from diffusion_llm_rs_tpu.config import DiffusionConfig
    return DiffusionConfig.tiny()


def test_transformer_denoiser_forward():
    cfg = _tiny_cfg()
    params = dn.init_denoiser_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, cfg.hidden_size))
    t = jnp.array([3, 7])
    eps = dn.denoiser_forward(params, cfg, x, t)
    assert eps.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(eps)))


def test_transformer_denoiser_kv_roundtrip():
    cfg = _tiny_cfg()
    params = dn.init_denoiser_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, cfg.hidden_size))
    t = jnp.array([3, 7])
    eps1, kv = dn.denoiser_forward(params, cfg, x, t, return_kv=True)
    assert kv[0].shape == (cfg.num_layers, 2, 8, cfg.num_attention_heads,
                           cfg.head_dim)
    # feeding back its own fresh kv == self-attention -> identical output
    eps2 = dn.denoiser_forward(params, cfg, x, t, cached_kv=kv)
    np.testing.assert_allclose(np.asarray(eps1), np.asarray(eps2),
                               rtol=2e-4, atol=2e-5)


def test_denoiser_timestep_sensitivity():
    cfg = _tiny_cfg()
    params = dn.init_denoiser_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, cfg.hidden_size))
    e1 = dn.denoiser_forward(params, cfg, x, jnp.array([1]))
    e2 = dn.denoiser_forward(params, cfg, x, jnp.array([40]))
    assert float(jnp.max(jnp.abs(e1 - e2))) > 1e-6


def test_embed_and_logits_shapes():
    cfg = _tiny_cfg()
    params = dn.init_denoiser_params(jax.random.PRNGKey(0), cfg)
    ids = jnp.array([[1, 2, 3]])
    x = dn.embed_tokens(params, ids)
    assert x.shape == (1, 3, cfg.hidden_size)
    logits = dn.logits_from_hidden(params, x)
    assert logits.shape == (1, 3, cfg.vocab_size)
    # exact embedding decodes to its own token
    decoded = dn.decode_tokens(params, x)
    np.testing.assert_array_equal(np.asarray(decoded), np.asarray(ids))

"""GSPMD sharding tests on the 8-virtual-device CPU mesh (SURVEY.md §4:
"multi-host logic tested single-process via mesh over CPU devices")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from diffusion_llm_rs_tpu.config import DiffusionConfig
from diffusion_llm_rs_tpu.models import denoiser as dn
from diffusion_llm_rs_tpu.models.diffusion import DiffusionSchedule
from diffusion_llm_rs_tpu.parallel import mesh as pm
from diffusion_llm_rs_tpu.quant.core import quantize


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    return pm.make_mesh()


def test_make_mesh_shape(mesh8):
    assert dict(zip(mesh8.axis_names, mesh8.devices.shape)) == {
        "data": 2, "model": 4}
    with pytest.raises(ValueError):
        pm.make_mesh(shape=(3, 2))


def test_spec_rules():
    assert pm.spec_for_path("blocks/0/attn/wqkv") == P(None, "model")
    assert pm.spec_for_path("blocks/3/attn/wo") == P("model", None)
    assert pm.spec_for_path("blocks/1/mlp/w1") == P(None, "model")
    assert pm.spec_for_path("tok_embed") == P("model", None)
    assert pm.spec_for_path("blocks/0/ln1/scale") == P()


def test_shard_params_placement(mesh8):
    cfg = DiffusionConfig.tiny(hidden_size=64, num_attention_heads=4)
    params = dn.init_denoiser_params(jax.random.PRNGKey(0), cfg)
    sharded = pm.shard_params(params, mesh8)
    wqkv = sharded["blocks"][0]["attn"]["wqkv"]
    # column-parallel: N axis split over 4 model shards
    shard_shape = wqkv.sharding.shard_shape(wqkv.shape)
    assert shard_shape == (64, 192 // 4)
    wo = sharded["blocks"][0]["attn"]["wo"]
    assert wo.sharding.shard_shape(wo.shape) == (16, 64)
    # layernorm replicated
    ln = sharded["blocks"][0]["ln1"]["scale"]
    assert ln.sharding.shard_shape(ln.shape) == ln.shape


def test_shard_quantized_weight(mesh8):
    qt = quantize(jnp.ones((256, 64)), 4, granularity="group",
                  group_size=128, axis=0)
    sharded = pm.shard_params({"blocks": [{"attn": {"wq": qt}}]}, mesh8)
    sq = sharded["blocks"][0]["attn"]["wq"]
    # packed data sharded like the fp weight (columns over 'model')
    assert sq.data.sharding.shard_shape(sq.data.shape) == (256, 64 // 4 // 2)
    # group sidecars follow: [n_groups, N] -> N over 'model'
    assert sq.scale.sharding.shard_shape(sq.scale.shape) == (2, 16)
    np.testing.assert_allclose(np.asarray(sq.dequantize()),
                               np.ones((256, 64)), atol=0.1)


def test_sharded_infer_step(mesh8):
    cfg = DiffusionConfig.tiny(hidden_size=64, num_attention_heads=4)
    params = pm.shard_params(
        dn.init_denoiser_params(jax.random.PRNGKey(0), cfg), mesh8)
    x = pm.shard_batch(jax.random.normal(jax.random.PRNGKey(1), (4, 8, 64)),
                       mesh8)
    t = pm.shard_batch(jnp.zeros((4,), jnp.int32), mesh8)
    with mesh8:
        infer = pm.make_sharded_infer_step(cfg, mesh8)
        eps = infer(params, x, t)
    assert eps.shape == (4, 8, 64)
    assert bool(jnp.all(jnp.isfinite(eps)))
    # output batch-sharded over 'data'
    assert eps.sharding.shard_shape(eps.shape)[0] == 2


def test_sharded_train_step_reduces_loss(mesh8):
    cfg = DiffusionConfig.tiny(hidden_size=64, num_attention_heads=4,
                               num_timesteps=20)
    schedule = DiffusionSchedule.create(20)
    params = pm.shard_params(
        dn.init_denoiser_params(jax.random.PRNGKey(0), cfg), mesh8)
    key = jax.random.PRNGKey(1)
    x0 = pm.shard_batch(jax.random.normal(key, (8, 8, 64)), mesh8)
    t = pm.shard_batch(jax.random.randint(key, (8,), 0, 20), mesh8)
    noise = pm.shard_batch(jax.random.normal(key, x0.shape), mesh8)
    with mesh8:
        train = pm.make_sharded_train_step(cfg, mesh8, schedule, lr=1e-2)
        p1, loss1 = train(params, x0, t, noise)
        losses = [float(loss1)]
        p = p1
        for _ in range(5):
            p, loss = train(p, x0, t, noise)
            losses.append(float(loss))
    assert losses[-1] < losses[0]  # SGD on a fixed batch must descend


def test_sharded_sample_step(mesh8):
    from diffusion_llm_rs_tpu.models.diffusion import DiffusionSchedule
    cfg = DiffusionConfig.tiny(hidden_size=64, num_attention_heads=4,
                               num_timesteps=10)
    schedule = DiffusionSchedule.create(10)
    params = pm.shard_params(
        dn.init_denoiser_params(jax.random.PRNGKey(0), cfg), mesh8)
    sampler = pm.make_sharded_sample_step(cfg, mesh8, schedule)
    out = sampler(params, jax.random.PRNGKey(1), batch=4, seq_len=8,
                  num_steps=3)
    assert out.shape == (4, 8, 64)
    assert bool(jnp.all(jnp.isfinite(out)))
    assert out.sharding.shard_shape(out.shape)[0] == 2  # data-sharded

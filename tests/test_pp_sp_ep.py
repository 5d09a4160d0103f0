"""Pipeline / sequence / expert parallelism on the 8-virtual-device CPU mesh.

Each strategy is validated by exact (tolerance) agreement with the
single-device dense forward — the same roundtrip-style oracle pattern the
reference uses for its numerics (SURVEY.md §4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

try:
    from jax import shard_map
except ImportError:
    from jax.experimental.shard_map import shard_map

from diffusion_llm_rs_tpu.config import DiffusionConfig
from diffusion_llm_rs_tpu.models import denoiser as dn
from diffusion_llm_rs_tpu.models import moe as moe_mod
from diffusion_llm_rs_tpu.parallel import pp as pp_mod
from diffusion_llm_rs_tpu.parallel import sp as sp_mod


@pytest.fixture(scope="module")
def cfg():
    return DiffusionConfig.tiny(hidden_size=32, num_layers=4,
                                num_attention_heads=4,
                                max_sequence_length=64)


@pytest.fixture(scope="module")
def params(cfg):
    return dn.init_denoiser_params(jax.random.PRNGKey(0), cfg)


def _inputs(cfg, batch=4, seq=32, seed=1):
    kx, kt = jax.random.split(jax.random.PRNGKey(seed))
    x = jax.random.normal(kx, (batch, seq, cfg.hidden_size), jnp.float32)
    t = jax.random.randint(kt, (batch,), 0, cfg.num_timesteps)
    return x, t


# ---------------------------------------------------------------------------
# Sequence parallel (ring attention)
# ---------------------------------------------------------------------------


def test_ring_attention_matches_full():
    mesh = sp_mod.make_seq_mesh(4)
    B, S, H, Hd = 2, 32, 4, 8
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    q = jax.random.normal(ks[0], (B, S, H, Hd), jnp.float32)
    k = jax.random.normal(ks[1], (B, S, H, Hd), jnp.float32)
    v = jax.random.normal(ks[2], (B, S, H, Hd), jnp.float32)

    ref = dn.attention(q, k, v)

    f = shard_map(
        lambda qq, kk, vv: sp_mod.ring_attention(qq, kk, vv, "seq", 4),
        mesh=mesh,
        in_specs=(P(None, "seq"), P(None, "seq"), P(None, "seq")),
        out_specs=P(None, "seq"), check_vma=False)
    out = jax.jit(f)(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_sp_forward_matches_dense(cfg, params):
    mesh = sp_mod.make_seq_mesh(4)
    x, t = _inputs(cfg)
    ref = dn.denoiser_forward(params, cfg, x, t)
    out = sp_mod.make_sp_forward(cfg, mesh)(params, x, t)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_sp_forward_rejects_ragged_seq(cfg, params):
    mesh = sp_mod.make_seq_mesh(4)
    x, t = _inputs(cfg, seq=30)
    with pytest.raises(ValueError, match="not divisible"):
        sp_mod.make_sp_forward(cfg, mesh)(params, x, t)


# ---------------------------------------------------------------------------
# Pipeline parallel (GPipe)
# ---------------------------------------------------------------------------


def test_stack_stage_params_shapes(cfg, params):
    stacked = pp_mod.stack_stage_params(params, 4)
    # 4 layers over 4 stages -> 1 block per stage; leaves gain stage axis
    wqkv = stacked[0]["attn"]["wqkv"]
    assert wqkv.shape == (4, cfg.hidden_size, 3 * cfg.hidden_size)
    with pytest.raises(ValueError, match="not divisible"):
        pp_mod.stack_stage_params(params, 3)


def test_pp_forward_matches_dense(cfg, params):
    mesh = pp_mod.make_stage_mesh(4)
    stacked = pp_mod.place_stage_params(
        pp_mod.stack_stage_params(params, 4), mesh)
    x, t = _inputs(cfg)
    ref = dn.denoiser_forward(params, cfg, x, t)
    out = pp_mod.make_pp_forward(cfg, mesh, n_micro=2)(params, stacked, x, t)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_pp_forward_single_microbatch(cfg, params):
    mesh = pp_mod.make_stage_mesh(2)
    stacked = pp_mod.place_stage_params(
        pp_mod.stack_stage_params(params, 2), mesh)
    x, t = _inputs(cfg, batch=2, seed=7)
    ref = dn.denoiser_forward(params, cfg, x, t)
    out = pp_mod.make_pp_forward(cfg, mesh, n_micro=1)(params, stacked, x, t)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


# ---------------------------------------------------------------------------
# Expert parallel (MoE)
# ---------------------------------------------------------------------------


def test_moe_forward_runs_and_routes(cfg):
    E = 4
    params = moe_mod.init_moe_denoiser_params(jax.random.PRNGKey(2), cfg, E)
    x, t = _inputs(cfg, batch=2, seq=16)
    out = moe_mod.moe_denoiser_forward(params, cfg, x, t)
    assert out.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(out)))


def test_moe_dispatch_keeps_all_tokens_at_high_capacity():
    # capacity_factor = E covers the worst case (all tokens on one expert)
    D, E, T = 8, 2, 16
    key = jax.random.PRNGKey(0)
    p = {
        "router": jax.random.normal(key, (D, E)) * 0.02,
        "w1": jnp.zeros((E, D, 4 * D)), "b1": jnp.zeros((E, 4 * D)),
        "w2": jnp.zeros((E, 4 * D, D)), "b2": jnp.ones((E, D)),
    }
    h = jax.random.normal(jax.random.PRNGKey(1), (1, T, D))
    y = moe_mod.moe_mlp(p, h, capacity_factor=float(E))
    # zero weights + unit bias -> every kept token returns gate * 1;
    # all tokens kept -> nothing is exactly zero
    assert bool(jnp.all(jnp.abs(y) > 0))


def test_ep_forward_matches_unsharded(cfg):
    E = 8
    params = moe_mod.init_moe_denoiser_params(jax.random.PRNGKey(5), cfg, E)
    mesh = moe_mod.make_expert_mesh(8)
    x, t = _inputs(cfg, batch=2, seq=16, seed=9)
    ref = moe_mod.moe_denoiser_forward(params, cfg, x, t)
    ep_params = moe_mod.place_ep_params(params, mesh)
    out = moe_mod.make_ep_forward(cfg, mesh)(ep_params, x, t)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
    # expert banks actually sharded: each device holds E/8 experts
    w1 = ep_params["blocks"][0]["moe"]["w1"]
    assert w1.sharding.shard_shape(w1.shape)[0] == E // 8


def test_moe_sorted_dispatch_matches_dense():
    """Ragged (sort-based) dispatch is bit-equivalent to the GShard dense
    dispatch tensor, including the first-come-first-kept drop order at a
    tight capacity."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from diffusion_llm_rs_tpu.models import moe as moe_mod

    key = jax.random.PRNGKey(0)
    B, S, D, E = 2, 16, 32, 4
    p = {
        "router": jax.random.normal(key, (D, E)) * 0.5,
        "w1": jax.random.normal(jax.random.fold_in(key, 1), (E, D, 2 * D)) * 0.1,
        "b1": jnp.zeros((E, 2 * D)),
        "w2": jax.random.normal(jax.random.fold_in(key, 2), (E, 2 * D, D)) * 0.1,
        "b2": jnp.zeros((E, D)),
    }
    h = jax.random.normal(jax.random.fold_in(key, 3), (B, S, D))
    for cap in (0.5, 1.25, float(E)):   # with and without drops
        dense = moe_mod.moe_mlp(p, h, capacity_factor=cap, dispatch="dense")
        ragged = moe_mod.moe_mlp(p, h, capacity_factor=cap, dispatch="sorted")
        np.testing.assert_allclose(np.asarray(ragged), np.asarray(dense),
                                   rtol=1e-5, atol=1e-5)


def test_moe_auto_dispatch_picks_sorted_at_scale():
    from diffusion_llm_rs_tpu.models import moe as moe_mod
    import jax, jax.numpy as jnp, numpy as np
    key = jax.random.PRNGKey(1)
    D, E = 8, 64
    p = {
        "router": jax.random.normal(key, (D, E)) * 0.5,
        "w1": jax.random.normal(jax.random.fold_in(key, 1), (E, D, D)) * 0.1,
        "b1": jnp.zeros((E, D)),
        "w2": jax.random.normal(jax.random.fold_in(key, 2), (E, D, D)) * 0.1,
        "b2": jnp.zeros((E, D)),
    }
    h = jax.random.normal(jax.random.fold_in(key, 3), (4, 128, D))
    # E*C = 64 * ceil(1.25*512/64) = 640 > 8*D=64 -> auto picks sorted; just
    # pin it runs and matches dense
    out_auto = moe_mod.moe_mlp(p, h, dispatch="auto")
    out_dense = moe_mod.moe_mlp(p, h, dispatch="dense")
    np.testing.assert_allclose(np.asarray(out_auto), np.asarray(out_dense),
                               rtol=1e-5, atol=1e-5)

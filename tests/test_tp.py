"""Megatron-TP shard_map forward tests: fp and quantized weights, vs the
single-device reference (8-virtual-CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_llm_rs_tpu.config import DiffusionConfig
from diffusion_llm_rs_tpu.models import denoiser as dn
from diffusion_llm_rs_tpu.ops.pallas_matmul import MatmulWeight, prepare
from diffusion_llm_rs_tpu.parallel import mesh as pm
from diffusion_llm_rs_tpu.parallel import tp
from diffusion_llm_rs_tpu.quant.core import QuantizedTensor, quantize_tree


@pytest.fixture(scope="module")
def mesh4():
    return pm.make_mesh(shape=(2, 4))


def _cfg():
    return DiffusionConfig.tiny(hidden_size=64, num_attention_heads=4,
                                vocab_size=256)


def _quantize(params, bits=4, group=32):
    qp = quantize_tree(params, bits, symmetric=True, granularity="group",
                       group_size=group, axis=0, min_size=512)

    def prep(l):
        if isinstance(l, QuantizedTensor) and l.ndim == 2:
            try:
                return prepare(l)
            except ValueError:
                return l
        return l
    return jax.tree_util.tree_map(
        prep, qp, is_leaf=lambda l: isinstance(l, QuantizedTensor))


def test_tp_fp_matches_single_device(mesh4):
    cfg = _cfg()
    params = dn.init_denoiser_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 64))
    t = jnp.array([1, 5])
    ref = dn.denoiser_forward(params, cfg, x, t)
    stacked = tp.place_tp_params(params, mesh4)
    fwd = tp.make_tp_forward(cfg, mesh4)
    out = fwd(stacked, x, t)
    # psum reduction order vs single-device: f32 noise only
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 1e-3, rel


def test_tp_quantized_matches_single_device(mesh4):
    cfg = _cfg()
    params = dn.init_denoiser_params(jax.random.PRNGKey(0), cfg)
    qparams = _quantize(params)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 64))
    t = jnp.array([1, 5])
    ref = dn.denoiser_forward(qparams, cfg, x, t)
    stacked = tp.place_tp_params(qparams, mesh4)
    fwd = tp.make_tp_forward(cfg, mesh4)
    out = fwd(stacked, x, t)
    # per-shard kernels + psum vs single fused kernel: bf16-accumulation-order
    # differences only
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 5e-2, rel


def test_split_weight_column_and_row():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(64, 64)).astype(np.float32))
    from diffusion_llm_rs_tpu.quant.core import quantize
    mw = prepare(quantize(w, 4, granularity="group", group_size=32, axis=0))
    cols = [tp._split_weight(mw, 1, 4, i) for i in range(4)]
    recon = np.concatenate([np.asarray(c.dequantize()) for c in cols], axis=1)
    np.testing.assert_allclose(recon, np.asarray(mw.dequantize()), atol=1e-6)
    rows = [tp._split_weight(mw, 0, 2, i) for i in range(2)]
    recon_r = np.concatenate([np.asarray(r.dequantize()) for r in rows], axis=0)
    np.testing.assert_allclose(recon_r, np.asarray(mw.dequantize()), atol=1e-6)


def test_split_weight_straddling_groups_requantizes():
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.normal(size=(96, 32)).astype(np.float32))
    from diffusion_llm_rs_tpu.quant.core import quantize
    mw = prepare(quantize(w, 4, granularity="group", group_size=32, axis=0))
    # tp=3 -> k_loc=32 aligns; tp=2 -> k_loc=48, 48%32!=0 -> requantize path
    rows = [tp._split_weight(mw, 0, 2, i) for i in range(2)]
    assert rows[0].group_size == 16  # gcd(32, 48)
    recon = np.concatenate([np.asarray(r.dequantize()) for r in rows], axis=0)
    # requantized with finer groups: fresh rounding, bounded by the quant step
    step = float(np.ptp(np.asarray(w))) / 15
    assert np.max(np.abs(recon - np.asarray(w))) <= step


def test_split_weight_preserves_a8_mode():
    """TP slicing keeps act_bits=8 + per-column scales on every shard kind."""
    from diffusion_llm_rs_tpu.quant.core import quantize

    w = jnp.asarray(np.random.default_rng(0).normal(size=(64, 96)),
                    jnp.float32)
    mw = prepare(quantize(w, 4, granularity="group", group_size=32, axis=0),
                 act_bits=8)
    col = tp._split_weight(mw, axis=1, tp=2, idx=1)
    assert col.act_bits == 8 and col.col_scale.shape == (1, 48)
    np.testing.assert_allclose(np.asarray(col.col_scale),
                               np.asarray(mw.col_scale[:, 48:]))
    row = tp._split_weight(mw, axis=0, tp=2, idx=0)
    assert row.act_bits == 8 and row.col_scale is not None
    qkv = tp._split_wqkv(mw, tp=2, idx=0)  # 96 = 3*32 -> thirds of 16
    assert qkv.act_bits == 8 and qkv.col_scale.shape == (1, 48)


def test_shard_tp_params_rejects_raw_quantized_tensor():
    """Raw QuantizedTensor leaves must be prepare()d first: slicing their
    packed uint8 data as fp columns (with the global shape aux) silently
    corrupts the shard (review r5)."""
    from diffusion_llm_rs_tpu.parallel.tp import shard_tp_params
    from diffusion_llm_rs_tpu.quant.core import quantize_tree

    cfg = DiffusionConfig.tiny()
    params = dn.init_denoiser_params(jax.random.PRNGKey(0), cfg)
    qp = quantize_tree(params, 4, symmetric=True, granularity="group",
                       group_size=32, axis=0)
    with pytest.raises(TypeError, match="prepare"):
        shard_tp_params(qp, 2)


def test_tp_forward_rejects_nondividing_heads():
    from diffusion_llm_rs_tpu.parallel.tp import (shard_tp_params,
                                                  tp_denoiser_forward)
    cfg = DiffusionConfig.tiny(num_attention_heads=4)
    params = dn.init_denoiser_params(jax.random.PRNGKey(0), cfg)
    local = shard_tp_params(params, 2)[0]
    x = jnp.zeros((1, 8, cfg.hidden_size))
    t = jnp.zeros((1,), jnp.int32)
    with pytest.raises(ValueError, match="divisible"):
        tp_denoiser_forward(local, cfg, x, t, tp=3)

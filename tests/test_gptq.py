"""GPTQ error-compensated weight quantization (quant/gptq.py).

The reference declares a GPTQ-shaped config (`quantization/src/types.rs:112-132`:
quant_method "gptq", group_size, desc_act, true_sequential) with no
implementation behind it. These tests pin down the TPU build's real one:
same storage layout as RTN (so the Pallas fused-matmul kernels consume the
output unchanged), strictly lower activation-weighted error than RTN.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_llm_rs_tpu.config import DiffusionConfig
from diffusion_llm_rs_tpu.models import denoiser as dn
from diffusion_llm_rs_tpu.models.diffusion import DiffusionSchedule
from diffusion_llm_rs_tpu.quant.core import QuantizedTensor, dequantize, quantize
from diffusion_llm_rs_tpu.quant.gptq import (
    HessianCollector,
    gptq_quantize_matrix,
    gptq_quantize_tree,
    make_calib_batches,
)


def _correlated_inputs(key, n, k):
    """Calibration activations with strong feature correlation (the regime
    where error compensation matters; iid inputs make GPTQ ~= RTN)."""
    k1, k2 = jax.random.split(key)
    mix = jax.random.normal(k1, (k, k)) * 0.3 + jnp.eye(k)
    z = jax.random.normal(k2, (n, k))
    # heavy-tailed per-feature scales -> realistic diag(H) spread
    scales = jnp.exp(jax.random.normal(k1, (k,)) * 1.0)
    return (z * scales) @ mix


def _xw_err(x, w, qt):
    wq = dequantize(qt)
    return float(jnp.linalg.norm(x @ (w - wq)))


@pytest.mark.parametrize("bits", [4, 2])
@pytest.mark.parametrize("symmetric", [True, False])
def test_gptq_beats_rtn(bits, symmetric):
    key = jax.random.PRNGKey(0)
    K, N, n_cal = 128, 96, 512
    x = _correlated_inputs(key, n_cal, K)
    w = jax.random.normal(jax.random.PRNGKey(1), (K, N)) * 0.05
    h = np.asarray(x.T @ x, np.float64)

    rtn = quantize(w, bits, symmetric=symmetric, granularity="group",
                   group_size=32, axis=0)
    gptq = gptq_quantize_matrix(w, h, bits, group_size=32,
                                symmetric=symmetric, desc_act=True)
    err_rtn = _xw_err(x, w, rtn)
    err_gptq = _xw_err(x, w, gptq)
    # GPTQ must cut activation-weighted error meaningfully vs RTN
    assert err_gptq < err_rtn * 0.9, (err_gptq, err_rtn)


def test_gptq_layout_matches_rtn():
    """Storage layout parity: identical packed/sidecar shapes and metadata,
    so ops.matmul.linear dispatch consumes GPTQ output unchanged."""
    key = jax.random.PRNGKey(2)
    w = jax.random.normal(key, (128, 64)) * 0.1
    h = np.eye(128)
    gptq = gptq_quantize_matrix(w, h, 4, group_size=32, desc_act=True)
    rtn = quantize(w, 4, symmetric=True, granularity="group",
                   group_size=32, axis=0)
    assert isinstance(gptq, QuantizedTensor)
    assert gptq.data.shape == rtn.data.shape
    assert gptq.scale.shape == rtn.scale.shape
    assert gptq.zero_point.shape == rtn.zero_point.shape
    assert (gptq.bits, gptq.shape, gptq.granularity, gptq.group_size,
            gptq.axis) == (rtn.bits, rtn.shape, rtn.granularity,
                           rtn.group_size, rtn.axis)


def test_gptq_identity_hessian_reduces_to_rtn():
    """With an identity Hessian (no input correlation) and desc_act off,
    there is nothing to compensate: GPTQ must reproduce RTN bit-for-bit."""
    key = jax.random.PRNGKey(3)
    w = jax.random.normal(key, (64, 48)) * 0.1
    h = np.eye(64)
    gptq = gptq_quantize_matrix(w, h, 4, group_size=32, symmetric=True,
                                desc_act=False, damp=0.0)
    rtn = quantize(w, 4, symmetric=True, granularity="group",
                   group_size=32, axis=0)
    np.testing.assert_array_equal(np.asarray(gptq.data), np.asarray(rtn.data))
    np.testing.assert_allclose(np.asarray(gptq.scale), np.asarray(rtn.scale),
                               rtol=1e-6)


def test_hessian_collector_via_denoiser_tap():
    cfg = DiffusionConfig.tiny()
    params = dn.init_denoiser_params(jax.random.PRNGKey(0), cfg)
    col = HessianCollector(["blocks/0/attn/wqkv", "head/w"])
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, cfg.hidden_size))
    t = jnp.array([3, 7], jnp.int32)
    dn.denoiser_forward(params, cfg, x, t, tap=col.tap)
    assert set(col.h) == {"blocks/0/attn/wqkv", "head/w"}
    D = cfg.hidden_size
    assert col.h["blocks/0/attn/wqkv"].shape == (D, D)
    assert col.count["blocks/0/attn/wqkv"] == 2 * 8
    # H is PSD by construction
    eig = np.linalg.eigvalsh(col.h["head/w"])
    assert eig.min() > -1e-8


def test_gptq_tree_end_to_end_better_than_rtn_tree():
    """Full pipeline: calibrate on noisy embeddings, quantize the whole
    denoiser, compare forward-output error against the RTN-quantized tree."""
    from diffusion_llm_rs_tpu.quant.core import quantize_tree

    cfg = DiffusionConfig.tiny(num_layers=2, hidden_size=64)
    key = jax.random.PRNGKey(0)
    params = dn.init_denoiser_params(key, cfg)
    schedule = DiffusionSchedule.create(cfg.num_timesteps, cfg.beta_start,
                                        cfg.beta_end, cfg.beta_schedule)
    token_batches = [jax.random.randint(jax.random.PRNGKey(i), (2, 16), 0,
                                        cfg.vocab_size) for i in range(2)]
    calib = make_calib_batches(params, cfg, schedule, token_batches,
                               jax.random.PRNGKey(9))

    qtree = gptq_quantize_tree(params, cfg, calib, bits=4,
                               group_size=32, true_sequential=True)
    rtree = quantize_tree(params, 4, group_size=32, symmetric=True)

    # tapped 2-D weights became QuantizedTensors
    assert isinstance(qtree["blocks"][0]["attn"]["wqkv"], QuantizedTensor)
    assert isinstance(qtree["head"]["w"], QuantizedTensor)
    # embeddings stay fp
    assert not isinstance(qtree["tok_embed"], QuantizedTensor)

    x, t = calib[0]
    ref = dn.denoiser_forward(params, cfg, x, t)
    out_g = dn.denoiser_forward(qtree, cfg, x, t)
    out_r = dn.denoiser_forward(rtree, cfg, x, t)
    err_g = float(jnp.linalg.norm(out_g - ref))
    err_r = float(jnp.linalg.norm(out_r - ref))
    assert jnp.all(jnp.isfinite(out_g))
    assert err_g < err_r, (err_g, err_r)

"""Fused dequant+matmul kernel tests — verified against the jnp reference
(interpret mode on CPU, the "fake backend" strategy from SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_llm_rs_tpu.ops import pallas_matmul as pmm
from diffusion_llm_rs_tpu.ops.matmul import linear
from diffusion_llm_rs_tpu.quant.core import dequantize, quantize


def _mk(K=256, N=256, bits=4, granularity="group", group_size=128, seed=0,
        symmetric=False):
    rng = np.random.default_rng(seed)
    w = rng.normal(size=(K, N)).astype(np.float32) * 0.05
    kw = dict(granularity=granularity)
    if granularity == "group":
        kw.update(group_size=group_size, axis=0)
    elif granularity == "channel":
        kw.update(axis=1)
    qt = quantize(jnp.asarray(w), bits, symmetric=symmetric, **kw)
    return w, qt


@pytest.mark.parametrize("bits", [8, 4, 2, 1])
def test_prepare_dequantize_matches_core(bits):
    _, qt = _mk(bits=bits)
    mw = pmm.prepare(qt)
    np.testing.assert_allclose(np.asarray(mw.dequantize()),
                               np.asarray(dequantize(qt)), atol=1e-5)


@pytest.mark.parametrize("bits", [8, 4])
@pytest.mark.parametrize("granularity", ["tensor", "channel", "group"])
def test_kernel_matches_reference(bits, granularity):
    _, qt = _mk(K=256, N=256, bits=bits, granularity=granularity)
    mw = pmm.prepare(qt)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(16, 256)).astype(np.float32))
    ref = jnp.dot(x.astype(jnp.bfloat16),
                  dequantize(qt, jnp.bfloat16),
                  preferred_element_type=jnp.float32)
    out = pmm.matmul(x, mw)
    assert out.shape == (16, 256)
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 2e-2, rel


def test_kernel_int2_segmentation():
    # int2: Kp=K/4; gcd(G=128, Kp) segments exercise the misaligned path
    _, qt = _mk(K=512, N=128, bits=2)
    mw = pmm.prepare(qt)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(8, 512)),
                    jnp.float32)
    ref = jnp.dot(x.astype(jnp.bfloat16), mw.dequantize(jnp.bfloat16),
                  preferred_element_type=jnp.float32)
    out = pmm.matmul(x, mw)
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 3e-2, rel


def test_kernel_3d_input_and_fallback_shapes():
    _, qt = _mk(K=256, N=256, bits=4)
    mw = pmm.prepare(qt)
    x = jnp.ones((2, 8, 256))
    out = pmm.matmul(x, mw)
    assert out.shape == (2, 8, 256)
    # odd M triggers tile fallback but must stay correct
    x_odd = jnp.ones((3, 256))
    out_odd = pmm.matmul(x_odd, mw)
    # kernel vs XLA-fallback differ only by bf16 accumulation order
    np.testing.assert_allclose(np.asarray(out_odd[0]), np.asarray(out[0, 0]),
                               rtol=6e-2, atol=6e-2)


def test_linear_dispatch_matmul_weight():
    w, qt = _mk(K=256, N=128, bits=4)
    mw = pmm.prepare(qt)
    x = jnp.asarray(np.random.default_rng(3).normal(size=(4, 256)),
                    jnp.float32)
    b = jnp.ones((128,))
    y = linear(x, mw, b)
    ref = x @ w + b
    rel = float(jnp.linalg.norm(y - ref) / jnp.linalg.norm(ref))
    assert rel < 0.15  # int4 quantization error dominates


def test_symmetric_weights():
    _, qt = _mk(bits=4, symmetric=True)
    mw = pmm.prepare(qt)
    x = jnp.asarray(np.random.default_rng(4).normal(size=(8, 256)),
                    jnp.float32)
    ref = jnp.dot(x.astype(jnp.bfloat16), mw.dequantize(jnp.bfloat16),
                  preferred_element_type=jnp.float32)
    out = pmm.matmul(x, mw)
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 2e-2


def test_contraction_mismatch_raises():
    _, qt = _mk(K=256, N=128)
    mw = pmm.prepare(qt)
    with pytest.raises(ValueError):
        pmm.matmul(jnp.ones((4, 128)), mw)


def test_fused_bias_gelu_epilogue():
    w, qt = _mk(K=256, N=128, bits=4)
    mw = pmm.prepare(qt)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(16, 256)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(128,)).astype(np.float32))
    out = pmm.matmul(x, mw, bias=b, activation="gelu")
    ref = jax.nn.gelu(
        jnp.dot(x.astype(jnp.bfloat16), mw.dequantize(jnp.bfloat16),
                preferred_element_type=jnp.float32) + b)
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 2e-2, rel
    # via linear() dispatch
    y = linear(x, mw, b, activation="gelu")
    rel2 = float(jnp.linalg.norm(y - ref) / jnp.linalg.norm(ref))
    assert rel2 < 2e-2


def test_fused_bias_fallback_shapes():
    w, qt = _mk(K=256, N=128, bits=4)
    mw = pmm.prepare(qt)
    x = jnp.ones((3, 256))  # odd M -> XLA fallback path
    b = jnp.ones((128,))
    out = pmm.matmul(x, mw, bias=b, activation="gelu")
    ref = jax.nn.gelu(x @ mw.dequantize() + b)
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 5e-2

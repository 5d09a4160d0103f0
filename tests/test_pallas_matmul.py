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


# ---------------------------------------------------------------------------
# int8-activation (MXU int8x int8) path
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("bits", [8, 4, 2])
def test_a8_kernel_matches_xla_twin(bits):
    """Kernel output == the XLA reference implementing the identical math."""
    _, qt = _mk(K=256, N=256, bits=bits)
    mw = pmm.prepare(qt, act_bits=8)
    assert mw.col_scale is not None and mw.col_scale.shape == (1, 256)
    x = jnp.asarray(np.random.default_rng(3).normal(size=(16, 256)),
                    jnp.float32)
    ref = pmm.a8_matmul_reference(x, mw)
    out = pmm.matmul(x, mw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_a8_accuracy_close_to_weight_only():
    """int8 activations add ~1% on top of the int4 weight error: the a8
    output must track x @ dequant(W) (the weight-only result) closely, so
    the int4 step (~10% vs f32 on Gaussians) stays the dominant error."""
    w, qt = _mk(K=256, N=256, bits=4)
    mw = pmm.prepare(qt, act_bits=8)
    x = jnp.asarray(np.random.default_rng(4).normal(size=(32, 256)),
                    jnp.float32)
    weight_only = jnp.dot(x, mw.dequantize(jnp.float32))
    out = pmm.matmul(x, mw)
    rel = float(jnp.linalg.norm(out - weight_only) /
                jnp.linalg.norm(weight_only))
    assert rel < 2e-2, rel


def test_a8_bias_gelu_epilogue():
    _, qt = _mk(K=256, N=256, bits=4)
    mw = pmm.prepare(qt, act_bits=8)
    x = jnp.asarray(np.random.default_rng(5).normal(size=(16, 256)),
                    jnp.float32)
    bias = jnp.asarray(np.random.default_rng(6).normal(size=(256,)),
                       jnp.float32)
    ref = pmm.a8_matmul_reference(x, mw, bias=bias, activation="gelu")
    out = pmm.matmul(x, mw, bias=bias, activation="gelu")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_a8_odd_shape_falls_back():
    """Kernel-unfriendly M routes through the XLA twin with same numerics."""
    _, qt = _mk(K=256, N=256, bits=4)
    mw = pmm.prepare(qt, act_bits=8)
    x = jnp.asarray(np.random.default_rng(7).normal(size=(5, 256)),
                    jnp.float32)
    out = pmm.matmul(x, mw)
    ref = pmm.a8_matmul_reference(x, mw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_a8_weight_jits_as_pytree():
    _, qt = _mk(K=256, N=128, bits=4)
    mw = pmm.prepare(qt, act_bits=8)

    @jax.jit
    def f(x, w):
        return pmm.matmul(x, w)

    x = jnp.ones((8, 256), jnp.float32)
    out = f(x, mw)
    assert out.shape == (8, 128)
    leaves, treedef = jax.tree_util.tree_flatten(mw)
    mw2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert mw2.act_bits == 8 and mw2.col_scale is not None


def test_decoded_int8_matches_a8_reference():
    """decode_to_int8 + XLA int8 linear == the Pallas a8 kernel numerics."""
    from diffusion_llm_rs_tpu.ops.matmul import decode_to_int8, int8_linear

    _, qt = _mk(K=256, N=256, bits=4)
    mw = pmm.prepare(qt, act_bits=8)
    w8 = decode_to_int8(mw)
    x = jnp.asarray(np.random.default_rng(8).normal(size=(16, 256)),
                    jnp.float32)
    ref = pmm.a8_matmul_reference(x, mw)
    out = int8_linear(x, w8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
    # linear() dispatch routes Int8Weight and fuses bias+gelu
    bias = jnp.asarray(np.random.default_rng(9).normal(size=(256,)),
                       jnp.float32)
    out2 = linear(x, w8, bias, activation="gelu")
    ref2 = pmm.a8_matmul_reference(x, mw, bias=bias, activation="gelu")
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2),
                               rtol=1e-5, atol=1e-6)


def test_decoded_int8_from_plain_quantized_tensor():
    from diffusion_llm_rs_tpu.ops.matmul import decode_to_int8

    w, qt = _mk(K=128, N=128, bits=4)
    w8 = decode_to_int8(qt)
    assert w8.data.dtype == jnp.int8 and w8.data.shape == (128, 128)
    rel = float(jnp.linalg.norm(w8.dequantize() - jnp.asarray(w)) /
                np.linalg.norm(w))
    assert rel < 0.12  # int4 step dominates


def test_int8w_matmul_residual_epilogue():
    """Kernel residual add == adding after (exact: both f32 pre-cast)."""
    from diffusion_llm_rs_tpu.ops.matmul import decode_to_int8

    _, qt = _mk(K=256, N=256, bits=4)
    w8 = decode_to_int8(pmm.prepare(qt, act_bits=8))
    rng = np.random.default_rng(10)
    x = jnp.asarray(rng.normal(size=(16, 256)), jnp.float32)
    r = jnp.asarray(rng.normal(size=(16, 256)), jnp.float32)
    base = pmm.int8w_matmul(x, w8.data, w8.col_scale)
    out = pmm.int8w_matmul(x, w8.data, w8.col_scale, residual=r)
    assert base is not None and out is not None
    np.testing.assert_allclose(np.asarray(out), np.asarray(base + r),
                               rtol=1e-6, atol=1e-6)


def test_int8w_mlp_matches_chained_linears():
    """Fused MLP kernel == int8_linear(gelu) -> int8_linear(+residual):
    identical per-row act-quant math, only the HBM round trip removed."""
    from diffusion_llm_rs_tpu.ops.matmul import decode_to_int8, int8_linear

    _, qt1 = _mk(K=256, N=512, bits=4, seed=1)
    _, qt2 = _mk(K=512, N=256, bits=4, seed=2)
    w1 = decode_to_int8(pmm.prepare(qt1, act_bits=8))
    w2 = decode_to_int8(pmm.prepare(qt2, act_bits=8))
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(16, 256)), jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(512,)), jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(256,)), jnp.float32)
    r = jnp.asarray(rng.normal(size=(16, 256)), jnp.float32)
    out = pmm.int8w_mlp(x, w1.data, w1.col_scale, b1, w2.data, w2.col_scale,
                        b2, residual=r, out_dtype=jnp.float32)
    assert out is not None
    inner = int8_linear(x, w1, b1, activation="gelu")
    ref = int8_linear(inner, w2, b2) + r
    # the kernel rounds its inputs to bf16 before per-row act-quant (as the
    # TPU path does); the XLA fallback quantizes from f32 — levels may flip
    # by 1, so compare in norm, not elementwise
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 2e-2, rel  # ~0.5% measured: one act-quant level, an order
    # below the int8 act-quant error itself


def test_int8w_mlp_rejects_oversized():
    from diffusion_llm_rs_tpu.ops.matmul import decode_to_int8

    _, qt1 = _mk(K=256, N=512, bits=4, seed=1)
    w1 = decode_to_int8(pmm.prepare(qt1, act_bits=8))
    big = jnp.zeros((4096, 4096), jnp.int8)
    cs = jnp.ones((1, 4096), jnp.float32)
    out = pmm.int8w_mlp(jnp.zeros((16, 4096)), big, cs,
                        jnp.zeros((4096,)), big, cs, jnp.zeros((4096,)))
    assert out is None


def test_large_k_narrow_n_keeps_fullwidth_kernel():
    """K large enough that the column path's (K, TN) scratch bound rejects
    every TN must still dispatch the FULL-WIDTH kernel when K*N fits its
    VMEM budget (review r5: the K-aware tile bound gated dispatch before
    the full-width branch, silently demoting large-K narrow-N shapes to
    the XLA fallback)."""
    K, N = 20480, 128
    _, qt = _mk(K=K, N=N, bits=4)
    mw = pmm.prepare(qt)
    # the column path is indeed unavailable at this K...
    assert pmm._pick_tile(8, N, K=K) is None
    # ...but full-width fits (K*N*2 <= 6 MiB) and must win the dispatch:
    # the bf16 fallback calls MatmulWeight.dequantize; the kernel never does
    x = jnp.asarray(np.random.default_rng(2).normal(size=(8, K)),
                    jnp.float32)
    ref = jnp.dot(x.astype(jnp.bfloat16), mw.dequantize(jnp.bfloat16),
                  preferred_element_type=jnp.float32)
    called = []
    orig = pmm.MatmulWeight.dequantize
    pmm.MatmulWeight.dequantize = (
        lambda self, *a, **k: (called.append(1), orig(self, *a, **k))[1])
    try:
        out = pmm.matmul(x, mw)
    finally:
        pmm.MatmulWeight.dequantize = orig
    assert not called, "matmul took the XLA dequantize fallback"
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 2e-2, rel


def test_large_k_narrow_n_keeps_fullwidth_kernel_a8():
    """Same dispatch guarantee for the int8-activation path: full-width
    (K*N under budget) must not be gated by the column path's scratch
    bound."""
    K, N = 20480, 128
    _, qt = _mk(K=K, N=N, bits=4)
    mw = pmm.prepare(qt, act_bits=8)
    x = jnp.asarray(np.random.default_rng(3).normal(size=(8, K)),
                    jnp.float32)
    ref = pmm.a8_matmul_reference(x, mw, None, None, jnp.float32)
    called = []
    orig = pmm.a8_matmul_reference
    pmm.a8_matmul_reference = (
        lambda *a, **k: (called.append(1), orig(*a, **k))[1])
    try:
        out = pmm.matmul(x, mw)
    finally:
        pmm.a8_matmul_reference = orig
    assert not called, "a8 matmul took the XLA reference fallback"
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 2e-2, rel

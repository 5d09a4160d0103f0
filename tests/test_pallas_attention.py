"""Quantized-KV flash attention kernel vs f32 reference (interpret on CPU)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_llm_rs_tpu.ops import pallas_attention as pa


def _ref_attention(q, k, v, sm_scale):
    logits = jnp.einsum("bqd,bkd->bqk", q, k) * sm_scale
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", p, v)


@pytest.mark.parametrize("bits", [8, 4])
def test_quantize_kv_roundtrip(bits):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 16, 64)).astype(np.float32))
    qkv = pa.quantize_kv(x, bits)
    deq = qkv.dequantize()
    step = float(jnp.max(x) - jnp.min(x)) / (2 ** bits - 1)
    assert float(jnp.max(jnp.abs(deq - x))) <= step


@pytest.mark.parametrize("bits", [8, 4, 2])
def test_attention_matches_reference(bits):
    rng = np.random.default_rng(1)
    BH, Sq, Skv, D = 2, 16, 128, 64
    q = jnp.asarray(rng.normal(size=(BH, Sq, D)).astype(np.float32))
    kf = jnp.asarray(rng.normal(size=(BH, Skv, D)).astype(np.float32))
    vf = jnp.asarray(rng.normal(size=(BH, Skv, D)).astype(np.float32))
    k = pa.quantize_kv(kf, bits)
    v = pa.quantize_kv(vf, bits)
    sm = 1.0 / math.sqrt(D)
    out = pa.attention(q, k, v)
    # reference computed on the DEQUANTIZED kv (isolates kernel error from
    # quantization error)
    ref = _ref_attention(q, k.dequantize(), v.dequantize(), sm)
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 2e-2, rel


def test_attention_vs_fp_quality():
    """int8 KV attention should track full-precision attention closely."""
    rng = np.random.default_rng(2)
    BH, S, D = 4, 128, 64
    q = jnp.asarray(rng.normal(size=(BH, 32, D)).astype(np.float32))
    kf = jnp.asarray(rng.normal(size=(BH, S, D)).astype(np.float32))
    vf = jnp.asarray(rng.normal(size=(BH, S, D)).astype(np.float32))
    out8 = pa.attention(q, pa.quantize_kv(kf, 8), pa.quantize_kv(vf, 8))
    ref = _ref_attention(q, kf, vf, 1.0 / math.sqrt(D))
    rel = float(jnp.linalg.norm(out8 - ref) / jnp.linalg.norm(ref))
    assert rel < 2e-2, rel
    # 2-bit must be worse than 8-bit but still finite
    out2 = pa.attention(q, pa.quantize_kv(kf, 2), pa.quantize_kv(vf, 2))
    rel2 = float(jnp.linalg.norm(out2 - ref) / jnp.linalg.norm(ref))
    assert np.isfinite(rel2) and rel2 > rel


def test_attention_fallback_odd_shapes():
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.normal(size=(1, 5, 48)).astype(np.float32))
    kf = jnp.asarray(rng.normal(size=(1, 30, 48)).astype(np.float32))
    vf = jnp.asarray(rng.normal(size=(1, 30, 48)).astype(np.float32))
    out = pa.attention(q, pa.quantize_kv(kf, 8), pa.quantize_kv(vf, 8))
    ref = _ref_attention(q, kf, vf, 1.0 / math.sqrt(48))
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 3e-2


def test_dense_attention_matches_reference():
    rng = np.random.default_rng(3)
    BH, Sq, Skv, D = 3, 32, 256, 64
    q = jnp.asarray(rng.normal(size=(BH, Sq, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(BH, Skv, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(BH, Skv, D)).astype(np.float32))
    out = pa.dense_attention(q, k, v, out_dtype=jnp.float32)
    assert out is not None
    ref = _ref_attention(q.astype(jnp.bfloat16).astype(jnp.float32),
                         k.astype(jnp.bfloat16).astype(jnp.float32),
                         v.astype(jnp.bfloat16).astype(jnp.float32),
                         1.0 / math.sqrt(D))
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 1e-2, rel


def test_dense_attention_unfriendly_shape_returns_none():
    q = jnp.zeros((2, 7, 64))
    k = jnp.zeros((2, 100, 64))
    assert pa.dense_attention(q, k, k) is None


def test_denoiser_attention_uses_flash_equivalent_math():
    # the denoiser-level dispatch (mask=None) must agree with the einsum path
    from diffusion_llm_rs_tpu.models import denoiser as dn
    rng = np.random.default_rng(4)
    B, S, H, Hd = 2, 16, 4, 64
    q = jnp.asarray(rng.normal(size=(B, S, H, Hd)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, S, H, Hd)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, S, H, Hd)).astype(np.float32))
    out = dn.attention(q, k, v)
    logits = jnp.einsum("bshd,bthd->bhst", q, k) / math.sqrt(Hd)
    p = jax.nn.softmax(logits, axis=-1)
    ref = jnp.einsum("bhst,bthd->bshd", p, v)
    assert float(jnp.max(jnp.abs(out - ref))) < 5e-2


def test_long_s_attention_is_differentiable():
    """The denoiser's flash dispatch at Skv >= 1024 must be differentiable:
    the Pallas kernel has no VJP, so the dispatch wraps it in a custom_vjp
    whose backward recomputes standard attention grads via XLA (review r5
    — training at long S failed at trace time before)."""
    from diffusion_llm_rs_tpu.models import denoiser as dn

    B, S, H, Hd = 1, 1024, 2, 64
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, S, H, Hd)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, S, H, Hd)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, S, H, Hd)).astype(np.float32))

    def loss(q, k, v, flash):
        return jnp.sum(dn.attention(q, k, v, flash=flash) ** 2)

    gq, gk, gv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v, True)
    rq, rk, rv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v, False)
    for g, r in ((gq, rq), (gk, rk), (gv, rv)):
        assert bool(jnp.all(jnp.isfinite(g)))
        rel = float(jnp.linalg.norm(g - r) / (jnp.linalg.norm(r) + 1e-9))
        assert rel < 2e-2, rel


def test_attention_flash_false_matches_einsum():
    """flash=False (the GSPMD sharded steps' setting) must compute the same
    attention as the kernel dispatch."""
    from diffusion_llm_rs_tpu.models import denoiser as dn

    B, S, H, Hd = 1, 1024, 2, 64
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(B, S, H, Hd)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, S, H, Hd)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, S, H, Hd)).astype(np.float32))
    a = dn.attention(q, k, v, flash=True)
    b = dn.attention(q, k, v, flash=False)
    rel = float(jnp.linalg.norm(a - b) / jnp.linalg.norm(b))
    assert rel < 2e-2, rel

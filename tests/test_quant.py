"""Quantization unit tests.

Carries forward the reference's roundtrip-within-tolerance pattern (SURVEY.md §4)
plus the exact-value calibration checks (`quantization/src/calibrate.rs:123-132`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_llm_rs_tpu import quant


# --- pack/unpack -----------------------------------------------------------

@pytest.mark.parametrize("bits", [1, 2, 4, 8])
def test_pack_unpack_roundtrip(bits):
    rng = np.random.default_rng(0)
    q = rng.integers(0, 2 ** bits, size=(3, 37)).astype(np.uint8)
    packed = quant.pack_bits(jnp.asarray(q), bits)
    assert packed.dtype == jnp.uint8
    assert packed.shape == (3, quant.packed_last_dim(37, bits))
    out = quant.unpack_bits(packed, bits, 37)
    np.testing.assert_array_equal(np.asarray(out), q)


# --- roundtrip tolerance (reference: quantization.rs:242-252, prefill_kv.rs:147-160)

def test_quantization_roundtrip_4bit():
    data = jnp.array([1.0, 2.0, 3.0, 4.0, 5.0])
    qt = quant.quantize(data, 4)
    deq = quant.dequantize(qt)
    # 4-bit over range [1,5]: step = 4/15 ≈ 0.27, max err ≈ 0.14
    assert float(jnp.max(jnp.abs(deq - data))) < 0.15


def test_quantization_roundtrip_8bit():
    data = jnp.array([[-1.0, 0.0, 1.0], [2.0, 3.0, 4.0]])
    qt = quant.quantize(data, 8)
    deq = quant.dequantize(qt)
    assert deq.shape == (2, 3)
    assert float(jnp.max(jnp.abs(deq - data))) < 0.1


def test_kv_vector_roundtrip_4bit():
    # reference: diffusion_prefill/src/prefill_kv.rs:147-160
    vector = jnp.array([0.1, 0.5, 1.0, 0.0])
    qt = quant.quantize(vector, 4)
    deq = quant.dequantize(qt)
    assert float(jnp.max(jnp.abs(deq - vector))) < 0.1


def test_compression_ratio():
    # reference: diffuse-llm-rs/src/quantization.rs:254-265
    data = jnp.array([1.0, 2.0, 3.0, 4.0])
    qt = quant.quantize(data, 4)
    assert qt.compression_ratio() > 4.0


@pytest.mark.parametrize("bits", [2, 4, 8])
@pytest.mark.parametrize("symmetric", [False, True])
def test_monotone_error_in_bits(bits, symmetric):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(64, 64)).astype(np.float32))
    qt = quant.quantize(x, bits, symmetric=symmetric)
    err = float(jnp.mean(jnp.abs(quant.dequantize(qt) - x)))
    # error bounded by ~step/2 where step = range / (2^bits - 1)
    rng_width = float(jnp.max(x) - jnp.min(x)) if not symmetric else 2 * float(jnp.max(jnp.abs(x)))
    step = rng_width / (2 ** bits - 1)
    assert err <= step


def test_binary_1bit():
    x = jnp.array([-1.0, -0.5, 0.5, 1.0])
    qt = quant.quantize(x, 1)
    deq = quant.dequantize(qt)
    # 1-bit: two levels — min and max of the range
    assert len(np.unique(np.asarray(deq))) <= 2


# --- granularities ---------------------------------------------------------

def test_per_channel():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(16, 8)).astype(np.float32) *
                    np.array([1, 10] * 4, dtype=np.float32))
    qt_t = quant.quantize(x, 4, granularity="tensor")
    qt_c = quant.quantize(x, 4, granularity="channel", axis=1)
    assert qt_c.scale.shape == (1, 8)
    err_t = float(jnp.mean(jnp.abs(quant.dequantize(qt_t) - x)))
    err_c = float(jnp.mean(jnp.abs(quant.dequantize(qt_c) - x)))
    assert err_c < err_t  # per-channel strictly better on scale-varying channels


def test_per_group():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(256, 4)).astype(np.float32))
    qt = quant.quantize(x, 4, granularity="group", group_size=128, axis=0)
    assert qt.scale.shape == (2, 4)
    deq = quant.dequantize(qt)
    assert deq.shape == (256, 4)
    step = (float(jnp.max(x)) - float(jnp.min(x))) / 15
    assert float(jnp.mean(jnp.abs(deq - x))) <= step


def test_group_quant_jit_and_pytree():
    x = jnp.ones((128, 4))

    @jax.jit
    def roundtrip(x):
        qt = quant.quantize(x, 4, granularity="group", group_size=128, axis=0)
        return quant.dequantize(qt)

    out = roundtrip(x)
    np.testing.assert_allclose(np.asarray(out), np.ones((128, 4)), atol=0.15)
    # QuantizedTensor must be a registered pytree
    qt = quant.quantize(x, 4)
    leaves = jax.tree_util.tree_leaves(qt)
    assert len(leaves) == 3


# --- fp8 -------------------------------------------------------------------

def test_fp8_roundtrip():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(32, 32)).astype(np.float32))
    ft = quant.quantize_fp8(x)
    deq = ft.dequantize()
    assert float(jnp.max(jnp.abs(deq - x))) < 0.1 * float(jnp.max(jnp.abs(x)))


# --- calibration (exact-value parity: quantization/src/calibrate.rs:123-132) --

def test_calibration_exact_values():
    calib = quant.CalibrationData(num_bins=10)
    data = jnp.array([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]])
    calib.update(data)
    params = calib.compute_params(8, symmetric=False)
    assert abs(params.scale - 0.0235) < 1e-3
    assert params.zero_point == -43


def test_calibration_symmetric():
    calib = quant.CalibrationData()
    calib.update(jnp.array([-2.0, 0.0, 4.0]))
    params = calib.compute_params(8, symmetric=True)
    assert abs(params.scale - 4.0 * 2.0 / 255.0) < 1e-6
    assert params.zero_point == 127


def test_calibration_empty_raises():
    calib = quant.CalibrationData()
    with pytest.raises(ValueError):
        calib.compute_params(8, symmetric=False)


def test_calibration_constant_input():
    calib = quant.CalibrationData()
    calib.update(jnp.zeros((4,)))
    params = calib.compute_params(8, symmetric=False)
    assert params.scale == 1.0 and params.zero_point == 0


def test_calibration_per_channel():
    calib = quant.CalibrationData(per_channel=True)
    calib.update(jnp.array([1.0, 2.0]), channel=0)
    calib.update(jnp.array([-5.0, 5.0]), channel=1)
    stats = calib.get_per_channel_stats()
    assert stats[0] == (1.0, 2.0)
    assert stats[1] == (-5.0, 5.0)


# --- adaptive quantizer (reference: quantization.rs:267-277) ----------------

def test_adaptive_quantizer():
    aq = quant.AdaptiveQuantizer(bits=4, target_ratio=4.0)
    data = jnp.arange(1000, dtype=jnp.float32) / 1000.0
    aq.update_stats(data)
    scale, zero_point = aq.compute_params()
    assert scale > 0.0
    assert zero_point >= 0.0


def test_quantile_sketch_error_bound():
    rng = np.random.default_rng(5)
    data = rng.normal(size=50_000).astype(np.float32)
    sk = quant.QuantileSketch(eps=0.01)
    for chunk in np.array_split(data, 10):
        sk.insert(chunk)
    s = np.sort(data)
    for q in (0.0, 0.25, 0.5, 0.75, 1.0):
        est = sk.query(q)
        # rank error <= eps
        rank = np.searchsorted(s, est) / s.size
        assert abs(rank - q) <= 0.015


# --- tree quantization -----------------------------------------------------

def test_quantize_tree():
    params = {
        "w": jnp.ones((256, 128)),
        "b": jnp.zeros((128,)),
        "emb": jnp.ones((128, 256)),
    }
    qparams = quant.quantize_tree(params, 4)
    assert isinstance(qparams["w"], quant.QuantizedTensor)
    assert isinstance(qparams["b"], jnp.ndarray)  # small 1-D stays fp
    deq = quant.dequantize_tree(qparams)
    np.testing.assert_allclose(np.asarray(deq["w"]), np.ones((256, 128)), atol=0.2)


def test_dequantize_tree_covers_int8weight():
    """dequantize_tree's duck-typing must include ops.matmul.Int8Weight
    (dequantize + col_scale, no .bits) — it was silently left packed
    (review r5)."""
    import jax
    from diffusion_llm_rs_tpu.ops.matmul import decode_to_int8, Int8Weight
    from diffusion_llm_rs_tpu.quant.core import dequantize_tree

    w = jnp.asarray(np.random.default_rng(0).normal(size=(256, 128)),
                    jnp.float32)
    qt = quant.quantize(w, 4, symmetric=True, granularity="group",
                        group_size=128, axis=0)
    tree = {"w": decode_to_int8(qt), "b": jnp.zeros((128,))}
    out = dequantize_tree(tree)
    assert not isinstance(out["w"], Int8Weight)
    assert out["w"].shape == (256, 128)
    rel = float(jnp.linalg.norm(out["w"] - w) / jnp.linalg.norm(w))
    assert rel < 0.15  # int4 round-to-nearest on Gaussian weights is ~10%

"""TokenizedVector / Normalizer / WeightManager / PrefillKVQuant tests
(reference `diffuse-llm-rs/src/lib.rs:352-400,664-742`,
`prefill-kvquant-rs/lib.rs:99-147`)."""

import numpy as np
import pytest

from diffusion_llm_rs_tpu.models.types import (Normalizer, PrefillKVQuant,
                                               TokenizedVector, WeightManager)


def test_tokenized_vector_mask_and_json():
    tv = TokenizedVector(id="v", tokens=[1, 2, 3],
                         embeddings=np.ones((3, 4), np.float32))
    tv.apply_mask(np.zeros((2, 4), np.float32), offset=1)
    assert tv.offset == 1
    np.testing.assert_array_equal(tv.embeddings[0], np.ones(4))
    np.testing.assert_array_equal(tv.embeddings[1:], np.zeros((2, 4)))
    rt = TokenizedVector.from_json(tv.to_json())
    assert rt.id == "v" and rt.tokens == [1, 2, 3] and rt.offset == 1
    np.testing.assert_array_equal(rt.embeddings, tv.embeddings)


def test_normalizer():
    data = np.array([1.0, 2.0, 3.0, 4.0])
    n = Normalizer.fit(data)
    norm = np.asarray(n.normalize(data))
    assert abs(norm.mean()) < 1e-6 and abs(norm.std() - 1) < 1e-6
    np.testing.assert_allclose(np.asarray(n.denormalize(norm)), data,
                               rtol=1e-6)
    # constant data: std guard
    nc = Normalizer.fit(np.full(4, 7.0))
    assert nc.std == 1.0


def test_weight_manager():
    wm = WeightManager()
    wm.set_weight("w", np.ones((2, 2)))
    wm.update_gradient("w", np.full((2, 2), 0.5))
    wm.update_gradient("w", np.full((2, 2), 0.5))  # accumulates
    wm.apply_gradients(lr=1.0)
    np.testing.assert_allclose(np.asarray(wm.get_weight("w"), np.float32),
                               np.zeros((2, 2)))
    assert wm.get_gradient("w") is None  # cleared


def test_prefill_kv_quant_round_robin():
    tvs = [TokenizedVector(id=f"t{i}", tokens=[i],
                           embeddings=np.random.default_rng(i).normal(
                               size=(2, 8)).astype(np.float32))
           for i in range(4)]
    pkq = PrefillKVQuant(quantization_bits=(8, 4))
    out = pkq.quantize_vectors(tvs)
    assert [v.bits for v in out] == [8, 4, 8, 4]
    assert out[0].original_shape == (2, 8)
    assert pkq.compression_ratio > 4.0
    # roundtrip on the 8-bit one
    deq = out[0].dequantize().reshape(2, 8)
    np.testing.assert_allclose(deq, tvs[0].embeddings, atol=0.05)


def test_prefill_kv_quant_rejects_bad_bits():
    with pytest.raises(ValueError):
        PrefillKVQuant(quantization_bits=(3,))

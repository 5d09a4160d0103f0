"""Paged quantized KV cache + utils (metrics/serialization) tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_llm_rs_tpu.cache.memory_manager import MemoryManager
from diffusion_llm_rs_tpu.cache.paged import PagedKVCache
from diffusion_llm_rs_tpu.ops import pallas_attention as pa
from diffusion_llm_rs_tpu.utils.metrics import MetricsRegistry, Throughput
from diffusion_llm_rs_tpu.utils import serialization as ser


def _kv(bh=4, s=96, d=64, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    return (jax.random.normal(k1, (bh, s, d)),
            jax.random.normal(k2, (bh, s, d)))


def test_paged_append_gather_roundtrip():
    cache = PagedKVCache(bh=4, head_dim=64, page_size=32)
    k, v = _kv()
    cache.append("s1", k, v, bits=8)
    assert cache.seq_len("s1") == 96
    gk, gv = cache.gather("s1")
    assert gk.shape == (4, 96, 64)
    assert float(jnp.mean(jnp.abs(gk - k))) < 0.02
    assert float(jnp.mean(jnp.abs(gv - v))) < 0.02


def test_paged_partial_tail_page():
    cache = PagedKVCache(bh=2, head_dim=64, page_size=32)
    k, v = _kv(bh=2, s=40)
    cache.append("s", k, v, bits=4)
    assert cache.seq_len("s") == 40
    gk, _ = cache.gather("s")
    assert gk.shape == (2, 40, 64)


def test_paged_packed_gather_feeds_attention():
    cache = PagedKVCache(bh=2, head_dim=128, page_size=64)
    k, v = _kv(bh=2, s=128, d=128, seed=1)
    cache.append("s", k, v, bits=4)
    qk, qv = cache.gather_packed("s")
    q = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 128))
    out = pa.attention(q, qk, qv)
    assert out.shape == (2, 16, 128)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_paged_mixed_precision_salient():
    cache = PagedKVCache(bh=2, head_dim=64, page_size=32)
    k, v = _kv(bh=2, s=128, seed=2)
    scores = np.concatenate([np.full(64, 10.0), np.full(64, 0.1)])
    cache.append_salient("s", k, v, scores, budget_bits=6.0)
    handles = cache.page_tables["s"]
    assert len(handles) == 4
    # salient pages (first half) got at least as many bits as the tail
    assert handles[0].bits >= handles[-1].bits
    mean_bits = sum(h.bits for h in handles) / len(handles)
    assert mean_bits <= 6.0
    with pytest.raises(ValueError):
        cache.gather_packed("s")  # mixed widths
    gk, _ = cache.gather("s")
    assert gk.shape == (2, 128, 64)


def test_paged_free_and_exhaustion():
    cache = PagedKVCache(bh=1, head_dim=64, page_size=32,
                         pages_per_bits={8: 2})
    k, v = _kv(bh=1, s=64, seed=3)
    cache.append("a", k, v, bits=8)
    assert cache.num_free(8) == 0
    with pytest.raises(MemoryError):
        cache.append("b", k, v, bits=8)
    assert cache.free("a") == 2
    assert cache.num_free(8) == 2
    assert cache.memory_usage() == 0


def test_paged_spill_restore(tmp_path):
    mm = MemoryManager(spill_dir=str(tmp_path))
    cache = PagedKVCache(bh=2, head_dim=64, page_size=32, memory_manager=mm)
    k, v = _kv(bh=2, s=32, seed=4)
    cache.append("s", k, v, bits=8)
    before, _ = cache.gather("s")
    cache.spill_page("s", 0)
    assert cache.page_tables["s"][0].slot == -1
    cache.restore_page("s", 0)
    after, _ = cache.gather("s")
    np.testing.assert_allclose(np.asarray(before), np.asarray(after),
                               atol=1e-6)


# --- utils -------------------------------------------------------------------

def test_metrics_registry():
    m = MetricsRegistry()
    m.inc("hits")
    m.inc("hits", 2)
    m.set_gauge("bytes", 123)
    m.register_gauge("lazy", lambda: 7.0)
    snap = m.snapshot()
    assert snap["hits"] == 3 and snap["bytes"] == 123 and snap["lazy"] == 7.0
    with Throughput(100, "tps", m):
        pass
    assert m.get("tps") > 0


def test_checkpoint_roundtrip(tmp_path):
    from diffusion_llm_rs_tpu.ops.pallas_matmul import prepare
    from diffusion_llm_rs_tpu.quant.core import quantize, quantize_fp8
    params = {
        "w": quantize(jnp.ones((128, 64)), 4, granularity="group",
                      group_size=128, axis=0),
        "mw": prepare(quantize(jnp.full((128, 64), 0.5), 4,
                               granularity="group", group_size=128, axis=0)),
        "b": jnp.arange(8, dtype=jnp.float32),
        "h": jnp.ones((4,), jnp.bfloat16),
        "f8": quantize_fp8(jnp.ones((16, 16))),
    }
    path = str(tmp_path / "ckpt")
    ser.save_checkpoint(path, params, metadata={"step": 7})
    loaded = ser.load_checkpoint(path, params)
    assert ser.get_metadata(path)["step"] == 7
    np.testing.assert_allclose(np.asarray(loaded["w"].dequantize()),
                               np.asarray(params["w"].dequantize()))
    np.testing.assert_allclose(np.asarray(loaded["mw"].dequantize()),
                               np.asarray(params["mw"].dequantize()))
    np.testing.assert_array_equal(np.asarray(loaded["b"]),
                                  np.asarray(params["b"]))
    assert loaded["h"].dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(loaded["f8"].dequantize()),
                               np.asarray(params["f8"].dequantize()))


def test_free_after_spill_keeps_allocator_sound(tmp_path):
    """free() of a sequence holding a SPILLED page must not push the -1
    sentinel into the pool free list (review r5: the next _alloc popped -1
    and the following append overwrote slot n-1 — possibly another live
    page) and must reclaim the host-tier payload."""
    from diffusion_llm_rs_tpu.cache.memory_manager import NotFoundError

    mm = MemoryManager(spill_dir=str(tmp_path))
    cache = PagedKVCache(bh=2, head_dim=64, page_size=32, memory_manager=mm,
                         pages_per_bits={8: 4})
    k, v = _kv(bh=2, s=64, seed=5)
    cache.append("s", k, v, bits=8)
    cache.spill_page("s", 0)
    n_free_before = cache.num_free(8)
    assert cache.free("s") == 2
    pool = cache._pools[8]
    assert -1 not in pool.free
    # only the on-device page returns to the pool
    assert cache.num_free(8) == n_free_before + 1
    # host payload reclaimed
    with pytest.raises(NotFoundError):
        mm.get("kvpage:s:0:k_data")
    # allocator still sound: a fresh 4-page sequence allocates cleanly
    k2, v2 = _kv(bh=2, s=128, seed=6)
    cache.append("t", k2, v2, bits=8)
    slots = [h.slot for h in cache.page_tables["t"]]
    assert len(set(slots)) == 4 and all(s >= 0 for s in slots)
    gk, _ = cache.gather("t")
    assert float(jnp.mean(jnp.abs(gk - k2))) < 0.02


def test_double_spill_is_noop(tmp_path):
    """A second spill of an already-spilled page must not overwrite the
    host payload with another slot's data or corrupt the free list."""
    mm = MemoryManager(spill_dir=str(tmp_path))
    cache = PagedKVCache(bh=2, head_dim=64, page_size=32, memory_manager=mm)
    k, v = _kv(bh=2, s=32, seed=7)
    cache.append("s", k, v, bits=8)
    before, _ = cache.gather("s")
    cache.spill_page("s", 0)
    n_free = cache.num_free(8)
    cache.spill_page("s", 0)       # second call: guarded no-op
    assert cache.num_free(8) == n_free
    cache.restore_page("s", 0)
    after, _ = cache.gather("s")
    np.testing.assert_allclose(np.asarray(before), np.asarray(after),
                               atol=1e-6)


def test_gather_packed_rejects_interior_partial():
    """An interior partial page would silently return zero padding as real
    keys and truncate the tail — gather_packed must raise (gather() handles
    it correctly)."""
    cache = PagedKVCache(bh=2, head_dim=64, page_size=32)
    k, v = _kv(bh=2, s=40, seed=8)         # pages [32, 8]: interior partial
    cache.append("s", k, v, bits=8)        # after the next append
    k2, v2 = _kv(bh=2, s=32, seed=9)
    cache.append("s", k2, v2, bits=8)
    with pytest.raises(ValueError, match="interior partial"):
        cache.gather_packed("s")
    gk, _ = cache.gather("s")              # gather() slices per page: exact
    assert gk.shape == (2, 72, 64)


def test_batched_attend_unknown_seq_raises():
    cache = PagedKVCache(bh=2, head_dim=64, page_size=32)
    k, v = _kv(bh=2, s=32, seed=10)
    cache.append("a", k, v, bits=8)
    q = jax.random.normal(jax.random.PRNGKey(3), (2, 2, 8, 64))
    with pytest.raises(KeyError):
        cache.batched_attend(["a", "never-appended"], q)

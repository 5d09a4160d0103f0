"""Paged attention kernel: in-kernel page gather vs dense reference."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_llm_rs_tpu.cache.paged import PagedKVCache
from diffusion_llm_rs_tpu.ops import pallas_attention as pa
from diffusion_llm_rs_tpu.ops import pallas_paged_attention as ppa


def _pools_from_cache(cache: PagedKVCache, seq_id: str, bits: int):
    pool = cache._pools[bits]
    handles = cache.page_tables[seq_id]
    table = jnp.asarray([h.slot for h in handles], jnp.int32)
    return table, pool


@pytest.mark.parametrize("bits", [8, 4])
def test_paged_attention_matches_dense(bits):
    BH, S, D, P = 2, 256, 128, 128
    rng = np.random.default_rng(0)
    kf = jnp.asarray(rng.normal(size=(BH, S, D)).astype(np.float32))
    vf = jnp.asarray(rng.normal(size=(BH, S, D)).astype(np.float32))
    q = jnp.asarray(rng.normal(size=(BH, 32, D)).astype(np.float32))

    cache = PagedKVCache(bh=BH, head_dim=D, page_size=P,
                         pages_per_bits={bits: 8})
    cache.append("s", kf, vf, bits=bits)
    table, pool = _pools_from_cache(cache, "s", bits)

    out = ppa.paged_attention(q, table, pool.k_data, pool.k_scale, pool.k_zp,
                              pool.v_data, pool.v_scale, pool.v_zp, bits=bits)
    # dense reference over the same (quantized) values
    qk, qv = cache.gather_packed("s")
    ref = pa._attention_fallback(q, qk, qv, 1.0 / math.sqrt(D))
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 2e-2, rel


def test_paged_attention_scattered_slots():
    """Pages deliberately out of order in the pool: the table must gather."""
    BH, S, D, P = 1, 256, 128, 128
    rng = np.random.default_rng(1)
    kf = jnp.asarray(rng.normal(size=(BH, S, D)).astype(np.float32))
    vf = jnp.asarray(rng.normal(size=(BH, S, D)).astype(np.float32))
    q = jnp.asarray(rng.normal(size=(BH, 8, D)).astype(np.float32))

    cache = PagedKVCache(bh=BH, head_dim=D, page_size=P,
                         pages_per_bits={4: 8})
    # occupy some slots first so "s" lands on non-contiguous slots
    cache.append("pad", kf[:, :P], vf[:, :P], bits=4)
    cache.append("s", kf, vf, bits=4)
    cache.free("pad")
    table, pool = _pools_from_cache(cache, "s", 4)
    assert list(np.asarray(table)) != [0, 1]  # genuinely scattered

    out = ppa.paged_attention(q, table, pool.k_data, pool.k_scale, pool.k_zp,
                              pool.v_data, pool.v_scale, pool.v_zp, bits=4)
    qk, qv = cache.gather_packed("s")
    ref = pa._attention_fallback(q, qk, qv, 1.0 / math.sqrt(D))
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 2e-2, rel


def test_paged_attention_fallback_small_pages():
    """P=32 (not lane-aligned) takes the XLA gather fallback."""
    BH, S, D, P = 1, 64, 64, 32
    rng = np.random.default_rng(2)
    kf = jnp.asarray(rng.normal(size=(BH, S, D)).astype(np.float32))
    vf = jnp.asarray(rng.normal(size=(BH, S, D)).astype(np.float32))
    q = jnp.asarray(rng.normal(size=(BH, 8, D)).astype(np.float32))
    cache = PagedKVCache(bh=BH, head_dim=D, page_size=P,
                         pages_per_bits={8: 4})
    cache.append("s", kf, vf, bits=8)
    table, pool = _pools_from_cache(cache, "s", 8)
    out = ppa.paged_attention(q, table, pool.k_data, pool.k_scale, pool.k_zp,
                              pool.v_data, pool.v_scale, pool.v_zp, bits=8)
    qk, qv = cache.gather_packed("s")
    ref = pa._attention_fallback(q, qk, qv, 1.0 / math.sqrt(D))
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 2e-2, rel

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


def _dense_ref(cache, seq_id, q):
    kd, vd = cache.gather(seq_id)
    D = q.shape[-1]
    logits = jnp.einsum("bqd,bkd->bqk", q.astype(jnp.float32), kd)
    logits = logits / math.sqrt(D)
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", p, vd)


def test_paged_attention_partial_last_page():
    """S not a multiple of P: pad tokens must not leak into the softmax."""
    BH, S, D, P = 2, 300, 128, 128
    rng = np.random.default_rng(3)
    kf = jnp.asarray(rng.normal(size=(BH, S, D)).astype(np.float32))
    vf = jnp.asarray(rng.normal(size=(BH, S, D)).astype(np.float32))
    q = jnp.asarray(rng.normal(size=(BH, 16, D)).astype(np.float32))
    cache = PagedKVCache(bh=BH, head_dim=D, page_size=P,
                         pages_per_bits={4: 8})
    cache.append("s", kf, vf, bits=4)
    out = cache.attend("s", q)
    ref = _dense_ref(cache, "s", q)
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 2e-2, rel


def test_paged_attention_mixed_precision_merge():
    """Salience-mixed chain (8/4/2-bit pages): per-bucket kernel calls
    flash-merged by lse must equal dense attention over the dequantized
    union."""
    BH, D, P = 2, 128, 128
    rng = np.random.default_rng(4)
    chunks = []
    cache = PagedKVCache(bh=BH, head_dim=D, page_size=P,
                         pages_per_bits={8: 4, 4: 4, 2: 4})
    for bits in (8, 4, 2, 4):
        kf = jnp.asarray(rng.normal(size=(BH, P, D)).astype(np.float32))
        vf = jnp.asarray(rng.normal(size=(BH, P, D)).astype(np.float32))
        cache.append("s", kf, vf, bits=bits)
        chunks.append((kf, vf))
    q = jnp.asarray(rng.normal(size=(BH, 16, D)).astype(np.float32))
    out = cache.attend("s", q)
    ref = _dense_ref(cache, "s", q)
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 2e-2, rel


def test_merge_partials_exactness():
    """lse merge of two disjoint key sets == softmax over the union (fp32)."""
    rng = np.random.default_rng(5)
    BH, Sq, D, S1, S2 = 1, 4, 8, 16, 24
    q = jnp.asarray(rng.normal(size=(BH, Sq, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(BH, S1 + S2, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(BH, S1 + S2, D)).astype(np.float32))

    def part(ks, vs):
        logits = jnp.einsum("bqd,bkd->bqk", q, ks) / math.sqrt(D)
        p = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bqk,bkd->bqd", p, vs)
        lse = jax.scipy.special.logsumexp(logits, axis=-1)
        return out, lse

    merged = ppa.merge_partials([part(k[:, :S1], v[:, :S1]),
                                 part(k[:, S1:], v[:, S1:])])
    ref, _ = part(k, v)
    np.testing.assert_allclose(np.asarray(merged), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_attend_uniform_matches_single_call():
    BH, S, D, P = 1, 256, 128, 128
    rng = np.random.default_rng(6)
    kf = jnp.asarray(rng.normal(size=(BH, S, D)).astype(np.float32))
    vf = jnp.asarray(rng.normal(size=(BH, S, D)).astype(np.float32))
    q = jnp.asarray(rng.normal(size=(BH, 8, D)).astype(np.float32))
    cache = PagedKVCache(bh=BH, head_dim=D, page_size=P,
                         pages_per_bits={8: 4})
    cache.append("s", kf, vf, bits=8)
    out = cache.attend("s", q)
    table, pool = _pools_from_cache(cache, "s", 8)
    direct = ppa.paged_attention(q, table, pool.k_data, pool.k_scale,
                                 pool.k_zp, pool.v_data, pool.v_scale,
                                 pool.v_zp, bits=8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(direct),
                               rtol=1e-5, atol=1e-5)


def _dense_ref_bhqd(cache, seq_id, q_bh):
    # q_bh: [H, Sq, D] for one sequence whose cache bh == H
    kd, vd = cache.gather(seq_id)
    D = q_bh.shape[-1]
    logits = jnp.einsum("hqd,hkd->hqk", q_bh.astype(jnp.float32), kd)
    logits = logits / math.sqrt(D)
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("hqk,hkd->hqd", p, vd)


def test_batched_paged_attention_varied_lengths():
    """3 active slots with different lengths + 1 inactive; per-slot output
    must match single-sequence dense reference; inactive slot -> zeros."""
    H, D, P = 2, 128, 128
    rng = np.random.default_rng(7)
    cache = PagedKVCache(bh=H, head_dim=D, page_size=P,
                         pages_per_bits={4: 12})
    lengths = {"a": 256, "b": 300, "c": 128}
    for sid, S in lengths.items():
        kf = jnp.asarray(rng.normal(size=(H, S, D)).astype(np.float32))
        vf = jnp.asarray(rng.normal(size=(H, S, D)).astype(np.float32))
        cache.append(sid, kf, vf, bits=4)
    q = jnp.asarray(rng.normal(size=(4, H, 16, D)).astype(np.float32))
    out = cache.batched_attend(["a", "b", None, "c"], q)
    assert out.shape == (4, H, 16, D)
    for b, sid in [(0, "a"), (1, "b"), (3, "c")]:
        ref = _dense_ref_bhqd(cache, sid, q[b])
        rel = float(jnp.linalg.norm(out[b] - ref) / jnp.linalg.norm(ref))
        assert rel < 2e-2, (sid, rel)
    np.testing.assert_array_equal(np.asarray(out[2]), 0.0)


def test_batched_attend_mixed_precision():
    """Slot a: 8-bit pages; slot b: mixed 8/2-bit chain -> bucket merge."""
    H, D, P = 2, 128, 128
    rng = np.random.default_rng(8)
    cache = PagedKVCache(bh=H, head_dim=D, page_size=P,
                         pages_per_bits={8: 4, 2: 4})
    ka = jnp.asarray(rng.normal(size=(H, P, D)).astype(np.float32))
    va = jnp.asarray(rng.normal(size=(H, P, D)).astype(np.float32))
    cache.append("a", ka, va, bits=8)
    for bits in (8, 2):
        kb = jnp.asarray(rng.normal(size=(H, P, D)).astype(np.float32))
        vb = jnp.asarray(rng.normal(size=(H, P, D)).astype(np.float32))
        cache.append("b", kb, vb, bits=bits)
    q = jnp.asarray(rng.normal(size=(2, H, 8, D)).astype(np.float32))
    out = cache.batched_attend(["a", "b"], q)
    for b, sid in [(0, "a"), (1, "b")]:
        ref = _dense_ref_bhqd(cache, sid, q[b])
        rel = float(jnp.linalg.norm(out[b] - ref) / jnp.linalg.norm(ref))
        assert rel < 2e-2, (sid, rel)


def test_batched_attend_all_inactive():
    H, D, P = 1, 128, 128
    cache = PagedKVCache(bh=H, head_dim=D, page_size=P,
                         pages_per_bits={8: 2})
    q = jnp.ones((2, H, 8, D), jnp.float32)
    out = cache.batched_attend([None, None], q)
    np.testing.assert_array_equal(np.asarray(out), 0.0)


# ---------------------------------------------------------------------------
# head grouping (head_dim < 128)
# ---------------------------------------------------------------------------


def _grouped_pools_from_dense(kf, vf, bits, P, G):
    """Quantize dense K/V [H, S, D] per token per head and lay out grouped
    pools [n_pages, H/G, P/vpb, G*D] + sidecars [n_pages, H/G, G*P]."""
    from diffusion_llm_rs_tpu.cache.paged import quantize_page

    H, S, D = kf.shape
    HG = H // G
    nps = S // P

    def build(x):
        d, s, z = quantize_page(
            x.reshape(H, nps, P, D).transpose(1, 0, 2, 3)
            .reshape(nps * H, P, D), bits)          # [nps*H, P/vpb, D]
        Pp = P // (8 // bits)
        d = (d.reshape(nps, HG, G, Pp, D).transpose(0, 1, 3, 2, 4)
             .reshape(nps, HG, Pp, G * D))
        s = s.reshape(nps, HG, G * P)
        z = z.reshape(nps, HG, G * P)
        return d, s, z

    kd, ks, kz = build(kf)
    vd, vs, vz = build(vf)
    return kd, ks, kz, vd, vs, vz


@pytest.mark.parametrize("bits", [8, 4])
def test_batched_grouped_matches_ungrouped_fallback(bits):
    """head_group=2 kernel (head_dim 64) == the ungrouped XLA fallback."""
    B, H, Sq, D, P, G = 1, 2, 32, 64, 128, 2
    S = 256
    rng = np.random.default_rng(5)
    kf = jnp.asarray(rng.normal(size=(H, S, D)).astype(np.float32))
    vf = jnp.asarray(rng.normal(size=(H, S, D)).astype(np.float32))
    q = jnp.asarray(rng.normal(size=(B, H, Sq, D)).astype(np.float32))

    kd, ks, kz, vd, vs, vz = _grouped_pools_from_dense(kf, vf, bits, P, G)
    nps = S // P
    pt = jnp.arange(nps, dtype=jnp.int32)[None, :]
    nt = jnp.full((B, nps), P, jnp.int32)
    npg = jnp.full((B,), nps, jnp.int32)

    out, lse = ppa.batched_paged_attention(
        q, pt, nt, npg, kd, ks, kz, vd, vs, vz, bits=bits,
        return_lse=True, head_group=G)
    # ungrouped reference over the identical quantized values
    ref, ref_lse = ppa._batched_fallback(
        q, pt, nt, npg,
        ppa.degroup_pool(kd, G), ppa.degroup_sidecar(ks, G),
        ppa.degroup_sidecar(kz, G),
        ppa.degroup_pool(vd, G), ppa.degroup_sidecar(vs, G),
        ppa.degroup_sidecar(vz, G),
        bits, 1.0 / math.sqrt(D), return_lse=True)
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 2e-2, rel
    np.testing.assert_allclose(np.asarray(lse), np.asarray(ref_lse),
                               rtol=1e-3, atol=1e-3)


def test_batched_grouped_partial_and_inactive():
    """Grouped kernel honors per-slot page counts and partial last pages."""
    B, H, Sq, D, P, G = 2, 2, 8, 64, 128, 2
    S = 256
    rng = np.random.default_rng(6)
    kf = jnp.asarray(rng.normal(size=(H, S, D)).astype(np.float32))
    vf = jnp.asarray(rng.normal(size=(H, S, D)).astype(np.float32))
    q = jnp.asarray(rng.normal(size=(B, H, Sq, D)).astype(np.float32))

    kd, ks, kz, vd, vs, vz = _grouped_pools_from_dense(kf, vf, 4, P, G)
    nps = S // P
    # slot 0: 1.5 pages valid; slot 1: inactive
    pt = jnp.asarray([[0, 1], [0, 0]], jnp.int32)
    nt = jnp.asarray([[P, P // 2], [0, 0]], jnp.int32)
    npg = jnp.asarray([2, 0], jnp.int32)

    out, lse = ppa.batched_paged_attention(
        q, pt, nt, npg, kd, ks, kz, vd, vs, vz, bits=4,
        return_lse=True, head_group=G)
    ref = ppa._batched_fallback(
        q, pt, nt, npg,
        ppa.degroup_pool(kd, G), ppa.degroup_sidecar(ks, G),
        ppa.degroup_sidecar(kz, G),
        ppa.degroup_pool(vd, G), ppa.degroup_sidecar(vs, G),
        ppa.degroup_sidecar(vz, G),
        4, 1.0 / math.sqrt(D))
    rel = float(jnp.linalg.norm(out[0] - ref[0]) / jnp.linalg.norm(ref[0]))
    assert rel < 2e-2, rel
    assert np.all(np.asarray(out[1]) == 0.0)        # inactive slot
    assert np.all(np.asarray(lse[1]) == ppa.NEG_INF)


# ---------------------------------------------------------------------------
# int8-MXU activation path (act_bits=8)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("bits", [8, 4, 2])
def test_batched_a8_close_to_exact(bits):
    """act_bits=8 (int8 QK^T/AV + rank-1 scales) vs the exact bf16 kernel:
    centered levels + q at 1/254 of its row max + folded P·scale_v at
    1/254 of its column max measure 1.6-2.2% output error (the softmax
    stats stay within 4e-3) — well under the KV quantization step."""
    B, H, Sq, D, P, G = 2, 2, 64, 64, 128, 2
    S = 384
    rng = np.random.default_rng(11)
    kf = jnp.asarray(rng.normal(size=(H, S, D)).astype(np.float32))
    vf = jnp.asarray(rng.normal(size=(H, S, D)).astype(np.float32))
    q = jnp.asarray(rng.normal(size=(B, H, Sq, D)).astype(np.float32))

    kd, ks, kz, vd, vs, vz = _grouped_pools_from_dense(kf, vf, bits, P, G)
    nps = S // P
    pt = jnp.tile(jnp.arange(nps, dtype=jnp.int32)[None, :], (B, 1))
    nt = jnp.full((B, nps), P, jnp.int32)
    npg = jnp.full((B,), nps, jnp.int32)

    args = (q, pt, nt, npg, kd, ks, kz, vd, vs, vz)
    out8, lse8 = ppa.batched_paged_attention(
        *args, bits=bits, return_lse=True, head_group=G, act_bits=8)
    out16, lse16 = ppa.batched_paged_attention(
        *args, bits=bits, return_lse=True, head_group=G, act_bits=16)
    rel = float(jnp.linalg.norm(out8 - out16) / jnp.linalg.norm(out16))
    assert rel < 3.5e-2, rel
    np.testing.assert_allclose(np.asarray(lse8), np.asarray(lse16),
                               rtol=2e-2, atol=2e-2)


def test_batched_a8_varied_lengths_and_inactive():
    """a8 honors dynamic page counts, partial pages and inactive slots."""
    B, H, Sq, D, P, G = 3, 2, 16, 64, 128, 2
    S = 256
    rng = np.random.default_rng(12)
    kf = jnp.asarray(rng.normal(size=(H, S, D)).astype(np.float32))
    vf = jnp.asarray(rng.normal(size=(H, S, D)).astype(np.float32))
    q = jnp.asarray(rng.normal(size=(B, H, Sq, D)).astype(np.float32))

    kd, ks, kz, vd, vs, vz = _grouped_pools_from_dense(kf, vf, 4, P, G)
    pt = jnp.asarray([[0, 1], [0, 0], [1, 0]], jnp.int32)
    nt = jnp.asarray([[P, P // 2], [0, 0], [P, 0]], jnp.int32)
    npg = jnp.asarray([2, 0, 1], jnp.int32)

    args = (q, pt, nt, npg, kd, ks, kz, vd, vs, vz)
    out8, lse8 = ppa.batched_paged_attention(
        *args, bits=4, return_lse=True, head_group=G, act_bits=8)
    out16, _ = ppa.batched_paged_attention(
        *args, bits=4, return_lse=True, head_group=G, act_bits=16)
    for b in (0, 2):
        rel = float(jnp.linalg.norm(out8[b] - out16[b]) /
                    jnp.linalg.norm(out16[b]))
        assert rel < 2.5e-2, (b, rel)
    assert np.all(np.asarray(out8[1]) == 0.0)
    assert np.all(np.asarray(lse8[1]) == ppa.NEG_INF)


def test_batched_a8_int1_coerces_to_exact():
    """bits=1 pages sit below the int8 register tile: act_bits=8 silently
    runs the exact path (identical output)."""
    B, H, Sq, D, P = 1, 1, 8, 128, 128
    S = 128
    rng = np.random.default_rng(13)
    kf = jnp.asarray(rng.normal(size=(H, S, D)).astype(np.float32))
    vf = jnp.asarray(rng.normal(size=(H, S, D)).astype(np.float32))
    q = jnp.asarray(rng.normal(size=(B, H, Sq, D)).astype(np.float32))
    kd, ks, kz, vd, vs, vz = _grouped_pools_from_dense(kf, vf, 1, P, 1)
    pt = jnp.zeros((B, 1), jnp.int32)
    nt = jnp.full((B, 1), P, jnp.int32)
    npg = jnp.ones((B,), jnp.int32)
    args = (q, pt, nt, npg, kd, ks, kz, vd, vs, vz)
    out8 = ppa.batched_paged_attention(*args, bits=1, act_bits=8)
    out16 = ppa.batched_paged_attention(*args, bits=1, act_bits=16)
    np.testing.assert_allclose(np.asarray(out8), np.asarray(out16),
                               rtol=1e-6, atol=1e-6)

"""Paged quantized KV cache: fixed-size token pages in HBM, per-page bits.

The TPU-native replacement for the reference's monolithic `KVCacheEntry`
(SURVEY.md §7 design mapping): pages are fixed token blocks quantized at
append time with the *current phase's* bit-width, progressive precision is a
per-page metadata field (new pages get fewer bits as decoding progresses)
instead of a global re-quantization of the whole cache
(`diffuse-llm-rs/src/lib.rs:893-904`), and cold pages spill to the host tier
through `MemoryManager`.

Unlike vLLM-style AR decode, every diffusion denoise step touches the WHOLE
sequence (SURVEY.md §7 hard parts), so `gather` materializes a sequence's
pages in order; the Pallas attention kernel (`ops.pallas_attention`) consumes
the packed pages' layout directly.

Storage pools are bucketed by bit-width (one uint8 pool per width) so shapes
stay static for XLA; a page handle is (bits, slot).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from diffusion_llm_rs_tpu.cache.salience import allocate_bits
from diffusion_llm_rs_tpu.ops.pallas_attention import QuantKV


def quantize_page(x: jax.Array, bits: int):
    """Per-token quantize one page [BH, P, D] into TOKEN-BLOCK-packed layout.

    data: uint8 [BH, P/vpb, D] — byte (t, d) holds the levels of tokens
    t + p*(P/vpb) in bit-field p. The page's last dim stays D, so page DMA
    blocks are lane-aligned for EVERY bit width (the D-packed layout of
    `ops.pallas_attention` shrinks the last dim below the 128-lane tile for
    sub-8-bit at head_dim 128). Returns (data, scale [BH, P], zp [BH, P]).
    """
    BH, P, D = x.shape
    vpb = 8 // bits
    if P % vpb:
        raise ValueError(f"page tokens {P} not divisible by {vpb}")
    x = x.astype(jnp.float32)
    qmax = float((1 << bits) - 1)
    mn = jnp.min(x, axis=-1)
    mx = jnp.max(x, axis=-1)
    rng = mx - mn
    scale = jnp.where(rng > 0, rng / qmax, 1.0)
    zp = -mn / scale
    lv = jnp.clip(jnp.round(x / scale[..., None] + zp[..., None]),
                  0.0, qmax).astype(jnp.uint8)
    Pp = P // vpb
    if bits == 8:
        data = lv
    else:
        acc = lv[:, 0:Pp, :].astype(jnp.int32)
        for p in range(1, vpb):
            acc = acc | (lv[:, p * Pp:(p + 1) * Pp, :].astype(jnp.int32)
                         << (p * bits))
        data = acc.astype(jnp.uint8)
    return data, scale.astype(jnp.float32), zp.astype(jnp.float32)


def dequantize_page(data: jax.Array, scale: jax.Array, zp: jax.Array,
                    bits: int) -> jax.Array:
    """Inverse of quantize_page: [BH, P/vpb, D] -> [BH, P, D] float."""
    vpb = 8 // bits
    mask = (1 << bits) - 1
    d32 = data.astype(jnp.int32)
    parts = [((d32 >> (p * bits)) & mask) for p in range(vpb)]
    lv = jnp.concatenate(parts, axis=1).astype(jnp.float32)  # [BH, P, D]
    return (lv - zp[..., None]) * scale[..., None]


@dataclasses.dataclass
class PageHandle:
    bits: int
    slot: int
    tokens: int  # valid tokens in this page (<= page_size)


@dataclasses.dataclass
class _Pool:
    """Device-resident page pool for one bit-width."""

    k_data: jax.Array   # uint8 [num_pages, BH, P, D/vpb]
    v_data: jax.Array
    k_scale: jax.Array  # f32 [num_pages, BH, P]
    k_zp: jax.Array
    v_scale: jax.Array
    v_zp: jax.Array
    free: List[int] = dataclasses.field(default_factory=list)


class PagedKVCache:
    """Page-pooled quantized KV store for one model (all layers x heads folded
    into the BH axis)."""

    def __init__(self, bh: int, head_dim: int, page_size: int = 64,
                 pages_per_bits: Optional[Dict[int, int]] = None,
                 memory_manager=None):
        self.bh = bh
        self.head_dim = head_dim
        self.page_size = page_size
        self.memory_manager = memory_manager
        pages_per_bits = pages_per_bits or {8: 64, 4: 128, 2: 128, 1: 64}
        self._pools: Dict[int, _Pool] = {}
        for bits, n in pages_per_bits.items():
            vpb = 8 // bits
            # token-block packing: last dim stays D (lane-aligned DMA blocks
            # at every bit width); packed tokens axis shrinks instead
            shape_d = (n, bh, page_size // vpb, head_dim)
            shape_s = (n, bh, page_size)
            self._pools[bits] = _Pool(
                k_data=jnp.zeros(shape_d, jnp.uint8),
                v_data=jnp.zeros(shape_d, jnp.uint8),
                k_scale=jnp.ones(shape_s, jnp.float32),
                k_zp=jnp.zeros(shape_s, jnp.float32),
                v_scale=jnp.ones(shape_s, jnp.float32),
                v_zp=jnp.zeros(shape_s, jnp.float32),
                free=list(range(n - 1, -1, -1)))
        # sequence id -> ordered page handles
        self.page_tables: Dict[str, List[PageHandle]] = {}

    # -- page lifecycle -----------------------------------------------------

    def num_free(self, bits: int) -> int:
        return len(self._pools[bits].free)

    def _alloc(self, bits: int) -> int:
        pool = self._pools[bits]
        if not pool.free:
            raise MemoryError(f"no free {bits}-bit pages")
        return pool.free.pop()

    def append(self, seq_id: str, k: jax.Array, v: jax.Array,
               bits: int) -> List[PageHandle]:
        """Append [BH, S, D] K/V, quantized at `bits`, page by page."""
        BH, S, D = k.shape
        assert BH == self.bh and D == self.head_dim, (k.shape, self.bh)
        handles = self.page_tables.setdefault(seq_id, [])
        P = self.page_size
        for start in range(0, S, P):
            tokens = min(P, S - start)
            kc = k[:, start:start + tokens]
            vc = v[:, start:start + tokens]
            if tokens < P:  # pad the tail page
                pad = P - tokens
                kc = jnp.pad(kc, ((0, 0), (0, pad), (0, 0)))
                vc = jnp.pad(vc, ((0, 0), (0, pad), (0, 0)))
            kd, ks, kz = quantize_page(kc, bits)
            vd, vs, vz = quantize_page(vc, bits)
            slot = self._alloc(bits)
            pool = self._pools[bits]
            pool.k_data = pool.k_data.at[slot].set(kd)
            pool.v_data = pool.v_data.at[slot].set(vd)
            pool.k_scale = pool.k_scale.at[slot].set(ks)
            pool.k_zp = pool.k_zp.at[slot].set(kz)
            pool.v_scale = pool.v_scale.at[slot].set(vs)
            pool.v_zp = pool.v_zp.at[slot].set(vz)
            handles.append(PageHandle(bits=bits, slot=slot, tokens=tokens))
        return handles

    def append_salient(self, seq_id: str, k: jax.Array, v: jax.Array,
                       scores: np.ndarray, budget_bits: float,
                       bit_options: Sequence[int] = (8, 4, 2, 1)) -> None:
        """Salience-driven per-page bit allocation (BASELINE.json config 4):
        per-page scores -> widths under an average budget, pages quantized
        accordingly."""
        S = k.shape[1]
        P = self.page_size
        n_pages = -(-S // P)
        page_scores = np.asarray([
            float(np.max(scores[i * P:(i + 1) * P])) for i in range(n_pages)])
        bits_per_page = allocate_bits(page_scores, budget_bits, bit_options)
        for i in range(n_pages):
            self.append(seq_id, k[:, i * P:(i + 1) * P],
                        v[:, i * P:(i + 1) * P], int(bits_per_page[i]))

    def gather(self, seq_id: str) -> Tuple[jax.Array, jax.Array]:
        """Materialize a sequence's full K/V [BH, S, D] (dequantized).

        Mixed-precision page chains dequantize per page; single-width chains
        could hand packed pages straight to the attention kernel (round-2:
        scalar-prefetch page table in-kernel).
        """
        handles = self.page_tables.get(seq_id)
        if not handles:
            raise KeyError(f"unknown sequence {seq_id!r}")
        ks, vs = [], []
        for h in handles:
            pool = self._pools[h.bits]
            kd = dequantize_page(pool.k_data[h.slot], pool.k_scale[h.slot],
                                 pool.k_zp[h.slot], h.bits)
            vd = dequantize_page(pool.v_data[h.slot], pool.v_scale[h.slot],
                                 pool.v_zp[h.slot], h.bits)
            ks.append(kd[:, :h.tokens])
            vs.append(vd[:, :h.tokens])
        return jnp.concatenate(ks, axis=1), jnp.concatenate(vs, axis=1)

    def gather_packed(self, seq_id: str) -> Tuple[QuantKV, QuantKV]:
        """Contiguous D-packed QuantKV for `ops.pallas_attention.attention`.

        Pools store token-block-packed pages; this repacks the SAME levels
        into the contiguous kernel's D-packed layout (exact, no requantize).
        Requires a uniform-width page chain and full pages.
        """
        handles = self.page_tables.get(seq_id)
        if not handles:
            raise KeyError(f"unknown sequence {seq_id!r}")
        bits = handles[0].bits
        if any(h.bits != bits for h in handles):
            raise ValueError("mixed-precision chain: use gather()")
        # the flatten-and-slice below is only dense if every page before the
        # last is full; an interior partial page would silently return its
        # zero padding as real keys and truncate the tail
        if any(h.tokens != self.page_size for h in handles[:-1]):
            raise ValueError("interior partial page: use gather()")
        pool = self._pools[bits]
        slots = jnp.asarray([h.slot for h in handles])
        vpb = 8 // bits
        mask = (1 << bits) - 1
        D = self.head_dim
        total = sum(h.tokens for h in handles)

        def levels_of(arr):
            pages = arr[slots]                       # [n, BH, P/vpb, D]
            d32 = pages.astype(jnp.int32)
            parts = [((d32 >> (p * bits)) & mask) for p in range(vpb)]
            lv = jnp.concatenate(parts, axis=2)      # [n, BH, P, D]
            return jnp.moveaxis(lv, 0, 1).reshape(self.bh, -1, D)[:, :total]

        def repack_d(lv):
            if bits == 8:
                return lv.astype(jnp.uint8)
            Dp = D // vpb
            acc = lv[..., 0:Dp].astype(jnp.int32)
            for p in range(1, vpb):
                acc = acc | (lv[..., p * Dp:(p + 1) * Dp] << (p * bits))
            return acc.astype(jnp.uint8)

        def side(arr):
            moved = jnp.moveaxis(arr[slots], 0, 1)
            return moved.reshape(self.bh, -1)[:, :total]

        qk = QuantKV(data=repack_d(levels_of(pool.k_data)),
                     scale=side(pool.k_scale), zero_point=side(pool.k_zp),
                     bits=bits, D=D)
        qv = QuantKV(data=repack_d(levels_of(pool.v_data)),
                     scale=side(pool.v_scale), zero_point=side(pool.v_zp),
                     bits=bits, D=D)
        return qk, qv

    def attend(self, seq_id: str, q: jax.Array,
               sm_scale: Optional[float] = None) -> jax.Array:
        """Flash attention of q [BH, Sq, D] over the sequence's paged KV.

        The single entry point for the cache-read side of the hot loop
        (`forward_with_cache`, `diffuse-llm-rs/src/lib.rs:910-915`): pages
        stay packed in HBM, the Pallas kernel gathers them by page table.
        Mixed-precision chains (salience-driven `append_salient`) run ONE
        kernel call per bit-width bucket over that bucket's pages and
        flash-merge the partials by log-sum-exp — softmax over the union of
        disjoint key sets is exact under the merge, so per-page precision
        costs no extra passes over HBM and no recompile per mixture.
        """
        from diffusion_llm_rs_tpu.ops.pallas_paged_attention import (
            merge_partials, paged_attention)

        handles = self.page_tables.get(seq_id)
        if not handles:
            raise KeyError(f"unknown sequence {seq_id!r}")
        for i, h in enumerate(handles):
            if h.slot == -1:
                self.restore_page(seq_id, i)
        buckets: Dict[int, List[PageHandle]] = {}
        for h in handles:
            buckets.setdefault(h.bits, []).append(h)
        parts = []
        for bits, hs in sorted(buckets.items()):
            pool = self._pools[bits]
            pt = jnp.asarray([h.slot for h in hs], jnp.int32)
            nt = jnp.asarray([h.tokens for h in hs], jnp.int32)
            parts.append(paged_attention(
                q, pt, pool.k_data, pool.k_scale, pool.k_zp,
                pool.v_data, pool.v_scale, pool.v_zp, bits=bits,
                sm_scale=sm_scale, page_tokens=nt, return_lse=True))
        return merge_partials(parts)

    def batched_attend(self, seq_ids: Sequence[Optional[str]],
                       q: jax.Array,
                       sm_scale: Optional[float] = None) -> jax.Array:
        """Serving-path attention: q [B, H, Sq, D], one sequence per batch
        slot (None = inactive slot -> zeros). Each slot's page chain is
        looked up in-kernel by its own page table with a dynamic page count
        (`batched_paged_attention`); mixed-precision chains bucket by
        bit-width and flash-merge, as in `attend`."""
        from diffusion_llm_rs_tpu.ops.pallas_paged_attention import (
            batched_paged_attention, merge_partials)

        B = q.shape[0]
        if len(seq_ids) != B:
            raise ValueError(f"{len(seq_ids)} seq_ids for batch {B}")
        chains: List[List[PageHandle]] = []
        for sid in seq_ids:
            if sid is None:
                chains.append([])
                continue
            handles = self.page_tables.get(sid)
            if handles is None:
                # surface caller bugs (typo / already-freed id) like
                # attend()/gather() do, instead of silently attending
                # over an empty chain and returning zeros
                raise KeyError(f"unknown sequence {sid!r}")
            for i, h in enumerate(handles):
                if h.slot == -1:
                    self.restore_page(sid, i)
            chains.append(handles)
        all_bits = sorted({h.bits for hs in chains for h in hs})
        if not all_bits:
            return jnp.zeros(q.shape, jnp.float32)
        parts = []
        for bits in all_bits:
            per_slot = [[h for h in hs if h.bits == bits] for hs in chains]
            n_max = max(1, max(len(hs) for hs in per_slot))
            pt = np.zeros((B, n_max), np.int32)
            nt = np.zeros((B, n_max), np.int32)
            npg = np.zeros((B,), np.int32)
            for b, hs in enumerate(per_slot):
                npg[b] = len(hs)
                for j, h in enumerate(hs):
                    pt[b, j] = h.slot
                    nt[b, j] = h.tokens
            pool = self._pools[bits]
            parts.append(batched_paged_attention(
                q, jnp.asarray(pt), jnp.asarray(nt), jnp.asarray(npg),
                pool.k_data, pool.k_scale, pool.k_zp,
                pool.v_data, pool.v_scale, pool.v_zp, bits=bits,
                sm_scale=sm_scale, return_lse=True))
        return merge_partials(parts)

    def free(self, seq_id: str) -> int:
        """Release a sequence's pages back to the pools. Spilled pages
        (slot == -1) hold no device slot — pushing their sentinel into the
        free list would hand -1 to the next _alloc (which then writes slot
        n-1, possibly another live page); their host-tier payload is
        reclaimed instead."""
        handles = self.page_tables.pop(seq_id, [])
        for i, h in enumerate(handles):
            if h.slot == -1:
                if self.memory_manager is not None:
                    key = f"kvpage:{seq_id}:{i}"
                    for name in ("k_data", "v_data", "k_scale", "k_zp",
                                 "v_scale", "v_zp"):
                        try:
                            self.memory_manager.deallocate(f"{key}:{name}")
                        except Exception:
                            pass  # best-effort reclaim
                continue
            self._pools[h.bits].free.append(h.slot)
        return len(handles)

    def seq_len(self, seq_id: str) -> int:
        return sum(h.tokens for h in self.page_tables.get(seq_id, []))

    def memory_usage(self) -> int:
        """Bytes held by allocated (non-free) pages, packed + sidecars."""
        total = 0
        for bits, pool in self._pools.items():
            n_alloc = pool.k_data.shape[0] - len(pool.free)
            per_page = (2 * pool.k_data.shape[1] * pool.k_data.shape[2] *
                        pool.k_data.shape[3] +          # k+v packed
                        4 * pool.k_scale.shape[1] * pool.k_scale.shape[2] * 4)
            total += n_alloc * per_page
        return total

    def spill_page(self, seq_id: str, page_idx: int) -> None:
        """Demote one page to the host tier via MemoryManager (io-dedup's
        SSD-spill capability, SURVEY.md §5.7)."""
        if self.memory_manager is None:
            raise RuntimeError("no MemoryManager attached")
        h = self.page_tables[seq_id][page_idx]
        if h.slot == -1:
            return  # already spilled (symmetric with restore_page's guard)
        pool = self._pools[h.bits]
        payload = {
            "k_data": np.asarray(pool.k_data[h.slot]),
            "v_data": np.asarray(pool.v_data[h.slot]),
            "k_scale": np.asarray(pool.k_scale[h.slot]),
            "k_zp": np.asarray(pool.k_zp[h.slot]),
            "v_scale": np.asarray(pool.v_scale[h.slot]),
            "v_zp": np.asarray(pool.v_zp[h.slot]),
        }
        key = f"kvpage:{seq_id}:{page_idx}"
        for name, arr in payload.items():
            self.memory_manager.allocate(f"{key}:{name}", arr, tier="host")
        pool.free.append(h.slot)
        h.slot = -1  # spilled marker

    def restore_page(self, seq_id: str, page_idx: int) -> None:
        h = self.page_tables[seq_id][page_idx]
        if h.slot != -1:
            return
        pool = self._pools[h.bits]
        key = f"kvpage:{seq_id}:{page_idx}"
        slot = self._alloc(h.bits)
        mm = self.memory_manager
        pool.k_data = pool.k_data.at[slot].set(
            jnp.asarray(np.asarray(mm.get(f"{key}:k_data"))))
        pool.v_data = pool.v_data.at[slot].set(
            jnp.asarray(np.asarray(mm.get(f"{key}:v_data"))))
        pool.k_scale = pool.k_scale.at[slot].set(
            jnp.asarray(np.asarray(mm.get(f"{key}:k_scale"))))
        pool.k_zp = pool.k_zp.at[slot].set(
            jnp.asarray(np.asarray(mm.get(f"{key}:k_zp"))))
        pool.v_scale = pool.v_scale.at[slot].set(
            jnp.asarray(np.asarray(mm.get(f"{key}:v_scale"))))
        pool.v_zp = pool.v_zp.at[slot].set(
            jnp.asarray(np.asarray(mm.get(f"{key}:v_zp"))))
        for name in ("k_data", "v_data", "k_scale", "k_zp", "v_scale", "v_zp"):
            mm.deallocate(f"{key}:{name}")
        h.slot = slot

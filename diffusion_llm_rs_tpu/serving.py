"""Continuous batching of denoising steps — the serving scheduler.

BASELINE.json config 5 / SURVEY.md §7 hard parts: "batch membership changes
while t-steps differ per request — scheduler must cope with per-request
timestep vectors". The reference's per-sample `t: Array1<usize>`
(`diffuse-llm-rs/src/lib.rs:619`) is exactly the right abstraction, and the
denoiser here takes a per-sample timestep vector natively.

Design: a fixed pool of B batch slots. ONE jitted step function runs a denoise
step for all slots with their per-slot timesteps (inactive slots masked); the
host loop admits queued requests into freed slots (fresh noise at t=T-1) and
retires slots that reach t=0. Slot state (x, quantized KV rows) is updated
with `.at[slot].set` — batch membership changes never trigger recompilation
because shapes are static.

Multi-host: run one scheduler per host over the data-parallel shard of slots;
the sharded step compiles with the same static shapes (parallel/mesh.py).
"""

from __future__ import annotations

import dataclasses
import functools
import time
from collections import deque
from typing import Callable, Deque, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from diffusion_llm_rs_tpu.cache.paged import quantize_page
from diffusion_llm_rs_tpu.config import DiffusionConfig
from diffusion_llm_rs_tpu.models import denoiser as dn
from diffusion_llm_rs_tpu.models.diffusion import DiffusionSchedule, p_sample
from diffusion_llm_rs_tpu.models.sampler import SUPPORTED, bucket_bits
from diffusion_llm_rs_tpu.ops.pallas_paged_attention import (
    batched_paged_attention, merge_partials)
from diffusion_llm_rs_tpu.utils.metrics import metrics


@dataclasses.dataclass
class Request:
    request_id: str
    seq_len: int
    num_steps: int
    submitted_at: float = dataclasses.field(default_factory=time.time)


@dataclasses.dataclass
class Completion:
    request_id: str
    tokens: np.ndarray       # [seq_len] decoded token ids
    embeddings: np.ndarray   # [seq_len, hidden]
    steps: int
    latency_s: float


class ContinuousBatcher:
    """Fixed-slot continuous batching over the diffusion denoise loop."""

    def __init__(self, params, cfg: DiffusionConfig,
                 schedule: Optional[DiffusionSchedule] = None,
                 num_slots: int = 8, seq_len: int = 64, seed: int = 0):
        self.params = params
        # readout (decode_tokens) params — the sharded subclass re-packs
        # self.params for its step fn but keeps the original tree here
        self.readout_params = params
        self.cfg = cfg
        self.schedule = schedule or DiffusionSchedule.create(
            cfg.num_timesteps, cfg.beta_start, cfg.beta_end, cfg.beta_schedule)
        self.num_slots = num_slots
        self.seq_len = seq_len
        self._key = jax.random.PRNGKey(seed)

        B, S, D = num_slots, seq_len, cfg.hidden_size
        self.x = jnp.zeros((B, S, D), jnp.float32)
        # per-slot timestep; -1 = inactive (`t: Array1<usize>` per-sample)
        self.t = np.full((B,), -1, np.int64)
        self.slot_request: List[Optional[Request]] = [None] * B
        self.queue: Deque[Request] = deque()
        self.completions: Deque[Completion] = deque()
        self._step_fn = self._build_step()

    # -- jitted batched denoise step ----------------------------------------

    def _build_step(self) -> Callable:
        cfg, schedule = self.cfg, self.schedule

        @jax.jit
        def step(params, x, t_vec, active, slot_keys):
            # one reverse step for every slot at its own timestep; Langevin
            # noise is drawn per-slot from that slot's own key, so batch
            # membership changes never perturb other slots' streams (and a
            # data-parallel shard of the slots computes identical values)
            t_clamped = jnp.maximum(t_vec, 0).astype(jnp.int32)
            eps = dn.denoiser_forward(params, cfg, x, t_clamped)
            noise = jax.vmap(
                lambda k: jax.random.normal(k, x.shape[1:], x.dtype))(slot_keys)
            x_next = p_sample(schedule, x, t_clamped, eps, noise=noise)
            keep = active.reshape(-1, 1, 1)
            return jnp.where(keep, x_next, x)

        return step

    # -- public API ----------------------------------------------------------

    def submit(self, request: Request) -> None:
        if request.seq_len > self.seq_len:
            raise ValueError(
                f"request seq_len {request.seq_len} > slot seq_len "
                f"{self.seq_len}")
        self.queue.append(request)
        metrics.inc("batcher.submitted")

    def active_slots(self) -> int:
        return int((self.t >= 0).sum())

    def _admit(self) -> None:
        for slot in range(self.num_slots):
            if self.t[slot] >= 0 or not self.queue:
                continue
            req = self.queue.popleft()
            self._key, sub = jax.random.split(self._key)
            noise = jax.random.normal(
                sub, (self.seq_len, self.cfg.hidden_size), jnp.float32)
            self.x = self.x.at[slot].set(noise)
            self.t[slot] = req.num_steps - 1
            self.slot_request[slot] = req
            metrics.inc("batcher.admitted")

    def _invoke_step(self, active_mask: np.ndarray,
                     slot_keys: jax.Array) -> None:
        """Run the jitted denoise step, updating self.x (and any cache state)."""
        self.x = self._step_fn(self.params, self.x,
                               jnp.asarray(self.t), jnp.asarray(active_mask),
                               slot_keys)

    def step(self) -> int:
        """Admit, run ONE denoise step over the batch, retire finished slots.
        Returns the number of active slots stepped."""
        self._admit()
        active_mask = self.t >= 0
        n_active = int(active_mask.sum())
        if n_active == 0:
            return 0
        self._key, sub = jax.random.split(self._key)
        self._invoke_step(active_mask, jax.random.split(sub, self.num_slots))
        finished = active_mask & (self.t == 0)
        self.t = np.where(active_mask, self.t - 1, self.t)
        metrics.inc("batcher.steps")
        metrics.inc("batcher.slot_steps", n_active)
        if finished.any():
            x_host = None
            for slot in np.nonzero(finished)[0]:
                req = self.slot_request[slot]
                if x_host is None:
                    x_host = np.asarray(self.x)
                emb = x_host[slot, : req.seq_len]
                tokens = np.asarray(dn.decode_tokens(
                    self.readout_params, jnp.asarray(emb[None]))[0])
                self.completions.append(Completion(
                    request_id=req.request_id, tokens=tokens,
                    embeddings=emb, steps=req.num_steps,
                    latency_s=time.time() - req.submitted_at))
                self.slot_request[slot] = None
                self.t[slot] = -1
                metrics.inc("batcher.completed")
        return n_active

    def run_until_drained(self, max_steps: int = 100_000) -> List[Completion]:
        """Drive the loop until queue and slots are empty."""
        steps = 0
        while (self.queue or self.active_slots()) and steps < max_steps:
            self.step()
            steps += 1
        out = list(self.completions)
        self.completions.clear()
        return out

    def stats(self) -> Dict[str, float]:
        return {
            "queued": len(self.queue),
            "active": self.active_slots(),
            "completed": len(self.completions),
        }


# ---------------------------------------------------------------------------
# Paged quantized-KV serving path
# ---------------------------------------------------------------------------


def make_slot_bits_router(cfg: DiffusionConfig):
    """Per-slot KV bit-width routing, the vectorized twin of
    `models.sampler.plan_segments` (same phase/progress arithmetic,
    `diffuse-llm-rs/src/lib.rs:886-904`, with the fixes of DESIGN.md #4).

    Returns (bucket widths, fn) where fn(t, total_steps) -> int32 bits per
    slot: prefill bits while t > total/2, then decode bits interpolating
    down to min_decode_bits when progressive precision is on, bucketed onto
    the supported power-of-two widths.
    """
    qc = cfg.quant_config
    if not cfg.use_phase_aware_quant:
        bits = bucket_bits(cfg.kv_quant_bits or 8)
        return (bits,), lambda t, total: jnp.full(t.shape, bits, jnp.int32)
    pb = bucket_bits(qc.prefill_bits)
    db = bucket_bits(qc.decode_bits)
    if qc.progressive_precision:
        lo = bucket_bits(qc.min_decode_bits)
        decode_widths = tuple(b for b in SUPPORTED if lo <= b <= db)
    else:
        decode_widths = (db,)
    widths = tuple(sorted(set(decode_widths) | {pb}))

    def fn(t: jax.Array, total: jax.Array) -> jax.Array:
        half = total // 2
        if qc.progressive_precision:
            progress = jnp.clip(
                (half - t).astype(jnp.float32) /
                jnp.maximum(half, 1).astype(jnp.float32), 0.0, 1.0)
            target = (qc.decode_bits * (1.0 - progress) +
                      qc.min_decode_bits * progress)
            target = jnp.maximum(target, float(qc.min_decode_bits))
        else:
            target = jnp.full(t.shape, float(db), jnp.float32)
        dbits = jnp.full(t.shape, min(decode_widths), jnp.int32)
        for b in sorted(decode_widths):  # final pick: largest width <= target
            dbits = jnp.where(target >= b, b, dbits)
        return jnp.where(t > half, pb, dbits).astype(jnp.int32)

    return widths, fn


def _quantize_pages(x: jax.Array, bits: int):
    """Per-token quantize pages [N, H, P, Hd] into the pools' token-block
    layout: data [N, H, P/vpb, Hd] + scale/zp [N, H, P]
    (`cache.paged.quantize_page` vectorized over the page axis)."""
    N, H, P, Hd = x.shape
    d, s, z = quantize_page(x.reshape(N * H, P, Hd), bits)
    return (d.reshape(N, H, P // (8 // bits), Hd),
            s.reshape(N, H, P), z.reshape(N, H, P))


class PagedContinuousBatcher(ContinuousBatcher):
    """Continuous batching with the quantized PAGED KV cache in the hot loop.

    The serving-side integration of the whole memory stack: every layer of
    the ONE jitted step quantizes its fresh K/V into fixed per-(layer, slot)
    page ranges of bit-width-bucketed HBM pools (the reference's
    `update_kv_cache`, `diffuse-llm-rs/src/lib.rs:826-835`) and then attends
    over those pages with the batched paged flash kernel — its page gather
    happens in-kernel and its page-loop bound is each slot's OWN page count,
    so short or inactive slots cost only their own pages
    (`forward_with_cache`, `lib.rs:910-915`; update-then-read order of
    `lib.rs:907-918` preserved).

    Phase-aware + progressive precision (`lib.rs:85-105,886-904`): each slot
    reads the bucket of its own phase — prefill bits while t > num_steps/2,
    then decode bits interpolating down to min_decode_bits — via
    `make_slot_bits_router`, the vectorized twin of the engine sampler's
    `plan_segments`. Every bucket's copy is written each step, generalizing
    the dual-copy `KVCacheEntry::update` (`lib.rs:246-276`); the write
    bandwidth of the extra copies is tiny next to the attention reads, and
    keeping all buckets static means per-slot precision changes never
    recompile — the bucketed answer to SURVEY.md §7's "dynamic bit-width
    mid-sampling" hard part.
    """

    def __init__(self, params, cfg: DiffusionConfig,
                 schedule: Optional[DiffusionSchedule] = None,
                 num_slots: int = 8, seq_len: int = 64, seed: int = 0,
                 page_size: Optional[int] = None):
        self.page_size = page_size or min(seq_len, 64)
        if seq_len % self.page_size:
            raise ValueError(f"seq_len {seq_len} not divisible by page_size "
                             f"{self.page_size}")
        self.buckets, self._slot_bits = make_slot_bits_router(cfg)
        for bits in self.buckets:
            if self.page_size % (8 // bits):
                raise ValueError(f"page_size {self.page_size} not divisible "
                                 f"by {8 // bits} (bits={bits})")
        self.num_pages_per_slot = seq_len // self.page_size
        self.cfg = cfg
        self.head_group = self._choose_head_group()
        super().__init__(params, cfg, schedule, num_slots, seq_len, seed)
        self.pools = {bits: self._make_pool(bits) for bits in self.buckets}

    def _choose_head_group(self) -> int:
        """Head grouping: head_dim < 128 packs G heads per 128-lane page
        block so the paged kernel applies at the GPT-2 shape (head_dim 64)."""
        Hd, H = self.cfg.head_dim, self.cfg.num_attention_heads
        if Hd % 128 == 0:
            return 1
        if 128 % Hd == 0 and H % (128 // Hd) == 0:
            return 128 // Hd
        return 1

    def _make_pool(self, bits: int) -> Dict[str, jax.Array]:
        """One bucket's HBM page pool (layout = `cache.paged._Pool`, with the
        pool's BH axis carrying heads; layers and slots partition the page
        axis as fixed ranges)."""
        vpb = 8 // bits
        cfg = self.cfg
        n = cfg.num_layers * self.num_slots * self.num_pages_per_slot
        H, Hd, P = cfg.num_attention_heads, cfg.head_dim, self.page_size
        G = self.head_group
        HG = H // G
        return {
            "k_data": jnp.zeros((n, HG, P // vpb, G * Hd), jnp.uint8),
            "v_data": jnp.zeros((n, HG, P // vpb, G * Hd), jnp.uint8),
            "k_scale": jnp.ones((n, HG, G * P), jnp.float32),
            "k_zp": jnp.zeros((n, HG, G * P), jnp.float32),
            "v_scale": jnp.ones((n, HG, G * P), jnp.float32),
            "v_zp": jnp.zeros((n, HG, G * P), jnp.float32),
        }

    def _build_step(self) -> Callable:
        cfg, schedule = self.cfg, self.schedule
        B, S = self.num_slots, self.seq_len
        P, nps, buckets = self.page_size, self.num_pages_per_slot, self.buckets
        H, Hd = cfg.num_attention_heads, cfg.head_dim
        L = cfg.num_layers
        slot_bits_fn = self._slot_bits
        # page id of (layer li, slot b, page j) = (li*B + b)*nps + j — fixed
        # ranges, so the page tables are constants and scatters are
        # constant-offset dynamic_update_slices
        pt_const = jnp.asarray(
            (np.arange(L * B)[:, None] * nps +
             np.arange(nps)[None, :]).reshape(L, B, nps), jnp.int32)

        @functools.partial(jax.jit, donate_argnums=(7,))
        def step(params, x, t_vec, active, seq_lens, total_steps, slot_keys,
                 pools):
            t_clamped = jnp.maximum(t_vec, 0).astype(jnp.int32)
            # phase + progressive-precision routing per slot (lib.rs:886-904)
            slot_bits = slot_bits_fn(t_clamped, total_steps)
            nps_actual = ((seq_lens + P - 1) // P).astype(jnp.int32)
            page_idx = jnp.arange(nps, dtype=jnp.int32)[None, :]
            nt = jnp.clip(seq_lens[:, None] - page_idx * P, 0, P
                          ).astype(jnp.int32)        # valid tokens per page
            pools = {b: dict(p) for b, p in pools.items()}

            G = self.head_group
            HG = H // G

            def attend_fn(li, q, k, v, mask):
                del mask  # page/token validity is carried by nt/npg

                def to_pages(z):  # [B, S, H, Hd] -> [B*nps, H, P, Hd]
                    z = z.transpose(0, 2, 1, 3).reshape(B, H, nps, P, Hd)
                    return z.transpose(0, 2, 1, 3, 4).reshape(B * nps, H, P, Hd)

                def group_pages(d):  # [N, H, Pp, Hd] -> [N, HG, Pp, G*Hd]
                    if G == 1:
                        return d
                    N, _, Pp_, _ = d.shape
                    return (d.reshape(N, HG, G, Pp_, Hd)
                            .transpose(0, 1, 3, 2, 4)
                            .reshape(N, HG, Pp_, G * Hd))

                def group_sidecar(s):  # [N, H, P] -> [N, HG, G*P]
                    return s if G == 1 else s.reshape(s.shape[0], HG, G * P)

                kp, vp = to_pages(k), to_pages(v)
                off = li * B * nps
                parts = []
                for bits in buckets:
                    pool = pools[bits]
                    for name, pages in (("k", kp), ("v", vp)):
                        d, s, z = _quantize_pages(pages, bits)
                        pool[f"{name}_data"] = jax.lax.dynamic_update_slice(
                            pool[f"{name}_data"], group_pages(d),
                            (off, 0, 0, 0))
                        pool[f"{name}_scale"] = jax.lax.dynamic_update_slice(
                            pool[f"{name}_scale"], group_sidecar(s),
                            (off, 0, 0))
                        pool[f"{name}_zp"] = jax.lax.dynamic_update_slice(
                            pool[f"{name}_zp"], group_sidecar(z),
                            (off, 0, 0))
                    npg = jnp.where(active & (slot_bits == bits),
                                    nps_actual, 0).astype(jnp.int32)
                    parts.append(batched_paged_attention(
                        q.transpose(0, 2, 1, 3), pt_const[li], nt, npg,
                        pool["k_data"], pool["k_scale"], pool["k_zp"],
                        pool["v_data"], pool["v_scale"], pool["v_zp"],
                        bits=bits, return_lse=True, head_group=G))
                out = merge_partials(parts)          # [B, H, S, Hd] f32
                return out.transpose(0, 2, 1, 3)

            eps = dn.denoiser_forward(params, cfg, x, t_clamped,
                                      attend_fn=attend_fn)
            noise = jax.vmap(
                lambda k: jax.random.normal(k, x.shape[1:], x.dtype))(slot_keys)
            x_next = p_sample(schedule, x, t_clamped, eps, noise=noise)
            keep = active.reshape(-1, 1, 1)
            return jnp.where(keep, x_next, x), pools

        return step

    def _invoke_step(self, active_mask: np.ndarray,
                     slot_keys: jax.Array) -> None:
        seq_lens = jnp.asarray(
            [r.seq_len if r is not None else 0 for r in self.slot_request],
            jnp.int32)
        total_steps = jnp.asarray(
            [r.num_steps if r is not None else 1 for r in self.slot_request],
            jnp.int32)
        self.x, self.pools = self._step_fn(
            self.params, self.x, jnp.asarray(self.t),
            jnp.asarray(active_mask), seq_lens, total_steps, slot_keys,
            self.pools)

    def cache_memory_bytes(self) -> int:
        """HBM bytes held by the page pools (packed data + sidecars) — the
        reference's `kv_cache_memory_usage` metric (`lib.rs:1082-1084`)."""
        return sum(int(a.size) * a.dtype.itemsize
                   for pool in self.pools.values() for a in pool.values())

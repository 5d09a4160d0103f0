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
import math
import time
from collections import deque
from typing import Callable, Deque, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from diffusion_llm_rs_tpu.cache.paged import dequantize_page, quantize_page
from diffusion_llm_rs_tpu.cache.salience import allocate_bits
from diffusion_llm_rs_tpu.config import DiffusionConfig
from diffusion_llm_rs_tpu.models import denoiser as dn
from diffusion_llm_rs_tpu.models.diffusion import DiffusionSchedule, p_sample
from diffusion_llm_rs_tpu.models.sampler import (SUPPORTED, bucket_bits,
                                                 bucket_bits_up)
from diffusion_llm_rs_tpu.ops.pallas_paged_attention import (
    batched_paged_attention, merge_partials)
from diffusion_llm_rs_tpu.utils.metrics import metrics
from diffusion_llm_rs_tpu.utils.sanitize import (ReentrancyGuard,
                                                 check_scheduler_invariants,
                                                 sanitize_enabled)


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
    embeddings: Optional[np.ndarray]   # [seq_len, hidden]; None unless the
    # batcher keeps embeddings (the [B, S, D] host transfer through a TPU
    # tunnel costs more than the denoise steps — tokens are the product)
    steps: int
    # submit -> retirement dispatch (the request's last denoise step). The
    # decode/host transfer that materializes `tokens` is deferred past the
    # NEXT wave's dispatch to overlap device compute, so its tail is
    # deliberately excluded — it measures scheduler batching, not this
    # request's service time.
    latency_s: float


class ContinuousBatcher:
    """Fixed-slot continuous batching over the diffusion denoise loop."""

    def __init__(self, params, cfg: DiffusionConfig,
                 schedule: Optional[DiffusionSchedule] = None,
                 num_slots: int = 8, seq_len: int = 64, seed: int = 0,
                 keep_embeddings: bool = True,
                 sanitize: Optional[bool] = None):
        self.params = params
        # readout (decode_tokens) params — the sharded subclass re-packs
        # self.params for its step fn but keeps the original tree here
        self.readout_params = params
        self.keep_embeddings = keep_embeddings
        self.cfg = cfg
        self.schedule = schedule or DiffusionSchedule.create(
            cfg.num_timesteps, cfg.beta_start, cfg.beta_end, cfg.beta_schedule)
        if seq_len > cfg.max_sequence_length:
            # fail at construction, not 3 frames deep in the jitted scan:
            # the denoiser's positional table is cfg.max_sequence_length long
            raise ValueError(
                f"seq_len {seq_len} exceeds the model's max_sequence_length "
                f"{cfg.max_sequence_length}")
        self.num_slots = num_slots
        self.seq_len = seq_len
        self._key = jax.random.PRNGKey(seed)

        B, S, D = num_slots, seq_len, cfg.hidden_size
        # denoiser compute dtype (MXU path); slot state + posterior stay f32
        self._model_dtype = (jnp.bfloat16 if cfg.dtype == "bfloat16"
                             else jnp.float32)
        self.x = jnp.zeros((B, S, D), jnp.float32)
        # per-slot timestep; -1 = inactive (`t: Array1<usize>` per-sample)
        self.t = np.full((B,), -1, np.int64)
        self.slot_request: List[Optional[Request]] = [None] * B
        self.queue: Deque[Request] = deque()
        self.completions: Deque[Completion] = deque()
        # retires whose decode is dispatched but not yet transferred — the
        # host transfer happens AFTER the next wave is dispatched, so it
        # overlaps device compute instead of serializing the loop
        self._pending_retires: List[tuple] = []
        self._decode_fn: Optional[Callable] = None
        self._admit_fn: Optional[Callable] = None
        # sanitizers (utils/sanitize.py, SURVEY.md §5.2): the host loop is
        # single-threaded by design — the guard turns the forbidden race
        # into a loud error; invariants check the slot state machine
        self.sanitize = sanitize_enabled() if sanitize is None else sanitize
        self._guard = ReentrancyGuard("batcher.step")
        self._step_fn = self._build_step()

    # -- jitted batched denoise step ----------------------------------------

    def _build_step(self) -> Callable:
        cfg, schedule = self.cfg, self.schedule
        mdt = self._model_dtype

        @jax.jit
        def step(params, x, t_vec, active, slot_keys):
            # one reverse step for every slot at its own timestep; Langevin
            # noise is drawn per-slot from that slot's own key, so batch
            # membership changes never perturb other slots' streams (and a
            # data-parallel shard of the slots computes identical values)
            t_clamped = jnp.maximum(t_vec, 0).astype(jnp.int32)
            eps = dn.denoiser_forward(params, cfg, x.astype(mdt),
                                      t_clamped).astype(jnp.float32)
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
        # num_steps=0 would admit as t=-1 (immediately inactive, never
        # completed); num_steps > T would index the schedule out of range
        # (jax gather CLAMPS, silently reusing the last coefficients)
        if not 1 <= request.num_steps <= self.cfg.num_timesteps:
            raise ValueError(
                f"request num_steps {request.num_steps} outside "
                f"[1, {self.cfg.num_timesteps}]")
        self.queue.append(request)
        metrics.inc("batcher.submitted")

    def active_slots(self) -> int:
        return int((self.t >= 0).sum())

    def _admit(self) -> None:
        # Batched admission: ONE key split + ONE [n, S, D] normal + ONE
        # scatter for all newly admitted slots. (Per-slot eager admission ops
        # through the TPU tunnel were measured at ~15 ms per request —
        # DESIGN.md perf log, round 3.)
        fresh: List[int] = []
        for slot in range(self.num_slots):
            if self.t[slot] >= 0 or not self.queue:
                continue
            req = self.queue.popleft()
            fresh.append(slot)
            self.t[slot] = req.num_steps - 1
            self.slot_request[slot] = req
            metrics.inc("batcher.admitted")
        if fresh:
            # full-[B] noise + masked select: ONE compiled shape regardless
            # of how many slots admit (a per-count scatter compiles B
            # variants at ~2.6 s each through the TPU tunnel)
            self._key, sub = jax.random.split(self._key)
            noise = jax.random.normal(
                sub, (self.num_slots, self.seq_len, self.cfg.hidden_size),
                jnp.float32)
            mask = np.zeros((self.num_slots,), bool)
            mask[fresh] = True
            if self._admit_fn is None:
                self._admit_fn = jax.jit(
                    lambda x, m, n: jnp.where(m[:, None, None], n, x))
            self.x = self._admit_fn(self.x, jnp.asarray(mask), noise)

    def _invoke_step(self, active_mask: np.ndarray,
                     slot_keys: jax.Array) -> None:
        """Run the jitted denoise step, updating self.x (and any cache state)."""
        self.x = self._step_fn(self.params, self.x,
                               jnp.asarray(self.t), jnp.asarray(active_mask),
                               slot_keys)

    def step(self) -> int:
        """Admit, run denoise step(s), retire finished slots. Returns the
        number of active slots stepped. Guarded against concurrent entry;
        with `sanitize` on, slot-state invariants are checked after."""
        with self._guard():
            n = self._step_impl()
        if self.sanitize:
            check_scheduler_invariants(self)
        return n

    def _step_impl(self) -> int:
        self._admit()
        active_mask = self.t >= 0
        n_active = int(active_mask.sum())
        if n_active == 0:
            self._flush_retires()
            return 0
        self._key, sub = jax.random.split(self._key)
        self._invoke_step(active_mask, jax.random.split(sub, self.num_slots))
        # previous wave's deferred retires: transfer now, overlapping the
        # wave just dispatched
        self._flush_retires()
        finished = active_mask & (self.t == 0)
        self.t = np.where(active_mask, self.t - 1, self.t)
        metrics.inc("batcher.steps")
        metrics.inc("batcher.slot_steps", n_active)
        self._retire(finished)
        return n_active

    def _retire(self, finished: np.ndarray) -> None:
        """Dispatch the retirement decode and free the slots; the host
        transfer is DEFERRED to `_flush_retires`.

        Token decode runs as ONE jitted all-slots call (static shape, no
        per-slot dispatch): an eager per-slot readout was measured at ~75 ms
        per retired request through the TPU tunnel — more than the denoise
        steps themselves (DESIGN.md perf log, round 3). Deferring the
        transfer to after the NEXT wave's dispatch overlaps it with device
        compute instead of serializing the loop on every retirement wave
        (VERDICT r3 weak #7). Slot bookkeeping is host state, so slots are
        reusable immediately — the decode's device buffers are immutable."""
        if not finished.any():
            return
        if self._decode_fn is None:
            self._decode_fn = jax.jit(dn.decode_tokens)
        tokens_dev = self._decode_fn(self.readout_params, self.x)  # async
        x_dev = self.x if self.keep_embeddings else None
        entries = []
        for slot in np.nonzero(finished)[0]:
            entries.append((int(slot), self.slot_request[slot]))
            self.slot_request[slot] = None
            self.t[slot] = -1
            metrics.inc("batcher.completed")
        self._pending_retires.append((tokens_dev, x_dev, entries, time.time()))

    def _flush_retires(self) -> None:
        """Materialize deferred retirement decodes into Completions."""
        for tokens_dev, x_dev, entries, t_done in self._pending_retires:
            tokens_all = self._to_host(tokens_dev)            # [B, S]
            x_host = self._to_host(x_dev) if x_dev is not None else None
            for slot, req in entries:
                self.completions.append(Completion(
                    request_id=req.request_id,
                    tokens=tokens_all[slot, : req.seq_len],
                    embeddings=(x_host[slot, : req.seq_len]
                                if x_host is not None else None),
                    steps=req.num_steps,
                    latency_s=t_done - req.submitted_at))
        self._pending_retires.clear()

    def _to_host(self, arr) -> np.ndarray:
        """Device -> host transfer for retirement readout. The sharded
        subclass overrides this with a process-allgather so the same host
        scheduler runs unchanged when the mesh spans OS processes."""
        return np.asarray(arr)

    def run_until_drained(self, max_steps: int = 100_000) -> List[Completion]:
        """Drive the loop until queue and slots are empty."""
        steps = 0
        while (self.queue or self.active_slots()) and steps < max_steps:
            self.step()
            steps += 1
        self._flush_retires()
        out = list(self.completions)
        self.completions.clear()
        return out

    def stats(self) -> Dict[str, float]:
        self._flush_retires()
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
        lo = bucket_bits_up(qc.min_decode_bits)  # floor never rounds DOWN
        decode_widths = tuple(b for b in SUPPORTED if lo <= b <= db) or (db,)
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


def make_slot_budget_router(cfg: DiffusionConfig):
    """Device twin of `slot_phase_bits_np`'s FLOAT budget column: the
    per-slot average-bits budget the salience allocator spends across the
    slot's pages (prefill bits while t > total/2, then the progressive
    interpolation target). Used by the fused salience chunk."""
    qc = cfg.quant_config
    if not cfg.use_phase_aware_quant:
        b = float(bucket_bits(cfg.kv_quant_bits or 8))
        return lambda t, total: jnp.full(t.shape, b, jnp.float32)
    db = bucket_bits(qc.decode_bits)

    def fn(t: jax.Array, total: jax.Array) -> jax.Array:
        half = total // 2
        if qc.progressive_precision:
            progress = jnp.clip(
                (half - t).astype(jnp.float32) /
                jnp.maximum(half, 1).astype(jnp.float32), 0.0, 1.0)
            target = jnp.maximum(
                qc.decode_bits * (1.0 - progress) +
                qc.min_decode_bits * progress, float(qc.min_decode_bits))
        else:
            target = jnp.full(t.shape, float(db), jnp.float32)
        return jnp.where(t > half, float(qc.prefill_bits),
                         target).astype(jnp.float32)

    return fn


def _quantize_pages(x: jax.Array, bits: int):
    """Per-token quantize pages [N, H, P, Hd] into the pools' token-block
    layout: data [N, H, P/vpb, Hd] + scale/zp [N, H, P]
    (`cache.paged.quantize_page` vectorized over the page axis)."""
    N, H, P, Hd = x.shape
    d, s, z = quantize_page(x.reshape(N * H, P, Hd), bits)
    return (d.reshape(N, H, P // (8 // bits), Hd),
            s.reshape(N, H, P), z.reshape(N, H, P))


def slot_phase_bits_np(cfg: DiffusionConfig, t: np.ndarray,
                       total: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Host (numpy) twin of `make_slot_bits_router`: per-slot (bucketed bits,
    UNBUCKETED float target). The float target is the salience router's
    per-slot bit BUDGET — progressive precision becomes a fractional budget
    curve that `allocate_bits` spends across the slot's pages."""
    t = np.asarray(t, np.int64)
    total = np.asarray(total, np.int64)
    qc = cfg.quant_config
    if not cfg.use_phase_aware_quant:
        b = float(bucket_bits(cfg.kv_quant_bits or 8))
        bits = np.full(t.shape, b, np.int32)
        return bits, np.full(t.shape, b, np.float32)
    half = total // 2
    pb = bucket_bits(qc.prefill_bits)
    db = bucket_bits(qc.decode_bits)
    if qc.progressive_precision:
        lo = bucket_bits_up(qc.min_decode_bits)  # same floor as the router
        decode_widths = tuple(b for b in SUPPORTED if lo <= b <= db) or (db,)
        # float32 in the SAME op order as the device router
        # (make_slot_bits_router): float64 here diverged from the device's
        # float32 at bucket boundaries (e.g. target 4.0000000000000004 vs
        # 3.9999998), flipping the pick — the chunked path then pruned the
        # bucket the device actually routed to (review r5). Exact ulp
        # parity is not guaranteed (XLA may fuse an FMA), so the chunk's
        # bucket union additionally guards boundaries with an eps
        # (`_used_buckets_chunk`).
        progress = np.clip(
            (half - t).astype(np.float32) /
            np.maximum(half, 1).astype(np.float32),
            np.float32(0.0), np.float32(1.0))
        target = (np.float32(qc.decode_bits) *
                  (np.float32(1.0) - progress) +
                  np.float32(qc.min_decode_bits) * progress)
        target = np.maximum(target, np.float32(qc.min_decode_bits))
    else:
        decode_widths = (db,)
        target = np.full(t.shape, float(db), np.float32)
    dbits = np.full(t.shape, min(decode_widths), np.int32)
    for b in sorted(decode_widths):
        dbits = np.where(target >= b, b, dbits)
    bits = np.where(t > half, pb, dbits).astype(np.int32)
    budget = np.where(t > half, float(qc.prefill_bits), target
                      ).astype(np.float32)
    return bits, budget


def _page_mass_proxy(q, k, *, B, S, Pg, nps, H, Hd, seq_lens, page_idx,
                     page_valid):
    """Per-page attention-mass proxy [B, nps]: softmax over pages of
    (mean valid q) . (mean valid k of the page) — the in-step salience
    signal (`/root/reference/salience-engine/src/lib.rs:130-151` intent)."""
    tok_pos = (page_idx[..., None] * Pg +
               jnp.arange(Pg, dtype=jnp.int32)[None, None, :])
    tok_valid = (tok_pos < seq_lens[:, None, None]).astype(jnp.float32)
    kpage = k.reshape(B, nps, Pg, H, Hd)
    km = (jnp.einsum("bnp,bnphd->bnhd", tok_valid, kpage) /
          jnp.maximum(tok_valid.sum(2), 1.0)[..., None, None])
    qvalid = (jnp.arange(S)[None, :] < seq_lens[:, None]).astype(jnp.float32)
    qm = (jnp.einsum("bs,bshd->bhd", qvalid, q) /
          jnp.maximum(qvalid.sum(1), 1.0)[:, None, None])
    logits = jnp.einsum("bhd,bnhd->bn", qm, km) / math.sqrt(Hd)
    logits = jnp.where(page_valid, logits, -jnp.inf)
    mass = jax.nn.softmax(logits, axis=-1)
    return jnp.where(page_valid, mass, 0.0)


def _dense_attend_factory(*, cfg: DiffusionConfig, B: int, S: int, Pg: int,
                          nps: int, H: int, buckets, page_bits: jax.Array,
                          active: jax.Array, seq_lens: jax.Array,
                          scores_acc, used=None):
    """Dense fake-quant twin of `_paged_attend_factory` for the
    short-sequence regime: K/V take the SAME per-(token, head) affine
    quantization round trip at each page's routed bits (`quantize_page` /
    `dequantize_page`, numerically identical to what the paged pools hold),
    then ONE dense attention consumes the mixed-precision reconstruction —
    no page pools, no scatter, no page-gather kernel.

    At short S the paged kernel's sequential page-DMA grid and the per-layer
    pool rewrites cost more than they save (measured: DESIGN.md round-3 perf
    log); the paged path wins only once the quantized KV reads dominate.
    `PagedContinuousBatcher(attend_mode="auto")` picks the regime."""
    Hd = cfg.head_dim
    page_idx = jnp.arange(nps, dtype=jnp.int32)[None, :]
    nps_actual = ((seq_lens + Pg - 1) // Pg).astype(jnp.int32)
    page_valid = page_idx < nps_actual[:, None]          # [B, nps]
    tok_ok = jnp.arange(S, dtype=jnp.int32)[None, :] < seq_lens[:, None]
    addmask = (1.0 - tok_ok.astype(jnp.float32))[:, None, None, :] * -1e9
    tok_bits = jnp.repeat(page_bits, Pg, axis=1)         # [B, S]

    def attend_fn(li, q, k, v, mask):
        del li, mask
        if scores_acc is not None:
            scores_acc.append(_page_mass_proxy(
                q, k, B=B, S=S, Pg=Pg, nps=nps, H=H, Hd=Hd,
                seq_lens=seq_lens, page_idx=page_idx, page_valid=page_valid))

        def fq(z, bits):   # [B, S, H, Hd] quantize/dequantize round trip
            zz = z.transpose(0, 2, 1, 3).reshape(B * H, S, Hd)
            d, s, zp = quantize_page(zz, bits)
            out = dequantize_page(d, s, zp, bits)
            return out.reshape(B, H, S, Hd).transpose(0, 2, 1, 3)

        kq = jnp.zeros_like(k)
        vq = jnp.zeros_like(v)
        for bits in buckets:
            if used is not None and bits not in used:
                continue
            sel = (tok_bits == bits)[:, :, None, None]
            kq = jnp.where(sel, fq(k, bits).astype(k.dtype), kq)
            vq = jnp.where(sel, fq(v, bits).astype(v.dtype), vq)
        return dn.attention(q, kq, vq, addmask)

    return attend_fn


def _paged_attend_factory(*, cfg: DiffusionConfig, B: int, S: int, Pg: int,
                          nps: int, L: int, H: int, G: int, buckets,
                          pt: jax.Array, pools, page_bits: jax.Array,
                          active: jax.Array, seq_lens: jax.Array,
                          scores_acc: list, used=None, act_bits: int = 16):
    """Build the per-layer paged-attention callback shared by the
    single-device and sharded serving steps (H = this shard's local heads).

    Page pools are SLOT-MAJOR on the page axis — page (slot b, layer li,
    page j) lives at row (b*L + li)*nps + j — so a data-parallel shard
    boundary never splits a slot. Each step writes fresh K/V pages into
    every bucket (update-then-read, `diffuse-llm-rs/src/lib.rs:907-918`),
    then reads each page from the bucket `page_bits` routes it to: per-bucket
    page tables are compacted with a stable argsort over the membership mask
    and the buckets' partial attentions are lse-merged — per-PAGE mixed
    precision inside one slot (BASELINE config 4), with uniform `page_bits`
    reducing exactly to the phase-per-slot routing.

    With `scores_acc` a list, appends one [B, nps] per-page attention-mass
    proxy per layer: softmax over pages of (mean valid q) . (mean valid k of
    the page) — the in-step salience signal
    (`/root/reference/salience-engine/src/lib.rs:130-151` intent: importance
    from access/attention patterns). With `scores_acc=None` (salience routing
    off) the proxy is never built, so the phase-only step pays nothing for it.
    """
    HG = H // G
    Hd = cfg.head_dim
    page_idx = jnp.arange(nps, dtype=jnp.int32)[None, :]
    nps_actual = ((seq_lens + Pg - 1) // Pg).astype(jnp.int32)
    nt = jnp.clip(seq_lens[:, None] - page_idx * Pg, 0, Pg).astype(jnp.int32)
    page_valid = page_idx < nps_actual[:, None]        # [B, nps]

    def attend_fn(li, q, k, v, mask):
        del mask

        if scores_acc is not None:
            scores_acc.append(_page_mass_proxy(
                q, k, B=B, S=S, Pg=Pg, nps=nps, H=H, Hd=Hd,
                seq_lens=seq_lens, page_idx=page_idx, page_valid=page_valid))

        def to_pages(z):  # [B, S, H, Hd] -> [B*nps, H, Pg, Hd]
            z = z.transpose(0, 2, 1, 3).reshape(B, H, nps, Pg, Hd)
            return z.transpose(0, 2, 1, 3, 4).reshape(B * nps, H, Pg, Hd)

        def group_pages(d):  # [N, H, Pp, Hd] -> [N, HG, Pp, G*Hd]
            if G == 1:
                return d
            N, _, Pp_, _ = d.shape
            return (d.reshape(N, HG, G, Pp_, Hd)
                    .transpose(0, 1, 3, 2, 4)
                    .reshape(N, HG, Pp_, G * Hd))

        def group_sidecar(s):  # [N, H, P] -> [N, HG, G*P]
            return s if G == 1 else s.reshape(s.shape[0], HG, G * Pg)

        kp, vp = to_pages(k), to_pages(v)
        parts = []
        for bits in buckets:
            # Diffusion denoising attends over the SAME step's fresh K/V
            # (whole-sequence re-encode each step, SURVEY.md §7 "paged KV +
            # diffusion semantics") — pages in buckets no slot reads this
            # step need not be quantized or written at all. `used` is a
            # static host-computed bucket subset; measured 1.15x step cost
            # for 3 buckets vs 1, so skipping dead buckets is real bandwidth.
            if used is not None and bits not in used:
                continue
            pool = dict(pools[bits])
            vpb = 8 // bits
            for name, pages in (("k", kp), ("v", vp)):
                d, s, z = _quantize_pages(pages, bits)
                d = group_pages(d)
                s, z = group_sidecar(s), group_sidecar(z)
                # write layer li's rows: page axis viewed [B, L*nps]
                dat = pool[f"{name}_data"].reshape(
                    B, L * nps, HG, Pg // vpb, G * Hd)
                dat = dat.at[:, li * nps:(li + 1) * nps].set(
                    d.reshape(B, nps, HG, Pg // vpb, G * Hd))
                pool[f"{name}_data"] = dat.reshape(
                    B * L * nps, HG, Pg // vpb, G * Hd)
                for sc, val in (("scale", s), ("zp", z)):
                    arr = pool[f"{name}_{sc}"].reshape(B, L * nps, HG, G * Pg)
                    arr = arr.at[:, li * nps:(li + 1) * nps].set(
                        val.reshape(B, nps, HG, G * Pg))
                    pool[f"{name}_{sc}"] = arr.reshape(B * L * nps, HG, G * Pg)
            pools[bits] = pool
            # this bucket's pages: compact members to the front (stable, so
            # uniform routing keeps the identity order)
            member = (page_bits == bits) & page_valid
            order = jnp.argsort(jnp.logical_not(member), axis=1, stable=True)
            pt_b = jnp.take_along_axis(pt[li], order, axis=1)
            nt_b = jnp.take_along_axis(nt, order, axis=1)
            npg = jnp.where(active, member.sum(axis=1), 0).astype(jnp.int32)
            parts.append(batched_paged_attention(
                q.transpose(0, 2, 1, 3), pt_b, nt_b, npg,
                pool["k_data"], pool["k_scale"], pool["k_zp"],
                pool["v_data"], pool["v_scale"], pool["v_zp"],
                bits=bits, return_lse=True, head_group=G,
                act_bits=act_bits))
        out = merge_partials(parts)              # [B, H, S, Hd] f32
        return out.transpose(0, 2, 1, 3)

    return attend_fn


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
                 page_size: Optional[int] = None,
                 salience_routing: bool = False,
                 salience_ema: float = 0.8,
                 max_chunk: int = 32,
                 attend_mode: str = "auto",
                 attn_act_bits: int = 16,
                 keep_embeddings: bool = True,
                 hbm_budget_bytes: Optional[int] = None,
                 memory_manager=None,
                 sanitize: Optional[bool] = None):
        # attn_act_bits=16 (default): exact bf16 MXU dots in the paged
        # kernel — on v5e this is also the FASTER config (the kernel is
        # VPU-bound and int8 MXU rates are contraction-gated; DESIGN.md r5
        # "int8 attention investigation"). 8 = int8-MXU QK^T/AV (~2%
        # attention error, +0.001 ppl on the quality bench's
        # kv-int4+a8attn row) — kept for chips where the MXU is the bound.
        # Dense mode ignores it (the fake-quant reconstruction is exact).
        if attn_act_bits not in (8, 16):
            raise ValueError(f"attn_act_bits must be 8 or 16, "
                             f"got {attn_act_bits}")
        self.attn_act_bits = attn_act_bits
        self.page_size = page_size or min(seq_len, 64)
        # fused steps per dispatch; chunk lengths are pow2-bucketed, so at
        # most log2(max_chunk)+1 chunk programs ever compile per bucket set
        self.max_chunk = max_chunk
        self._chunk_fn: Optional[Callable] = None
        # attend_mode: "dense" reconstructs the (identically) quantized K/V
        # and runs one dense attention — fastest at short S; "paged" streams
        # the packed page pools through the gather kernel — wins once the
        # fake-quant reconstruction's fp intermediates dominate HBM traffic.
        # Measured crossover on v5e (benchmarks/bench_longseq.py,
        # LONGSEQ_r05.json): the round-5 kernel (q-prep hoisted, 3 DMAs
        # per page, sm-fold) beats the fake-quant dense mode 2.7x at
        # S=2048 (0.44 vs 1.18 ms) and runs at bf16-FLASH parity from
        # S>=2048, while dense still wins at S=1024 (0.10 vs 0.13 ms) —
        # "auto" switches at 2048.
        if attend_mode not in ("auto", "dense", "paged"):
            raise ValueError(f"unknown attend_mode {attend_mode!r}")
        if attend_mode == "auto":
            attend_mode = "paged" if seq_len >= 2048 else "dense"
        self.attend_mode = attend_mode
        if seq_len % self.page_size:
            raise ValueError(f"seq_len {seq_len} not divisible by page_size "
                             f"{self.page_size}")
        self.salience_routing = salience_routing
        self.salience_ema = salience_ema
        self.buckets, self._slot_bits = make_slot_bits_router(cfg)
        for bits in self.buckets:
            if self.page_size % (8 // bits):
                raise ValueError(f"page_size {self.page_size} not divisible "
                                 f"by {8 // bits} (bits={bits})")
        self.num_pages_per_slot = seq_len // self.page_size
        self.cfg = cfg
        self.head_group = self._choose_head_group()
        super().__init__(params, cfg, schedule, num_slots, seq_len, seed,
                         keep_embeddings=keep_embeddings, sanitize=sanitize)
        # dense mode never reads the pools — allocate none (saves the HBM)
        self.pools = ({bits: self._make_pool(bits) for bits in self.buckets}
                      if self.attend_mode == "paged" else {})
        # HBM budget for the pools: idle buckets spill to the tiered
        # MemoryManager (host RAM, demoting to disk under ITS budgets) and
        # restore when the bit router needs them again — the reference
        # README's "HBM and host memory with smart swapping" promise
        # (`/root/reference/README.md:18,31`) inside the production path.
        self.hbm_budget = hbm_budget_bytes
        self.memory = memory_manager
        self._spilled: set = set()   # buckets accounted to the host tier
        if self.hbm_budget is not None and self.memory is None:
            from diffusion_llm_rs_tpu.cache.memory_manager import MemoryManager
            self.memory = MemoryManager()
        # per-page attention-mass EMA (host side) driving salience routing
        self.page_scores = np.full((num_slots, self.num_pages_per_slot),
                                   1.0 / self.num_pages_per_slot, np.float32)

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

    def _page_table_const(self) -> jax.Array:
        """Slot-major page id: (slot b, layer li, page j) ->
        (b*L + li)*nps + j (fixed ranges; matches the sharded batcher so a
        'data' shard boundary never splits a slot). Shape [L, B, nps]."""
        B, L, nps = self.num_slots, self.cfg.num_layers, self.num_pages_per_slot
        return jnp.asarray(
            ((np.arange(B)[None, :, None] * L +
              np.arange(L)[:, None, None]) * nps +
             np.arange(nps)[None, None, :]), jnp.int32)

    def _make_attend(self, pools, page_bits, active, seq_lens, scores_acc,
                     used, *, B=None, H=None, pt=None):
        """Mode-dispatched attend callback (B/H/pt overridable so the
        sharded subclass passes its per-shard values)."""
        cfg = self.cfg
        if self.attend_mode == "dense":
            return _dense_attend_factory(
                cfg=cfg, B=B or self.num_slots, S=self.seq_len,
                Pg=self.page_size, nps=self.num_pages_per_slot,
                H=H or cfg.num_attention_heads, buckets=self.buckets,
                page_bits=page_bits, active=active, seq_lens=seq_lens,
                scores_acc=scores_acc, used=used)
        return _paged_attend_factory(
            cfg=cfg, B=B or self.num_slots, S=self.seq_len,
            Pg=self.page_size, nps=self.num_pages_per_slot,
            L=cfg.num_layers, H=H or cfg.num_attention_heads,
            G=self.head_group, buckets=self.buckets,
            pt=pt if pt is not None else self._page_table_const(),
            pools=pools, page_bits=page_bits, active=active,
            seq_lens=seq_lens, scores_acc=scores_acc, used=used,
            act_bits=self.attn_act_bits)

    def _build_step(self) -> Callable:
        cfg, schedule = self.cfg, self.schedule
        B = self.num_slots
        salience = self.salience_routing
        make_attend = self._make_attend
        mdt = self._model_dtype

        @functools.partial(jax.jit, donate_argnums=(7,), static_argnums=(8,))
        def step(params, x, t_vec, active, seq_lens, page_bits, slot_keys,
                 pools, used):
            t_clamped = jnp.maximum(t_vec, 0).astype(jnp.int32)
            pools = {b: dict(p) for b, p in pools.items()}
            # the attention-mass proxy is only built when salience routing
            # consumes it — the phase-only step carries zero proxy cost
            scores_acc = [] if salience else None
            attend_fn = make_attend(pools, page_bits, active, seq_lens,
                                    scores_acc, used)
            eps = dn.denoiser_forward(params, cfg, x.astype(mdt), t_clamped,
                                      attend_fn=attend_fn
                                      ).astype(jnp.float32)
            noise = jax.vmap(
                lambda k: jax.random.normal(k, x.shape[1:], x.dtype))(slot_keys)
            x_next = p_sample(schedule, x, t_clamped, eps, noise=noise)
            keep = active.reshape(-1, 1, 1)
            x_out = jnp.where(keep, x_next, x)
            if salience:
                return x_out, pools, jnp.mean(jnp.stack(scores_acc), axis=0)
            return x_out, pools

        return step

    def _build_chunk(self) -> Callable:
        """Fused multi-step serving: ONE jitted `lax.scan` over n denoise
        steps (n static via the key array's shape). Batch membership only
        changes at admission/retirement, which the host predicts (min active
        t + 1), so per-step host dispatch — the dominant cost of the
        per-step path — is amortized over the whole chunk. Per-slot KV bits
        are re-routed ON DEVICE each scan step via `make_slot_bits_router`
        (the jnp twin of the host router), so phase transitions and
        progressive precision happen mid-chunk exactly as they would
        per-step; `used` staticizes the union of buckets the chunk touches.

        With salience routing, the chunk additionally carries the per-page
        attention-mass EMA and re-allocates per-page bit-widths ON DEVICE
        each step (`allocate_bits_jnp`, bit-identical to the host greedy) —
        salience serving runs at fused-chunk speed instead of one dispatch
        per step."""
        from diffusion_llm_rs_tpu.cache.salience import allocate_bits_jnp

        cfg, schedule = self.cfg, self.schedule
        B, S = self.num_slots, self.seq_len
        Pg = self.page_size
        nps = self.num_pages_per_slot
        slot_bits_fn = self._slot_bits
        budget_fn = make_slot_budget_router(cfg)
        make_attend = self._make_attend
        mdt = self._model_dtype
        salience = self.salience_routing
        ema = self.salience_ema
        # salience never crushes a page below 2 bits (see _route_page_bits)
        opts = tuple(b for b in self.buckets if b >= 2) or self.buckets

        @functools.partial(jax.jit, donate_argnums=(7,),
                           static_argnums=(8, 9))
        def run_chunk(params, x, key, t0, totals, seq_lens, scores, pools,
                      used, n_steps):
            # the key chain advances INSIDE the scan (split is deterministic,
            # so values are bit-identical to the host splitting per step —
            # without 2 eager dispatches per step through the TPU tunnel)
            nps_actual = ((seq_lens + Pg - 1) // Pg).astype(jnp.int32)
            page_valid = (jnp.arange(nps, dtype=jnp.int32)[None, :]
                          < nps_actual[:, None])                 # [B, nps]

            def body(carry, _):
                x, t, key, scores, pools = carry
                key, sub = jax.random.split(key)
                step_keys = jax.random.split(sub, B)
                active = t >= 0
                t_clamped = jnp.maximum(t, 0).astype(jnp.int32)
                if salience:
                    budget = budget_fn(t_clamped, totals)        # [B] f32
                    page_bits = jax.vmap(
                        lambda s, b, v: allocate_bits_jnp(
                            s, b, valid=v, bit_options=opts)
                    )(scores, budget, page_valid)
                else:
                    bits = slot_bits_fn(t_clamped, totals)       # [B] int32
                    page_bits = jnp.broadcast_to(bits[:, None], (B, nps))
                pools = {b: dict(p) for b, p in pools.items()}
                scores_acc = [] if salience else None
                attend_fn = make_attend(pools, page_bits, active, seq_lens,
                                        scores_acc, used)
                eps = dn.denoiser_forward(params, cfg, x.astype(mdt),
                                          t_clamped, attend_fn=attend_fn
                                          ).astype(jnp.float32)
                noise = jax.vmap(
                    lambda k: jax.random.normal(k, x.shape[1:], x.dtype)
                )(step_keys)
                x_next = p_sample(schedule, x, t_clamped, eps, noise=noise)
                keep = active.reshape(-1, 1, 1)
                x = jnp.where(keep, x_next, x)
                t = jnp.where(active, t - 1, t)
                if salience:
                    step_scores = jnp.mean(jnp.stack(scores_acc), axis=0)
                    scores = ema * scores + (1.0 - ema) * step_scores
                return (x, t, key, scores, pools), None

            (x, _, key, scores, pools), _ = jax.lax.scan(
                body, (x, t0, key, scores, pools), None, length=n_steps)
            return x, key, scores, pools

        return run_chunk

    def _admit(self) -> None:
        before = [r is not None for r in self.slot_request]
        super()._admit()
        for slot, (was, req) in enumerate(zip(before, self.slot_request)):
            if not was and req is not None:   # fresh occupant: reset salience
                self.page_scores[slot] = 1.0 / self.num_pages_per_slot

    def _route_page_bits(self, active_mask: np.ndarray) -> np.ndarray:
        """Host-side per-page bit routing (the serving-side realization of
        the reference's salience->precision intent, BASELINE config 4).

        Phase-only mode broadcasts the slot's phase bits to all its pages
        (exactly `make_slot_bits_router`); salience mode spends the phase
        router's FLOAT target as a per-slot budget, allocating widths to
        pages by attention-mass EMA via `cache.salience.allocate_bits`."""
        t = np.maximum(self.t, 0)
        total = np.asarray(
            [r.num_steps if r is not None else 1 for r in self.slot_request],
            np.int64)
        slot_bits, budget = slot_phase_bits_np(self.cfg, t, total)
        nps = self.num_pages_per_slot
        page_bits = np.repeat(slot_bits[:, None], nps, axis=1)
        if not self.salience_routing:
            return page_bits
        # salience never crushes a page below 2 bits: 1-bit K error perturbs
        # LOGITS (pre-softmax), so even zero-mass pages can grab spurious
        # attention — measured in tests/test_salience_serving.py's probe
        opts = tuple(b for b in self.buckets if b >= 2) or self.buckets
        for b in np.nonzero(active_mask)[0]:
            req = self.slot_request[b]
            n_pages = -(-req.seq_len // self.page_size)
            page_bits[b, :n_pages] = allocate_bits(
                self.page_scores[b, :n_pages], float(budget[b]),
                bit_options=opts)
        return page_bits

    def _used_buckets(self, page_bits: np.ndarray,
                      active_mask: np.ndarray) -> Tuple[int, ...]:
        """Buckets any active slot reads this step (static jit arg): dead
        buckets skip their quantize+write entirely — diffusion re-encodes
        the whole sequence each step, so unwritten pages are never read."""
        if not active_mask.any():
            return (self.buckets[0],)
        # only VALID pages (within each slot's seq_len) vote: in salience
        # mode the tail pages past n_pages keep the broadcast phase bits
        # (e.g. 8) that no kernel ever reads — counting them would pay that
        # bucket's full quantize+write (~1.15x step cost) for nothing
        used = set()
        for b in np.nonzero(active_mask)[0]:
            n_pages = -(-self.slot_request[b].seq_len // self.page_size)
            used.update(int(v) for v in np.unique(page_bits[b, :n_pages]))
        return tuple(b for b in self.buckets if b in used) or (self.buckets[0],)

    def _invoke_step(self, active_mask: np.ndarray,
                     slot_keys: jax.Array) -> None:
        seq_lens = jnp.asarray(
            [r.seq_len if r is not None else 0 for r in self.slot_request],
            jnp.int32)
        page_bits_np = self._route_page_bits(active_mask)
        used = self._used_buckets(page_bits_np, active_mask)
        self._ensure_pools(used)
        out = self._step_fn(
            self.params, self.x, jnp.asarray(self.t),
            jnp.asarray(active_mask), seq_lens,
            jnp.asarray(page_bits_np, jnp.int32), slot_keys,
            self.pools, used)
        if self.salience_routing:
            self.x, self.pools, scores = out
            a = self.salience_ema
            # _to_host, not np.asarray: scores come back data-sharded and
            # on a multi-process mesh are not fully addressable here (the
            # sharded subclass overrides _to_host with a process allgather)
            self.page_scores = (a * self.page_scores +
                                (1.0 - a) * self._to_host(scores))
        else:
            self.x, self.pools = out

    # -- fused multi-step dispatch ------------------------------------------

    def _chunk_steps(self, active_mask: np.ndarray) -> int:
        """Steps until the next possible membership change (min active t + 1),
        capped at max_chunk and bucketed to a power of two so the number of
        distinct compiled chunk programs stays bounded."""
        c = int(self.t[active_mask].min()) + 1
        c = min(c, self.max_chunk)
        return 1 << (c.bit_length() - 1)

    def _used_buckets_chunk(self, active_mask: np.ndarray,
                            totals: np.ndarray, c: int) -> Tuple[int, ...]:
        """Union of buckets any active slot touches over the chunk's c steps
        (host twin of the device router, evaluated at each offset).

        Must be a SUPERSET of the device router's picks: a bucket the twin
        prunes but the device routes to is skipped by the attend loop and
        the step's attention silently zeroes. The twin now matches the
        device's float32 arithmetic, but ulp-level divergence (FMA fusion)
        can still flip a pick exactly at a bucket boundary — so for
        decode-phase slots both neighbors of any boundary within eps of the
        float target are included (costs at most one extra bucket for the
        boundary step)."""
        qc = self.cfg.quant_config
        progressive = (self.cfg.use_phase_aware_quant and
                       qc.progressive_precision)
        if progressive:
            lo_w = bucket_bits_up(qc.min_decode_bits)
            widths = sorted(b for b in SUPPORTED
                            if lo_w <= b <= bucket_bits(qc.decode_bits)) \
                or [bucket_bits(qc.decode_bits)]

            def pick(x):
                p = widths[0]
                for b in widths:
                    if x >= b:
                        p = b
                return p

        used = set()
        for s in range(c):
            step_active = active_mask & (self.t - s >= 0)
            if not step_active.any():
                break
            tt = np.maximum(self.t - s, 0)
            bits, budget = slot_phase_bits_np(self.cfg, tt, totals)
            used.update(int(v) for v in np.unique(bits[step_active]))
            if progressive:
                decode_mask = step_active & (tt <= totals // 2)
                for x in budget[decode_mask]:
                    used.add(pick(float(x) - 1e-3))
                    used.add(pick(float(x) + 1e-3))
        return tuple(b for b in self.buckets if b in used) or (self.buckets[0],)

    def _used_buckets_chunk_salience(self, active_mask: np.ndarray,
                                     totals: np.ndarray,
                                     c: int) -> Tuple[int, ...]:
        """Reachable-bucket bound for a salience-routed chunk.

        The device allocator (`allocate_bits_jnp`) starts every page at the
        floor width and upgrades most-salient-first while the budget lasts,
        so a width `lv > floor` is assignable at some step only if that
        step's initial budget surplus (budget - floor) * n_pages covers the
        upgrade cost lv - floor. Bounding the surplus over the chunk's steps
        and active slots prunes buckets no allocation can reach — late
        (decode-phase) chunks drop the 8-bit bucket's full K/V write tax
        instead of unconditionally paying every bucket (VERDICT r3 weak #5).
        Budgets are score-independent, so the bound holds for any EMA state.
        """
        opts = tuple(b for b in self.buckets if b >= 2) or self.buckets
        floor = min(opts)
        max_extra = 0.0
        for s in range(c):
            step_active = active_mask & (self.t - s >= 0)
            if not step_active.any():
                break
            _, budget = slot_phase_bits_np(
                self.cfg, np.maximum(self.t - s, 0), totals)
            for b in np.nonzero(step_active)[0]:
                n_valid = -(-self.slot_request[b].seq_len // self.page_size)
                # +1e-3 eps: the device allocator compares its float32
                # budget; the host bound must err toward inclusion
                max_extra = max(max_extra,
                                (float(budget[b]) + 1e-3 - floor) * n_valid)
        return tuple(lv for lv in opts
                     if lv == floor or (lv - floor) <= max_extra)

    def _step_impl(self) -> int:
        """Admit, then run a CHUNK of fused denoise steps in one dispatch
        (with salience routing, the per-page EMA + bit allocation advance
        on device inside the chunk). Returns active slots stepped."""
        if self.max_chunk <= 1:
            return super()._step_impl()
        self._admit()
        active_mask = self.t >= 0
        n_active = int(active_mask.sum())
        if n_active == 0:
            self._flush_retires()
            return 0
        c = self._chunk_steps(active_mask)
        totals = np.asarray(
            [r.num_steps if r is not None else 1 for r in self.slot_request],
            np.int32)
        seq_lens = jnp.asarray(
            [r.seq_len if r is not None else 0 for r in self.slot_request],
            jnp.int32)
        if self.salience_routing:
            # allocation outcomes are data-dependent, but the budget bounds
            # which widths are reachable — prune the rest
            used = self._used_buckets_chunk_salience(active_mask, totals, c)
        else:
            used = self._used_buckets_chunk(active_mask, totals, c)
        self._ensure_pools(used)
        if self._chunk_fn is None:
            self._chunk_fn = self._build_chunk()
        # per-(step, slot) keys are split INSIDE the chunk — same sequence
        # the per-step path draws, advanced on device in one dispatch
        self.x, self._key, scores, self.pools = self._chunk_fn(
            self.params, self.x, self._key, jnp.asarray(self.t, jnp.int32),
            jnp.asarray(totals), seq_lens,
            jnp.asarray(self.page_scores, jnp.float32), self.pools, used, c)
        if self.salience_routing:
            # np.array (writable copy): np.asarray of a jax array is a
            # READ-ONLY view, and _admit writes per-slot resets into it;
            # _to_host first so multi-process meshes allgather the shards
            self.page_scores = np.array(self._to_host(scores))
        # previous wave's deferred retires: transfer now, overlapping the
        # chunk just dispatched (mirrors the base _step_impl — without this,
        # step() callers saw no completions until drain and every pending
        # wave pinned its decode buffers for the life of the serve)
        self._flush_retires()
        new_t = np.where(active_mask, self.t - c, self.t)
        metrics.inc("batcher.steps", c)
        metrics.inc("batcher.slot_steps", n_active * c)
        finished = active_mask & (new_t < 0)
        self.t = new_t
        self._retire(finished)
        return n_active

    def cache_memory_bytes(self) -> int:
        """HBM bytes held by the RESIDENT page pools (packed data +
        sidecars) — the reference's `kv_cache_memory_usage` metric
        (`lib.rs:1082-1084`). Spilled buckets live in the MemoryManager's
        host/disk tiers and are not counted here."""
        return sum(int(a.size) * a.dtype.itemsize
                   for pool in self.pools.values() for a in pool.values())

    # -- HBM-budget pool tiering ---------------------------------------------

    _POOL_FIELDS = ("k_data", "v_data", "k_scale", "k_zp", "v_scale", "v_zp")

    def _pool_key(self, bits: int, name: str) -> str:
        return f"kvpool:{id(self)}:{bits}:{name}"

    def _place_pool(self, pool: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        """Device placement hook for restored pools (sharded override)."""
        return pool

    def spilled_buckets(self) -> Tuple[int, ...]:
        return tuple(sorted(self._spilled))

    def _spill_bucket(self, bits: int) -> None:
        pool = self.pools.pop(bits)
        for name, arr in pool.items():
            # _to_host: pool arrays are mesh-sharded in the sharded batcher
            self.memory.allocate(self._pool_key(bits, name),
                                 self._to_host(arr), tier="host")
        self._spilled.add(bits)
        metrics.inc("batcher.pool_spills")

    def _restore_bucket(self, bits: int) -> None:
        pool = {}
        for name in self._POOL_FIELDS:
            key = self._pool_key(bits, name)
            pool[name] = jnp.asarray(self.memory.get(key))
            self.memory.deallocate(key)
        self.pools[bits] = self._place_pool(pool)
        self._spilled.discard(bits)
        metrics.inc("batcher.pool_restores")

    def _ensure_pools(self, used: Tuple[int, ...]) -> None:
        """Under an HBM budget: restore the buckets this dispatch reads,
        then spill the widest idle buckets until the resident pools fit.
        Diffusion rewrites every page each step, so spilled pool CONTENT is
        never live — only capacity moves between tiers; trajectories are
        bit-identical with or without a budget. Best-effort: the used
        buckets always stay resident even if they alone exceed the budget."""
        if self.attend_mode != "paged" or self.hbm_budget is None:
            return
        for bits in used:
            if bits not in self.pools:
                self._restore_bucket(bits)
        idle = [b for b in sorted(self.pools) if b not in used]
        while self.cache_memory_bytes() > self.hbm_budget and idle:
            self._spill_bucket(idle.pop())   # widest idle pool first

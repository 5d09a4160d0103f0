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
import time
from collections import deque
from typing import Callable, Deque, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from diffusion_llm_rs_tpu.config import DiffusionConfig
from diffusion_llm_rs_tpu.models import denoiser as dn
from diffusion_llm_rs_tpu.models.diffusion import DiffusionSchedule, p_sample
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
        def step(params, x, t_vec, active, key):
            # one reverse step for every slot at its own timestep
            t_clamped = jnp.maximum(t_vec, 0).astype(jnp.int32)
            eps = dn.denoiser_forward(params, cfg, x, t_clamped)
            x_next = p_sample(schedule, x, t_clamped, eps, key)
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

    def step(self) -> int:
        """Admit, run ONE denoise step over the batch, retire finished slots.
        Returns the number of active slots stepped."""
        self._admit()
        active_mask = self.t >= 0
        n_active = int(active_mask.sum())
        if n_active == 0:
            return 0
        self._key, sub = jax.random.split(self._key)
        self.x = self._step_fn(self.params, self.x,
                               jnp.asarray(self.t), jnp.asarray(active_mask),
                               sub)
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
                    self.params, jnp.asarray(emb[None]))[0])
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

"""Runtime sanitizers: scheduler invariants, reentrancy guard, NaN guard.

SURVEY.md §5.2: the reference has no race detection or sanitizers — its
thread safety is "by construction" (DashMap / RwLock / atomics,
`diffuse-llm-rs/src/lib.rs:332-344`, `fusion-anns/src/lib.rs:39-47`). The
TPU build's host scheduler is single-threaded by DESIGN, so the honest
equivalents are:

  - `ReentrancyGuard`: detects the actual race that design rule forbids —
    two threads driving the same batcher's step loop concurrently (the
    failure DashMap would have papered over) — and fails LOUDLY instead of
    corrupting slot state.
  - `check_scheduler_invariants`: the slot state machine's invariants
    (t >= 0 <=> slot occupied, timesteps bounded by the request, pool
    bucket residency consistent with spill state) checked between steps.
  - `nan_guard`: scoped `jax_debug_nans` — the numeric sanitizer.

Enable per-batcher with `sanitize=True` (or env DLM_SANITIZE=1): every
`step()` checks invariants and holds the reentrancy guard. Overhead is a
few host-side comparisons — nothing touches the device.
"""

from __future__ import annotations

import contextlib
import os
import threading

import numpy as np

import jax


class SanitizerError(AssertionError):
    """An invariant the serving scheduler must maintain was violated."""


class ReentrancyGuard:
    """Detects concurrent entry into a single-threaded host loop."""

    def __init__(self, name: str = "scheduler"):
        self._name = name
        self._lock = threading.Lock()
        self._holder: int | None = None

    @contextlib.contextmanager
    def __call__(self):
        me = threading.get_ident()
        if not self._lock.acquire(blocking=False):
            raise SanitizerError(
                f"concurrent {self._name} access: thread {me} entered while "
                f"thread {self._holder} is still stepping — the batcher's "
                f"host loop is single-threaded by design; drive it from one "
                f"thread (or shard requests across batchers)")
        self._holder = me
        try:
            yield
        finally:
            self._holder = None
            self._lock.release()


def sanitize_enabled() -> bool:
    return os.environ.get("DLM_SANITIZE", "0") == "1"


def check_scheduler_invariants(batcher) -> None:
    """Slot state machine invariants for `serving.ContinuousBatcher`."""
    t = np.asarray(batcher.t)
    for slot in range(batcher.num_slots):
        req = batcher.slot_request[slot]
        if (t[slot] >= 0) != (req is not None):
            raise SanitizerError(
                f"slot {slot}: t={t[slot]} but request={'set' if req else 'None'}"
                f" — occupancy and timestep disagree")
        if req is not None:
            if not (0 <= t[slot] < req.num_steps):
                raise SanitizerError(
                    f"slot {slot}: t={t[slot]} outside [0, {req.num_steps})")
            if req.seq_len > batcher.seq_len:
                raise SanitizerError(
                    f"slot {slot}: request seq_len {req.seq_len} exceeds "
                    f"slot capacity {batcher.seq_len}")
    # paged-specific: resident + spilled buckets partition the bucket set
    if hasattr(batcher, "buckets") and hasattr(batcher, "pools"):
        if batcher.attend_mode == "paged":
            resident = set(batcher.pools)
            spilled = set(batcher.spilled_buckets())
            if resident & spilled:
                raise SanitizerError(
                    f"buckets both resident and spilled: {resident & spilled}")
            if resident | spilled != set(batcher.buckets):
                raise SanitizerError(
                    f"bucket accounting lost track: resident {resident} + "
                    f"spilled {spilled} != {set(batcher.buckets)}")
        elif batcher.pools:
            raise SanitizerError(
                f"attend_mode={batcher.attend_mode!r} must hold no pools")


@contextlib.contextmanager
def nan_guard():
    """Scoped numeric sanitizer: any NaN produced under this context raises
    (jax_debug_nans). Use around a suspect step, not in production loops —
    it disables some fusion and forces synchronous checks."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)

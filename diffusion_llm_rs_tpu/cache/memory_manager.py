"""Tiered memory manager: HBM (device) / host RAM / disk spill with budgets.

Re-implementation of the reference's `memory_manager` crate: the shipped code is
a DashMap<String, Vec<u8>> allocate/deallocate/get (`memory_manager/src/lib.rs:21-48`
+ the orphaned richer variant with AlreadyAllocated errors, `memory_manager/lib.rs:31-89`),
while the README promises "HBM and host memory with smart swapping"
(`README.md:18,31` — aspiration only, SURVEY.md §2 item 23). Here the promise is
implemented: three tiers (device HBM via jax.device_put, host numpy, disk via
np.save), LRU demotion under per-tier byte budgets, and promotion on access.
"""

from __future__ import annotations

import os
import time
from collections import OrderedDict
from dataclasses import dataclass, field
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


class AlreadyAllocatedError(Exception):
    """`memory_manager/lib.rs:31-35`."""


class NotFoundError(KeyError):
    pass


@dataclass
class MemoryAllocation:
    """`memory_manager/lib.rs:45-89` (richer orphaned variant)."""

    key: str
    nbytes: int
    tier: str  # "hbm" | "host" | "disk"
    created: float = field(default_factory=time.time)
    last_access: float = field(default_factory=time.time)


class MemoryManager:
    """Tiered allocate/deallocate/get with byte budgets and LRU demotion."""

    TIERS = ("hbm", "host", "disk")

    def __init__(self, hbm_budget: int = 8 << 30, host_budget: int = 16 << 30,
                 spill_dir: str = "/tmp/dlm_tpu_spill",
                 device: Optional[jax.Device] = None):
        self.budgets = {"hbm": hbm_budget, "host": host_budget,
                        "disk": float("inf")}
        self.spill_dir = spill_dir
        self.device = device
        self._store: Dict[str, object] = {}
        self._alloc: "OrderedDict[str, MemoryAllocation]" = OrderedDict()
        self._usage = {"hbm": 0, "host": 0, "disk": 0}
        os.makedirs(spill_dir, exist_ok=True)

    # -- core API (`memory_manager/src/lib.rs:34-48`) -----------------------

    def allocate(self, key: str, data, tier: str = "hbm") -> MemoryAllocation:
        """Store `data` (array or bytes) under `key`. Raises AlreadyAllocated
        on duplicate keys (`memory_manager/lib.rs:31-35`)."""
        if key in self._alloc:
            raise AlreadyAllocatedError(key)
        return self._put(key, data, tier)

    def _put(self, key: str, data, tier: str) -> MemoryAllocation:
        if tier not in self.TIERS:
            raise ValueError(f"tier must be one of {self.TIERS}")
        arr = self._to_array(data)
        nbytes = arr.nbytes
        self._make_room(tier, nbytes)
        self._store[key] = self._place(key, arr, tier)
        alloc = MemoryAllocation(key=key, nbytes=nbytes, tier=tier)
        self._alloc[key] = alloc
        self._alloc.move_to_end(key)
        self._usage[tier] += nbytes
        return alloc

    def get(self, key: str, promote: bool = True):
        """Fetch as a host numpy array (device arrays return as jax.Array)."""
        if key not in self._alloc:
            raise NotFoundError(key)
        alloc = self._alloc[key]
        alloc.last_access = time.time()
        self._alloc.move_to_end(key)
        value = self._store[key]
        if alloc.tier == "disk":
            arr = np.load(value)
            if promote:
                self._move(key, "host")
                return self._store[key]
            return arr
        return value

    def deallocate(self, key: str) -> None:
        if key not in self._alloc:
            raise NotFoundError(key)
        alloc = self._alloc.pop(key)
        value = self._store.pop(key)
        self._usage[alloc.tier] -= alloc.nbytes
        if alloc.tier == "disk" and isinstance(value, str):
            try:
                os.remove(value)
            except OSError:
                pass

    def contains(self, key: str) -> bool:
        return key in self._alloc

    def usage(self, tier: Optional[str] = None) -> int:
        if tier:
            return self._usage[tier]
        return sum(v for k, v in self._usage.items() if k != "disk")

    def tier_of(self, key: str) -> str:
        return self._alloc[key].tier

    def keys(self):
        return list(self._alloc.keys())

    # -- tier mechanics ------------------------------------------------------

    def _to_array(self, data) -> np.ndarray:
        if isinstance(data, (bytes, bytearray)):
            return np.frombuffer(bytes(data), dtype=np.uint8)
        if isinstance(data, jax.Array):
            return np.asarray(data)
        return np.asarray(data)

    def _place(self, key: str, arr: np.ndarray, tier: str):
        if tier == "hbm":
            dev = self.device or jax.devices()[0]
            return jax.device_put(jnp.asarray(arr), dev)
        if tier == "host":
            return arr
        path = os.path.join(self.spill_dir, f"{abs(hash(key)):x}.npy")
        np.save(path, arr)
        return path

    def _move(self, key: str, tier: str) -> None:
        alloc = self._alloc[key]
        if alloc.tier == tier:
            return
        value = self._store[key]
        arr = (np.load(value) if alloc.tier == "disk"
               else np.asarray(value))
        if alloc.tier == "disk" and isinstance(value, str):
            try:
                os.remove(value)
            except OSError:
                pass
        self._usage[alloc.tier] -= alloc.nbytes
        self._make_room(tier, alloc.nbytes, exclude=key)
        self._store[key] = self._place(key, arr, tier)
        alloc.tier = tier
        self._usage[tier] += alloc.nbytes

    def _make_room(self, tier: str, nbytes: int,
                   exclude: Optional[str] = None) -> None:
        """LRU-demote entries until `nbytes` fits in `tier`'s budget —
        the "smart swapping" the reference only promised."""
        if tier == "disk":
            return
        next_tier = {"hbm": "host", "host": "disk"}[tier]
        while self._usage[tier] + nbytes > self.budgets[tier]:
            victim = next((k for k, a in self._alloc.items()
                           if a.tier == tier and k != exclude), None)
            if victim is None:
                raise MemoryError(
                    f"{tier} budget {self.budgets[tier]} cannot fit {nbytes}")
            self._move(victim, next_tier)

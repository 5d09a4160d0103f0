"""Tracing & profiling helpers (SURVEY.md §5.1).

The reference declares `tracing`/`tracing-subscriber` everywhere but has ONE
call site (`lib.rs:68`). Here: structured stage logging via `logging`,
`jax.named_scope` wrappers so pipeline stages show up in XLA/TensorBoard
profiles, and a `profile_trace` context manager around `jax.profiler`.
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Iterator, Optional

import jax

logger = logging.getLogger("diffusion_llm_rs_tpu")


def setup_logging(level: int = logging.INFO) -> None:
    """Install a basic structured handler (the subscriber the reference
    never installs)."""
    if not logger.handlers:
        h = logging.StreamHandler()
        h.setFormatter(logging.Formatter(
            "%(asctime)s %(name)s %(levelname)s %(message)s"))
        logger.addHandler(h)
    logger.setLevel(level)


@contextlib.contextmanager
def stage(name: str, **fields) -> Iterator[None]:
    """Span-style stage scope: logs enter/exit + wall time, and nests a
    jax.named_scope so device ops attribute to the stage in profiles."""
    t0 = time.perf_counter()
    logger.debug("enter %s %s", name, fields or "")
    with jax.named_scope(name):
        yield
    logger.info("%s done in %.3fs %s", name, time.perf_counter() - t0,
                fields or "")


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/dlm_tpu_profile") -> Iterator[None]:
    """Capture a TensorBoard-viewable device profile of the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

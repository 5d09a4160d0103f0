"""Runtime sanitizers (SURVEY.md §5.2 — the row the reference leaves empty).

The host scheduler is single-threaded by design; the sanitizers make the
forbidden states LOUD: concurrent step() entry (the race DashMap would have
silently papered over), slot-state-machine violations, and scoped NaN
detection.
"""

import threading
import time

import jax
import numpy as np
import pytest

from diffusion_llm_rs_tpu.config import DiffusionConfig
from diffusion_llm_rs_tpu.models import denoiser as dn
from diffusion_llm_rs_tpu.serving import PagedContinuousBatcher, Request
from diffusion_llm_rs_tpu.utils.sanitize import (SanitizerError,
                                                 check_scheduler_invariants,
                                                 nan_guard)


def _make(**kw):
    cfg = DiffusionConfig.tiny(vocab_size=128)
    params = dn.init_denoiser_params(jax.random.PRNGKey(0), cfg)
    return PagedContinuousBatcher(params, cfg, num_slots=2, seq_len=8,
                                  page_size=4, **kw)


def test_sanitized_run_is_clean():
    """A normal drained run under sanitize=True raises nothing and the fuzzed
    admission pattern (mixed lengths/steps, queue churn) keeps invariants."""
    b = _make(sanitize=True)
    rng = np.random.RandomState(0)
    for i in range(7):
        b.submit(Request(f"r{i}", seq_len=int(rng.choice([4, 8])),
                         num_steps=int(rng.randint(1, 9))))
        if rng.rand() < 0.5:
            b.step()
    done = b.run_until_drained()
    assert len(done) == 7


def test_invariant_checker_catches_corruption():
    b = _make(sanitize=True, max_chunk=1)
    b.submit(Request("a", seq_len=8, num_steps=4))
    b.step()
    b.t[0] = 99  # out of the request's range
    with pytest.raises(SanitizerError, match="outside"):
        check_scheduler_invariants(b)
    b.t[0] = -1  # occupied slot marked free
    with pytest.raises(SanitizerError, match="disagree"):
        check_scheduler_invariants(b)


def test_invariant_checker_catches_bucket_leak():
    b = _make(sanitize=True, attend_mode="paged")
    bits = b.buckets[0]
    b.pools.pop(bits)           # lose a pool without accounting for it...
    b.hbm_budget = None         # ...with spill machinery off
    with pytest.raises(SanitizerError):
        check_scheduler_invariants(b)


def test_reentrancy_guard_detects_concurrent_step():
    """Two threads driving one batcher: exactly the race the single-threaded
    design forbids — the guard raises instead of corrupting slot state."""
    b = _make(sanitize=True)
    for i in range(4):
        b.submit(Request(f"r{i}", seq_len=8, num_steps=6))
    orig = b._invoke_step
    entered = threading.Event()

    def slow_invoke(*a, **kw):
        entered.set()
        time.sleep(0.3)
        return orig(*a, **kw)

    b._invoke_step = slow_invoke
    b.max_chunk = 1   # route through _invoke_step
    errors = []

    def drive():
        try:
            b.step()
        except SanitizerError as e:
            errors.append(e)

    t1 = threading.Thread(target=drive)
    t1.start()
    assert entered.wait(5.0)
    drive()           # second entry from this thread while t1 still inside
    t1.join()
    assert len(errors) == 1
    assert "concurrent" in str(errors[0])
    # the guard released cleanly: stepping again works
    b._invoke_step = orig
    assert b.step() > 0


def test_nan_guard_scopes_debug_nans():
    import jax.numpy as jnp
    with pytest.raises(FloatingPointError):
        with nan_guard():
            jax.jit(lambda x: x / 0.0 * 0.0)(jnp.float32(1.0)
                                             ).block_until_ready()
    # restored outside the scope
    assert not jax.config.jax_debug_nans

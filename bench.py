"""Benchmark: INT4 weight-only diffusion decode tokens/sec/chip vs BF16.

Prints ONE JSON line on stdout:
  {"metric": ..., "value": tokens_per_sec_int4, "unit": "tokens/s/chip",
   "vs_baseline": int4_tps / bf16_tps}

BASELINE.md target: INT4 decode >= 0.85x BF16 (vs_baseline >= 0.85).
Model shape follows the reference defaults (`diffuse-llm-rs/src/lib.rs:476-493`):
hidden 768, 12 layers, 12 heads. "Decode tokens/s" counts generated tokens
(batch * seq_len) over the full reverse-diffusion loop.

Diagnostics go to stderr; stdout stays a single JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("DLM_TPU_CACHE", "/tmp/dlm_tpu_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from diffusion_llm_rs_tpu.config import DiffusionConfig
from diffusion_llm_rs_tpu.models import denoiser as dn
from diffusion_llm_rs_tpu.models.diffusion import DiffusionSchedule, sample
from diffusion_llm_rs_tpu.quant.core import quantize_tree

BATCH = int(os.environ.get("BENCH_BATCH", 8))
SEQ = int(os.environ.get("BENCH_SEQ", 256))
STEPS = int(os.environ.get("BENCH_STEPS", 32))
REPEATS = int(os.environ.get("BENCH_REPEATS", 3))
BITS = int(os.environ.get("BENCH_BITS", 4))
# 8 = int8-activation MXU path (W4A8: 1.85x bf16 MXU rate on v5e, perplexity
# matched to weight-only int4 per BENCH_QUALITY.md); 16 = bf16 activations
ACT_BITS = int(os.environ.get("BENCH_ACT_BITS", 8))
# 1 = decode packed weights to int8 in HBM once at load (compute-bound
# fast path: plain XLA int8 dots, no in-kernel unpack); 0 = packed-in-HBM
# Pallas kernel (memory-bound fast path)
DECODED = os.environ.get("BENCH_DECODED", "1" if ACT_BITS == 8 else "0") == "1"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build(cfg, params):
    schedule = DiffusionSchedule.create(cfg.num_timesteps)

    def model_fn(x, t):
        # bf16 activations through the denoiser (MXU path); the p_sample
        # posterior math stays f32
        eps = dn.denoiser_forward(params, cfg, x.astype(jnp.bfloat16), t)
        return eps.astype(jnp.float32)

    @jax.jit
    def run(key):
        return sample(model_fn, schedule, (BATCH, SEQ, cfg.hidden_size), key,
                      num_steps=STEPS)

    return run


def time_run(run, label):
    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    run(key).block_until_ready()
    log(f"{label}: compile+first run {time.perf_counter() - t0:.2f}s")
    times = []
    for i in range(REPEATS):
        key = jax.random.PRNGKey(i + 1)
        t0 = time.perf_counter()
        run(key).block_until_ready()
        times.append(time.perf_counter() - t0)
    best = min(times)
    tps = BATCH * SEQ / best
    log(f"{label}: best {best * 1e3:.1f} ms for {STEPS} steps -> "
        f"{tps:.1f} gen tokens/s ({BATCH * SEQ * STEPS / best:.0f} "
        f"denoise-step tokens/s)")
    return tps


def main():
    log(f"backend={jax.default_backend()} devices={jax.devices()}")
    cfg = DiffusionConfig(num_timesteps=1000, hidden_size=768, num_layers=12,
                          num_attention_heads=12, vocab_size=50257,
                          max_sequence_length=max(SEQ, 256), dtype="bfloat16")
    key = jax.random.PRNGKey(0)
    params = dn.init_denoiser_params(key, cfg)
    params_bf16 = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16) if hasattr(p, "astype") else p, params)

    bf16_tps = time_run(build(cfg, params_bf16), "bf16")

    from diffusion_llm_rs_tpu.ops import pallas_matmul
    from diffusion_llm_rs_tpu.quant.core import QuantizedTensor

    qparams = quantize_tree(params, BITS, symmetric=True,
                            granularity="group", group_size=128, axis=0)
    # one-time repack into the Pallas fused-matmul layout
    from diffusion_llm_rs_tpu.ops.matmul import decode_to_int8

    def _prep(l):
        if isinstance(l, QuantizedTensor) and l.ndim == 2:
            try:
                mw = pallas_matmul.prepare(l, act_bits=ACT_BITS)
            except ValueError:
                return l  # e.g. vocab-sized embedding, K not packable
            return decode_to_int8(mw) if DECODED else mw
        return l

    qparams = jax.tree_util.tree_map(
        _prep, qparams, is_leaf=lambda l: isinstance(l, QuantizedTensor))
    # remaining fp leaves (biases, layernorms) -> bf16; packed weights intact
    qparams = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16)
        if hasattr(p, "astype") and hasattr(p, "dtype") and
        p.dtype == jnp.float32 else p, qparams,
        is_leaf=lambda l: isinstance(
            l, (pallas_matmul.MatmulWeight, QuantizedTensor)))
    label = f"int{BITS}" + ("/a8" if ACT_BITS == 8 else "") + \
        ("/decoded" if DECODED else "")
    int4_tps = time_run(build(cfg, qparams), label)

    kind = ("int8-activation" if ACT_BITS == 8 else "weight-only")
    print(json.dumps({
        "metric": f"int{BITS} {kind} diffusion decode throughput",
        "value": round(int4_tps, 2),
        "unit": "tokens/s/chip",
        "vs_baseline": round(int4_tps / bf16_tps, 4),
    }), flush=True)


if __name__ == "__main__":
    main()

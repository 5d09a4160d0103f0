"""Command-line entry point: ``python -m diffusion_llm_rs_tpu <cmd>``.

The reference's release pipeline ships a ``diffusion-llm-rs`` binary that no
crate actually defines (`/root/reference/.github/workflows/release.yml:58-63`)
— this module is that binary, implemented for real on the Engine facade.

Subcommands mirror the coordinator / prefill entry points:

  generate   greedy text continuation           (`diffusion_prefill/src/lib.rs:117-139`)
  sample     reverse-diffusion sampling          (`diffuse-llm-rs/src/lib.rs:853-955`)
  ppl        denoising perplexity of a text      (BASELINE.json metric)
  ingest     process_model 5-step pipeline       (`lib.rs:66-86`)
  serve      continuous-batching throughput demo (BASELINE config 5)
  quantize   weight quantization + checkpoint    (`quantization/src/types.rs:112-132`)

All commands default to the shipped pretrained anchor
(``Engine.from_pretrained()``); pass ``--random-init`` for a fresh random
model (e.g. for shape/perf experiments at custom sizes).
"""

import argparse
import json
import sys
import time


def _add_engine_args(p):
    p.add_argument("--checkpoint", default=None,
                   help="checkpoint stem (<stem>.npz/.json); default: the "
                        "shipped quality anchor")
    p.add_argument("--random-init", action="store_true",
                   help="random-init model instead of a checkpoint")
    p.add_argument("--bits", type=int, default=None, choices=(1, 2, 4, 8),
                   help="weight-quantize to this many bits before running")
    p.add_argument("--quant-method", default="int",
                   choices=("int", "gptq", "fp8"))
    p.add_argument("--platform", default=None,
                   help="force a JAX platform (e.g. cpu)")


def _build_engine(args):
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    from diffusion_llm_rs_tpu.engine import Engine
    if args.random_init:
        eng = Engine()
    else:
        eng = Engine.from_pretrained(args.checkpoint)
    if args.bits or args.quant_method == "fp8":
        # fp8 stores 8-bit floats regardless of --bits (the flag is the int
        # grid width); pass a nominal 8 so the call is unambiguous
        eng.quantize_weights(args.bits or 8, method=args.quant_method)
    return eng


def cmd_generate(args):
    eng = _build_engine(args)
    out = eng.generate(args.prompt, max_length=args.max_length)
    print(out)


def cmd_sample(args):
    eng = _build_engine(args)
    texts = eng.sample(batch_size=args.batch, seq_len=args.seq_len,
                       num_steps=args.steps, seed=args.seed,
                       salience_routing=args.salience)
    for t in texts:
        print(t)


def cmd_ppl(args):
    eng = _build_engine(args)
    text = args.text or sys.stdin.read()
    ppl = eng.denoising_perplexity(text, t=args.t)
    # report the ACTUAL stored weight width (a pre-quantized --checkpoint or
    # fp8 differs from the flag), not the flag echo
    print(json.dumps({"perplexity": round(float(ppl), 4), "t": args.t,
                      "bits": int(eng.stats()["weight_bits"]),
                      "method": args.quant_method}))


def cmd_ingest(args):
    eng = _build_engine(args)
    text = open(args.file).read() if args.file else sys.stdin.read()
    stats = eng.process_model(text, model_id=args.model_id)
    stats.update(eng.stats())
    print(json.dumps({k: v for k, v in sorted(stats.items())}, default=float))


def cmd_serve(args):
    eng = _build_engine(args)
    from diffusion_llm_rs_tpu.serving import PagedContinuousBatcher, Request
    b = PagedContinuousBatcher(eng.params, eng.config, eng.schedule,
                               num_slots=args.slots, seq_len=args.seq_len,
                               page_size=args.page_size,
                               salience_routing=args.salience,
                               keep_embeddings=False)
    for i in range(args.requests):
        b.submit(Request(f"r{i}", seq_len=args.seq_len, num_steps=args.steps))
    t0 = time.perf_counter()
    done = b.run_until_drained()
    dt = time.perf_counter() - t0
    toks = sum(c.tokens.size for c in done)
    out = {"requests": len(done), "gen_tokens": int(toks),
           "seconds": round(dt, 3), "tokens_per_sec": round(toks / dt, 1)}
    out.update({k: round(float(v), 4) for k, v in b.stats().items()})
    print(json.dumps(out))


def cmd_quantize(args):
    # validate the flag contract BEFORE the (slow) checkpoint load
    if not args.bits and args.quant_method != "fp8":
        raise SystemExit("quantize requires --bits (unless --quant-method fp8)")
    eng = _build_engine(args)
    if args.out:
        import os
        from diffusion_llm_rs_tpu.utils.serialization import save_checkpoint
        # metadata must match the anchor format (config + tokenizer) so the
        # saved stem loads back through Engine.from_pretrained / --checkpoint
        cfg = eng.config
        tok_name = os.path.basename(args.out) + ".tok.json"
        meta = {
            "bits": args.bits or 8, "method": args.quant_method,
            "config": {"num_timesteps": cfg.num_timesteps,
                       "hidden_size": cfg.hidden_size,
                       "num_layers": cfg.num_layers,
                       "num_attention_heads": cfg.num_attention_heads,
                       "vocab_size": cfg.vocab_size,
                       "max_sequence_length": cfg.max_sequence_length,
                       "dtype": cfg.dtype},
            "tokenizer": tok_name,
        }
        save_checkpoint(args.out, eng.params, meta)
        eng.tokenizer.save(os.path.join(
            os.path.dirname(os.path.abspath(args.out)), tok_name))
    import jax
    import numpy as np
    total = sum(int(np.prod(l.shape)) * l.dtype.itemsize
                for l in jax.tree_util.tree_leaves(eng.params)
                if hasattr(l, "shape") and hasattr(l, "dtype"))
    print(json.dumps({"bits": args.bits or 8, "method": args.quant_method,
                      "param_bytes": total,
                      "saved": args.out or None}))


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="diffusion_llm_rs_tpu",
        description="TPU-native quantized diffusion-LM inference engine")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("generate", help="greedy text continuation")
    _add_engine_args(p)
    p.add_argument("--prompt", required=True)
    p.add_argument("--max-length", type=int, default=16)
    p.set_defaults(fn=cmd_generate)

    p = sub.add_parser("sample", help="reverse-diffusion sampling")
    _add_engine_args(p)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--seq-len", type=int, default=32)
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--salience", action="store_true")
    p.set_defaults(fn=cmd_sample)

    p = sub.add_parser("ppl", help="denoising perplexity of a text")
    _add_engine_args(p)
    p.add_argument("--text", default=None, help="default: read stdin")
    p.add_argument("--t", type=int, default=10)
    p.set_defaults(fn=cmd_ppl)

    p = sub.add_parser("ingest", help="process_model pipeline on a text")
    _add_engine_args(p)
    p.add_argument("--file", default=None, help="default: read stdin")
    p.add_argument("--model-id", default="model")
    p.set_defaults(fn=cmd_ingest)

    p = sub.add_parser("serve", help="continuous-batching throughput demo")
    _add_engine_args(p)
    p.add_argument("--requests", type=int, default=8)
    p.add_argument("--slots", type=int, default=4)
    p.add_argument("--seq-len", type=int, default=32)
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--page-size", type=int, default=16)
    p.add_argument("--salience", action="store_true")
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser("quantize", help="quantize weights; optionally save")
    _add_engine_args(p)
    p.add_argument("--out", default=None, help="checkpoint stem to write")
    p.set_defaults(fn=cmd_quantize)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()

"""Engine: the system coordinator / end-user facade.

Re-implementation of the reference's two top-level orchestrators:
  - `ZetaReticula` + `process_model` 5-step ingestion pipeline
    (`lib.rs:17-87`, orphaned coordinator; SURVEY.md §3.1)
  - `DiffusionPrefill` {prefill, generate, predict_next_token, sample_token}
    (`diffusion_prefill/src/lib.rs:36-174`; SURVEY.md §3.3-3.4)

Where the reference stubs the model path (zero embeddings, uniform next-token
probs — `diffusion_prefill/src/lib.rs:99,153-156`), this engine wires the real
transformer denoiser: embeddings come from the token-embedding table, logits
from the weight-tied readout (the commented-out intent at
`diffusion_prefill/src/lib.rs:148-152`).
"""

from __future__ import annotations

import functools
import os
from collections import OrderedDict
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from diffusion_llm_rs_tpu.cache.kv_cache import KVCacheManager
from diffusion_llm_rs_tpu.cache.memory_manager import MemoryManager
from diffusion_llm_rs_tpu.cache.salience import SalienceEngine
from diffusion_llm_rs_tpu.cache.suffix_tree import SuffixTree
from diffusion_llm_rs_tpu.config import DiffusionConfig, PrefillConfig, SystemConfig
from diffusion_llm_rs_tpu.index.anns import CompressedVector, FusionANNS, compress_rows
from diffusion_llm_rs_tpu.models import denoiser as dn
from diffusion_llm_rs_tpu.models.diffusion import DiffusionSchedule, add_noise
from diffusion_llm_rs_tpu.models.sampler import phase_aware_sample
from diffusion_llm_rs_tpu.quant.core import quantize_tree
from diffusion_llm_rs_tpu.router.router import NSRouter
from diffusion_llm_rs_tpu.storage.dedup import IODedupEngine
from diffusion_llm_rs_tpu.tokenizer.bpe import BPETokenizer


def _default_tokenizer(vocab_size: int) -> BPETokenizer:
    """Byte-level tokenizer with a small merge set trained on a seed corpus."""
    seed_corpus = [
        "the quick brown fox jumps over the lazy dog",
        "diffusion language models denoise token embeddings step by step",
        "quantized key value caches keep memory small and inference fast",
    ]
    return BPETokenizer.train(seed_corpus, min(vocab_size, 320))


class Engine:
    """End-to-end quantized diffusion-LM inference engine."""

    def __init__(
        self,
        config: Optional[DiffusionConfig] = None,
        prefill_config: Optional[PrefillConfig] = None,
        system_config: Optional[SystemConfig] = None,
        tokenizer: Optional[BPETokenizer] = None,
        params=None,
        seed: int = 0,
    ):
        self.config = config or DiffusionConfig()
        self.prefill_config = prefill_config or PrefillConfig(
            embedding_dim=self.config.hidden_size)
        self.system_config = system_config or SystemConfig()
        self.tokenizer = tokenizer or _default_tokenizer(self.config.vocab_size)
        if self.tokenizer.vocab_size > self.config.vocab_size:
            raise ValueError(
                f"tokenizer vocab {self.tokenizer.vocab_size} exceeds model "
                f"vocab {self.config.vocab_size}")

        key = jax.random.PRNGKey(seed)
        self.params = params if params is not None else dn.init_denoiser_params(
            key, self.config)
        self.schedule = DiffusionSchedule.create(
            self.config.num_timesteps, self.config.beta_start,
            self.config.beta_end, self.config.beta_schedule)

        # memory / cache / index / routing subsystems (reference L3/L1)
        self.kv_cache = KVCacheManager(
            max_cache_size=self.config.max_cache_size,
            prefill_bits=self.config.quant_config.prefill_bits,
            decode_bits=self.config.quant_config.decode_bits)
        self.salience = SalienceEngine(cache_size=self.prefill_config.cache_size)
        self.anns = FusionANNS(embedding_dim=self.config.hidden_size)
        self.router = NSRouter()
        self.dedup = IODedupEngine(path=self.system_config.ssd_path,
                                   enable_direct_io=self.system_config.enable_direct_io,
                                   batch_size=self.system_config.batch_size,
                                   dedup_buffer_size_mb=self.system_config.dedup_buffer_size_mb)
        self.memory = MemoryManager(
            hbm_budget=self.system_config.hbm_size_gb << 30)
        self._prefill_store: Dict[str, CompressedVector] = {}
        self._attention_masks: Dict[str, np.ndarray] = {}
        self._weight_bits: Optional[int] = None
        # prompt/prefix cache (`diffusion_prefill/src/suffix_tree.rs:1-30`
        # intent): per-cache-id suffix automaton over the prefilled text +
        # the token stream it indexed, so repeated/extended prompts skip
        # re-embedding and re-quantizing the matched prefix
        self._prefix_index: Dict[str, Tuple[SuffixTree, List[int]]] = {}
        self.prefill_prefix_hits = 0
        # next-token distribution memo for the greedy generate loop (the
        # denoiser is bidirectional, so incremental KV reuse is unsound —
        # exact-prefix memoization is the valid reuse). LRU-capped so a
        # long-lived engine holds memory flat, mirroring the reference's
        # cache eviction budget (`diffuse-llm-rs/src/lib.rs:1046-1073`).
        self._ntp_cache: OrderedDict = OrderedDict()
        self._ntp_cache_cap = 4096
        self.generate_cache_hits = 0
        # jitted samplers keyed by (batch, seq, salience): each holds full
        # HBM page pools, so the LRU cap is small
        self._samplers: OrderedDict = OrderedDict()
        self._samplers_cap = 4
        # per-instance jitted next-token predictor (built lazily)
        self._predict_fn: Optional[Callable] = None

    # ------------------------------------------------------------------
    # weight quantization
    # ------------------------------------------------------------------

    def quantize_weights(self, bits: int, kernel_layout: bool = True,
                         method: str = "int",
                         calib_texts: Optional[Sequence[str]] = None) -> None:
        """Weight-only quantization of all large matrices (GPTQ-style groups
        along the contraction axis, `quantization/src/types.rs:112-132`).

        method="int" packs 1/2/4/8-bit integers (RTN grids); method="gptq"
        runs the real error-compensated GPTQ algorithm (`quant/gptq.py`) on
        the matmul weights, calibrated on `calib_texts` (a built-in seed
        corpus if omitted), honoring the config's desc_act/true_sequential;
        method="fp8" stores float8_e4m3 with a per-tensor scale (the
        reference's `QuantizationType::Float8`, `quantization/src/quantize.rs:66`).
        With kernel_layout (default), 2-D int-quantized weights are repacked
        once into the Pallas fused-matmul layout (`ops.pallas_matmul.prepare`).
        """
        from diffusion_llm_rs_tpu.ops import pallas_matmul
        from diffusion_llm_rs_tpu.quant.core import QuantizedTensor, quantize_fp8

        # Params are being replaced: every memo derived from them (next-token
        # results, prefill embeddings, prefix index, jitted samplers) would
        # silently report the OLD weights' behavior — invalidate them all.
        self._invalidate_param_memos()

        if method == "fp8":
            def _f8(path, leaf):
                path_str = "/".join(
                    str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
                if "pos_embed" in path_str:  # sliced per-sequence; stays fp
                    return leaf
                if (hasattr(leaf, "ndim") and leaf.ndim >= 2
                        and hasattr(leaf, "size") and leaf.size >= 1024
                        and jnp.issubdtype(leaf.dtype, jnp.floating)):
                    return quantize_fp8(leaf)
                return leaf
            self.params = jax.tree_util.tree_map_with_path(_f8, self.params)
            self._weight_bits = 8
            return

        if method == "gptq":
            from diffusion_llm_rs_tpu.quant.gptq import (gptq_quantize_tree,
                                                         make_calib_batches)
            texts = list(calib_texts) if calib_texts else [
                "the quick brown fox jumps over the lazy dog",
                "diffusion language models denoise token embeddings",
                "quantized key value caches keep memory small",
            ]
            token_batches = [self.tokenizer.encode(s) for s in texts]
            token_batches = [b for b in token_batches if len(b) >= 2]
            batches = make_calib_batches(self.params, self.config,
                                         self.schedule, token_batches,
                                         jax.random.PRNGKey(0))
            self.params = gptq_quantize_tree(self.params, self.config,
                                             batches, bits=bits)
            # non-matmul lookup tables (tok_embed) still quantize by RTN
            self.params = quantize_tree(
                self.params, bits,
                symmetric=self.config.weight_quant.sym,
                group_size=self.config.weight_quant.group_size)
        else:
            self.params = quantize_tree(
                self.params, bits,
                symmetric=self.config.weight_quant.sym,
                group_size=self.config.weight_quant.group_size)
        if kernel_layout:
            act_bits = self.config.weight_quant.act_bits

            def _prep(leaf):
                if isinstance(leaf, QuantizedTensor) and leaf.ndim == 2:
                    try:
                        return pallas_matmul.prepare(leaf, act_bits=act_bits)
                    except ValueError:
                        return leaf
                return leaf
            self.params = jax.tree_util.tree_map(
                _prep, self.params,
                is_leaf=lambda l: isinstance(l, QuantizedTensor))
        self._weight_bits = bits

    @classmethod
    def from_pretrained(cls, path: Optional[str] = None, **kw) -> "Engine":
        """Engine serving the shipped pretrained anchor: config, tokenizer
        and trained weights bundled in one checkpoint (written by
        benchmarks/bench_quality.py). This is the facade's honest demo
        path — `generate()` produces corpus-plausible continuations instead
        of random-init noise — mirroring the reference's
        `DiffusionPrefill::new` loading a real tokenizer+model
        (`diffusion_prefill/src/lib.rs:69-89`).

        `path` is the checkpoint stem (expects `<path>.npz`, `<path>.json`,
        and the tokenizer file named in the metadata next to it); defaults
        to the repo's `benchmarks/quality_anchor`.
        """
        from diffusion_llm_rs_tpu.models import denoiser as dn
        from diffusion_llm_rs_tpu.utils.serialization import (get_metadata,
                                                              load_checkpoint)
        if path is None:
            path = os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "benchmarks", "quality_anchor")
        meta = get_metadata(path)
        cfg = DiffusionConfig(**meta["config"])
        tokenizer = BPETokenizer.load(
            os.path.join(os.path.dirname(path), meta["tokenizer"]))
        like = dn.init_denoiser_params(jax.random.PRNGKey(0), cfg)
        params = load_checkpoint(path, like=like)
        return cls(config=cfg, tokenizer=tokenizer, params=params, **kw)

    def _invalidate_param_memos(self) -> None:
        """Drop every cache keyed on (or derived from) self.params."""
        self._ntp_cache.clear()
        self._prefill_store.clear()
        self._prefix_index.clear()
        self._samplers.clear()
        # KV entries hold K/V computed from the OLD params — serving them
        # after quantize_weights/load would mix old-weight attention state
        # with new-weight computation (review r5)
        self.kv_cache.clear()

    # ------------------------------------------------------------------
    # tokenization + attention-mask cache (`diffuse-llm-rs/src/lib.rs:1224-1256`)
    # ------------------------------------------------------------------

    def tokenize_model(self, text: str, model_id: str = "model"):
        """Tokenize into TokenizedVectors with real embeddings (the reference
        builds zero embeddings, `lib.rs:1234`)."""
        from diffusion_llm_rs_tpu.models.types import TokenizedVector
        token_ids = self.tokenizer.encode(text)
        embeddings = np.asarray(dn.embed_tokens(
            self.params, jnp.asarray([token_ids]))[0])
        return [TokenizedVector(id=model_id, tokens=token_ids,
                                embeddings=embeddings)]

    def set_attention_mask(self, vector_id: str, mask: np.ndarray) -> None:
        """Cache an attention mask (`DiffuseLLM.attention_masks`, lib.rs:332)."""
        self._attention_masks[vector_id] = np.asarray(mask, np.float32)

    def apply_attention_masks(self, tokens, offsets) -> None:
        """Apply cached masks to TokenizedVectors (`lib.rs:1247-1256`)."""
        for tv, offset in zip(tokens, offsets):
            mask = self._attention_masks.get(tv.id)
            if mask is not None:
                tv.apply_mask(mask, offset)

    def clear_kv_cache(self) -> None:
        """`lib.rs:1076-1079`."""
        self.kv_cache.clear()

    def kv_cache_memory_usage(self) -> int:
        """`lib.rs:1082-1084`."""
        return self.kv_cache.memory_usage()

    # ------------------------------------------------------------------
    # process_model (`lib.rs:66-86`; SURVEY.md §3.1)
    # ------------------------------------------------------------------

    def process_model(self, text: str, model_id: str = "model") -> Dict[str, int]:
        """5-step ingestion: tokenize -> quantize -> dedup-store -> route ->
        index. Mirrors `ZetaReticula::process_model` layer-for-layer."""
        # 1. tokenize + embed (`DiffuseLLM::tokenize_model`, lib.rs:1224-1245
        #    builds zero embeddings; we use the real embedding table)
        token_ids = self.tokenizer.encode(text)
        embeddings = np.asarray(dn.embed_tokens(
            self.params, jnp.asarray([token_ids]))[0])
        # 2. per-token quantization, bits cycling over the configured widths
        #    (`PrefillKVQuant::quantize_vectors`, prefill-kvquant-rs/lib.rs:127-146)
        ids = [f"{model_id}:{i}" for i in range(len(token_ids))]
        compressed = compress_rows(embeddings,
                                   self.system_config.quantization_bits, ids)
        # 3. dedup + SSD store (`IODedupEngine::store_vectors`)
        written = self.dedup.store_vectors(compressed)
        # 4. routing graph (`NsRouter::build_graph`)
        self.router.update_routing(compressed)
        # 5. ANN index (`FusionANNS::index_vectors`)
        self.anns.index_compressed(compressed)
        return {"tokens": len(token_ids), "stored": written,
                "dedup_hits": self.dedup.dedup_hits}

    # ------------------------------------------------------------------
    # prefill (`diffusion_prefill/src/lib.rs:92-114`; SURVEY.md §3.3)
    # ------------------------------------------------------------------

    def prefill(self, text: str, cache_id: str = "default") -> int:
        """Tokenize -> embed -> quantize -> cache -> salience -> route.

        Repeated or prefix-extended prompts reuse the prompt cache: the
        suffix automaton over the previously prefilled text proposes a
        match, position-aligned token comparison confirms it, and only the
        unmatched suffix is embedded/quantized/stored (the consumption of
        `suffix_tree` the reference documents but never wires,
        `diffusion_prefill/src/suffix_tree.rs:1-30`). Returns the number of
        NEW tokens processed."""
        token_ids = self.tokenizer.encode(text)
        if not token_ids:
            return 0
        reuse = 0
        indexed = self._prefix_index.get(cache_id)
        if indexed is not None:
            tree, old_ids = indexed
            # automaton: longest prefix of `text` occurring in the indexed
            # text; exact token comparison pins position-0 alignment
            cand = tree.longest_match(text)
            if cand > 0:
                max_tok = min(len(token_ids), len(old_ids))
                while reuse < max_tok and token_ids[reuse] == old_ids[reuse]:
                    reuse += 1
        new_ids = token_ids[reuse:]
        self.prefill_prefix_hits += reuse
        # re-prefilling with a SHORTER (or diverged) prompt: drop the old
        # tail entries, or get_cached_vectors serves the stale prompt's
        # embeddings instead of the documented zero-on-miss, and the store
        # grows without bound across re-prefills (review r5)
        if indexed is not None:
            for i in range(len(token_ids), len(indexed[1])):
                self._prefill_store.pop(f"{cache_id}:{i}", None)
        for i in range(reuse):   # matched prefix: refresh salience only
            self.salience.update(f"{cache_id}:{i}")
        if new_ids:
            embeddings = np.asarray(dn.embed_tokens(
                self.params, jnp.asarray([new_ids]))[0])
            ids = [f"{cache_id}:{i}" for i in
                   range(reuse, len(token_ids))]
            compressed = compress_rows(embeddings,
                                       self.prefill_config.quant_bits, ids)
            for vec in compressed:
                self._prefill_store[vec.id] = vec
                self.salience.update(vec.id)
            self.router.update_routing(compressed)
        self.salience.calculate(text)
        self._prefix_index[cache_id] = (SuffixTree(text), token_ids)
        return len(new_ids)

    def get_cached_vectors(self, ids: Sequence[str]) -> List[np.ndarray]:
        """Zero-vector on miss (`diffusion_prefill/src/prefill_kv.rs:94-97`)."""
        out = []
        for vid in ids:
            vec = self._prefill_store.get(vid)
            out.append(vec.dequantize() if vec is not None
                       else np.zeros((self.config.hidden_size,), np.float32))
        return out

    # ------------------------------------------------------------------
    # generate (`diffusion_prefill/src/lib.rs:117-174`; SURVEY.md §3.4)
    # ------------------------------------------------------------------

    def predict_next_token(self, token_ids: Sequence[int]) -> jax.Array:
        """Next-token probabilities from the denoiser hidden state at t=0 —
        the real path the reference sketches (`lib.rs:148-152`)."""
        ids = jnp.asarray([list(token_ids)], jnp.int32)
        if self._predict_fn is None:
            cfg = self.config

            # per-instance jit of (params, ids) — `static_argnums=0` on a
            # method pins `self` (params, samplers, stores) in jax's global
            # compilation cache forever, leaking every Engine ever built
            # (review r5)
            @jax.jit
            def predict(params, ids):
                x = dn.embed_tokens(params, ids)
                t = jnp.zeros((ids.shape[0],), jnp.int32)
                _, h = dn.denoiser_forward(params, cfg, x, t,
                                           return_hidden=True)
                logits = dn.logits_from_hidden(params, h[:, -1:, :])[:, 0, :]
                return jax.nn.softmax(logits, axis=-1)

            self._predict_fn = predict
        probs = self._predict_fn(self.params, ids)
        return probs[0]

    def sample_token(self, probs) -> str:
        """Greedy argmax -> token string (`lib.rs:162-174`)."""
        token_id = int(jnp.argmax(jnp.asarray(probs)))
        return self.tokenizer.id_to_token(token_id)

    def generate(self, prompt: str, max_length: int = 32) -> str:
        """Greedy token loop with [EOS] early stop (`lib.rs:117-139`).

        Greedy decoding is deterministic per prefix, and the bidirectional
        denoiser re-encodes every position each step (no sound AR-style KV
        reuse), so the valid cache is an exact-prefix next-token memo: a
        repeated or shared-prefix prompt skips its forwards entirely
        (`generate_cache_hits` counts skips)."""
        ids = self.tokenizer.encode(prompt)
        if not ids:
            ids = [self.tokenizer.eos_id]
        out_ids: List[int] = []
        for _ in range(max_length):
            window = tuple(ids[-self.config.max_sequence_length:])
            next_id = self._ntp_cache.get(window)
            if next_id is None:
                probs = self.predict_next_token(list(window))
                next_id = int(jnp.argmax(probs))
                self._ntp_cache[window] = next_id
                while len(self._ntp_cache) > self._ntp_cache_cap:
                    self._ntp_cache.popitem(last=False)
            else:
                self._ntp_cache.move_to_end(window)
                self.generate_cache_hits += 1
            if next_id == self.tokenizer.eos_id:
                break
            ids.append(next_id)
            out_ids.append(next_id)
        return self.tokenizer.decode(out_ids)

    # ------------------------------------------------------------------
    # diffusion sampling (`DiffuseLLM::sample`, lib.rs:853-955)
    # ------------------------------------------------------------------

    def sample(self, batch_size: int = 1, seq_len: Optional[int] = None,
               num_steps: Optional[int] = None, seed: int = 0,
               return_text: bool = True, use_paged: bool = True,
               salience_routing: bool = False, attend_mode: str = "auto"):
        """Phase-aware quantized reverse-diffusion sampling -> text.

        use_paged (default): the flagship path — the quantized PAGED KV
        serving machinery (`serving.PagedContinuousBatcher`: per-page bit
        buckets, batched paged flash kernel, optional salience routing), so
        the facade reaches the same code production serving runs.
        use_paged=False: the lax.scan sampler (`phase_aware_sample`) — one
        fused program, best for one-shot fixed batches.
        """
        seq_len = seq_len or min(32, self.config.max_sequence_length)
        T = num_steps or self.config.num_timesteps
        if use_paged:
            # largest page <= 64 dividing seq_len and packable at 1 bit; if
            # none exists (e.g. seq_len=10) the paged pools can't be built —
            # fall back to the fused scan sampler instead of crashing
            page = next((p for p in range(min(seq_len, 64), 0, -1)
                         if seq_len % p == 0 and p % 8 == 0), None)
            if page is None:
                use_paged = False
        if use_paged:
            from diffusion_llm_rs_tpu.serving import (PagedContinuousBatcher,
                                                      Request)
            skey = (batch_size, seq_len, salience_routing, attend_mode)
            b = self._samplers.get(skey)
            if b is None:
                b = PagedContinuousBatcher(
                    self.params, self.config, self.schedule,
                    num_slots=batch_size, seq_len=seq_len,
                    page_size=page, salience_routing=salience_routing,
                    attend_mode=attend_mode)
                self._samplers[skey] = b
                while len(self._samplers) > self._samplers_cap:
                    self._samplers.popitem(last=False)
            else:
                self._samplers.move_to_end(skey)
            # pick up later quantize_weights in BOTH the denoise step and
            # the token readout (the two must decode with the same weights)
            b.params = self.params
            b.readout_params = self.params
            b._key = jax.random.PRNGKey(seed)
            for i in range(batch_size):
                b.submit(Request(f"sample:{seed}:{i}", seq_len=seq_len,
                                 num_steps=T))
            done = {c.request_id: c for c in b.run_until_drained()}
            token_ids = jnp.stack([
                jnp.asarray(done[f"sample:{seed}:{i}"].tokens)
                for i in range(batch_size)])
        else:
            key = jax.random.PRNGKey(seed)
            x = phase_aware_sample(self.params, self.config, self.schedule,
                                   (batch_size, seq_len), key, num_steps)
            token_ids = dn.decode_tokens(self.params, x)
        if not return_text:
            return token_ids
        return [self.tokenizer.decode(np.asarray(row)) for row in token_ids]

    # ------------------------------------------------------------------
    # quality metric: denoising perplexity (BASELINE.json metric)
    # ------------------------------------------------------------------

    def denoising_perplexity(self, text: str, t: int = 10,
                             seed: int = 0) -> float:
        """Token-reconstruction perplexity after noising to step t.

        Embeds the tokens, applies the forward process to timestep t, predicts
        the noise, reconstructs x0 = (x_t - sqrt(1-abar)*eps_hat)/sqrt(abar),
        reads logits through the tied embedding, and returns exp(CE). Sensitive
        to weight/KV quantization — the measurable stand-in for the perplexity
        deltas BASELINE.md requires (the reference has no trained weights).
        """
        ids = self.tokenizer.encode(text)[: self.config.max_sequence_length]
        if len(ids) < 2:
            raise ValueError("need at least 2 tokens")
        ids_arr = jnp.asarray([ids], jnp.int32)
        return float(self._ppl_jit(self.params, ids_arr, t,
                                   jax.random.PRNGKey(seed)))

    @functools.partial(jax.jit, static_argnums=(0, 3))
    def _ppl_jit(self, params, ids, t, key):
        x0 = dn.embed_tokens(params, ids)
        t_vec = jnp.full((ids.shape[0],), t, jnp.int32)
        x_t, _ = add_noise(self.schedule, x0, t_vec, key=key)
        eps_hat = dn.denoiser_forward(params, self.config, x_t, t_vec)
        sqrt_abar = self.schedule.sqrt_alpha_bars[t]
        sqrt_1m = self.schedule.sqrt_one_minus_alpha_bars[t]
        x0_hat = (x_t - sqrt_1m * eps_hat) / sqrt_abar
        logits = dn.logits_from_hidden(params, x0_hat)
        logp = jax.nn.log_softmax(logits, axis=-1)
        tok_logp = jnp.take_along_axis(logp, ids[..., None], axis=-1)
        return jnp.exp(-jnp.mean(tok_logp))

    # ------------------------------------------------------------------

    def stats(self) -> Dict[str, float]:
        """Metric schema per SURVEY.md §5.5."""
        s = dict(self.dedup.stats())
        s.update({
            "kv_cache_bytes": self.kv_cache.memory_usage(),
            "kv_cache_entries": len(self.kv_cache),
            "prefill_vectors": len(self._prefill_store),
            "indexed_vectors": len(self.anns),
            "router_nodes": len(self.router.nodes),
            "weight_bits": self._weight_bits or self._infer_weight_bits(),
        })
        return s

    def _infer_weight_bits(self) -> int:
        """Stored weight width when params came pre-quantized (e.g. a
        quantized checkpoint loaded via from_pretrained, where
        quantize_weights never ran): min bits over quantized leaves."""
        from diffusion_llm_rs_tpu.ops.matmul import Int8Weight
        from diffusion_llm_rs_tpu.ops.pallas_matmul import MatmulWeight
        from diffusion_llm_rs_tpu.quant.core import Fp8Tensor, QuantizedTensor

        def _is_q(l):
            return isinstance(l, (QuantizedTensor, MatmulWeight, Fp8Tensor,
                                  Int8Weight))
        bits = [l.bits for l in jax.tree_util.tree_leaves(
                    self.params, is_leaf=_is_q)
                if isinstance(l, (QuantizedTensor, MatmulWeight))]
        bits += [8 for l in jax.tree_util.tree_leaves(
                     self.params, is_leaf=_is_q)
                 if isinstance(l, (Fp8Tensor, Int8Weight))]
        return min(bits) if bits else 16

"""Sharded paged serving: continuous batching over a ('data','model') mesh.

BASELINE.json config 5 end-to-end ("multi-host sharded weights + quantized
KV-cache, continuous batching"): the TPU-native realization of the
reference's intended multi-node serving story — `SyncManager` rank/world_size
doc semantics (`diffuse-llm-rs/src/lib.rs:406-445`) + the NS-Router's shard
bookkeeping (`diffusion_prefill/src/router.rs:34-39`) — as ONE jitted
shard_map step over a GSPMD mesh:

  - batch slots and their quantized KV page pools shard over 'data': each
    data shard owns B/dp slots and their pages (pages are slot-major in the
    pool's page axis, so the shard boundary never splits a slot)
  - weights shard over 'model' (Megatron TP, `parallel/tp.py`): attention is
    head-local, so each shard's paged-attention kernel runs unmodified on its
    own H/tp heads and the pools' head-group axis shards over 'model' too
  - per-slot Langevin noise comes from per-slot PRNG keys, so the sharded
    batcher computes bit-identical slot trajectories to the single-device
    `PagedContinuousBatcher` (up to TP psum reassociation) — the parity test
    in tests/test_sharded_serving.py pins this

The host scheduler loop (admission/retirement) is unchanged from
`serving.ContinuousBatcher`; on a real multi-host pod each host runs this
same program under `jax.distributed.initialize` with its own process feeding
the globally-sharded arrays.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from diffusion_llm_rs_tpu.config import DiffusionConfig
from diffusion_llm_rs_tpu.models.diffusion import DiffusionSchedule, p_sample
from diffusion_llm_rs_tpu.parallel.tp import place_tp_params, tp_denoiser_forward
from diffusion_llm_rs_tpu.serving import PagedContinuousBatcher


class ShardedPagedBatcher(PagedContinuousBatcher):
    """`PagedContinuousBatcher` with slots/pools over 'data', weights over
    'model' — one jitted sharded step (BASELINE config 5)."""

    def __init__(self, params, cfg: DiffusionConfig, mesh: Mesh,
                 schedule: Optional[DiffusionSchedule] = None,
                 num_slots: int = 8, seq_len: int = 64, seed: int = 0,
                 page_size: Optional[int] = None,
                 salience_routing: bool = False, salience_ema: float = 0.8,
                 max_chunk: int = 32, attend_mode: str = "auto",
                 attn_act_bits: int = 16,
                 keep_embeddings: bool = True,
                 hbm_budget_bytes: Optional[int] = None,
                 memory_manager=None,
                 sanitize: Optional[bool] = None):
        self.mesh = mesh
        self.dp = mesh.shape["data"]
        self.tp = mesh.shape["model"]
        if num_slots % self.dp:
            raise ValueError(f"num_slots {num_slots} not divisible by data "
                             f"axis {self.dp}")
        if cfg.num_attention_heads % self.tp:
            raise ValueError(f"heads {cfg.num_attention_heads} not divisible "
                             f"by model axis {self.tp}")
        super().__init__(params, cfg, schedule, num_slots, seq_len, seed,
                         page_size, salience_routing=salience_routing,
                         salience_ema=salience_ema, max_chunk=max_chunk,
                         attend_mode=attend_mode, attn_act_bits=attn_act_bits,
                         keep_embeddings=keep_embeddings,
                         hbm_budget_bytes=hbm_budget_bytes,
                         memory_manager=memory_manager, sanitize=sanitize)
        HG = cfg.num_attention_heads // self.head_group
        if HG % self.tp:
            raise ValueError(f"head groups {HG} not divisible by model axis "
                             f"{self.tp}")
        # step-fn params: Megatron-split, stacked on a leading 'model' axis
        self.params = place_tp_params(params, mesh)
        # re-place slot state + pools with their mesh shardings (via host
        # so the transfer also works when the mesh spans OS processes —
        # every process holds the same value and serves its local shards)
        self.x = jax.device_put(
            np.asarray(self.x), NamedSharding(mesh, P("data", None, None)))
        # pools need no re-placement: self.mesh is set BEFORE
        # super().__init__, so every pool the base constructor built already
        # went through the sharded _make_pool below

    def _to_host(self, arr) -> np.ndarray:
        """Retirement readout when the 'data' axis spans OS processes: the
        decoded tokens are sharded over processes, so every process
        allgathers the full value (each host's scheduler retires the same
        slots — the host loops run in lockstep by construction)."""
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils as mhu
            return np.asarray(mhu.process_allgather(arr, tiled=True))
        return np.asarray(arr)

    def _choose_head_group(self) -> int:
        g = super()._choose_head_group()
        # TP shards heads: each shard's local heads must still tile into
        # whole lane-groups
        while g > 1 and (self.cfg.num_attention_heads // self.tp) % g:
            g //= 2
        return g

    def _make_pool(self, bits: int) -> Dict[str, jax.Array]:
        pool = super()._make_pool(bits)
        mesh = self.mesh  # set before super().__init__, so always present

        def place(a):
            spec = P("data", "model", *([None] * (a.ndim - 2)))
            return jax.device_put(np.asarray(a), NamedSharding(mesh, spec))

        return {k: place(v) for k, v in pool.items()}

    def _place_pool(self, pool):
        """Pools restored from the host tier go back with mesh shardings."""
        mesh = self.mesh

        def place(a):
            spec = P("data", "model", *([None] * (a.ndim - 2)))
            return jax.device_put(a, NamedSharding(mesh, spec))

        return {k: place(v) for k, v in pool.items()}

    def _build_step(self) -> Callable:
        cfg, schedule = self.cfg, self.schedule
        mesh, dp, tp = self.mesh, self.dp, self.tp
        B, S = self.num_slots, self.seq_len
        B_loc = B // dp
        Pg, nps, buckets = self.page_size, self.num_pages_per_slot, self.buckets
        H_loc = cfg.num_attention_heads // tp
        L = cfg.num_layers
        G = self.head_group
        # local page id of (slot b, layer li, page j) = (b*L + li)*nps + j —
        # slot-major, so the global page axis shards contiguously over 'data'
        pt_local = jnp.asarray(
            ((np.arange(B_loc)[None, :, None] * L +
              np.arange(L)[:, None, None]) * nps +
             np.arange(nps)[None, None, :]), jnp.int32)     # [L, B_loc, nps]

        salience = self.salience_routing
        make_attend = self._make_attend
        mdt = self._model_dtype

        def local_step(params_stacked, x, t_vec, active, seq_lens,
                       page_bits, slot_keys, pools, used):
            params_local = jax.tree_util.tree_map(lambda l: l[0],
                                                  params_stacked)
            t_clamped = jnp.maximum(t_vec, 0).astype(jnp.int32)
            pools = {b: dict(p) for b, p in pools.items()}
            scores_acc = [] if salience else None
            attend_fn = make_attend(pools, page_bits, active, seq_lens,
                                    scores_acc, used, B=B_loc, H=H_loc,
                                    pt=pt_local)
            eps = tp_denoiser_forward(params_local, cfg, x.astype(mdt),
                                      t_clamped, tp, "model",
                                      attend_fn=attend_fn)
            noise = jax.vmap(
                lambda kk: jax.random.normal(kk, (S, cfg.hidden_size),
                                             x.dtype))(slot_keys)
            x_next = p_sample(schedule, x, t_clamped, eps.astype(x.dtype),
                              noise=noise)
            keep = active.reshape(-1, 1, 1)
            x_out = jnp.where(keep, x_next, x)
            if salience:
                # salience proxy is head-local: average it over 'model' so
                # every shard (and the host) sees full-model attention mass
                page_scores = jax.lax.pmean(
                    jnp.mean(jnp.stack(scores_acc), axis=0), "model")
                return x_out, pools, page_scores
            return x_out, pools

        jitted: dict = {}

        def run(params_stacked, x, t_vec, active, seq_lens, page_bits,
                slot_keys, pools, used):
            # pool MEMBERSHIP is part of the key: HBM-budget spill/restore
            # changes which buckets exist, and the shard_map's in/out specs
            # are built from the pools dict — a cached program for a
            # different bucket set would fail the pytree/spec match
            key = (jax.tree_util.tree_structure(params_stacked), used,
                   tuple(sorted(pools)))
            if key not in jitted:
                pspecs = jax.tree_util.tree_map(
                    lambda l: P("model", *([None] * (l.ndim - 1))),
                    params_stacked)
                pool_specs = {
                    b: {k: P("data", "model", *([None] * (a.ndim - 2)))
                        for k, a in p.items()}
                    for b, p in pools.items()}
                out_specs = (P("data", None, None), pool_specs)
                if salience:
                    out_specs = out_specs + (P("data", None),)
                sm = shard_map(
                    functools.partial(local_step, used=used), mesh=mesh,
                    in_specs=(pspecs, P("data", None, None), P("data"),
                              P("data"), P("data"), P("data", None),
                              P("data", None), pool_specs),
                    out_specs=out_specs,
                    check_vma=False)
                jitted[key] = jax.jit(sm, donate_argnums=(7,))
            return jitted[key](params_stacked, x, t_vec, active, seq_lens,
                               page_bits, slot_keys, pools)

        return run

    def _build_chunk(self) -> Callable:
        """Sharded twin of `PagedContinuousBatcher._build_chunk`: ONE jitted
        shard_map whose body scans n fused denoise steps — slots/pools over
        'data', Megatron weights over 'model'. Per-slot bits re-route on
        device each scan step; host dispatch happens once per chunk."""
        cfg, schedule = self.cfg, self.schedule
        mesh, tp = self.mesh, self.tp
        B, S = self.num_slots, self.seq_len
        B_loc = B // self.dp
        Pg, nps, buckets = self.page_size, self.num_pages_per_slot, self.buckets
        H_loc = cfg.num_attention_heads // tp
        L = cfg.num_layers
        G = self.head_group
        pt_local = jnp.asarray(
            ((np.arange(B_loc)[None, :, None] * L +
              np.arange(L)[:, None, None]) * nps +
             np.arange(nps)[None, None, :]), jnp.int32)     # [L, B_loc, nps]
        slot_bits_fn = self._slot_bits
        make_attend = self._make_attend
        mdt = self._model_dtype
        salience = self.salience_routing
        ema = self.salience_ema
        Pg = self.page_size
        opts = tuple(b for b in self.buckets if b >= 2) or self.buckets

        from diffusion_llm_rs_tpu.cache.salience import allocate_bits_jnp
        from diffusion_llm_rs_tpu.serving import make_slot_budget_router
        budget_fn = make_slot_budget_router(cfg)

        def local_chunk(params_stacked, x, rng, t0, totals, seq_lens,
                        scores, pools, used, n_steps):
            params_local = jax.tree_util.tree_map(lambda l: l[0],
                                                  params_stacked)
            shard = jax.lax.axis_index("data")
            nps_actual = ((seq_lens + Pg - 1) // Pg).astype(jnp.int32)
            page_valid = (jnp.arange(nps, dtype=jnp.int32)[None, :]
                          < nps_actual[:, None])

            def body(carry, _):
                x, t, rng, scores, pools = carry
                # every shard advances the SAME global key chain (splits are
                # deterministic), then takes its own slots' keys — bit-equal
                # per-slot noise to the single-device batcher
                rng, sub = jax.random.split(rng)
                step_keys = jax.random.split(sub, B)
                local_keys = jax.lax.dynamic_slice_in_dim(
                    step_keys, shard * B_loc, B_loc)
                active = t >= 0
                t_clamped = jnp.maximum(t, 0).astype(jnp.int32)
                if salience:
                    budget = budget_fn(t_clamped, totals)
                    page_bits = jax.vmap(
                        lambda s, b, v: allocate_bits_jnp(
                            s, b, valid=v, bit_options=opts)
                    )(scores, budget, page_valid)
                else:
                    bits = slot_bits_fn(t_clamped, totals)
                    page_bits = jnp.broadcast_to(bits[:, None], (B_loc, nps))
                pools = {b: dict(p) for b, p in pools.items()}
                scores_acc = [] if salience else None
                attend_fn = make_attend(pools, page_bits, active, seq_lens,
                                        scores_acc, used, B=B_loc, H=H_loc,
                                        pt=pt_local)
                eps = tp_denoiser_forward(params_local, cfg, x.astype(mdt),
                                          t_clamped, tp, "model",
                                          attend_fn=attend_fn)
                noise = jax.vmap(
                    lambda kk: jax.random.normal(kk, (S, cfg.hidden_size),
                                                 x.dtype))(local_keys)
                x_next = p_sample(schedule, x, t_clamped,
                                  eps.astype(x.dtype), noise=noise)
                x = jnp.where(active.reshape(-1, 1, 1), x_next, x)
                t = jnp.where(active, t - 1, t)
                if salience:
                    step_scores = jax.lax.pmean(
                        jnp.mean(jnp.stack(scores_acc), axis=0), "model")
                    scores = ema * scores + (1.0 - ema) * step_scores
                return (x, t, rng, scores, pools), None

            (x, _, rng, scores, pools), _ = jax.lax.scan(
                body, (x, t0, rng, scores, pools), None, length=n_steps)
            return x, rng, scores, pools

        jitted: dict = {}

        def run(params_stacked, x, rng, t0, totals, seq_lens, scores,
                pools, used, n_steps):
            # bucket membership in the key for the same reason as the
            # per-step run(): spilled pools change the specs' structure
            key = (jax.tree_util.tree_structure(params_stacked), used,
                   n_steps, tuple(sorted(pools)))
            if key not in jitted:
                pspecs = jax.tree_util.tree_map(
                    lambda l: P("model", *([None] * (l.ndim - 1))),
                    params_stacked)
                pool_specs = {
                    b: {k: P("data", "model", *([None] * (a.ndim - 2)))
                        for k, a in p.items()}
                    for b, p in pools.items()}
                sm = shard_map(
                    functools.partial(local_chunk, used=used,
                                      n_steps=n_steps), mesh=mesh,
                    in_specs=(pspecs, P("data", None, None), P(),
                              P("data"), P("data"), P("data"),
                              P("data", None), pool_specs),
                    out_specs=(P("data", None, None), P(),
                               P("data", None), pool_specs),
                    check_vma=False)
                jitted[key] = jax.jit(sm, donate_argnums=(7,))
            return jitted[key](params_stacked, x, rng, t0, totals, seq_lens,
                               scores, pools)

        return run

"""Training core: sharded train step, SoW accumulation events, evaluation.

TPU-native rebuild of the reference pretraining loop
(``scripts/simple_train.py:216-730``). The per-rank torchrun process model
becomes a single SPMD program: one jitted train step over a
``(data, fsdp, model)`` mesh; DDP's bucketed allreduce is XLA's psum,
gradient accumulation is a ``lax.scan`` over microbatches, and the periodic
SoW accumulation + optimizer-group reset (``simple_train.py:618-626``)
happens between steps as a pure param/opt-state rebuild.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sow_tpu.models import llama as llama_lib
from sow_tpu.models.configs import get_config
from sow_tpu.nn import SoWConfig, param_labels, prepare_sow
from sow_tpu.nn import accumulate as accumulate_tree
from sow_tpu.optim.adamw import apply_updates, grouped_adamw
from sow_tpu.optim.schedules import Schedule, get_schedule
from sow_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    opt_state_shardings,
    params_shardings,
    stacked_token_sharding,
    token_sharding,
    replicated,
)


@dataclasses.dataclass
class TrainConfig:
    """Pretraining configuration (flag surface of ``simple_train.py:50-116``,
    unified into one typed config)."""

    model: str = "llama_60m"
    architecture: str = "sow"  # linear | sow | lora
    # optimization
    lr: float = 1e-2
    sow_lr: float = 1e-3
    weight_decay: float = 0.0
    grad_clipping: float = 0.0
    scheduler: str = "cosine"
    warmup_steps: float = 0.05  # ratio of num_training_steps
    min_lr_ratio: float = 0.03
    lr_decay: float = 1.0  # cycle_ratio
    reset_scheduler: bool = False  # per-cycle SoW LR restarts
    num_training_steps: int = 25_000
    gradient_accumulation: int = 1
    # sow
    rank: int = 50
    n_iter: int = 1
    sow_scale: float = 1.0
    sow_accumulation: int = 5_000  # update steps between accumulations
    # convergence-ablation knobs (reference pretraining uses neither):
    # keep the SoW group's Adam moments across accumulation events instead
    # of resetting them (ablates reset_optimizer, training_utils.py:257-277)
    sow_keep_moments: bool = False
    # after the FIRST accumulation, set the factor scale to this value
    # (0 = keep sow_scale). The finetune workloads' scale -> 1/rank move
    # (run_glue.py:993-1002) as a pretraining ablation.
    sow_scale_after_first: float = 0.0
    # Skip SoW accumulation events past this fraction of num_training_steps
    # (1.0 = reference behavior: accumulate at every sow_accumulation
    # multiple before the final step). Motivation is measured, not
    # theoretical: in the 25k-step flagship run the step-20000 accumulation
    # (80% of a cosine schedule, sow_lr nearly annealed) REGRESSED eval ppl
    # 4.98 -> 5.03 — fresh factors injected under a near-zero sow_lr can
    # neither learn nor recover the folded optimum (PARITY.md "Flagship
    # experiment", schedule-interaction bullet). ~0.7 is the guided value.
    sow_accum_end_frac: float = 1.0
    # Post-accumulation factor re-init. "random" (reference: fresh A is a
    # QR of N(0,0.02) noise, B zero — sow.py:157-178). "grad": warm-start A
    # with an orthonormal basis of the top-(rank*n_iter) LEFT singular
    # subspace of the CURRENT loss gradient dL/dW at the folded point
    # (GaLore-style; randomized range-finder + one power iteration, MXU
    # matmuls only). B stays zero, so the fold is still output-continuous —
    # but the first post-fold updates of B (dL/dB = A^T dL/dW) now capture
    # the top gradient energy instead of a random-subspace projection of it.
    # Targets the conv9m deficit's untested lever (VERDICT r3 weak-6).
    sow_reinit: str = "random"
    init_method: str = "normal_QR"
    grow_rank: bool = False
    # galore (ref simple_train.py:96-102)
    galore_rank: int = 128
    update_proj_gap: int = 200
    galore_scale: float = 0.25
    # Optimizer for the embed/lm_head subtrees under SoW — the bulk of the
    # remaining optimizer HBM once the projections are factored:
    #   "factored" (default): exact first moment + Adafactor-style factored
    #       second moment — full-rank updates, v drops O(m*n) -> O(m+n).
    #   "galore": rank-r projected AdamW (periodic SVD of the grad).
    #   "adamw": plain grouped AdamW (the reference's behavior).
    # Only applies to sow/lora architectures; dense baselines keep AdamW.
    embed_optimizer: str = "factored"
    # Back-compat alias: True forces embed_optimizer="galore".
    galore_embeddings: bool = False
    # Whole-model optimizer family. "adamw" (default): the grouped AdamW
    # stack above. "ttadam": TT-compressed moment storage for every 2D
    # param >= tt_min_dim (optim/ttadam.py ≙ tn_gradient/optimizer/
    # ttadam.py:10-117), grouped lrs (lr / sow_lr) preserved. The
    # TPU-recommended config is the default below: matrix layout +
    # Adafactor-factored v (1.04x dense step time at 83x moment
    # compression, BENCH_HISTORY r3).
    optimizer: str = "adamw"
    tt_rank: int = 16
    tt_layout: str = "matrix"  # matrix | uniform | wide
    tt_v_mode: str = "factored"  # factored | tt
    tt_ema_mode: str = "dense"  # dense | tt (tt = single-decompose TTRAdam)
    tt_state_dtype: str = "float32"  # storage dtype of TT cores between
    # steps (math is fp32 either way); bfloat16 halves TT state bytes
    tt_min_dim: int = 64
    # data/model
    batch_size: int = 128  # per-step global batch (sequences)
    max_length: int = 256
    dtype: str = "bfloat16"
    # "auto" (default): rematerialize block activations when the long-seq
    # memory-envelope policy triggers (same score-bytes threshold as the
    # flash/fused-CE kernels — at those shapes the kernels alone land ~1 GiB
    # over a v5e chip's HBM; remat closes the gap). True/False force it.
    activation_checkpointing: Any = "auto"
    # Pallas streaming-CE kernel: "auto" (default) picks it when the XLA
    # path's fp32 log-softmax intermediate (batch*seq*vocab*4B per
    # microbatch) exceeds the memory budget; measured slower than XLA's
    # fused softmax-CE at llama-60m bench shapes, so it stays off below.
    # True/False force it.
    fused_loss: Any = "auto"
    seed: int = 42
    # mesh
    mesh_data: int = -1
    mesh_fsdp: int = 1
    mesh_model: int = 1
    # Context parallelism: shard the token axis over this many devices
    # (long-context training; see models/llama.py ``seq_shard``).
    # max_length must divide by it.
    mesh_seq: int = 1
    # Pipeline parallelism: layers sharded over this many stages
    # (parallel/pipeline.py GPipe schedule). >1 routes pretraining through
    # PipelineTrainer on a (data, stage) mesh; gradient_accumulation becomes
    # the microbatch count.
    mesh_stage: int = 1


def accumulation_event_due(cfg: "TrainConfig", update_step: int) -> bool:
    """Shared SoW accumulation-event predicate (Trainer + PipelineTrainer).

    An event fires on every ``sow_accumulation`` multiple strictly before the
    final step (ref simple_train.py:618-626), unless it lands past the
    ``sow_accum_end_frac`` cutoff. The cutoff is computed as an INTEGER step
    once — ``frac * steps`` in floats silently drops exact-boundary events
    (0.57 * 10000 == 5699.999...)."""
    if cfg.architecture != "sow" or cfg.sow_accumulation <= 0:
        return False
    cutoff = round(cfg.sow_accum_end_frac * cfg.num_training_steps)
    return (
        update_step % cfg.sow_accumulation == 0
        and update_step < cfg.num_training_steps
        and update_step <= cutoff
    )


def _dtype(name: str):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[name]


def global_norm(tree) -> jax.Array:
    return jnp.sqrt(
        sum(jnp.sum(jnp.square(x.astype(jnp.float32))) for x in jax.tree_util.tree_leaves(tree))
    )


class Trainer:
    """Owns params, optimizer state, mesh and the jitted step functions."""

    def __init__(self, cfg: TrainConfig, mesh=None):
        self.cfg = cfg
        self.model_cfg = get_config(cfg.model)
        if self._use_remat():
            self.model_cfg = dataclasses.replace(self.model_cfg, remat=True)
        self.mesh = mesh if mesh is not None else make_mesh(
            cfg.mesh_data, cfg.mesh_fsdp, cfg.mesh_model, cfg.mesh_seq
        )
        if self.mesh.shape.get("seq", 1) > 1:
            # context parallelism: activations shard over the seq axis
            self.model_cfg = dataclasses.replace(self.model_cfg, seq_shard=True)
        self.dtype = _dtype(cfg.dtype)

        key = jax.random.PRNGKey(cfg.seed)
        key, init_key, sow_key = jax.random.split(key, 3)
        params = llama_lib.init_params(init_key, self.model_cfg, dtype=self.dtype)

        if cfg.architecture in ("sow", "lora"):
            sow_cfg = SoWConfig(
                target_modules=llama_lib.LLAMA_TARGET_MODULES,
                rank=cfg.rank,
                n_iter=cfg.n_iter,
                scale=cfg.sow_scale,
                init_method=cfg.init_method,
                decompose=None,  # blank layers for pretraining (simple_train.py:320-331)
                dtype=self.dtype,
                grow_rank=cfg.grow_rank,
            )
            params = prepare_sow(params, sow_cfg, sow_key)
            if cfg.architecture == "lora":
                # ref simple_train.py:335-349: LoRA = SoW with a frozen random
                # base and accumulation disabled. One immediate accumulation
                # freezes the random factors as the base (B resets to 0).
                key, k2 = jax.random.split(key)
                params = accumulate_tree(params, k2)

        self.params = self._device_put_params(params)
        self._build_optimizer()
        self.opt_state = jax.jit(
            self.opt.init, out_shardings=self._opt_shardings(self.params)
        )(self.params)
        self.update_step = 0
        self._tokens_dev = None  # device-side token counter (lazy)
        self._tokens_base = 0  # host-side offset (restored checkpoints)
        self._mask_cache: dict[tuple, jax.Array] = {}
        self._jit_cache: dict[Any, Any] = {}

    @property
    def tokens_seen(self) -> int:
        """Total tokens trained on (syncs the device counter — call at
        logging cadence, not per step)."""
        dev = 0 if self._tokens_dev is None else int(self._tokens_dev)
        return self._tokens_base + dev

    @tokens_seen.setter
    def tokens_seen(self, value: int):
        self._tokens_base = int(value)
        self._tokens_dev = None

    def _ones_mask(self, shape) -> jax.Array:
        from sow_tpu.parallel.multihost import put_sharded

        key = tuple(shape)
        if key not in self._mask_cache:
            sh = (stacked_token_sharding(self.mesh) if len(key) == 3
                  else token_sharding(self.mesh))
            self._mask_cache[key] = put_sharded(np.ones(shape, np.int32), sh)
        return self._mask_cache[key]

    # -- sharding helpers --------------------------------------------------
    def _device_put_params(self, params):
        from sow_tpu.parallel.multihost import tree_put_sharded

        sh = params_shardings(self.mesh, params)
        return tree_put_sharded(params, sh)

    def _opt_shardings(self, params):
        sh = params_shardings(self.mesh, params)
        dummy = jax.eval_shape(self.opt.init, params)
        return opt_state_shardings(self.mesh, dummy, sh)

    # -- optimizer ---------------------------------------------------------
    def _schedules(self) -> dict[str, Schedule]:
        cfg = self.cfg
        regular = get_schedule(
            cfg.scheduler,
            num_training_steps=cfg.num_training_steps,
            warmup_ratio=cfg.warmup_steps,
            min_lr_ratio=cfg.min_lr_ratio,
            cycle_length=cfg.num_training_steps if cfg.scheduler == "cosine" else None,
            cycle_ratio=1.0,
        )
        scheds = {"regular": regular}
        if cfg.reset_scheduler:
            # SoW group restarts its cosine every accumulation cycle
            # (simple_train.py:516-523 + get_all_schedulers).
            n = cfg.num_training_steps
            cyc = cfg.sow_accumulation
            n = (n // cyc) * cyc if n % cyc else n
            scheds["sow"] = get_schedule(
                "cosine",
                num_training_steps=n,
                warmup_ratio=cfg.warmup_steps,
                min_lr_ratio=cfg.min_lr_ratio,
                cycle_length=cyc,
                cycle_ratio=cfg.lr_decay,
            )
        else:
            scheds["sow"] = regular
        return scheds

    def _build_optimizer(self):
        if self.cfg.architecture == "galore":
            # ref simple_train.py:471-479 (GaLoreAdamW over 2D params)
            from sow_tpu.optim.galore import galore_adamw

            sched = self._schedules()["regular"]
            self.labels = jax.tree_util.tree_map(lambda _: "regular", self.params)
            self.opt = galore_adamw(
                lr=lambda step: self.cfg.lr * sched(step),
                rank=self.cfg.galore_rank,
                update_proj_gap=self.cfg.update_proj_gap,
                scale=self.cfg.galore_scale,
                weight_decay=self.cfg.weight_decay,
            )
            return
        labels = param_labels(self.params) if self._has_sow() else jax.tree_util.tree_map(
            lambda _: "regular", self.params
        )
        if self.cfg.optimizer == "ttadam":
            # TT-Adam over the whole tree (embed/lm_head included — TT
            # compression of exactly those big moments is its point, so the
            # embed_optimizer routing above does not apply).
            from sow_tpu.optim.ttadam import default_tt_spec, ttadam

            self.labels = labels
            order = 2 if self.cfg.tt_layout == "matrix" else 4
            self.opt = ttadam(
                labels=labels,
                lrs={"regular": self.cfg.lr, "sow": self.cfg.sow_lr},
                schedules=self._schedules(),
                weight_decay=self.cfg.weight_decay,
                tt_spec=default_tt_spec(
                    order=order, rank=self.cfg.tt_rank, min_dim=self.cfg.tt_min_dim
                ),
                layout=self.cfg.tt_layout,
                v_mode=self.cfg.tt_v_mode,
                ema_mode=self.cfg.tt_ema_mode,
                state_dtype=jnp.dtype(self.cfg.tt_state_dtype),
            )
            return
        embed_opt = "galore" if self.cfg.galore_embeddings else self.cfg.embed_optimizer
        if self._has_sow() and embed_opt != "adamw":
            # embed/lm_head moments (the bulk of remaining optimizer HBM) go
            # through a memory-compact optimizer; freeze them for AdamW.
            from sow_tpu.optim.combine import split_optimizer

            routed_keys = [k for k in ("embed", "lm_head") if k in self.params]
            for k in routed_keys:
                labels[k] = jax.tree_util.tree_map(lambda _: "frozen", labels[k])
            self.labels = labels
            main = grouped_adamw(
                labels,
                lrs={"regular": self.cfg.lr, "sow": self.cfg.sow_lr},
                schedules=self._schedules(),
                weight_decay=self.cfg.weight_decay,
            )
            sched = self._schedules()["regular"]
            if embed_opt == "galore":
                from sow_tpu.optim.galore import galore_adamw

                routed = galore_adamw(
                    lr=lambda step: self.cfg.lr * sched(step),
                    rank=self.cfg.galore_rank,
                    update_proj_gap=self.cfg.update_proj_gap,
                    scale=self.cfg.galore_scale,
                    weight_decay=self.cfg.weight_decay,
                    # project any routed matrix the configured rank can compress
                    min_dim=max(2 * self.cfg.galore_rank, 16),
                )
            elif embed_opt == "factored":
                from sow_tpu.optim.factored import factored_adamw

                routed = factored_adamw(
                    lr=lambda step: self.cfg.lr * sched(step),
                    weight_decay=self.cfg.weight_decay,
                    min_dim=128,
                )
            else:
                raise ValueError(f"unknown embed_optimizer: {embed_opt!r}")
            self.opt = split_optimizer(main, routed, routed_keys)
            return
        self.labels = labels
        self.opt = grouped_adamw(
            labels,
            lrs={"regular": self.cfg.lr, "sow": self.cfg.sow_lr},
            schedules=self._schedules(),
            weight_decay=self.cfg.weight_decay,
        )

    def _has_sow(self) -> bool:
        return self.cfg.architecture in ("sow", "lora")

    # -- steps -------------------------------------------------------------
    def _use_remat(self) -> bool:
        """Auto remat at the long-seq envelope (same threshold as the
        kernels). Uses ``self.cfg`` and the model zoo config only, so it is
        safe to call before the mesh exists (Trainer.__init__)."""
        from sow_tpu.models.llama import AUTO_FLASH_BYTES, _score_bytes

        ac = self.cfg.activation_checkpointing
        if isinstance(ac, str):
            ac = {"true": True, "1": True, "false": False, "0": False}.get(ac.lower(), "auto")
        if ac == "auto":
            micro = max(self.cfg.batch_size // max(self.cfg.gradient_accumulation, 1), 1)
            return _score_bytes(self.model_cfg, micro, self.cfg.max_length) > AUTO_FLASH_BYTES
        return bool(ac)

    def _use_fused_loss(self) -> bool:
        # vocab-sharded shards combine via pmax/psum; each shard's slice must
        # still tile into 128-lane blocks.
        #
        # "auto" couples to the flash-attention score-bytes policy: the two
        # kernels switch TOGETHER at the long-seq memory envelope. They can't
        # be separated by logits bytes alone (bench bs-256/seq-256 and the
        # OOM case bs-64/seq-1024 have equal batch*seq), and the measured
        # envelope win (15.75 GiB vs 30.4 GiB OOM, PARITY.md "Kernels")
        # needed both: fused CE removes the fp32 log-softmax intermediate
        # that would re-OOM a flash-attention run.
        from sow_tpu.models.llama import AUTO_FLASH_BYTES, _score_bytes

        cfg = self.cfg
        model = max(cfg.mesh_model, 1)
        shapes_ok = (
            self.mesh.devices.flat[0].platform == "tpu"
            and self.model_cfg.vocab_size % (128 * model) == 0
            # CP keeps logits sequence-sharded; the shard_map CE kernel's
            # batch-axis specs don't cover a sharded token axis — XLA's own
            # fused CE handles it.
            and self.mesh.shape.get("seq", 1) == 1
        )
        fl = cfg.fused_loss
        if isinstance(fl, str):  # CLI flags arrive as strings
            fl = {"true": True, "1": True, "false": False, "0": False}.get(fl.lower(), "auto")
        if fl == "auto":
            micro = max(cfg.batch_size // max(cfg.gradient_accumulation, 1), 1)
            return shapes_ok and _score_bytes(self.model_cfg, micro, cfg.max_length) > AUTO_FLASH_BYTES
        return bool(fl) and shapes_ok

    def _loss_fn(self, params, input_ids, attention_mask):
        labels = jnp.where(attention_mask.astype(bool), input_ids, -100)
        logits = llama_lib.forward(params, input_ids, self.model_cfg, attention_mask)
        if self._use_fused_loss():
            if self.mesh.devices.size > 1:
                from sow_tpu.ops.fused_ce import fused_causal_lm_loss_sharded

                return fused_causal_lm_loss_sharded(logits, labels, self.mesh)
            from sow_tpu.ops.fused_ce import fused_causal_lm_loss

            return fused_causal_lm_loss(logits, labels)
        return llama_lib.causal_lm_loss(logits, labels)

    def _train_step_body(self):
        """The raw (unjitted) update-step function, shared by the
        single-step jit and the multi-step ``lax.scan`` dispatch."""
        cfg = self.cfg
        opt = self.opt

        def train_step(params, opt_state, input_ids, attention_mask):
            accum = cfg.gradient_accumulation

            def micro_loss(p, ids, mask):
                return self._loss_fn(p, ids, mask)

            if accum > 1:
                ids = input_ids.reshape(accum, -1, input_ids.shape[-1])
                msk = attention_mask.reshape(accum, -1, attention_mask.shape[-1])

                def body(carry, xs):
                    loss_acc, grad_acc = carry
                    loss, grads = jax.value_and_grad(micro_loss)(params, xs[0], xs[1])
                    grad_acc = jax.tree_util.tree_map(jnp.add, grad_acc, grads)
                    return (loss_acc + loss, grad_acc), None

                zero = jax.tree_util.tree_map(
                    lambda p: jnp.zeros(p.shape, jnp.float32), params
                )
                (loss_sum, grads), _ = jax.lax.scan(body, (jnp.float32(0), zero), (ids, msk))
                loss = loss_sum / accum
                grads = jax.tree_util.tree_map(lambda g: g / accum, grads)
            else:
                loss, grads = jax.value_and_grad(micro_loss)(params, input_ids, attention_mask)

            gnorm = global_norm(grads)
            if cfg.grad_clipping > 0.0:
                factor = jnp.minimum(1.0, cfg.grad_clipping / (gnorm + 1e-6))
                grads = jax.tree_util.tree_map(
                    lambda g: (g.astype(jnp.float32) * factor).astype(g.dtype), grads
                )
            updates, opt_state = opt.update(grads, opt_state, params)
            params = apply_updates(params, updates)
            ntok = attention_mask.sum()
            return params, opt_state, {"loss": loss, "grad_norm": gnorm, "ntok": ntok}

        return train_step

    def _make_train_step(self):
        p_sh = params_shardings(self.mesh, self.params)
        o_sh = self._opt_shardings(self.params)
        b_sh = token_sharding(self.mesh)
        rep = replicated(self.mesh)
        return jax.jit(
            self._train_step_body(),
            in_shardings=(p_sh, o_sh, b_sh, b_sh),
            out_shardings=(p_sh, o_sh, {"loss": rep, "grad_norm": rep, "ntok": rep}),
            donate_argnums=(0, 1),
        )

    def _make_train_many(self):
        """K chained update steps in ONE jitted program (``lax.scan`` over
        stacked batches). On a dispatch-latency-bound runtime (the tunneled
        chip: ~half of each 60m step is host/program-launch overhead —
        measured 253k tokens/s solo vs 253k+263k for two concurrent
        streams) this amortizes the per-program cost over K updates.
        Metrics are the LAST step's loss/grad_norm (matching what a
        sequential loop would log at the chunk boundary) plus summed ntok
        and the chunk-mean loss."""
        body = self._train_step_body()

        def train_many(params, opt_state, ids_k, mask_k):
            def scan_body(carry, xs):
                p, o = carry
                p, o, m = body(p, o, xs[0], xs[1])
                return (p, o), m

            (params, opt_state), ms = jax.lax.scan(
                scan_body, (params, opt_state), (ids_k, mask_k)
            )
            metrics = {
                "loss": ms["loss"][-1],
                "grad_norm": ms["grad_norm"][-1],
                "ntok": ms["ntok"].sum(),
                "loss_mean": ms["loss"].mean(),
            }
            return params, opt_state, metrics

        p_sh = params_shardings(self.mesh, self.params)
        o_sh = self._opt_shardings(self.params)
        bk_sh = stacked_token_sharding(self.mesh)
        rep = replicated(self.mesh)
        return jax.jit(
            train_many,
            in_shardings=(p_sh, o_sh, bk_sh, bk_sh),
            out_shardings=(p_sh, o_sh,
                           {"loss": rep, "grad_norm": rep, "ntok": rep,
                            "loss_mean": rep}),
            donate_argnums=(0, 1),
        )

    def _train_step_fn(self):
        key = jax.tree_util.tree_structure(self.params)
        if key not in self._jit_cache:
            self._jit_cache[key] = self._make_train_step()
        return self._jit_cache[key]

    def _train_many_fn(self):
        key = ("many", jax.tree_util.tree_structure(self.params))
        if key not in self._jit_cache:
            self._jit_cache[key] = self._make_train_many()
        return self._jit_cache[key]

    def step(self, input_ids: jax.Array, attention_mask: Optional[jax.Array] = None):
        """One update step (the batch already spans gradient accumulation).

        No host<->device syncs on the hot path: token counting happens
        inside the jitted step and accumulates lazily on device; read
        ``tokens_seen`` (a sync) only at logging cadence.
        """
        if attention_mask is None:
            attention_mask = self._ones_mask(input_ids.shape)
        fn = self._train_step_fn()
        with jax.set_mesh(self.mesh):
            # active mesh lets forward's bare-PartitionSpec sharding
            # constraints (context parallelism) resolve at trace time
            self.params, self.opt_state, metrics = fn(
                self.params, self.opt_state, input_ids, attention_mask
            )
        self.update_step += 1
        self._tokens_dev = (
            metrics["ntok"] if self._tokens_dev is None else self._tokens_dev + metrics["ntok"]
        )
        if self._accumulation_due():
            self.run_accumulation(probe_batch=(input_ids, attention_mask))
        return metrics

    def _accumulation_due(self) -> bool:
        """True when a SoW accumulation event should fire at ``update_step``.

        Events land on every ``sow_accumulation`` multiple strictly before
        the final step (ref simple_train.py:618-626), gated by
        ``sow_accum_end_frac``: past that fraction of the schedule fresh
        factors train under a nearly-annealed sow_lr and measurably hurt
        (flagship: ppl 4.98 -> 5.03 from the 80%-of-schedule event)."""
        return self._has_sow() and accumulation_event_due(self.cfg, self.update_step)

    def step_many(self, input_ids: jax.Array, attention_mask: Optional[jax.Array] = None):
        """K update steps in one dispatch (inputs shaped ``(k, batch, seq)``).

        The caller must align chunk boundaries so no SoW accumulation event
        falls strictly INSIDE the chunk (asserted here): the accumulation's
        QR fold + moment reset is a host-driven path that must run between
        dispatches. An event landing exactly at the chunk end is handled.
        """
        if attention_mask is None:
            attention_mask = self._ones_mask(input_ids.shape)
        k = int(input_ids.shape[0])
        if (
            self._has_sow()
            and self.cfg.architecture == "sow"
            and self.cfg.sow_accumulation > 0
        ):
            nxt = (self.update_step // self.cfg.sow_accumulation + 1) * self.cfg.sow_accumulation
            # Only chunks crossing a boundary where an event would actually
            # FIRE are illegal — events disabled by sow_accum_end_frac (or
            # landing on/after the final step) don't need host interleaving.
            assert nxt >= self.update_step + k or not accumulation_event_due(
                self.cfg, nxt
            ), (
                f"step_many chunk of {k} would cross the SoW accumulation "
                f"boundary at step {nxt}; shrink steps-per-dispatch so it "
                f"divides sow_accumulation"
            )
        fn = self._train_many_fn()
        with jax.set_mesh(self.mesh):
            self.params, self.opt_state, metrics = fn(
                self.params, self.opt_state, input_ids, attention_mask
            )
        self.update_step += k
        self._tokens_dev = (
            metrics["ntok"] if self._tokens_dev is None else self._tokens_dev + metrics["ntok"]
        )
        if self._accumulation_due():
            self.run_accumulation(
                probe_batch=(input_ids[-1], attention_mask[-1])
            )
        return metrics

    # -- SoW accumulation event --------------------------------------------
    def _grad_warm_start(self, params, input_ids, attention_mask):
        """Replace each freshly-reinitialized A with an orthonormal basis of
        the top-(rank*n_iter) left singular subspace of dL/dW at the folded
        point (``sow_reinit="grad"``).

        dL/dW is obtained exactly via an identity probe: a layer with
        ``down = I`` and ``up = 0`` computes the same outputs (W_eff = acc),
        and its ``up`` cotangent is ``scale * I^T dL/dW`` — so one backward
        pass over the probe tree yields every layer's full weight gradient
        without touching model code. The subspace basis comes from a
        randomized range finder with one power iteration (G @ Omega then
        G @ (G^T @ Y) then QR — all MXU matmuls). B stays zero: the event
        remains output-continuous; the warm A only redirects where the
        first post-fold B updates (dL/dB = A^T dL/dW) can look."""
        import dataclasses as _dc

        from sow_tpu.nn.surgery import iter_sow, map_sow

        def probe_layer(_path, layer):
            d_in, d_out = layer.in_features, layer.out_features
            eye = jnp.eye(d_in, dtype=jnp.float32)[None]
            zer = jnp.zeros((1, d_in, d_out), jnp.float32)
            return _dc.replace(
                layer, down=eye, up=zer, rank=d_in, n_iter=1,
                virtual_rank=layer.virtual_rank,
            )

        probe = map_sow(params, probe_layer)
        with jax.set_mesh(self.mesh):
            grads = jax.jit(jax.grad(self._loss_fn))(
                probe, input_ids, attention_mask
            )
        g_by_path = dict(iter_sow(grads))

        @jax.jit
        def topr_basis(G, omega):
            y = G @ omega
            y = G @ (G.T @ y)  # one power iteration
            q, _ = jnp.linalg.qr(y.astype(jnp.float32))
            return q

        paths = [p for p, _ in iter_sow(params)]
        keys = dict(zip(paths, jax.random.split(
            jax.random.PRNGKey(self.cfg.seed + 2000 + self.update_step),
            max(len(paths), 1),
        )))

        def warm(path, layer):
            G = g_by_path[path].up[0].astype(jnp.float32)
            r_tot = layer.rank * layer.n_iter
            r_eff = min(r_tot, G.shape[0], G.shape[1])
            omega = jax.random.normal(keys[path], (G.shape[1], r_eff), jnp.float32)
            q = topr_basis(G, omega)  # (in, r_eff) orthonormal
            down = layer.down
            cols = []
            for i in range(layer.n_iter):
                c = q[:, i * layer.rank:(i + 1) * layer.rank]
                if c.shape[1] < layer.rank:  # subspace exhausted: keep random
                    c = jnp.concatenate([c, down[i][:, c.shape[1]:]], axis=1)
                cols.append(c)
            return _dc.replace(layer, down=jnp.stack(cols).astype(down.dtype))

        return map_sow(params, warm)

    def run_accumulation(self, probe_batch=None):
        """Fold factors into bases + reset the SoW optimizer group.

        Mirrors ``simple_train.py:618-626``: ``accumulate(model)`` then
        ``reset_optimizer(optimizer, group_id=1)``. Param structure can
        change (acc buffers appear / grow), so the optimizer and its state
        are rebuilt; non-SoW moments are carried over by param path — only
        the SoW group restarts, exactly like the reference.
        """
        from sow_tpu.optim.adamw import rebuild_state_after_accumulation
        from sow_tpu.optim.combine import SplitState

        key = jax.random.PRNGKey(self.cfg.seed + 1000 + self.update_step)
        new_params = accumulate_tree(self.params, key)
        self._n_accumulations = getattr(self, "_n_accumulations", 0) + 1
        if self.cfg.sow_scale_after_first > 0 and self._n_accumulations == 1:
            from sow_tpu.nn import set_sow_scale

            new_params = set_sow_scale(new_params, self.cfg.sow_scale_after_first)
        if self.cfg.sow_reinit == "grad" and probe_batch is not None:
            new_params = self._grad_warm_start(new_params, *probe_batch)
        old_state = self.opt_state

        self.params = self._device_put_params(new_params)
        self._build_optimizer()
        fresh = jax.jit(self.opt.init, out_shardings=self._opt_shardings(self.params))(
            self.params
        )

        def rebuild(old_st, fresh_st):
            if isinstance(old_st, SplitState):
                return SplitState(
                    main=rebuild(old_st.main, fresh_st.main),
                    routed=old_st.routed,  # embed/head state unaffected by SoW events
                )
            from sow_tpu.optim.ttadam import (
                TTAdamState,
                rebuild_tt_state_after_accumulation,
            )

            if isinstance(old_st, TTAdamState):
                return rebuild_tt_state_after_accumulation(
                    old_st, fresh_st, self.labels,
                    reset_label="__keep_all__" if self.cfg.sow_keep_moments else "sow",
                )
            return rebuild_state_after_accumulation(
                old_st, fresh_st, self.labels,
                # ablation: carry the SoW moments too (shapes permitting)
                reset_label="__keep_all__" if self.cfg.sow_keep_moments else "sow",
            )

        self.opt_state = rebuild(old_state, fresh)

    # -- eval --------------------------------------------------------------
    def _make_eval_step(self):
        def eval_step(params, input_ids, attention_mask):
            labels = jnp.where(attention_mask.astype(bool), input_ids, -100)
            logits = llama_lib.forward(params, input_ids, self.model_cfg, attention_mask)
            loss = llama_lib.causal_lm_loss(logits, labels)
            ntok = jnp.maximum((labels[:, 1:] != -100).sum(), 1)
            return loss, ntok

        p_sh = params_shardings(self.mesh, self.params)
        b_sh = token_sharding(self.mesh)
        rep = replicated(self.mesh)
        return jax.jit(
            eval_step, in_shardings=(p_sh, b_sh, b_sh), out_shardings=(rep, rep)
        )

    def evaluate(self, batches, max_tokens: int = 5_000_000):
        """Streamed eval to a token budget (ref ``simple_train.py:121-164``
        evaluates C4-val to 5M tokens and all-gathers the loss; here the
        global mean falls out of the sharded jit)."""
        from sow_tpu.parallel.multihost import put_sharded

        fn = self._make_eval_step()
        b_sh = token_sharding(self.mesh)
        total_loss, total_tok, n = 0.0, 0, 0
        for batch in batches:
            ids, mask = batch["input_ids"], batch.get("attention_mask")
            if mask is None:
                mask = np.ones_like(np.asarray(ids))
            if jax.process_count() > 1:
                # every process streams the same eval batches; upload only
                # the addressable shard of each
                ids = put_sharded(np.asarray(ids), b_sh)
                mask = put_sharded(np.asarray(mask), b_sh)
            with jax.set_mesh(self.mesh):
                loss, ntok = fn(self.params, ids, mask)
            total_loss += float(loss) * int(ntok)
            total_tok += int(ntok)
            n += 1
            if total_tok >= max_tokens:
                break
        mean = total_loss / max(total_tok, 1)
        return {"eval_loss": mean, "perplexity": float(jnp.exp(jnp.asarray(mean))), "eval_tokens": total_tok}

"""Pipeline parallelism: layers sharded over a ``stage`` mesh axis.

Beyond the reference's parallelism (DDP only — SURVEY §2.4): a GPipe
schedule expressed as one SPMD program. The per-layer parameter subtrees are
stacked on a leading layer axis and that axis is sharded over ``stage``;
inside a ``shard_map`` every device runs the same ``lax.scan`` over
``n_micro + n_stages - 1`` ticks, handing activations to the next stage
with ``lax.ppermute`` each tick. XLA overlaps the permute with the next
tick's compute; the bubble is the standard (S-1)/(M+S-1) GPipe fraction.

TPU-native design notes:
  * The schedule is data-independent (every stage computes every tick;
    invalid ticks operate on junk that ``where``-gates out of the loss), so
    there is no dynamic control flow — one fixed-shape compiled program.
  * Cross-entropy is NOT computed inside the tick loop (in SPMD all stages
    execute the whole program, so an in-loop CE would cost S times the
    FLOPs): the last stage's outputs accumulate into an (n_micro, ...)
    buffer and one vectorized CE runs after the drain.
  * Composes with data parallelism in the same shard_map: the microbatch
    axis shards over ``data``; loss/grads reduce with one psum.
  * embed / final norm / lm_head are replicated across stages (their
    cotangents psum over the mesh via the shard_map transpose); the layer
    stack — the dominant bytes — is what shards.

Backward flows through the same program: the transpose of ``ppermute`` is
the reversed permute, so the backward pipeline runs the schedule in reverse
without extra code.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sow_tpu.models import llama as llama_lib

PIPELINE_AXES = ("data", "stage")


def make_pipeline_mesh(data: int = 1, stage: int = 2, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data * stage != n:
        raise ValueError(f"pipeline mesh {data}x{stage} != {n} devices")
    return Mesh(np.asarray(devices).reshape(data, stage), PIPELINE_AXES)


def stack_layers(layers: dict) -> Any:
    """``{"0": tree, "1": tree, ...}`` -> one tree with a leading layer axis
    on every leaf (all llama layers are shape-homogeneous)."""
    n = len(layers)
    trees = [layers[str(i)] for i in range(n)]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)


def unstack_layers(stacked: Any, n_layers: int) -> dict:
    """Inverse of ``stack_layers`` (checkpoint export / surgery interop)."""
    return {
        str(i): jax.tree_util.tree_map(lambda a: a[i], stacked)
        for i in range(n_layers)
    }


def stacked_param_shardings(mesh: Mesh, stacked: Any) -> Any:
    """Layer stack sharded over ``stage`` on the leading (layer) axis."""
    sh = NamedSharding(mesh, P("stage"))
    return jax.tree_util.tree_map(lambda _: sh, stacked)


def _block(x, layer_tree, cfg, cos, sin, mask):
    """One transformer block (same math as llama.forward's block)."""
    h = llama_lib.rms_norm(x, layer_tree["input_norm"]["scale"], cfg.rms_norm_eps)
    x = x + llama_lib._attention(layer_tree["attn"], h, cfg, cos, sin, mask)
    h2 = llama_lib.rms_norm(x, layer_tree["post_norm"]["scale"], cfg.rms_norm_eps)
    x = x + llama_lib._mlp(layer_tree["mlp"], h2)
    return x


def pipeline_forward_loss(
    params: dict,
    input_ids: jax.Array,  # (n_micro, mb, t) — microbatched token ids
    attention_mask: jax.Array,  # (n_micro, mb, t)
    cfg: llama_lib.LlamaConfig,
    mesh: Mesh,
    n_stages: int,
) -> jax.Array:
    """Mean causal-LM loss over the microbatched batch, computed through the
    stage pipeline. ``params`` holds ``stacked_layers`` (leading layer axis,
    sharded over ``stage``) plus replicated embed/norm/lm_head."""
    n_layers = cfg.num_hidden_layers
    assert n_layers % n_stages == 0, (n_layers, n_stages)
    n_micro, _, t = input_ids.shape

    causal = jnp.tril(jnp.ones((t, t), bool))[None, None]
    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    def body(stacked_local, embed, norm, lm_head, ids, mask):
        # stacked_local leaves: (per_stage, ...) — this stage's layers.
        # ids/mask arrive with the LOCAL (data-sharded) microbatch size.
        stage = jax.lax.axis_index("stage")
        is_last = stage == n_stages - 1
        mb = ids.shape[1]

        positions = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32), (mb, t))
        cos, sin = llama_lib.rope_tables(positions, cfg.head_dim, cfg.rope_theta)

        def run_stage(x, m):
            amask = causal & m[:, None, None, :].astype(bool)

            def layer_step(h, layer_tree):
                h = _block(h, layer_tree, cfg, cos, sin, amask)
                return h, None

            if cfg.remat:
                step = jax.checkpoint(lambda h, lt: layer_step(h, lt))
            else:
                step = layer_step
            x, _ = jax.lax.scan(step, x, stacked_local)
            return x

        dtype = embed["embedding"].dtype
        zero_act = jnp.zeros((mb, t, cfg.hidden_size), dtype)
        out_buf = jnp.zeros((n_micro, mb, t, cfg.hidden_size), dtype)

        def tick(carry, tk):
            incoming, out_buf = carry
            # microbatch index this stage works on at this tick
            mbi = tk - stage
            safe = jnp.clip(mbi, 0, n_micro - 1)
            ids_mb = jax.lax.dynamic_index_in_dim(ids, safe, 0, keepdims=False)
            mask_mb = jax.lax.dynamic_index_in_dim(mask, safe, 0, keepdims=False)
            # stage 0 ingests a fresh microbatch; others take the permuted
            # activation from the previous stage's last tick
            x0 = embed["embedding"][ids_mb].astype(dtype)
            x_in = jnp.where(stage == 0, x0, incoming)
            y = run_stage(x_in, mask_mb)
            # last stage: bank the finished microbatch (junk ticks write to a
            # clipped slot and are overwritten/ignored via the loss mask)
            valid = (mbi >= 0) & (mbi < n_micro)
            banked = jnp.where(
                valid & is_last,
                y,
                jax.lax.dynamic_index_in_dim(out_buf, safe, 0, keepdims=False),
            )
            out_buf = jax.lax.dynamic_update_index_in_dim(out_buf, banked, safe, 0)
            nxt = jax.lax.ppermute(y, "stage", perm)
            return (nxt, out_buf), None

        (_, out_buf), _ = jax.lax.scan(
            tick, (zero_act, out_buf), jnp.arange(n_micro + n_stages - 1)
        )

        # One vectorized CE over the drained buffer (only the last stage's
        # buffer is real; the psum picks it out).
        h = llama_lib.rms_norm(
            out_buf.reshape(n_micro * mb, t, cfg.hidden_size),
            norm["scale"],
            cfg.rms_norm_eps,
        )
        if cfg.tie_word_embeddings:
            logits = h @ embed["embedding"].T
        else:
            logits = llama_lib.linear_apply(lm_head, h)
        flat_ids = ids.reshape(n_micro * mb, t)
        flat_mask = mask.reshape(n_micro * mb, t)
        labels = jnp.where(flat_mask.astype(bool), flat_ids, -100)

        logits32 = logits[:, :-1].astype(jnp.float32)
        targets = labels[:, 1:]
        valid_tok = targets != -100
        safe_t = jnp.where(valid_tok, targets, 0)
        logp = jax.nn.log_softmax(logits32, axis=-1)
        nll = -jnp.take_along_axis(logp, safe_t[..., None], axis=-1)[..., 0]
        nll = jnp.where(valid_tok, nll, 0.0)

        local_sum = jnp.where(is_last, nll.sum(), 0.0)
        local_cnt = jnp.where(is_last, valid_tok.sum(), 0)
        # reduce over stages (select last) and over data shards (sum)
        total = jax.lax.psum(jax.lax.psum(local_sum, "stage"), "data")
        count = jax.lax.psum(jax.lax.psum(local_cnt, "stage"), "data")
        return total / jnp.maximum(count, 1)

    from jax import shard_map

    layer_specs = jax.tree_util.tree_map(lambda _: P("stage"), params["stacked_layers"])
    rep = P()
    mb_spec = P(None, "data")  # microbatch axis replicated, batch over data
    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(layer_specs, rep, rep, rep, mb_spec, mb_spec),
        out_specs=rep,
        check_vma=False,
    )
    return fn(
        params["stacked_layers"],
        params["embed"],
        params["norm"],
        params.get("lm_head") or {},  # {} when embeddings are tied
        input_ids,
        attention_mask,
    )


def pipeline_param_shardings(mesh: Mesh, params: dict) -> dict:
    """Pipeline-layout sharding tree: the layer stack over ``stage``,
    everything else replicated."""
    rep = NamedSharding(mesh, P())
    out = jax.tree_util.tree_map(lambda _: rep, params)
    out["stacked_layers"] = stacked_param_shardings(mesh, params["stacked_layers"])
    return out


def to_pipeline_params(params: dict) -> dict:
    """Standard llama tree -> pipeline layout (stacked layer subtrees)."""
    out = {k: v for k, v in params.items() if k != "layers"}
    out["stacked_layers"] = stack_layers(params["layers"])
    return out


def from_pipeline_params(params: dict, n_layers: int) -> dict:
    """Pipeline layout -> standard llama tree (checkpointing, eval)."""
    out = {k: v for k, v in params.items() if k != "stacked_layers"}
    out["layers"] = unstack_layers(params["stacked_layers"], n_layers)
    return out


def _moments_to_standard(tree: dict, n_layers: int) -> dict:
    """Pipeline-layout optimizer-moment tree -> standard layout.

    Frozen leaves carry 0-d placeholder moments (adamw.py init), which have
    no layer axis to unstack — they replicate per layer unchanged."""
    out = {k: v for k, v in tree.items() if k != "stacked_layers"}
    stacked = tree["stacked_layers"]
    out["layers"] = {
        str(i): jax.tree_util.tree_map(
            lambda a, i=i: a if getattr(a, "ndim", 0) == 0 else a[i], stacked
        )
        for i in range(n_layers)
    }
    return out


def _moments_to_pipeline(tree: dict) -> dict:
    """Standard-layout optimizer-moment tree -> pipeline layout (0-d frozen
    placeholders stay 0-d instead of stacking into a bogus (n,) vector)."""
    out = {k: v for k, v in tree.items() if k != "layers"}
    layers = tree["layers"]
    trees = [layers[str(i)] for i in range(len(layers))]
    out["stacked_layers"] = jax.tree_util.tree_map(
        lambda *xs: xs[0] if getattr(xs[0], "ndim", 0) == 0 else jnp.stack(xs), *trees
    )
    return out


class PipelineTrainer:
    """Pretraining with pipeline (+ data) parallelism.

    Mirrors ``train.trainer.Trainer``'s surface (``step`` / ``evaluate`` /
    ``run_accumulation`` / ``standard_params``) over the pipeline layout.
    ``cfg.gradient_accumulation`` becomes the microbatch count (GPipe needs
    >= n_stages microbatches to fill; default 2*stages when unset)."""

    def __init__(self, cfg, n_stages: int, mesh: Optional[Mesh] = None):
        from sow_tpu.models.configs import get_config
        from sow_tpu.nn import SoWConfig, prepare_sow
        from sow_tpu.train.trainer import _dtype

        self.cfg = cfg
        self.n_stages = n_stages
        self.model_cfg = get_config(cfg.model)
        self.n_micro = max(cfg.gradient_accumulation, 1)
        if self.n_micro < n_stages:
            self.n_micro = 2 * n_stages  # fill the pipe
        if mesh is None:
            n = len(jax.devices())
            mesh = make_pipeline_mesh(n // n_stages, n_stages)
        self.mesh = mesh
        self.dtype = _dtype(cfg.dtype)

        key = jax.random.PRNGKey(cfg.seed)
        key, init_key, sow_key = jax.random.split(key, 3)
        params = llama_lib.init_params(init_key, self.model_cfg, dtype=self.dtype)
        if cfg.architecture == "sow":
            params = prepare_sow(
                params,
                SoWConfig(
                    target_modules=llama_lib.LLAMA_TARGET_MODULES,
                    rank=cfg.rank,
                    n_iter=cfg.n_iter,
                    scale=cfg.sow_scale,
                    init_method=cfg.init_method,
                    decompose=None,
                    dtype=self.dtype,
                ),
                sow_key,
            )
        pp = to_pipeline_params(params)
        self.params = jax.device_put(pp, pipeline_param_shardings(mesh, pp))

        self._build_optimizer()
        self.opt_state = self.opt.init(self.params)
        self.update_step = 0
        self._tokens_dev = None
        self._tokens_base = 0
        self._step_fn = None
        self._eval_fn = None

    @property
    def tokens_seen(self) -> int:
        dev = 0 if self._tokens_dev is None else int(self._tokens_dev)
        return self._tokens_base + dev

    @tokens_seen.setter
    def tokens_seen(self, value: int):
        self._tokens_base = int(value)
        self._tokens_dev = None

    def load_standard(self, std_params) -> None:
        """Adopt restored standard-layout params (checkpoint resume)."""
        pp = to_pipeline_params(std_params)
        self.params = jax.device_put(pp, pipeline_param_shardings(self.mesh, pp))
        self._build_optimizer()
        self.opt_state = self.opt.init(self.params)
        self._step_fn = None
        self._eval_fn = None

    def _build_optimizer(self):
        """(Re)build the grouped optimizer from the current param structure
        (labels change when accumulation materializes acc buffers)."""
        from sow_tpu.nn import param_labels
        from sow_tpu.optim.adamw import grouped_adamw
        from sow_tpu.optim.schedules import get_schedule

        cfg = self.cfg
        self.labels = param_labels(self.params)
        sched = get_schedule(
            cfg.scheduler,
            num_training_steps=cfg.num_training_steps,
            warmup_ratio=cfg.warmup_steps,
            min_lr_ratio=cfg.min_lr_ratio,
            cycle_length=cfg.num_training_steps if cfg.scheduler == "cosine" else None,
            cycle_ratio=1.0,
        )
        self.opt = grouped_adamw(
            self.labels,
            lrs={"regular": cfg.lr, "sow": cfg.sow_lr},
            schedules={"regular": sched, "sow": sched},
            weight_decay=cfg.weight_decay,
        )

    @property
    def standard_params(self) -> dict:
        """Params in the standard (per-layer dict) layout, for checkpoint
        export and single-device evaluation."""
        return from_pipeline_params(self.params, self.model_cfg.num_hidden_layers)

    @property
    def standard_opt_state(self):
        """Optimizer state with moments in the standard (per-layer dict)
        layout, so checkpoints written by a pipeline run restore cleanly into
        the non-pipelined Trainer and vice versa (previously the moments were
        saved under ``stacked_layers`` keypaths, which the standard trainer's
        ``restore_opt_state`` silently dropped)."""
        from sow_tpu.optim.adamw import GroupedAdamWState

        st = self.opt_state
        n = self.model_cfg.num_hidden_layers
        return GroupedAdamWState(
            step=st.step,
            count=st.count,
            mu=_moments_to_standard(st.mu, n),
            nu=_moments_to_standard(st.nu, n),
        )

    def load_standard_opt_state(self, std_state) -> None:
        """Adopt a standard-layout optimizer state (checkpoint resume)."""
        from sow_tpu.optim.adamw import GroupedAdamWState

        self.opt_state = GroupedAdamWState(
            step=std_state.step,
            count=std_state.count,
            mu=_moments_to_pipeline(std_state.mu),
            nu=_moments_to_pipeline(std_state.nu),
        )

    def _microbatch(self, ids, mask):
        b, t = ids.shape
        m = self.n_micro
        assert b % m == 0, f"batch {b} not divisible into {m} microbatches"
        return ids.reshape(m, b // m, t), mask.reshape(m, b // m, t)

    def _make_step(self):
        from sow_tpu.optim.adamw import apply_updates

        cfg, mesh, n_stages = self.cfg, self.mesh, self.n_stages
        model_cfg, opt = self.model_cfg, self.opt

        def train_step(params, opt_state, ids_mb, mask_mb):
            def loss_of(p):
                return pipeline_forward_loss(
                    p, ids_mb, mask_mb, model_cfg, mesh, n_stages
                )

            loss, grads = jax.value_and_grad(loss_of)(params)
            from sow_tpu.train.trainer import global_norm

            gnorm = global_norm(grads)
            updates, opt_state = opt.update(grads, opt_state, params)
            metrics = {"loss": loss, "grad_norm": gnorm, "ntok": mask_mb.sum()}
            return apply_updates(params, updates), opt_state, metrics

        p_sh = pipeline_param_shardings(mesh, self.params)
        o_sh = jax.tree_util.tree_map(
            lambda _: NamedSharding(mesh, P()), jax.eval_shape(self.opt.init, self.params)
        )
        # moments mirror the params' stage sharding
        from sow_tpu.optim.adamw import GroupedAdamWState

        dummy = jax.eval_shape(self.opt.init, self.params)
        if isinstance(dummy, GroupedAdamWState):
            rep = NamedSharding(mesh, P())

            def msh(sh, m):
                return rep if getattr(m, "ndim", 0) == 0 else sh

            o_sh = GroupedAdamWState(
                step=rep,
                count=jax.tree_util.tree_map(lambda _: rep, dummy.count),
                mu=jax.tree_util.tree_map(msh, p_sh, dummy.mu),
                nu=jax.tree_util.tree_map(msh, p_sh, dummy.nu),
            )
        mb_sh = NamedSharding(mesh, P(None, "data"))
        rep = NamedSharding(mesh, P())
        return jax.jit(
            train_step,
            in_shardings=(p_sh, o_sh, mb_sh, mb_sh),
            out_shardings=(p_sh, o_sh, {"loss": rep, "grad_norm": rep, "ntok": rep}),
            donate_argnums=(0, 1),
        )

    def step(self, input_ids, attention_mask=None):
        if attention_mask is None:
            attention_mask = jnp.ones_like(input_ids)
        ids_mb, mask_mb = self._microbatch(input_ids, attention_mask)
        if self._step_fn is None:
            self._step_fn = self._make_step()
        self.params, self.opt_state, metrics = self._step_fn(
            self.params, self.opt_state, ids_mb, mask_mb
        )
        self.update_step += 1
        self._tokens_dev = (
            metrics["ntok"]
            if self._tokens_dev is None
            else self._tokens_dev + metrics["ntok"]
        )
        from sow_tpu.train.trainer import accumulation_event_due

        if accumulation_event_due(self.cfg, self.update_step):
            self.run_accumulation()
        return metrics

    def run_accumulation(self):
        """SoW accumulation event in pipeline layout: unstack -> accumulate
        -> restack (cold path), then rebuild the SoW optimizer group exactly
        like the standard trainer."""
        from sow_tpu.nn import accumulate as accumulate_tree
        from sow_tpu.optim.adamw import rebuild_state_after_accumulation

        # same reinit key derivation as Trainer.run_accumulation, so a PP run
        # is step-for-step comparable with the standard trainer
        key = jax.random.PRNGKey(self.cfg.seed + 1000 + self.update_step)
        std = self.standard_params
        std = accumulate_tree(std, key)
        pp = to_pipeline_params(std)
        self.params = jax.device_put(pp, pipeline_param_shardings(self.mesh, pp))
        old_state = self.opt_state
        self._build_optimizer()  # param structure changed: new labels + opt
        fresh = self.opt.init(self.params)
        self.opt_state = rebuild_state_after_accumulation(old_state, fresh, self.labels)
        self._step_fn = None  # param structure may have changed
        self._eval_fn = None

    def evaluate(self, batches, max_tokens: int = 5_000_000):
        """Eval through the pipeline (same forward program, no grad)."""
        if self._eval_fn is None:
            # cached on self: jit caches key on function identity, so a fresh
            # closure here would recompile the whole pipeline program at
            # every eval interval
            model_cfg, mesh, n_stages = self.model_cfg, self.mesh, self.n_stages

            def eval_loss(params, ids_mb, mask_mb):
                return pipeline_forward_loss(
                    params, ids_mb, mask_mb, model_cfg, mesh, n_stages
                )

            self._eval_fn = jax.jit(eval_loss)
        fn = self._eval_fn
        total, ntok, = 0.0, 0
        for batch in batches:
            ids = jnp.asarray(batch["input_ids"])
            mask = batch.get("attention_mask")
            mask = jnp.ones_like(ids) if mask is None else jnp.asarray(mask)
            ids_mb, mask_mb = self._microbatch(ids, mask)
            loss = fn(self.params, ids_mb, mask_mb)
            n = int(mask.sum())
            total += float(loss) * n
            ntok += n
            if ntok >= max_tokens:
                break
        mean = total / max(ntok, 1)
        return {"eval_loss": mean, "perplexity": float(np.exp(mean)), "eval_tokens": ntok}

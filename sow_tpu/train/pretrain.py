"""Pretraining entry point — the flagship workload (ref ``simple_train.py``).

    python -m sow_tpu.train.pretrain --model llama_60m --architecture sow \
        --rank 50 --sow-accumulation 5000 --num-training-steps 25000 \
        --lr 0.01 --sow-lr 0.001 --batch-size 128 --max-length 256

One SPMD process drives the whole mesh by default (vs the reference's
one-process-per-GPU torchrun); ``--multihost-*`` joins N host processes
into one global mesh via ``jax.distributed`` (see
``sow_tpu/parallel/multihost.py``). Periodic eval to a token budget,
checkpoint/resume, tokens/sec telemetry, and startup memory report all
mirror ``simple_train.py``. Multihost scope: training + eval + save +
``--continue-from`` resume (every process restores the same checkpoint
from a shared filesystem — the reference's per-rank torchrun resume,
``simple_train.py:537-564``; ``--auto-restart`` is the one multihost
exclusion, since an in-process restart cannot re-rendezvous the process
set — relaunch the fleet with ``--continue-from`` instead).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from sow_tpu.checkpoint import complete_checkpoints, restore_opt_state, restore_params, save_checkpoint
from sow_tpu.data.c4 import make_pretrain_stream
from sow_tpu.train.trainer import TrainConfig, Trainer
from sow_tpu.utils.memory import format_memory_report


def parse_args(argv=None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description="SoW TPU pretraining")
    for f in dataclasses.fields(TrainConfig):
        flag = "--" + f.name.replace("_", "-")
        if f.type == "bool" or isinstance(f.default, bool):
            p.add_argument(flag, action="store_true", default=f.default)
        else:
            p.add_argument(flag, type=type(f.default), default=f.default)
    p.add_argument("--save-dir", type=str, default=None)
    p.add_argument("--save-every", type=int, default=10_000)
    p.add_argument("--eval-every", type=int, default=2_000)
    p.add_argument("--eval-tokens", type=int, default=5_000_000)
    p.add_argument("--logging-steps", type=int, default=100)
    p.add_argument("--synthetic-data", action="store_true", default=False)
    p.add_argument("--data-dir", type=str, default=None,
                   help="comma-separated local text roots (offline corpus; "
                        "C4 is egress-blocked here) — see data/local_text.py")
    p.add_argument("--tokenizer-path", type=str, default=None,
                   help="tokenizers-JSON path for --data-dir (trained "
                        "offline via local_text.train_bpe_tokenizer)")
    p.add_argument("--token-cache-dir", type=str, default=None,
                   help="pre-tokenized memmap cache dir for --data-dir "
                        "(built on first use; removes the 1-CPU live-BPE "
                        "throughput cap — local_text.ensure_token_cache)")
    p.add_argument("--continue-from", type=str, default=None)
    p.add_argument("--metrics-path", type=str, default=None, help="JSONL metrics sink")
    p.add_argument("--wandb-project", type=str, default=None)
    p.add_argument("--profile-dir", type=str, default=None,
                   help="capture a jax.profiler trace of steps 10-15 here")
    p.add_argument("--memory-profile", type=str, default=None,
                   help="dump a pprof device-memory profile at update 10 "
                        "(the --monitor_memory CUDA-snapshot analogue, ref "
                        "simple_train.py:590-591)")
    p.add_argument("--steps-per-dispatch", type=int, default=1,
                   help="K update steps per jitted dispatch (lax.scan over "
                        "K stacked batches; Trainer.step_many). Amortizes "
                        "per-program host/tunnel overhead; K must divide "
                        "every logging/save/eval/accumulation cadence")
    p.add_argument("--prefetch", type=int, default=2,
                   help="batches prefetched + device_put on a background "
                        "thread (0 disables); overlaps host data work with "
                        "device steps")
    p.add_argument("--verify-transfers", action="store_true", default=False,
                   help="transfer-integrity telemetry: lazily checksum every "
                        "uploaded batch against host bytes (no pipeline sync; "
                        "see the checkpoint-corruption postmortem)")
    p.add_argument("--auto-restart", type=int, default=0,
                   help="on crash, resume from the latest checkpoint up to N times "
                        "(simple fault tolerance; the reference has none — "
                        "SURVEY §5 'failure detection: None')")
    # multi-process SPMD (the torchrun/DDP equivalence, SURVEY §2.4:
    # simple_train.py:229 `dist.init_process_group` -> jax.distributed over
    # one global mesh; ICI within a slice, DCN across). One process per
    # host; all three flags must be set together.
    p.add_argument("--multihost-coordinator", type=str, default=None,
                   help="coordinator address host:port (process 0's)")
    p.add_argument("--multihost-num-processes", type=int, default=0)
    p.add_argument("--multihost-process-id", type=int, default=-1)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    if args.multihost_coordinator is not None and args.auto_restart > 0:
        raise ValueError(
            "--auto-restart is unsupported with --multihost-*: an in-process "
            "restart cannot re-rendezvous the distributed process set; "
            "relaunch every process with --continue-from instead"
        )
    if args.multihost_coordinator is not None:
        from sow_tpu.parallel import multihost

        # must precede every other jax call (backend init is one-shot)
        multihost.initialize(
            args.multihost_coordinator,
            args.multihost_num_processes,
            args.multihost_process_id,
        )
    attempts = max(args.auto_restart, 0)
    while True:
        try:
            return _run(args)
        except KeyboardInterrupt:
            raise
        except Exception as e:
            if attempts <= 0 or not args.save_dir:
                raise
            attempts -= 1
            print(f"[auto-restart] {type(e).__name__}: {e} — resuming from "
                  f"{args.save_dir} ({attempts} retries left)")
            args.continue_from = args.save_dir


def _try_restore(trainer, ckpt: str, use_pp: bool, multi: bool) -> dict:
    """Restore params + optimizer state from one checkpoint dir.

    Commits to the trainer only after EVERY piece has loaded, so a failure
    partway (truncated file, transfer corruption) leaves the trainer
    untouched for the next-older fallback candidate.
    """
    if use_pp:
        # params AND moments persist in the standard layout (interop
        # with the non-pipelined trainer both directions)
        std, state = restore_params(trainer.standard_params, ckpt)
        opt = restore_opt_state(trainer.standard_opt_state, ckpt)
        trainer.load_standard(std)
        trainer.load_standard_opt_state(opt)
    else:
        params, state = restore_params(trainer.params, ckpt)
        params = trainer._device_put_params(params)
        # the optimizer's param-group labels and sharding trees must be
        # built from the RESTORED structure (acc buffers exist after the
        # first fold; the fresh template has acc_down=None holes), so
        # commit params first — rolled back below if the rest fails
        old_params = trainer.params
        trainer.params = params
        try:
            trainer._build_optimizer()
            # jitted + sharded init (same as Trainer.__init__): an
            # unjitted init would materialize full optimizer state
            # replicated on every device at the restore-time memory peak.
            opt_sh = trainer._opt_shardings(params)
            fresh = jax.jit(trainer.opt.init, out_shardings=opt_sh)(params)
            if multi:
                # multihost: restored host leaves cannot be device_put onto
                # a sharding spanning non-addressable devices; re-place each
                # file-matched leaf shard-wise instead (every process reads
                # the same file and uploads only its addressable shards).
                from sow_tpu.checkpoint import restore_opt_state_sharded

                trainer.opt_state = restore_opt_state_sharded(fresh, ckpt, opt_sh)
            else:
                trainer.opt_state = jax.device_put(
                    restore_opt_state(fresh, ckpt), opt_sh
                )
        except Exception:
            # leave the trainer self-consistent for the next-older candidate
            trainer.params = old_params
            trainer._build_optimizer()
            raise
    trainer.update_step = state["update_step"]
    trainer.tokens_seen = state.get("tokens_seen", 0)
    return state


def _run(args):
    cfg_kwargs = {f.name: getattr(args, f.name) for f in dataclasses.fields(TrainConfig)}
    cfg = TrainConfig(**cfg_kwargs)

    use_pp = cfg.mesh_stage > 1
    if use_pp:
        from sow_tpu.parallel.pipeline import PipelineTrainer

        trainer = PipelineTrainer(cfg, n_stages=cfg.mesh_stage)
    else:
        trainer = Trainer(cfg)
    print(f"devices: {jax.devices()}")
    print(f"mesh: {trainer.mesh.shape}")
    print(format_memory_report(trainer.params, trainer.opt_state))

    multi = jax.process_count() > 1

    start_step = 0
    if args.continue_from:
        # newest-first over COMPLETE dirs only, falling back on restore
        # failure — the round-4 resetsched arm died 27 times in a row
        # retrying one partial dir while an intact checkpoint sat beside it.
        for ckpt in complete_checkpoints(args.continue_from):
            try:
                state = _try_restore(trainer, ckpt, use_pp, multi)
            except Exception as e:  # noqa: BLE001 — any broken ckpt falls back
                print(f"[resume-fallback] restore from {ckpt} failed "
                      f"({type(e).__name__}: {e}); trying next-newest")
                continue
            start_step = state["update_step"]
            print(f"resumed from {ckpt} at step {start_step}")
            break

    def stream(split: str, batch_size: int, seed: int):
        if args.data_dir:
            from sow_tpu.data.local_text import load_local_tokenizer, local_text_batches

            tok = load_local_tokenizer(args.tokenizer_path)
            if tok.vocab_size > trainer.model_cfg.vocab_size:
                # OOB token ids silently gather garbage embeddings (NaN loss)
                raise ValueError(
                    f"tokenizer vocab {tok.vocab_size} exceeds model vocab "
                    f"{trainer.model_cfg.vocab_size}"
                )
            return local_text_batches(
                tok,
                args.data_dir.split(","),
                split=split, batch_size=batch_size,
                max_length=cfg.max_length, seed=seed,
                cache_dir=args.token_cache_dir,
            )
        return make_pretrain_stream(
            batch_size, cfg.max_length, trainer.model_cfg.vocab_size,
            seed=seed, synthetic=args.synthetic_data, split=split,
        )

    prim = not multi or jax.process_index() == 0
    if multi and args.prefetch < 1:
        raise ValueError("--multihost-* requires --prefetch >= 1 (the "
                         "prefetcher owns the per-process shard upload)")

    from sow_tpu.utils.heartbeat import Heartbeat

    # liveness beats during saves/evals/compiles so the external watchdog
    # (benchmarks/watchdog_run.sh) can tell a long legitimate pause from a
    # wedged tunnel — see utils/heartbeat.py for the round-4 postmortem
    hb = Heartbeat((args.metrics_path + ".hb") if (args.metrics_path and prim) else None)

    def do_save(step):
        with hb.scope(f"save@{step}"):
            save_params = trainer.standard_params if use_pp else trainer.params
            save_opt = trainer.standard_opt_state if use_pp else trainer.opt_state
            if multi:
                from sow_tpu.parallel import multihost

                # collective: every process gathers, only process 0 writes
                save_params = multihost.gather_to_host(save_params)
                save_opt = multihost.gather_to_host(save_opt)
                if not prim:
                    return
            save_checkpoint(
                args.save_dir, step, save_params, save_opt,
                config=dataclasses.asdict(cfg), tokens_seen=trainer.tokens_seen,
            )

    data = stream("train", cfg.batch_size * cfg.gradient_accumulation, cfg.seed)
    K = args.steps_per_dispatch
    if K > 1:
        # multi-step dispatch (Trainer.step_many): chunk boundaries must
        # land exactly on every logging/save/eval/accumulation step, so K
        # must divide all of their cadences (and the step budget)
        cadences = {"logging-steps": args.logging_steps}
        if args.save_dir:
            cadences["save-every"] = args.save_every
        if args.eval_every:
            cadences["eval-every"] = args.eval_every
        if cfg.architecture == "sow" and cfg.sow_accumulation > 0:
            cadences["sow-accumulation"] = cfg.sow_accumulation
        cadences["num-training-steps"] = cfg.num_training_steps
        for name, val in cadences.items():
            if val % K:
                raise ValueError(
                    f"--steps-per-dispatch {K} must divide --{name} ({val})"
                )
        if use_pp:
            raise ValueError("--steps-per-dispatch > 1 is not supported with "
                             "pipeline parallelism")

        def chunked(it, k):
            while True:
                bs = [next(it) for _ in range(k)]
                yield {
                    "input_ids": np.stack([b["input_ids"] for b in bs]),
                    "attention_mask": np.stack([b["attention_mask"] for b in bs]),
                }

        data = chunked(data, K)

    if args.prefetch > 0:
        from sow_tpu.data.prefetch import Prefetcher
        from sow_tpu.parallel.mesh import stacked_token_sharding, token_sharding

        if use_pp:
            sharding = None
        else:
            sharding = (stacked_token_sharding(trainer.mesh) if K > 1
                        else token_sharding(trainer.mesh))
        data = Prefetcher(data, depth=args.prefetch, shardings=sharding,
                          verify_transfers=args.verify_transfers)

    from sow_tpu.utils.logging import MetricsLogger, device_memory_stats, profile_trace

    logger = MetricsLogger(args.metrics_path, args.wandb_project, dataclasses.asdict(cfg))
    t_log = time.perf_counter()
    tokens_at_log = trainer.tokens_seen
    profiling = False
    for it in range(start_step, cfg.num_training_steps, K):
        batch = next(data)
        step_next = trainer.update_step + 1
        if args.profile_dir and step_next <= 10 < step_next + K and not profiling:
            import jax.profiler as _prof

            os.makedirs(args.profile_dir, exist_ok=True)
            _prof.start_trace(args.profile_dir)
            profiling = True
        step_fn = trainer.step_many if K > 1 else trainer.step
        # (re)compile boundaries: the first dispatch after (re)start, and
        # the dispatch after a SoW fold (virtual_rank growth changes the
        # jitted shapes). Measured 13-14 min cold on this host — beat the
        # heartbeat through them so the watchdog doesn't misread a compile
        # as a hang.
        fold_before = (
            cfg.architecture in ("sow",) and cfg.sow_accumulation > 0
            and step_next > 1 and (step_next - 1) % cfg.sow_accumulation == 0
        )
        compile_scope = (
            hb.scope(f"compile@{step_next}") if (it == start_step or fold_before)
            else None
        )
        if compile_scope is not None:
            with compile_scope:
                metrics = step_fn(
                    jnp.asarray(batch["input_ids"]), jnp.asarray(batch["attention_mask"])
                )
        else:
            metrics = step_fn(
                jnp.asarray(batch["input_ids"]), jnp.asarray(batch["attention_mask"])
            )
        step = trainer.update_step
        if args.profile_dir and profiling and step >= 15:
            import jax.profiler as _prof

            _prof.stop_trace()
            profiling = False
        if step_next <= 10 <= step:
            # optimizer-HBM probe at update 10 (ref simple_train.py:634-641)
            logger.log(step, **{"memory": device_memory_stats()})
            if args.memory_profile:
                import jax.profiler as _prof

                float(metrics["loss"])  # settle enqueued work first
                _prof.save_device_memory_profile(args.memory_profile)
                print(f"device memory profile -> {args.memory_profile}")

        if step % args.logging_steps == 0:
            float(metrics["loss"])  # sync: dispatch is async, so the timing
            # window must close on completed compute, not enqueued work
            dt = time.perf_counter() - t_log
            tps = (trainer.tokens_seen - tokens_at_log) / max(dt, 1e-9)
            if prim:
                print(
                    f"step {step} | loss {float(metrics['loss']):.4f} | "
                    f"grad_norm {float(metrics['grad_norm']):.3f} | {tps:,.0f} tokens/s"
                )
                logger.log(
                    step,
                    loss=metrics["loss"],
                    grad_norm=metrics["grad_norm"],
                    tokens_per_sec=tps,
                    tokens_seen=trainer.tokens_seen,
                )
            t_log, tokens_at_log = time.perf_counter(), trainer.tokens_seen

        if args.save_dir and step % args.save_every == 0:
            do_save(step)

        if args.eval_every and step % args.eval_every == 0:
            eval_data = stream("validation", cfg.batch_size, cfg.seed + 1)
            with hb.scope(f"eval@{step}"):
                out = trainer.evaluate(eval_data, max_tokens=args.eval_tokens)
            if prim:
                print(f"eval @ {step}: loss {out['eval_loss']:.4f} ppl {out['perplexity']:.2f}")
                logger.log(step, eval_loss=out["eval_loss"], perplexity=out["perplexity"])

    if args.save_dir:
        do_save(trainer.update_step)
    final = {"final_step": trainer.update_step, "tokens_seen": trainer.tokens_seen}
    if args.eval_every and trainer.update_step % args.eval_every != 0:
        # the 25k-step flagship (readme.md:6-25) ends off the eval cadence;
        # always record a final held-out perplexity for the results table
        with hb.scope(f"eval@{trainer.update_step}"):
            out = trainer.evaluate(
                stream("validation", cfg.batch_size, cfg.seed + 1),
                max_tokens=args.eval_tokens,
            )
        if prim:
            logger.log(trainer.update_step, eval_loss=out["eval_loss"],
                       perplexity=out["perplexity"])
        final.update(final_eval_loss=out["eval_loss"],
                     final_perplexity=out["perplexity"])
    print(json.dumps(final))


if __name__ == "__main__":
    main()

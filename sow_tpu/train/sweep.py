"""Hyperparameter sweeps — the W8 orchestration layer.

The reference fans out ``torchrun`` subprocesses over a GPU worker pool
draining a queue of hyperparameter combos (``launch_sweep.py:34-70``,
product of ranks x accumulations x lrs x sow_lrs :45-52). On TPU a single
SPMD process owns the whole mesh, so the sweep is a queue of in-process runs
(one compiled program at a time); results land in a JSONL file instead of
wandb.
"""

from __future__ import annotations

import dataclasses
import itertools
import json
import os
import time
from typing import Any, Callable, Iterable, Optional

import jax

from sow_tpu.train.trainer import TrainConfig, Trainer


def grid(**axes: Iterable[Any]) -> list[dict[str, Any]]:
    """Cartesian product of named axes (ref ``launch_sweep.py:45-52``)."""
    names = list(axes)
    return [dict(zip(names, combo)) for combo in itertools.product(*axes.values())]


def random_search(n_trials: int, seed: int = 0, **axes) -> list[dict[str, Any]]:
    """Random sampling over axes — the stochastic-search counterpart of the
    reference's wandb bayes sweep (``glue_sweep.py:7-16``). An axis may be a
    list (uniform choice) or a ``(low, high)`` tuple (log-uniform float)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    combos = []
    for _ in range(n_trials):
        combo = {}
        for name, spec in axes.items():
            if isinstance(spec, tuple) and len(spec) == 2 and all(
                isinstance(v, float) for v in spec
            ):
                lo, hi = np.log(spec[0]), np.log(spec[1])
                combo[name] = float(np.exp(rng.uniform(lo, hi)))
            else:
                combo[name] = spec[int(rng.integers(len(spec)))]
        combos.append(combo)
    return combos


class TPESearch:
    """Tree-structured Parzen Estimator over the sweep axes — the
    model-based counterpart of the reference's wandb **bayes** sweep
    (``glue_sweep.py:7-16``: bayes over lr/sow_lr/rank/accumulation).

    Axes use the same spec language as ``random_search``: a list is a
    categorical choice, a ``(low, high)`` float tuple is log-uniform. After
    ``n_startup`` random trials, observations split into the best ``gamma``
    fraction ("good") and the rest ("bad"); candidates are drawn from a
    Parzen density fit to the good set and ranked by the density ratio
    l(x)/g(x) (Bergstra et al. 2011), jointly across axes.
    """

    def __init__(
        self,
        axes: dict[str, Any],
        seed: int = 0,
        gamma: float = 0.25,
        n_candidates: int = 24,
        n_startup: int = 5,
    ):
        import numpy as np

        self.axes = dict(axes)
        self.rng = np.random.default_rng(seed)
        self.gamma = gamma
        self.n_candidates = n_candidates
        self.n_startup = n_startup
        self.history: list[tuple[dict, float]] = []

    # -- spec helpers --------------------------------------------------------
    def _is_log_range(self, spec) -> bool:
        return (
            isinstance(spec, tuple)
            and len(spec) == 2
            and all(isinstance(v, float) for v in spec)
        )

    def _sample_prior(self, spec):
        import numpy as np

        if self._is_log_range(spec):
            lo, hi = np.log(spec[0]), np.log(spec[1])
            # clamp in the value domain: exp(log(x)) can overshoot by 1 ulp
            return float(min(max(np.exp(self.rng.uniform(lo, hi)), spec[0]), spec[1]))
        return spec[int(self.rng.integers(len(spec)))]

    # -- Parzen pieces -------------------------------------------------------
    def _numeric_kde(self, values, spec):
        """Gaussian KDE in log-space, mixed with the uniform prior (one
        prior pseudo-observation, per the original TPE construction) so the
        good-model never collapses onto early lucky points."""
        import numpy as np

        lo, hi = np.log(spec[0]), np.log(spec[1])
        pts = np.log(np.asarray(values, float))
        bw = max(pts.std() * (len(pts) ** -0.2) if len(pts) > 1 else 0.0,
                 (hi - lo) / 20.0)
        prior_w = 1.0 / (len(pts) + 1)

        def sample():
            if self.rng.random() < prior_w:
                x = np.exp(self.rng.uniform(lo, hi))
            else:
                c = pts[int(self.rng.integers(len(pts)))]
                x = np.exp(np.clip(self.rng.normal(c, bw), lo, hi))
            return float(min(max(x, spec[0]), spec[1]))

        def density(x):
            z = (np.log(x) - pts) / bw
            kde = np.mean(np.exp(-0.5 * z * z)) / (bw * np.sqrt(2 * np.pi))
            return float(prior_w / (hi - lo) + (1 - prior_w) * kde + 1e-12)

        return sample, density

    def _categorical_pmf(self, values, spec):
        import numpy as np

        counts = np.ones(len(spec), float)  # +1 smoothing prior
        index = {self._key(v): i for i, v in enumerate(spec)}
        for v in values:
            counts[index[self._key(v)]] += 1.0
        probs = counts / counts.sum()

        def sample():
            return spec[int(self.rng.choice(len(spec), p=probs))]

        def density(x):
            return float(probs[index[self._key(x)]])

        return sample, density

    @staticmethod
    def _key(v):
        return repr(v)

    # -- public API -----------------------------------------------------------
    def propose(self) -> dict[str, Any]:
        import numpy as np

        if len(self.history) < self.n_startup:
            return {k: self._sample_prior(spec) for k, spec in self.axes.items()}

        ordered = sorted(self.history, key=lambda t: t[1])
        n_good = max(1, int(np.ceil(self.gamma * len(ordered))))
        good = [c for c, _ in ordered[:n_good]]
        bad = [c for c, _ in ordered[n_good:]] or good

        models = {}
        for name, spec in self.axes.items():
            gv = [c[name] for c in good]
            bv = [c[name] for c in bad]
            if self._is_log_range(spec):
                models[name] = (self._numeric_kde(gv, spec), self._numeric_kde(bv, spec))
            else:
                models[name] = (
                    self._categorical_pmf(gv, spec),
                    self._categorical_pmf(bv, spec),
                )

        best_combo, best_score = None, -np.inf
        for _ in range(self.n_candidates):
            combo, score = {}, 0.0
            for name, ((g_sample, g_density), (_, b_density)) in models.items():
                x = g_sample()
                combo[name] = x
                score += np.log(g_density(x)) - np.log(b_density(x))
            if score > best_score:
                best_combo, best_score = combo, score
        return best_combo

    def observe(self, combo: dict[str, Any], loss: float) -> None:
        self.history.append((dict(combo), float(loss)))


def run_adaptive_sweep(
    base: TrainConfig,
    strategy,
    n_trials: int,
    steps_per_run: int,
    data_factory: Callable[[TrainConfig], Iterable[dict]],
    out_path: str = "sweep_results.jsonl",
) -> list[dict]:
    """Sequential sweep driven by a propose/observe strategy (``TPESearch``):
    each trial's final loss feeds the model that proposes the next combo."""
    results = []
    for i in range(n_trials):
        combo = strategy.propose()
        r = run_sweep(base, [combo], steps_per_run, data_factory, out_path)[0]
        r["run"] = i
        strategy.observe(combo, r["final_loss"])
        results.append(r)
    return results


def run_sweep(
    base: TrainConfig,
    combos: list[dict[str, Any]],
    steps_per_run: int,
    data_factory: Callable[[TrainConfig], Iterable[dict]],
    out_path: str = "sweep_results.jsonl",
    eval_batches: Optional[Callable[[TrainConfig], Iterable[dict]]] = None,
    eval_tokens: int = 100_000,
) -> list[dict]:
    """Run each combo for ``steps_per_run`` update steps; append one JSON
    line per run with final train loss (and eval loss if a factory given)."""
    results = []
    for i, combo in enumerate(combos):
        cfg = dataclasses.replace(base, **combo)
        trainer = Trainer(cfg)
        data = iter(data_factory(cfg))
        t0 = time.perf_counter()
        last_loss = None
        import jax.numpy as jnp

        for _ in range(steps_per_run):
            batch = next(data)
            m = trainer.step(jnp.asarray(batch["input_ids"]))
            last_loss = m["loss"]
        record = {
            "run": i,
            "combo": combo,
            "final_loss": float(last_loss) if last_loss is not None else None,
            "steps": steps_per_run,
            "seconds": round(time.perf_counter() - t0, 2),
            "tokens_seen": trainer.tokens_seen,
        }
        if eval_batches is not None:
            record["eval"] = trainer.evaluate(iter(eval_batches(cfg)), max_tokens=eval_tokens)
        results.append(record)
        with open(out_path, "a") as f:
            f.write(json.dumps(record) + "\n")
    return results


def run_glue_sweep(
    combos_or_strategy,
    n_trials: int,
    steps_per_run: int,
    out_path: str = "sweep_results.jsonl",
    model_name: str = "roberta-test",
    task: str = "cola",
    batch_size: int = 16,
    max_length: int = 64,
    seed: int = 0,
    data: str = "synthetic",
    tokenizer_path: str | None = None,
    roots=None,
    base_checkpoint: str | None = None,
    base_arch: str = "sow",
    base_rank: int = 50,
    eval_batches: int = 4,
) -> list[dict]:
    """Sweep the GLUE finetune workload over the reference bayes-sweep's 4-D
    box (lr / sow_lr / rank / accumulation — ``glue_sweep.py:7-16``), on the
    offline synthetic-separable GLUE batches (``glue.main --synthetic-data``).

    ``combos_or_strategy`` is either a list of combos (grid / random) or a
    propose/observe strategy (``TPESearch``). Axis names match the pretrain
    sweep (``sow_accumulation`` maps to ``GlueConfig.accumulation_steps``,
    ``lr`` to ``learning_rate``)."""
    import jax.numpy as jnp
    import numpy as np

    from sow_tpu.train.glue import (
        GlueConfig,
        build_llama_glue_trainer,
        build_roberta_glue_trainer,
    )

    if model_name.startswith("llama"):
        from sow_tpu.models import get_config

        model_cfg = get_config(model_name)
        build = build_llama_glue_trainer
    else:
        from sow_tpu.models import roberta as roberta_lib

        model_cfg = roberta_lib.ROBERTA_CONFIGS[model_name]
        build = build_roberta_glue_trainer

    base_params = None
    if base_checkpoint is not None:
        # locally-pretrained base (e.g. the flagship 60m) — the move that
        # turns the sweep objective non-degenerate: with a trained trunk,
        # trials separate on real data where random-init could not
        if not model_name.startswith("llama"):
            # the roberta builder has no params kwarg and
            # load_pretrain_checkpoint assumes a llama config name — fail
            # fast instead of a TypeError deep in the first trial
            raise ValueError(
                "--base-checkpoint requires a llama --glue-model "
                f"(got {model_name!r}); pretrain checkpoints are llama-only"
            )
        from sow_tpu.models.interop import load_pretrain_checkpoint

        base_params, model_cfg = load_pretrain_checkpoint(
            model_name, base_arch, base_checkpoint, rank=base_rank
        )

    if data == "local":
        from sow_tpu.data.local_text import load_local_tokenizer
        from sow_tpu.train.glue import load_local_cls_batches

        tok = load_local_tokenizer(tokenizer_path)

        def batches(n, bseed, split="train"):
            return load_local_cls_batches(
                tok, roots, split, batch_size, max_length,
                seed=bseed, n_batches=n,
            )
    else:
        def batches(n, bseed, split="train"):
            rng = np.random.default_rng(bseed)
            for _ in range(n):
                ids = rng.integers(2, model_cfg.vocab_size, (batch_size, max_length))
                yield {
                    "input_ids": jnp.asarray(ids),
                    "attention_mask": jnp.asarray(np.ones_like(ids)),
                    "labels": jnp.asarray(
                        (ids[:, 0] < model_cfg.vocab_size // 2).astype(np.int64)
                    ),
                }

    def trial(i, combo):
        cfg = GlueConfig(
            task=task,
            batch_size=batch_size,
            max_length=max_length,
            num_training_steps=steps_per_run,
            seed=seed,
            rank=int(combo.get("rank", 8)),
            accumulation_steps=int(combo.get("sow_accumulation", 1000)),
            learning_rate=float(combo.get("lr", 5e-5)),
            sow_lr=float(combo.get("sow_lr", 1.2e-4)),
        )
        # REAL buffer copy, not identity tree_map: the GLUE trainer's jitted
        # step donates its param buffers, so an aliased copy hands trial 2
        # the trial-1-deleted arrays ("Array has been deleted" — bit the
        # first on-chip TPE sweep on its second trial)
        params_copy = (
            jax.tree_util.tree_map(jnp.copy, base_params)
            if base_params is not None else None
        )
        if params_copy is not None:
            trainer = build(cfg, model_cfg, params=params_copy)
        else:
            trainer = build(cfg, model_cfg)
        t0 = time.perf_counter()
        last = None
        for b in batches(steps_per_run, cfg.seed):
            last = trainer.step(b["input_ids"], b["attention_mask"], b["labels"])
        record = {
            "run": i,
            "combo": combo,
            "final_loss": float(last),
            "steps": steps_per_run,
            "seconds": round(time.perf_counter() - t0, 2),
            "eval": {
                k: float(v) for k, v in trainer.evaluate(
                    batches(eval_batches, seed + 10_000, split="validation")
                ).items()
            },
        }
        record["objective"] = objective(record)
        with open(out_path, "a") as f:
            f.write(json.dumps(record) + "\n")
        return record

    def objective(r):
        # TPE minimizes. Real-data sweeps optimize the EVAL metric (the
        # reference bayes sweep's target, glue_sweep.py:13-15); synthetic
        # smoke keeps the train-loss objective.
        ev = r["eval"]
        if data == "local":
            for k in ("matthews_correlation", "accuracy"):
                if k in ev:
                    return 1.0 - ev[k]
        return r["final_loss"]

    results = []
    if hasattr(combos_or_strategy, "propose"):
        for i in range(n_trials):
            combo = combos_or_strategy.propose()
            r = trial(i, combo)
            # observe the stamped objective (eval metric for real data) so
            # TPE and downstream best-trial selection agree on one target
            combos_or_strategy.observe(combo, r["objective"])
            results.append(r)
    else:
        for i, combo in enumerate(combos_or_strategy):
            results.append(trial(i, combo))
    return results


def main(argv=None):
    """Sweep CLI — the in-process counterpart of the reference's GPU-pool
    fan-out (``launch_sweep.py:45-70``: product of ranks x accumulations x
    lrs x sow_lrs):

        python -m sow_tpu.train.sweep --model llama_9m --ranks 16 32 \
            --sow-lrs 1e-3 3e-3 --steps-per-run 50 --synthetic-data

    With ``--random-trials N`` the grid axes become sampling domains
    (lists = uniform choice; two floats = log-uniform range), standing in
    for the reference's wandb bayes sweep (``glue_sweep.py:7-16``)."""
    import argparse

    from sow_tpu.data.c4 import make_pretrain_stream
    from sow_tpu.models import get_config

    p = argparse.ArgumentParser(description="SoW hyperparameter sweep")
    p.add_argument("--model", type=str, default="llama_9m")
    p.add_argument("--architecture", type=str, default="sow")
    p.add_argument("--ranks", type=int, nargs="+", default=[16, 32])
    p.add_argument("--accumulations", type=int, nargs="+", default=[1000])
    p.add_argument("--lrs", type=float, nargs="+", default=[1e-2])
    p.add_argument("--sow-lrs", type=float, nargs="+", default=[1e-3])
    p.add_argument("--steps-per-run", type=int, default=100)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--max-length", type=int, default=64)
    p.add_argument("--random-trials", type=int, default=0,
                   help="sample N combos from the axes instead of the grid")
    p.add_argument("--tpe-trials", type=int, default=0,
                   help="model-based sequential search: N TPE trials over "
                        "the axes (the reference's wandb bayes sweep, "
                        "glue_sweep.py:7-16)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--synthetic-data", action="store_true", default=False)
    p.add_argument("--out", type=str, default="sweep_results.jsonl")
    p.add_argument("--workload", type=str, default="pretrain",
                   choices=("pretrain", "glue"),
                   help="glue = sweep the finetune workload (the reference's "
                        "glue_sweep.py target) on offline synthetic batches")
    p.add_argument("--glue-model", type=str, default="roberta-test")
    p.add_argument("--task", type=str, default="cola")
    p.add_argument("--glue-data", type=str, default="synthetic",
                   choices=("synthetic", "local"),
                   help="local = the real-text pysrc classification task "
                        "over --data-dir through --tokenizer-path (egress-"
                        "free GLUE stand-in with a non-degenerate objective)")
    p.add_argument("--tokenizer-path", type=str, default=None)
    p.add_argument("--data-dir", type=str, default=None,
                   help="comma-separated corpus roots for --glue-data local")
    p.add_argument("--base-checkpoint", type=str, default=None,
                   help="pretrain checkpoint dir to init the llama trunk "
                        "from (e.g. the flagship 60m)")
    p.add_argument("--base-arch", type=str, default="sow",
                   choices=("linear", "sow"))
    p.add_argument("--base-rank", type=int, default=50)
    p.add_argument("--eval-batches", type=int, default=4)
    args = p.parse_args(argv)

    axes = dict(
        rank=args.ranks, sow_accumulation=args.accumulations,
        lr=args.lrs, sow_lr=args.sow_lrs,
    )
    if args.random_trials > 0 or args.tpe_trials > 0:
        # lists of >1 float become continuous log-uniform sampling domains
        axes["lr"] = (
            (min(args.lrs), max(args.lrs)) if len(args.lrs) > 1 else args.lrs
        )
        axes["sow_lr"] = (
            (min(args.sow_lrs), max(args.sow_lrs))
            if len(args.sow_lrs) > 1 else args.sow_lrs
        )

    if args.workload == "glue":
        if args.tpe_trials > 0:
            driver = TPESearch(axes, seed=args.seed)
            n = args.tpe_trials
        elif args.random_trials > 0:
            driver = random_search(args.random_trials, seed=args.seed, **axes)
            n = args.random_trials
        else:
            driver = grid(**axes)
            n = len(driver)
        results = run_glue_sweep(
            driver, n, args.steps_per_run, args.out,
            model_name=args.glue_model, task=args.task,
            batch_size=args.batch_size, max_length=args.max_length,
            seed=args.seed, data=args.glue_data,
            tokenizer_path=args.tokenizer_path,
            roots=args.data_dir.split(",") if args.data_dir else None,
            base_checkpoint=args.base_checkpoint, base_arch=args.base_arch,
            base_rank=args.base_rank, eval_batches=args.eval_batches,
        )
        # select via the same objective TPE observed (eval metric on real
        # data), not train loss — the two can disagree
        best = min(results, key=lambda r: r.get("objective", r["final_loss"]))
        print(json.dumps({"runs": len(results), "best": best}))
        return

    base = TrainConfig(
        model=args.model, architecture=args.architecture,
        batch_size=args.batch_size, max_length=args.max_length,
        num_training_steps=args.steps_per_run, seed=args.seed,
    )
    vocab = get_config(args.model).vocab_size

    def data_factory(cfg):
        return make_pretrain_stream(
            cfg.batch_size, cfg.max_length, vocab,
            seed=cfg.seed, synthetic=args.synthetic_data,
        )

    if args.tpe_trials > 0:
        strategy = TPESearch(axes, seed=args.seed)
        results = run_adaptive_sweep(
            base, strategy, args.tpe_trials, args.steps_per_run, data_factory, args.out
        )
    else:
        if args.random_trials > 0:
            combos = random_search(args.random_trials, seed=args.seed, **axes)
        else:
            combos = grid(**axes)
        results = run_sweep(base, combos, args.steps_per_run, data_factory, args.out)
    best = min(results, key=lambda r: r["final_loss"])
    print(json.dumps({"runs": len(results), "best": best}))


if __name__ == "__main__":
    main()

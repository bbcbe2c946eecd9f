"""Commonsense instruction finetuning — the W3 workload (ref ``finetune.py``).

LLM-Adapters-style alpaca prompts, LLaMA with SoW adapters on the finetune
target set (q/k/v/up/down — ``finetune.py:292-298`` excludes o_proj and
gate_proj), completion-masked LM loss, and the SoWTrainer accumulation
schedule (``finetune.py:39-77``): every ``accumulation_steps`` update steps,
accumulate + ``scale = 1/rank`` + SoW optimizer-group reset.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sow_tpu.models import llama as llama_lib
from sow_tpu.nn import SoWConfig, prepare_sow
from sow_tpu.train.glue import GlueConfig, GlueTrainer

PROMPT_WITH_INPUT = (
    "Below is an instruction that describes a task, paired with an input that "
    "provides further context. Write a response that appropriately completes "
    "the request.\n\n### Instruction:\n{instruction}\n\n### Input:\n{input}"
    "\n\n### Response:\n"
)
PROMPT_NO_INPUT = (
    "Below is an instruction that describes a task. Write a response that "
    "appropriately completes the request.\n\n### Instruction:\n{instruction}"
    "\n\n### Response:\n"
)


def generate_prompt(example: dict, include_output: bool = True) -> str:
    """Alpaca template (ref ``finetune.py:499-519``; whitespace normalized —
    the reference's indented f-strings embed source indentation)."""
    if example.get("input"):
        p = PROMPT_WITH_INPUT.format(**example)
    else:
        p = PROMPT_NO_INPUT.format(instruction=example["instruction"])
    if include_output and "output" in example:
        p = p + example["output"]
    return p


def tokenize_example(
    tokenizer, example: dict, cutoff_len: int = 256, train_on_inputs: bool = False
) -> dict:
    """Tokenize prompt+output; labels mask the prompt part unless
    ``train_on_inputs`` (ref ``finetune.py:224-263``)."""
    full = generate_prompt(example, include_output=True)
    ids = tokenizer(full, truncation=True, max_length=cutoff_len)["input_ids"]
    if ids and tokenizer.eos_token_id is not None and ids[-1] != tokenizer.eos_token_id:
        ids = (ids + [tokenizer.eos_token_id])[:cutoff_len]
    labels = list(ids)
    if not train_on_inputs:
        prompt_ids = tokenizer(
            generate_prompt(example, include_output=False),
            truncation=True,
            max_length=cutoff_len,
        )["input_ids"]
        for i in range(min(len(prompt_ids), len(labels))):
            labels[i] = -100
    return {"input_ids": ids, "labels": labels}


def collate(batch: list[dict], pad_id: int, max_len: int) -> dict:
    ids = np.full((len(batch), max_len), pad_id, np.int32)
    labels = np.full((len(batch), max_len), -100, np.int32)
    mask = np.zeros((len(batch), max_len), np.int32)
    for i, ex in enumerate(batch):
        n = min(len(ex["input_ids"]), max_len)
        ids[i, :n] = ex["input_ids"][:n]
        labels[i, :n] = ex["labels"][:n]
        mask[i, :n] = 1
    return {"input_ids": ids, "labels": labels, "attention_mask": mask}


@dataclasses.dataclass
class CommonsenseConfig:
    rank: int = 8
    n_iter: int = 1
    learning_rate: float = 2e-5
    sow_lr: float = 1.2e-4
    accumulation_steps: int = 200
    cutoff_len: int = 256
    batch_size: int = 16
    num_training_steps: int = 10_000
    mode: str = "keep"
    seed: int = 42
    dtype: str = "float32"
    # Adapter choice (ref finetune.py:264-291): "sow" (default), "lora"
    # (peft-style frozen-base LoRA: W + alpha/r * A@B, B zero-init, no
    # accumulation events), "prefix-tuning" (trainable per-layer KV
    # prefixes, no weight surgery at all).
    adapter: str = "sow"
    lora_alpha: float = 16.0
    num_virtual_tokens: int = 30
    # int8 frozen base (keep mode) — the 8-bit base-model option
    # (ref finetune.py:196-199); see nn/quant.py
    quantize_base: bool = False


def build_commonsense_trainer(
    cfg: CommonsenseConfig,
    model_cfg: llama_lib.LlamaConfig,
    params: Optional[Any] = None,
    key: Optional[jax.Array] = None,
) -> GlueTrainer:
    """LLaMA instruction-finetune trainer reusing the grouped finetune core.

    ``params``: pretrained LLaMA tree (or None for random init in tests).
    """
    key = key if key is not None else jax.random.PRNGKey(cfg.seed)
    if params is None:
        key, sub = jax.random.split(key)
        params = llama_lib.init_params(sub, model_cfg)

    dtype = jnp.float32 if cfg.dtype == "float32" else jnp.bfloat16
    accumulation_steps = cfg.accumulation_steps
    if cfg.adapter == "prefix-tuning":
        # no weight surgery; trainable per-layer KV prefixes (finetune.py:286-291)
        from sow_tpu.nn.prefix import add_prefix_tuning

        key, sub = jax.random.split(key)
        params = add_prefix_tuning(
            params, model_cfg, cfg.num_virtual_tokens, sub, dtype=dtype
        )
        accumulation_steps = 0
    elif cfg.adapter in ("sow", "lora"):
        lora = cfg.adapter == "lora"
        sow_cfg = SoWConfig(
            target_modules=llama_lib.LLAMA_FINETUNE_TARGET_MODULES,
            rank=cfg.rank,
            n_iter=cfg.n_iter,
            decompose=cfg.mode,
            # peft LoRA: y = x@W + (alpha/r) x@A@B with B=0 at init and no
            # accumulation — the SoW layer degenerates to exactly that.
            scale=(cfg.lora_alpha / cfg.rank) if lora else 1.0,
            zero_up=lora,
            quantize_base=cfg.quantize_base,
            dtype=dtype,
        )
        key, sub = jax.random.split(key)
        params = prepare_sow(params, sow_cfg, sub)
        if lora:
            accumulation_steps = 0
    else:
        raise ValueError(f"unknown adapter {cfg.adapter!r}")

    def forward_fn(p, ids, mask):
        return llama_lib.forward(p, ids, model_cfg, mask)

    def loss_fn(logits, labels):
        return llama_lib.causal_lm_loss(logits, labels)

    gcfg = GlueConfig(
        task="commonsense",
        learning_rate=cfg.learning_rate,
        sow_lr=cfg.sow_lr,
        rank=cfg.rank,
        n_iter=cfg.n_iter,
        mode=cfg.mode,
        accumulation_steps=accumulation_steps,
        num_training_steps=cfg.num_training_steps,
        seed=cfg.seed,
        freeze_base=True,
        dtype=cfg.dtype,
    )
    return GlueTrainer(gcfg, params, forward_fn, loss_fn=loss_fn)


def main(argv=None):
    """Commonsense instruction-finetune CLI (ref readme.md:68-84):
    ``python -m sow_tpu.train.commonsense --base-model llama_7b \
        --data-path dataset/ARC-Easy/train.json --output-dir out ...``"""
    import argparse
    import dataclasses as dc
    import json

    from sow_tpu.checkpoint import save_checkpoint
    from sow_tpu.models.configs import get_config

    p = argparse.ArgumentParser()
    for f in dc.fields(CommonsenseConfig):
        flag = f"--{f.name.replace('_', '-')}"
        if isinstance(f.default, bool):
            p.add_argument(flag, action="store_true", default=f.default)
        else:
            p.add_argument(flag, type=type(f.default), default=f.default)
    p.add_argument("--base-model", type=str, default="llama_7b")
    p.add_argument("--hf-checkpoint", type=str, default=None,
                   help="HF llama dir/name to load pretrained weights from")
    p.add_argument("--data-path", type=str, required=True)
    p.add_argument("--output-dir", type=str, default="./trained")
    p.add_argument("--num-epochs", type=int, default=3)
    p.add_argument("--tokenizer", type=str, default=None)
    args = p.parse_args(argv)
    cfg = CommonsenseConfig(**{f.name: getattr(args, f.name) for f in dc.fields(CommonsenseConfig)})

    model_cfg = get_config(args.base_model)
    params = None
    if args.hf_checkpoint:
        from transformers import AutoModelForCausalLM

        hf = AutoModelForCausalLM.from_pretrained(args.hf_checkpoint)
        params = llama_lib.params_from_hf_state_dict(hf.state_dict(), model_cfg)
    trainer = build_commonsense_trainer(cfg, model_cfg, params=params)

    from sow_tpu.data.byte_tokenizer import load_tokenizer_or_byte

    tok = load_tokenizer_or_byte(args.tokenizer or args.hf_checkpoint)
    if tok.pad_token_id is None:
        tok.pad_token = tok.eos_token

    with open(args.data_path) as f:
        records = json.load(f)
    tokenized = [tokenize_example(tok, r, cfg.cutoff_len) for r in records]

    step = 0
    for epoch in range(args.num_epochs):
        for i in range(0, len(tokenized) - cfg.batch_size + 1, cfg.batch_size):
            b = collate(tokenized[i : i + cfg.batch_size], tok.pad_token_id or 0, cfg.cutoff_len)
            loss = trainer.step(
                jnp.asarray(b["input_ids"]), jnp.asarray(b["attention_mask"]), jnp.asarray(b["labels"])
            )
            step += 1
            if step % 50 == 0:
                print(f"epoch {epoch} step {step} loss {loss:.4f}")
    save_checkpoint(args.output_dir, step, trainer.params, config=dc.asdict(cfg))
    print(f"saved to {args.output_dir}")


if __name__ == "__main__":
    main()

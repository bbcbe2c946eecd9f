"""Commonsense generation eval — the W4 harness
(ref ``scripts/commonsense_evaluate.py``).

Batched beam-4 generation over a dataset of ``{"instruction", "answer"}``
records, response split on ``### Response:``, per-dataset regex answer
extraction, running accuracy. Model-loading is the caller's job (build the
SoW LLaMA tree, restore the checkpoint); the harness is model-agnostic over
our param trees.
"""

from __future__ import annotations

import dataclasses
import json
import re
from typing import Callable, Iterable, Optional

import jax.numpy as jnp
import numpy as np

from sow_tpu.eval.generate import beam_generate, greedy_generate, left_pad
from sow_tpu.train.commonsense import generate_prompt

# Per-dataset answer regexes (ref commonsense_evaluate.py:338-369).
ANSWER_PATTERNS = {
    "boolq": r"true|false",
    "piqa": r"solution1|solution2",
    "social_i_qa": r"answer1|answer2|answer3|answer4|answer5",
    "ARC-Challenge": r"answer1|answer2|answer3|answer4|answer5",
    "ARC-Easy": r"answer1|answer2|answer3|answer4|answer5",
    "openbookqa": r"answer1|answer2|answer3|answer4|answer5",
    "hellaswag": r"ending1|ending2|ending3|ending4",
    "winogrande": r"option1|option2",
}


def _dataset_pattern(dataset: str) -> Optional[str]:
    """Answer regex for a dataset name or any path containing one —
    'dataset/ARC-Easy', 'fixtures/arc_easy_test.json' both resolve."""
    exact = ANSWER_PATTERNS.get(dataset.split("/")[-1])
    if exact is not None:
        return exact
    norm = re.sub(r"[^a-z0-9]", "", dataset.lower())
    for name, pattern in ANSWER_PATTERNS.items():
        if re.sub(r"[^a-z0-9]", "", name.lower()) in norm:
            return pattern
    return None


def extract_answer(dataset: str, sentence: str) -> str:
    """First regex match in the generated text, '' if none
    (ref ``commonsense_evaluate.py:338-369``)."""
    pattern = _dataset_pattern(dataset)
    if pattern is None:
        raise KeyError(f"unknown dataset {dataset!r}")
    found = re.findall(pattern, sentence.strip())
    return found[0] if found else ""


def extract_response(text: str) -> str:
    """Text after the last '### Response:' marker
    (ref ``commonsense_evaluate.py:88``)."""
    parts = text.split("### Response:")
    return parts[-1].strip() if len(parts) > 1 else text.strip()


def load_test_records(path: str) -> list[dict]:
    """LLM-Adapters ``test.json`` format: list of {instruction, answer, ...}."""
    with open(path) as f:
        return json.load(f)


@dataclasses.dataclass
class EvalConfig:
    dataset: str = "ARC-Easy"
    batch_size: int = 16
    max_new_tokens: int = 32
    num_beams: int = 4
    # int8 KV cache: halves cache HBM + 1.22x decode throughput measured at
    # cache-bound shapes (llama-1b bs-32 ctx-1k, v5e-1); exact-match tokens
    # on the tiny test model, ~1% logit error bound tested.
    int8_kv_cache: bool = False
    # "batch": fixed batches through greedy/beam generate (the reference's
    # scheme, commonsense_evaluate.py:58-90). "server": continuous batching
    # through eval.serve.GenerationServer — greedy only; ragged prompts and
    # EOS-terminated completions stop paying for batch stragglers.
    engine: str = "batch"
    # batch engine: order records by tokenized prompt length so each batch
    # left-pads to a near-uniform length (fewer pad tokens -> cheaper
    # prefill, fewer distinct compile signatures). Outputs keep dataset
    # order. The reference iterates in dataset order and pays full padding.
    sort_by_length: bool = True
    # multi-chip serving (engine="server"): weights TP/FSDP-sharded over
    # this mesh, KV cache sharded over heads on the `model` axis
    mesh: Optional[object] = None

    @property
    def cache_dtype(self):
        return jnp.int8 if self.int8_kv_cache else None


def _pad_to_bucket(ids, mask, pad_id):
    """Extend left-padding to the next power-of-two length (jit-signature
    bounding; positions come from the mask, so results are unchanged)."""
    t0 = ids.shape[1]
    b = 1
    while b < t0:
        b *= 2
    if b == t0:
        return ids, mask
    ids = np.concatenate(
        [np.full((ids.shape[0], b - t0), pad_id, ids.dtype), ids], axis=1
    )
    mask = np.concatenate(
        [np.zeros((mask.shape[0], b - t0), mask.dtype), mask], axis=1
    )
    return ids, mask


def _server_generate(params, model_cfg, tokenized, cfg: EvalConfig, eos_id):
    """All records through one continuous-batching server; returns generated
    token lists in submission order."""
    from sow_tpu.eval.serve import GenerationServer

    longest = max(len(t) for t in tokenized)
    buckets, b = [], 32
    while b < longest:
        buckets.append(b)
        b *= 2
    buckets.append(b)
    srv = GenerationServer(
        params, model_cfg,
        # beam mode: one request = num_beams pool rows; keep the number of
        # CONCURRENT requests equal to the batch path's batch_size
        max_batch=cfg.batch_size * cfg.num_beams,
        max_len=b + cfg.max_new_tokens, eos_token_id=eos_id,
        cache_dtype=cfg.cache_dtype, prompt_buckets=tuple(buckets),
        mesh=cfg.mesh, num_beams=cfg.num_beams,
    )
    rids = [srv.submit(t, max_new_tokens=cfg.max_new_tokens) for t in tokenized]
    out = srv.run()
    return [out[r] for r in rids]


def evaluate_commonsense(
    params,
    model_cfg,
    tokenizer,
    records: Iterable[dict],
    cfg: EvalConfig,
    decode_fn: Optional[Callable] = None,
) -> dict:
    """Run batched generation over records; returns accuracy + per-example
    outcomes (ref running-accuracy loop, ``commonsense_evaluate.py:108-140``)."""
    records = list(records)
    correct, outputs = 0, []
    pad_id = tokenizer.pad_token_id or 0
    eos_id = tokenizer.eos_token_id

    all_tok = [
        tokenizer(generate_prompt(r, include_output=False))["input_ids"]
        for r in records
    ]

    if cfg.engine == "server" and decode_fn is None:
        # num_beams > 1 runs the server's grouped beam mode — token-identical
        # to beam_generate (the reference's beam-4 eval settings now run
        # through the continuous-batching engine too)
        gens = _server_generate(params, model_cfg, all_tok, cfg, eos_id)
        texts_by_idx = {
            j: tokenizer.decode(gen, skip_special_tokens=True)
            for j, gen in enumerate(gens)
        }
    else:
        order = (
            sorted(range(len(records)), key=lambda i: len(all_tok[i]))
            if cfg.sort_by_length
            else list(range(len(records)))
        )
        texts_by_idx = {}
        for i in range(0, len(order), cfg.batch_size):
            idxs = order[i : i + cfg.batch_size]
            ids, mask = left_pad([all_tok[j] for j in idxs], pad_id)
            # round the padded length up to a power of two: bounds jit
            # signatures at log2(longest) instead of one per distinct
            # batch-max length (length-sorted batches sweep the whole
            # length distribution)
            ids, mask = _pad_to_bucket(ids, mask, pad_id)
            if decode_fn is not None:
                gen = decode_fn(jnp.asarray(ids), jnp.asarray(mask))
            elif cfg.num_beams > 1:
                gen = beam_generate(
                    params, jnp.asarray(ids), jnp.asarray(mask), model_cfg,
                    max_new_tokens=cfg.max_new_tokens, num_beams=cfg.num_beams,
                    eos_token_id=eos_id, cache_dtype=cfg.cache_dtype,
                )
            else:
                gen = greedy_generate(
                    params, jnp.asarray(ids), jnp.asarray(mask), model_cfg,
                    max_new_tokens=cfg.max_new_tokens, eos_token_id=eos_id,
                    cache_dtype=cfg.cache_dtype,
                )
            texts = tokenizer.batch_decode(np.asarray(gen), skip_special_tokens=True)
            for j, text in zip(idxs, texts):
                texts_by_idx[j] = text

    for j, rec in enumerate(records):
        text = texts_by_idx[j]
        pred = extract_answer(cfg.dataset, extract_response("### Response:" + text))
        label = str(rec["answer"]).strip()
        ok = pred == label
        correct += int(ok)
        outputs.append({"prediction": pred, "answer": label, "correct": ok, "raw": text})
    n = len(records)
    return {"accuracy": correct / n if n else 0.0, "n": n, "outputs": outputs}


def main(argv=None):
    """Generation-eval CLI (ref readme.md:86-96):
    ``python -m sow_tpu.eval.commonsense_eval --dataset dataset/ARC-Easy \
        --checkpoint ./trained --base-model llama_7b``"""
    import argparse
    import os

    import jax

    from sow_tpu.checkpoint import latest_checkpoint, restore_params
    from sow_tpu.models.configs import get_config
    from sow_tpu.models import llama as llama_lib
    from sow_tpu.nn import SoWConfig, prepare_sow
    from sow_tpu.train.commonsense import CommonsenseConfig

    p = argparse.ArgumentParser()
    p.add_argument("--dataset", type=str, required=True, help="dir with test.json, or a test.json path")
    p.add_argument("--checkpoint", type=str, required=True)
    p.add_argument("--base-model", type=str, default="llama_7b")
    p.add_argument("--tokenizer", type=str, default="t5-base")
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--num-beams", type=int, default=None,
                   help="default: 4 (the reference's beam width) for "
                        "--engine batch, 1 for --engine server")
    p.add_argument("--max-new-tokens", type=int, default=32)
    p.add_argument("--rank", type=int, default=10)
    p.add_argument("--checkpoint-arch", choices=("finetune", "linear", "sow"),
                   default="finetune",
                   help="checkpoint param template: 'finetune' (default — "
                        "SoW adapters over the finetune target modules, "
                        "decompose='keep'), or a pretrain checkpoint from "
                        "train/pretrain.py ('linear' dense / 'sow' blank-"
                        "factor template, folded to dense for eval)")
    p.add_argument("--int8-kv-cache", action="store_true",
                   help="quantized KV cache: half the cache HBM, faster decode")
    p.add_argument("--engine", choices=("batch", "server"), default="batch",
                   help="server = continuous batching (greedy only)")
    p.add_argument("--dump-outputs", type=str, default=None,
                   help="write per-record predictions/raw generations as "
                        "JSON (the reference saves these too, "
                        "commonsense_evaluate.py:94)")
    # speculative decoding (greedy batch engine): a small same-tokenizer
    # draft model proposes --spec-gamma tokens per target verify forward;
    # output is token-identical to plain greedy (eval/speculative.py)
    p.add_argument("--draft-model", type=str, default=None,
                   help="config name of a draft model enabling speculative decoding")
    p.add_argument("--draft-checkpoint", type=str, default=None)
    p.add_argument("--draft-arch", choices=("linear", "sow"), default="linear",
                   help="template to restore --draft-checkpoint into "
                        "(sow = pretrain-style blank SoW layers, folded after restore)")
    p.add_argument("--spec-gamma", type=int, default=4)
    p.add_argument("--mesh-data", type=int, default=-1,
                   help="-1 absorbs remaining devices (trainer convention)")
    p.add_argument("--mesh-fsdp", type=int, default=1)
    p.add_argument("--mesh-model", type=int, default=1,
                   help="tensor-parallel serving over this many chips (engine=server)")
    args = p.parse_args(argv)

    if args.checkpoint_arch == "finetune":
        model_cfg = get_config(args.base_model)
        params = llama_lib.init_params(jax.random.PRNGKey(0), model_cfg)
        params = prepare_sow(
            params,
            SoWConfig(target_modules=llama_lib.LLAMA_FINETUNE_TARGET_MODULES, rank=args.rank, decompose="keep"),
            jax.random.PRNGKey(1),
        )
        ckpt = latest_checkpoint(args.checkpoint) or args.checkpoint
        params, _ = restore_params(params, ckpt)
    else:
        # pretrain checkpoints ('linear'/'sow') go through the ONE shared
        # loader (models/interop.load_pretrain_checkpoint): template
        # rebuild, restore, SoW fold-to-dense, bf16 cast — keeping dtype
        # semantics identical across this CLI, serving, and the spec/GLUE
        # consumers instead of re-implementing the load here
        from sow_tpu.models.interop import load_pretrain_checkpoint

        params, model_cfg = load_pretrain_checkpoint(
            args.base_model, args.checkpoint_arch, args.checkpoint, rank=args.rank
        )

    # "byte" -> builtin (offline); a ``.json`` path -> local BPE
    # (data/local_text.py, the flagship tokenizer); an explicit HF name must
    # load or RAISE — a silent byte fallback would score the checkpoint with
    # the wrong vocabulary and print a meaningless accuracy
    if args.tokenizer in (None, "byte"):
        from sow_tpu.data.byte_tokenizer import load_tokenizer_or_byte

        tok = load_tokenizer_or_byte("byte")
    elif args.tokenizer.endswith(".json"):
        from sow_tpu.data.local_text import load_local_tokenizer

        tok = load_local_tokenizer(args.tokenizer)
    else:
        from transformers import AutoTokenizer

        tok = AutoTokenizer.from_pretrained(args.tokenizer)
    if tok.pad_token_id is None:
        tok.pad_token = tok.eos_token

    path = args.dataset if args.dataset.endswith(".json") else os.path.join(args.dataset, "test.json")
    records = load_test_records(path)
    mesh = None
    if args.mesh_fsdp * args.mesh_model > 1 or args.mesh_data > 1:
        from sow_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(data=args.mesh_data, fsdp=args.mesh_fsdp, model=args.mesh_model)
    # both engines default to the reference's beam-4 eval settings
    # (commonsense_evaluate.py:79-85); the server runs its grouped beam mode
    num_beams = 4 if args.num_beams is None else args.num_beams
    cfg = EvalConfig(
        dataset=args.dataset, batch_size=args.batch_size,
        max_new_tokens=args.max_new_tokens, num_beams=num_beams,
        int8_kv_cache=args.int8_kv_cache, engine=args.engine, mesh=mesh,
    )

    decode_fn = None
    if args.draft_model is not None:
        if num_beams > 1 or args.engine != "batch":
            p.error("--draft-model requires --engine batch --num-beams 1")
        from sow_tpu.eval.speculative import speculative_generate

        draft_cfg = get_config(args.draft_model)
        if draft_cfg.vocab_size != model_cfg.vocab_size:
            p.error("draft and target must share a tokenizer/vocab")
        draft = llama_lib.init_params(jax.random.PRNGKey(2), draft_cfg)
        if args.draft_arch == "sow":
            draft = prepare_sow(
                draft,
                SoWConfig(target_modules=llama_lib.LLAMA_TARGET_MODULES,
                          rank=args.rank, decompose=None),
                jax.random.PRNGKey(3),
            )
        if args.draft_checkpoint:
            dckpt = latest_checkpoint(args.draft_checkpoint) or args.draft_checkpoint
            draft, _ = restore_params(draft, dckpt)
        if args.draft_arch == "sow":
            draft = llama_lib.merge_sow_to_dense(draft)

        def decode_fn(ids, mask):
            out, _ = speculative_generate(
                params, draft, ids, mask, model_cfg, draft_cfg,
                max_new_tokens=cfg.max_new_tokens, gamma=args.spec_gamma,
                eos_token_id=tok.eos_token_id, cache_dtype=cfg.cache_dtype,
            )
            return out

    out = evaluate_commonsense(params, model_cfg, tok, records, cfg, decode_fn=decode_fn)
    if args.dump_outputs:
        with open(args.dump_outputs, "w") as f:
            json.dump(out["outputs"], f, indent=1)
    print(json.dumps({"accuracy": out["accuracy"], "n": out["n"]}))


if __name__ == "__main__":
    main()

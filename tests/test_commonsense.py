"""Commonsense workload tests: alpaca prompts, tokenization masking,
answer extraction, finetune loop, and the generation-eval harness wired to a
stub tokenizer (no downloads)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sow_tpu.eval.commonsense_eval import (
    EvalConfig,
    evaluate_commonsense,
    extract_answer,
    extract_response,
)
from sow_tpu.models import get_config
from sow_tpu.nn import iter_sow
from sow_tpu.train.commonsense import (
    CommonsenseConfig,
    build_commonsense_trainer,
    collate,
    generate_prompt,
    tokenize_example,
)


class StubTokenizer:
    """Whitespace tokenizer with a tiny fixed vocab (for offline tests)."""

    pad_token_id = 0
    eos_token_id = 1

    def __init__(self, vocab_size=256):
        self.vocab_size = vocab_size

    def _tok(self, text):
        return [2 + (hash(w) % (self.vocab_size - 2)) for w in text.split()]

    def __call__(self, text, truncation=False, max_length=None):
        ids = self._tok(text)
        if truncation and max_length:
            ids = ids[:max_length]
        return {"input_ids": ids}

    def batch_decode(self, arr, skip_special_tokens=True):
        return [" ".join(f"tok{t}" for t in row if t > 1) for row in np.asarray(arr)]

    def decode(self, ids, skip_special_tokens=True):
        return self.batch_decode([list(ids)])[0]


class TestPrompts:
    def test_with_input(self):
        p = generate_prompt({"instruction": "Do X", "input": "ctx", "output": "ans"})
        assert "### Instruction:\nDo X" in p
        assert "### Input:\nctx" in p
        assert p.endswith("### Response:\nans")

    def test_without_input(self):
        p = generate_prompt({"instruction": "Do X", "output": "y"})
        assert "### Input" not in p and p.endswith("y")

    def test_tokenize_masks_prompt(self):
        tok = StubTokenizer()
        ex = tokenize_example(tok, {"instruction": "a b", "input": "", "output": "c d e"})
        n_prompt = len(tok(generate_prompt({"instruction": "a b"}, include_output=False))["input_ids"])
        assert all(l == -100 for l in ex["labels"][:n_prompt])
        assert any(l != -100 for l in ex["labels"][n_prompt:])
        assert ex["input_ids"][-1] == tok.eos_token_id

    def test_collate_shapes(self):
        tok = StubTokenizer()
        exs = [tokenize_example(tok, {"instruction": f"i{i}", "input": "", "output": "o"}) for i in range(3)]
        b = collate(exs, tok.pad_token_id, 32)
        assert b["input_ids"].shape == (3, 32)
        assert (b["labels"][b["attention_mask"] == 0] == -100).all()


class TestExtraction:
    @pytest.mark.parametrize(
        "ds,text,want",
        [
            ("boolq", "the answer is true I think", "true"),
            ("piqa", "solution2 looks right", "solution2"),
            ("ARC-Easy", "it must be answer3", "answer3"),
            ("dataset/ARC-Challenge", "answer1", "answer1"),
            ("hellaswag", "ending4.", "ending4"),
            ("winogrande", "I pick option1", "option1"),
            ("boolq", "no idea", ""),
        ],
    )
    def test_patterns(self, ds, text, want):
        assert extract_answer(ds, text) == want

    def test_response_split(self):
        assert extract_response("prompt ### Response: hello world") == "hello world"
        assert extract_response("no marker") == "no marker"


@pytest.mark.slow
class TestFinetune:
    def test_instruction_finetune_runs_with_accumulation(self):
        model_cfg = get_config("llama_test")
        cfg = CommonsenseConfig(rank=2, accumulation_steps=5, batch_size=4, cutoff_len=64, num_training_steps=50)
        trainer = build_commonsense_trainer(cfg, model_cfg)
        # q/k/v/up/down targeted; o_proj and gate_proj NOT (finetune.py:292-298)
        paths = [p for p, _ in iter_sow(trainer.params)]
        assert len(paths) == 5 * model_cfg.num_hidden_layers
        assert not any("o_proj" in p or "gate_proj" in p for p in paths)

        tok = StubTokenizer(vocab_size=model_cfg.vocab_size)
        rng = np.random.default_rng(0)
        losses = []
        for step in range(12):
            exs = [
                tokenize_example(tok, {"instruction": f"q {rng.integers(5)}", "input": "", "output": "answer1"})
                for _ in range(4)
            ]
            b = collate(exs, tok.pad_token_id, 64)
            losses.append(
                trainer.step(
                    jnp.asarray(b["input_ids"]), jnp.asarray(b["attention_mask"]),
                    jnp.asarray(b["labels"]),
                )
            )
        assert trainer.n_accumulations == 2
        assert losses[-1] < losses[0]


@pytest.mark.slow
class TestEvalHarness:
    def test_harness_end_to_end(self):
        from sow_tpu.models import init_params

        model_cfg = get_config("llama_test")
        params = init_params(jax.random.PRNGKey(0), model_cfg)
        tok = StubTokenizer(vocab_size=model_cfg.vocab_size)
        records = [{"instruction": f"question {i}", "answer": "true"} for i in range(5)]
        out = evaluate_commonsense(
            params, model_cfg, tok, records,
            EvalConfig(dataset="boolq", batch_size=2, max_new_tokens=4, num_beams=2),
        )
        assert out["n"] == 5
        assert 0.0 <= out["accuracy"] <= 1.0
        assert len(out["outputs"]) == 5

    def test_sorted_batching_preserves_outputs_and_order(self):
        """Length-sorted batching must not change any prediction and must
        return outputs in dataset order."""
        from sow_tpu.models import init_params

        model_cfg = get_config("llama_test")
        params = init_params(jax.random.PRNGKey(0), model_cfg)
        tok = StubTokenizer(vocab_size=model_cfg.vocab_size)
        records = [
            {"instruction": "w " * (1 + (7 * i) % 5) + f"q{i}", "answer": "true"}
            for i in range(6)
        ]
        a = evaluate_commonsense(
            params, model_cfg, tok, records,
            EvalConfig(dataset="boolq", batch_size=2, max_new_tokens=4,
                       num_beams=1, sort_by_length=False),
        )
        b = evaluate_commonsense(
            params, model_cfg, tok, records,
            EvalConfig(dataset="boolq", batch_size=2, max_new_tokens=4,
                       num_beams=1, sort_by_length=True),
        )
        assert [o["raw"] for o in a["outputs"]] == [o["raw"] for o in b["outputs"]]

    def test_server_engine_matches_batch_greedy(self):
        """engine='server' (continuous batching) must produce the same
        predictions as the fixed-batch greedy path."""
        from sow_tpu.models import init_params

        model_cfg = get_config("llama_test")
        params = init_params(jax.random.PRNGKey(0), model_cfg)
        tok = StubTokenizer(vocab_size=model_cfg.vocab_size)
        records = [
            {"instruction": f"question {i} with some extra words " * (1 + i % 3),
             "answer": "true"}
            for i in range(5)
        ]
        base = EvalConfig(dataset="boolq", batch_size=2, max_new_tokens=4, num_beams=1)
        batch = evaluate_commonsense(params, model_cfg, tok, records, base)
        srv = evaluate_commonsense(
            params, model_cfg, tok, records,
            EvalConfig(dataset="boolq", batch_size=2, max_new_tokens=4,
                       num_beams=1, engine="server"),
        )
        assert [o["raw"] for o in srv["outputs"]] == [o["raw"] for o in batch["outputs"]]
        assert srv["accuracy"] == batch["accuracy"]

    def test_server_engine_matches_batch_beam4(self):
        """engine='server' at the reference's beam-4 eval settings
        (commonsense_evaluate.py:79-85) matches the fixed-batch beam path."""
        from sow_tpu.models import init_params

        model_cfg = get_config("llama_test")
        params = init_params(jax.random.PRNGKey(0), model_cfg)
        tok = StubTokenizer(vocab_size=model_cfg.vocab_size)
        records = [
            {"instruction": f"beam question {i} " * (1 + i % 2), "answer": "true"}
            for i in range(4)
        ]
        batch = evaluate_commonsense(
            params, model_cfg, tok, records,
            EvalConfig(dataset="boolq", batch_size=2, max_new_tokens=4, num_beams=4),
        )
        srv = evaluate_commonsense(
            params, model_cfg, tok, records,
            EvalConfig(dataset="boolq", batch_size=2, max_new_tokens=4,
                       num_beams=4, engine="server"),
        )
        assert [o["raw"] for o in srv["outputs"]] == [o["raw"] for o in batch["outputs"]]
        assert srv["accuracy"] == batch["accuracy"]


@pytest.mark.slow
class TestAdapters:
    """Adapter parity (ref finetune.py:264-291): peft-style LoRA and
    prefix-tuning options next to SoW."""

    def _train(self, adapter, steps=40, **kw):
        model_cfg = get_config("llama_test")
        cfg = CommonsenseConfig(
            adapter=adapter, rank=4, learning_rate=1e-2, sow_lr=1e-2,
            accumulation_steps=10, cutoff_len=16, batch_size=8,
            num_training_steps=200, **kw,
        )
        trainer = build_commonsense_trainer(cfg, model_cfg)
        rng = np.random.default_rng(0)
        # fixed batch: with only a rank-4 adapter / tiny prefixes on a frozen
        # random base, overfitting one batch is the signal that gradients
        # reach the adapter params
        ids = rng.integers(2, model_cfg.vocab_size, (8, 16))
        losses = []
        for _ in range(steps):
            losses.append(trainer.step(
                jnp.asarray(ids), jnp.asarray(np.ones_like(ids)), jnp.asarray(ids)
            ))
        return trainer, losses

    def test_lora_trains_frozen_base(self):
        trainer, losses = self._train("lora", lora_alpha=8.0)
        assert np.mean(losses[-5:]) < np.mean(losses[:5])
        # no accumulation events for LoRA (frozen random base stays fixed)
        assert trainer.n_accumulations == 0
        # base weights frozen: acc_down label "frozen"
        from sow_tpu.nn import iter_sow
        for _, layer in iter_sow(trainer.params):
            assert layer.acc_down is not None  # keep-mode base present
            break

    def test_lora_starts_at_base_output(self):
        # B=0 init: the adapted model's logits equal the base model's.
        from sow_tpu.models import forward, init_params
        from sow_tpu.nn import SoWConfig, prepare_sow
        from sow_tpu.models.llama import LLAMA_FINETUNE_TARGET_MODULES

        model_cfg = get_config("llama_test")
        base = init_params(jax.random.PRNGKey(0), model_cfg)
        ids = jnp.asarray(np.random.default_rng(1).integers(0, model_cfg.vocab_size, (2, 12)))
        ref = forward(base, ids, model_cfg)
        lora_params = prepare_sow(
            base,
            SoWConfig(target_modules=LLAMA_FINETUNE_TARGET_MODULES, rank=4,
                      decompose="keep", scale=2.0, zero_up=True),
            jax.random.PRNGKey(2),
        )
        out = forward(lora_params, ids, model_cfg)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)

    def test_prefix_tuning_trains_only_prefixes(self):
        trainer, losses = self._train("prefix-tuning", num_virtual_tokens=8)
        assert np.mean(losses[-5:]) < np.mean(losses[:5])
        assert "prefix" in trainer.params
        # ONLY prefix params moved
        from sow_tpu.train.glue import finetune_labels
        labels = finetune_labels(trainer.params, freeze_base=True)
        flat_l = jax.tree_util.tree_leaves(labels)
        flat_p = jax.tree_util.tree_leaves(trainer.params)
        trainable = [l for l in flat_l if l in ("sow",)]
        assert trainable  # prefix group exists
        # embed stayed exactly frozen
        fresh = build_commonsense_trainer(
            CommonsenseConfig(adapter="prefix-tuning", rank=4, num_virtual_tokens=8,
                              cutoff_len=16, batch_size=8),
            get_config("llama_test"),
        )
        np.testing.assert_array_equal(
            np.asarray(trainer.params["embed"]["embedding"]),
            np.asarray(fresh.params["embed"]["embedding"]),
        )

    def test_prefix_changes_logits(self):
        from sow_tpu.models import forward, init_params
        from sow_tpu.nn.prefix import add_prefix_tuning

        model_cfg = get_config("llama_test")
        base = init_params(jax.random.PRNGKey(0), model_cfg)
        ids = jnp.asarray(np.random.default_rng(3).integers(0, model_cfg.vocab_size, (2, 12)))
        ref = np.asarray(forward(base, ids, model_cfg))
        withp = add_prefix_tuning(base, model_cfg, 8, jax.random.PRNGKey(4))
        out = np.asarray(forward(withp, ids, model_cfg))
        assert np.abs(out - ref).max() > 1e-4  # prefixes participate
        assert out.shape == ref.shape  # and don't consume input positions

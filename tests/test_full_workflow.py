"""The full reference user journey, end to end at toy scale:

pretrain (SoW, accumulation) -> checkpoint -> restore into a finetune setup
(decompose=keep on the pretrained weights) -> instruction-finetune ->
merge SoW to dense -> generation-eval harness. Exercises every subsystem
boundary a reference user crosses (readme.md workflows chained)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sow_tpu.checkpoint import latest_checkpoint, restore_params, save_checkpoint
from sow_tpu.data.synthetic import affine_stream
from sow_tpu.eval.commonsense_eval import EvalConfig, evaluate_commonsense
from sow_tpu.models import forward, get_config
from sow_tpu.models.llama import merge_sow_to_dense
from sow_tpu.nn import iter_sow
from sow_tpu.train.commonsense import (
    CommonsenseConfig,
    build_commonsense_trainer,
    collate,
    tokenize_example,
)
from sow_tpu.train.trainer import TrainConfig, Trainer


class StubTok:
    pad_token_id = 0
    eos_token_id = 1

    def __init__(self, vocab):
        self.vocab = vocab

    def __call__(self, text, truncation=False, max_length=None):
        ids = [2 + (hash(w) % (self.vocab - 2)) for w in text.split()]
        if truncation and max_length:
            ids = ids[:max_length]
        return {"input_ids": ids}

    def batch_decode(self, arr, skip_special_tokens=True):
        return [" ".join(f"t{t}" for t in row if t > 1) for row in np.asarray(arr)]


@pytest.mark.slow
def test_pretrain_finetune_merge_eval_chain(tmp_path):
    model_cfg = get_config("llama_test")

    # 1) pretrain with SoW + accumulation, checkpoint
    pre = Trainer(
        TrainConfig(
            model="llama_test", architecture="sow", rank=4, num_training_steps=20,
            sow_accumulation=8, batch_size=8, max_length=16, dtype="float32",
            lr=2e-3, sow_lr=2e-3, mesh_data=-1, mesh_fsdp=1, mesh_model=1,
        )
    )
    data = affine_stream(8, 16, model_cfg.vocab_size, seed=0)
    for _ in range(10):
        pre.step(jnp.asarray(next(data)["input_ids"]))
    ckpt_dir = save_checkpoint(str(tmp_path), pre.update_step, pre.params)

    # 2) restore + merge to a dense pretrained model (the artifact a user
    # would hand to finetuning)
    t2 = Trainer(
        TrainConfig(
            model="llama_test", architecture="sow", rank=4, num_training_steps=20,
            sow_accumulation=8, batch_size=8, max_length=16, dtype="float32",
            mesh_data=-1, mesh_fsdp=1, mesh_model=1,
        )
    )
    restored, _ = restore_params(t2.params, latest_checkpoint(str(tmp_path)))
    dense_pretrained = merge_sow_to_dense(restored)
    ids = jnp.asarray(next(data)["input_ids"])
    np.testing.assert_allclose(
        np.asarray(forward(dense_pretrained, ids, model_cfg)),
        np.asarray(forward(restored, ids, model_cfg)),
        rtol=1e-4, atol=1e-4,
    )

    # 3) instruction-finetune with SoW adapters (decompose=keep) on top
    cfg = CommonsenseConfig(rank=2, accumulation_steps=6, batch_size=4, cutoff_len=64)
    ft = build_commonsense_trainer(cfg, model_cfg, params=dense_pretrained)
    tok = StubTok(model_cfg.vocab_size)
    for i in range(8):  # crosses the step-6 accumulation
        exs = [
            tokenize_example(tok, {"instruction": f"q{i}{j}", "input": "", "output": "true"})
            for j in range(4)
        ]
        b = collate(exs, tok.pad_token_id, 64)
        ft.step(jnp.asarray(b["input_ids"]), jnp.asarray(b["attention_mask"]), jnp.asarray(b["labels"]))
    assert ft.n_accumulations == 1
    assert len(list(iter_sow(ft.params))) == 5 * model_cfg.num_hidden_layers

    # 4) merge adapters and run the generation-eval harness on the merged model
    merged = merge_sow_to_dense(ft.params)
    records = [{"instruction": f"question {i}", "answer": "true"} for i in range(4)]
    out = evaluate_commonsense(
        merged, model_cfg, tok, records,
        EvalConfig(dataset="boolq", batch_size=2, max_new_tokens=4, num_beams=2),
    )
    assert out["n"] == 4 and len(out["outputs"]) == 4


@pytest.mark.slow
def test_grow_rank_checkpoint_restore(tmp_path):
    cfg = TrainConfig(
        model="llama_test", architecture="sow", rank=4, num_training_steps=30,
        sow_accumulation=5, grow_rank=True, batch_size=8, max_length=16,
        dtype="float32", lr=1e-3, sow_lr=1e-3, mesh_data=-1, mesh_fsdp=1, mesh_model=1,
    )
    t1 = Trainer(cfg)
    data = affine_stream(8, 16, t1.model_cfg.vocab_size, seed=3)
    for _ in range(12):  # two accumulations -> factored bases, grown vr
        t1.step(jnp.asarray(next(data)["input_ids"]))
    layer = next(iter([l for _, l in iter_sow(t1.params)]))
    assert layer.acc_up is not None and layer.virtual_rank > 4

    d = save_checkpoint(str(tmp_path), t1.update_step, t1.params)
    t2 = Trainer(cfg)  # fresh template: blank layers, vr=4
    restored, _ = restore_params(t2.params, d)
    ids = jnp.asarray(next(data)["input_ids"])
    np.testing.assert_allclose(
        np.asarray(forward(restored, ids, t2.model_cfg)),
        np.asarray(forward(t1.params, ids, t1.model_cfg)),
        rtol=1e-5, atol=1e-5,
    )
    # static metadata restored too (factored base, grown virtual rank)
    rl = next(iter([l for _, l in iter_sow(restored)]))
    assert rl.acc_up is not None and rl.virtual_rank == layer.virtual_rank

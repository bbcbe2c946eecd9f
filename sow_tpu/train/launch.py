"""Canned launch configurations — the reference's ``scripts/launch.py``.

The reference keeps its flagship runs as hard-coded torchrun invocations
(live one: 3-GPU llama-1b SoW r=200, ``launch.py:98-127``; the readme's
llama-60m r=50 recipe at ``readme.md:6-25``). Here they are named TrainConfig
presets runnable via::

    python -m sow_tpu.train.launch --preset llama_60m_sow [pretrain args...]
"""

from __future__ import annotations

import dataclasses

from sow_tpu.train.trainer import TrainConfig

# readme.md:6-25 — the headline pretraining recipe.
LLAMA_60M_SOW = TrainConfig(
    model="llama_60m",
    architecture="sow",
    batch_size=128,
    max_length=256,
    num_training_steps=25_000,
    lr=0.01,
    warmup_steps=0.05,
    weight_decay=0.0,
    dtype="bfloat16",
    scheduler="cosine",
    min_lr_ratio=0.03,
    sow_accumulation=5_000,
    sow_lr=0.001,
    rank=50,
)

# launch.py:98-127 — the live 3-GPU llama-1b run (global batch 512 via
# gradient accumulation on fewer chips).
LLAMA_1B_SOW = TrainConfig(
    model="llama_1b",
    architecture="sow",
    batch_size=256,
    gradient_accumulation=2,
    max_length=256,
    num_training_steps=200_000,
    lr=0.005,
    warmup_steps=0.05,
    dtype="bfloat16",
    scheduler="cosine",
    min_lr_ratio=0.03,
    sow_accumulation=5_000,
    sow_lr=0.001,
    rank=200,
)

# dense / lora / galore baselines at 60m scale for ablations
LLAMA_60M_DENSE = dataclasses.replace(LLAMA_60M_SOW, architecture="linear")
LLAMA_60M_LORA = dataclasses.replace(LLAMA_60M_SOW, architecture="lora")
LLAMA_60M_GALORE = dataclasses.replace(
    LLAMA_60M_SOW, architecture="galore", galore_rank=128, update_proj_gap=200
)

PRESETS: dict[str, TrainConfig] = {
    "llama_60m_sow": LLAMA_60M_SOW,
    "llama_60m_dense": LLAMA_60M_DENSE,
    "llama_60m_lora": LLAMA_60M_LORA,
    "llama_60m_galore": LLAMA_60M_GALORE,
    "llama_1b_sow": LLAMA_1B_SOW,
}


def main(argv=None):
    import argparse
    import sys

    p = argparse.ArgumentParser(description="canned SoW training runs")
    p.add_argument("--preset", required=True, choices=sorted(PRESETS))
    args, rest = p.parse_known_args(argv)
    cfg = PRESETS[args.preset]

    from sow_tpu.train import pretrain

    forwarded = []
    for f in dataclasses.fields(TrainConfig):
        flag = "--" + f.name.replace("_", "-")
        if flag in (rest or []):
            continue  # user override wins
        v = getattr(cfg, f.name)
        if isinstance(v, bool):
            if v:
                forwarded.append(flag)
        else:
            forwarded.extend([flag, str(v)])
    pretrain.main(forwarded + (rest or []))


if __name__ == "__main__":
    main()

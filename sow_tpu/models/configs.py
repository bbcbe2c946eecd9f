"""Model zoo — the reference's LLaMA size ladder.

Values mirror ``scripts/configs/llama_*.json`` (hidden / intermediate /
layers / heads; vocab 32000, rms eps 1e-6 throughout). The reference feeds
these to ``AutoConfig.from_pretrained`` (``simple_train.py:313-314``).
"""

from __future__ import annotations

from sow_tpu.models.llama import LlamaConfig


def _cfg(hidden, inter, layers, heads, **kw) -> LlamaConfig:
    return LlamaConfig(
        hidden_size=hidden,
        intermediate_size=inter,
        num_hidden_layers=layers,
        num_attention_heads=heads,
        **kw,
    )


LLAMA_CONFIGS: dict[str, LlamaConfig] = {
    # name: (hidden, intermediate, layers, heads) — scripts/configs/llama_*.json
    "llama_9m": _cfg(128, 352, 4, 4),
    "llama_60m": _cfg(512, 1376, 8, 8),
    "llama_130m": _cfg(768, 2048, 12, 12),
    "llama_350m": _cfg(1024, 2736, 24, 16),
    "llama_1b": _cfg(2048, 5461, 24, 32),
    "llama_7b": _cfg(4096, 11008, 32, 32, max_position_embeddings=2048),
    "llama_13b": _cfg(5120, 13824, 40, 40, max_position_embeddings=2048),
    "llama_70b": _cfg(8192, 28672, 80, 64, num_key_value_heads=8, max_position_embeddings=4096),
    # tiny config for tests only (not part of the reference zoo)
    "llama_test": _cfg(64, 128, 2, 4, vocab_size=256, max_position_embeddings=128),
}


def get_config(name: str) -> LlamaConfig:
    try:
        return LLAMA_CONFIGS[name]
    except KeyError:
        raise KeyError(f"unknown model {name!r}; available: {sorted(LLAMA_CONFIGS)}")

"""RoBERTa classifier for GLUE finetuning — functional JAX, surgery-ready.

Replaces the reference's HF ``RobertaForSequenceClassification``
(``run_glue.py:515-516``; base model frozen, head + SoW factors trained).
Param subtree names follow HF module names so the reference's SoW target
list — ``["query", "key", "value", "output.dense", "intermediate.dense"]``
(``run_glue.py:572``) — matches via the same dotted-suffix rule.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from sow_tpu.nn.surgery import linear_apply

# Reference target set for RoBERTa SoW surgery (run_glue.py:572).
ROBERTA_TARGET_MODULES = ("query", "key", "value", "output.dense", "intermediate.dense")


@dataclasses.dataclass(frozen=True)
class RobertaConfig:
    vocab_size: int = 50265
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 514
    type_vocab_size: int = 1
    layer_norm_eps: float = 1e-5
    pad_token_id: int = 1
    num_labels: int = 2
    initializer_range: float = 0.02


ROBERTA_CONFIGS = {
    # scripts/configs/roberta.json / roberta-large.json mirror HF base/large
    "roberta-base": RobertaConfig(),
    "roberta-large": RobertaConfig(hidden_size=1024, num_hidden_layers=24, num_attention_heads=16, intermediate_size=4096),
    "roberta-test": RobertaConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, max_position_embeddings=64,
    ),
}


def _lin(key, d_in, d_out, std, dtype):
    return {
        "kernel": (std * jax.random.normal(key, (d_in, d_out), jnp.float32)).astype(dtype),
        "bias": jnp.zeros((d_out,), dtype),
    }


def _ln(h, dtype):
    return {"scale": jnp.ones((h,), dtype), "bias": jnp.zeros((h,), dtype)}


def init_params(key: jax.Array, cfg: RobertaConfig, dtype=jnp.float32) -> dict:
    std = cfg.initializer_range
    h = cfg.hidden_size
    keys = iter(jax.random.split(key, 8 + 6 * cfg.num_hidden_layers))
    layers = {}
    for i in range(cfg.num_hidden_layers):
        layers[str(i)] = {
            "attention": {
                "self": {
                    "query": _lin(next(keys), h, h, std, dtype),
                    "key": _lin(next(keys), h, h, std, dtype),
                    "value": _lin(next(keys), h, h, std, dtype),
                },
                "output": {"dense": _lin(next(keys), h, h, std, dtype), "ln": _ln(h, dtype)},
            },
            "intermediate": {"dense": _lin(next(keys), h, cfg.intermediate_size, std, dtype)},
            "output": {"dense": _lin(next(keys), cfg.intermediate_size, h, std, dtype), "ln": _ln(h, dtype)},
        }
    return {
        "embeddings": {
            "word": {"embedding": (std * jax.random.normal(next(keys), (cfg.vocab_size, h), jnp.float32)).astype(dtype)},
            "position": {"embedding": (std * jax.random.normal(next(keys), (cfg.max_position_embeddings, h), jnp.float32)).astype(dtype)},
            "token_type": {"embedding": (std * jax.random.normal(next(keys), (cfg.type_vocab_size, h), jnp.float32)).astype(dtype)},
            "ln": _ln(h, dtype),
        },
        "layers": layers,
        "classifier": {
            "dense": _lin(next(keys), h, h, std, dtype),
            "out_proj": _lin(next(keys), h, cfg.num_labels, std, dtype),
        },
    }


def _layer_norm(x, p, eps):
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = ((x32 - mu) ** 2).mean(-1, keepdims=True)
    out = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return (out * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)).astype(x.dtype)


def create_position_ids(input_ids: jax.Array, pad_token_id: int) -> jax.Array:
    """RoBERTa's position scheme: positions count non-pad tokens, offset by
    ``padding_idx`` (HF ``create_position_ids_from_input_ids``)."""
    mask = (input_ids != pad_token_id).astype(jnp.int32)
    incremental = jnp.cumsum(mask, axis=1) * mask
    return incremental + pad_token_id


def encode(
    params: dict,
    input_ids: jax.Array,
    cfg: RobertaConfig,
    attention_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Sequence output (batch, seq, hidden) — post-LN transformer encoder."""
    b, t = input_ids.shape
    if attention_mask is None:
        attention_mask = (input_ids != cfg.pad_token_id).astype(jnp.int32)

    emb = params["embeddings"]
    pos_ids = create_position_ids(input_ids, cfg.pad_token_id)
    x = (
        emb["word"]["embedding"][input_ids]
        + emb["position"]["embedding"][pos_ids]
        + emb["token_type"]["embedding"][jnp.zeros_like(input_ids)]
    )
    x = _layer_norm(x, emb["ln"], cfg.layer_norm_eps)

    nh = cfg.num_attention_heads
    hd = cfg.hidden_size // nh
    bias_mask = attention_mask[:, None, None, :].astype(bool)

    for i in range(cfg.num_hidden_layers):
        lp = params["layers"][str(i)]
        sa = lp["attention"]["self"]
        q = linear_apply(sa["query"], x).reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
        k = linear_apply(sa["key"], x).reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
        v = linear_apply(sa["value"], x).reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) / (hd**0.5)
        scores = jnp.where(bias_mask, scores, jnp.finfo(jnp.float32).min)
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        attn = jnp.einsum("bhqk,bhkd->bhqd", probs, v).transpose(0, 2, 1, 3).reshape(b, t, -1)
        attn = linear_apply(lp["attention"]["output"]["dense"], attn)
        x = _layer_norm(x + attn, lp["attention"]["output"]["ln"], cfg.layer_norm_eps)

        inter = jax.nn.gelu(linear_apply(lp["intermediate"]["dense"], x), approximate=False)
        out = linear_apply(lp["output"]["dense"], inter)
        x = _layer_norm(x + out, lp["output"]["ln"], cfg.layer_norm_eps)
    return x


def forward(
    params: dict,
    input_ids: jax.Array,
    cfg: RobertaConfig,
    attention_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Classification logits from the <s> (first) token, via the RoBERTa
    head: dense -> tanh -> out_proj."""
    x = encode(params, input_ids, cfg, attention_mask)
    cls = x[:, 0]
    h = jnp.tanh(linear_apply(params["classifier"]["dense"], cls))
    return linear_apply(params["classifier"]["out_proj"], h)


def classification_loss(logits: jax.Array, labels: jax.Array, is_regression: bool = False):
    if is_regression:
        return jnp.mean((logits[..., 0].astype(jnp.float32) - labels.astype(jnp.float32)) ** 2)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return nll.mean()


def params_from_hf_state_dict(state_dict: dict, cfg: RobertaConfig, dtype=jnp.float32) -> dict:
    """Convert HF ``RobertaForSequenceClassification`` weights (transposing
    (out, in) linears to (in, out))."""
    import numpy as np

    def arr(t):
        if hasattr(t, "detach"):
            t = t.detach().to("cpu").float().numpy()
        return jnp.asarray(np.asarray(t), dtype=dtype)

    def lin(prefix):
        return {
            "kernel": arr(state_dict[f"{prefix}.weight"]).T,
            "bias": arr(state_dict[f"{prefix}.bias"]),
        }

    def ln(prefix):
        return {"scale": arr(state_dict[f"{prefix}.weight"]), "bias": arr(state_dict[f"{prefix}.bias"])}

    layers = {}
    for i in range(cfg.num_hidden_layers):
        pre = f"roberta.encoder.layer.{i}"
        layers[str(i)] = {
            "attention": {
                "self": {
                    "query": lin(f"{pre}.attention.self.query"),
                    "key": lin(f"{pre}.attention.self.key"),
                    "value": lin(f"{pre}.attention.self.value"),
                },
                "output": {
                    "dense": lin(f"{pre}.attention.output.dense"),
                    "ln": ln(f"{pre}.attention.output.LayerNorm"),
                },
            },
            "intermediate": {"dense": lin(f"{pre}.intermediate.dense")},
            "output": {"dense": lin(f"{pre}.output.dense"), "ln": ln(f"{pre}.output.LayerNorm")},
        }
    params = {
        "embeddings": {
            "word": {"embedding": arr(state_dict["roberta.embeddings.word_embeddings.weight"])},
            "position": {"embedding": arr(state_dict["roberta.embeddings.position_embeddings.weight"])},
            "token_type": {"embedding": arr(state_dict["roberta.embeddings.token_type_embeddings.weight"])},
            "ln": ln("roberta.embeddings.LayerNorm"),
        },
        "layers": layers,
    }
    if "classifier.dense.weight" in state_dict:
        params["classifier"] = {
            "dense": lin("classifier.dense"),
            "out_proj": lin("classifier.out_proj"),
        }
    return params

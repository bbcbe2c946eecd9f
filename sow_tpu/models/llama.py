"""Minimal LLaMA for TPU — functional JAX, surgery-compatible param tree.

Replaces the reference's dependence on HF ``LlamaForCausalLM``
(``scripts/simple_train.py:313-314`` builds it from the JSON configs in
``scripts/configs/``). Every projection is a ``{"kernel": (in, out)}``
subtree so ``sow_tpu.nn.prepare_sow`` can rewrite it; the forward calls
``linear_apply`` and never needs to know whether a projection is dense or
SoW.

TPU notes: RMSNorm and rotary math run in fp32 regardless of param dtype;
attention/matmuls run in the param dtype (bf16 in training) on the MXU;
the whole forward is jit/pjit-friendly (static shapes, no Python branching
on data).
"""

from __future__ import annotations

import dataclasses
import json
import math
from typing import Any, Optional

import jax
import jax.numpy as jnp

from sow_tpu.nn.surgery import linear_apply


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    hidden_size: int = 512
    intermediate_size: int = 1376
    num_hidden_layers: int = 8
    num_attention_heads: int = 8
    num_key_value_heads: Optional[int] = None
    max_position_embeddings: int = 1024
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    initializer_range: float = 0.02
    tie_word_embeddings: bool = False
    attention_bias: bool = False
    mlp_bias: bool = False
    # rematerialize each block's activations in backward (the reference's
    # --activation_checkpointing flag, simple_train.py:67)
    remat: bool = False
    # "auto" (default): einsum softmax, switching to the Pallas TPU
    # flash-attention kernel when the XLA path's resident fp32 score tensors
    # would exceed AUTO_FLASH_BYTES (measured: XLA wins at seq 256, but OOMs
    # at seq-1024 bs-64 where flash trains fine — PARITY.md "Kernels").
    # "xla" / "flash" force one path (flash falls back off-TPU/bad shapes).
    attention_impl: str = "auto"
    # Context parallelism: activations sharded over the mesh's "seq" axis
    # (parallel/mesh.py). Each attention all-gathers K/V over that axis
    # (Megatron-CP style: queries stay sharded, keys are global) — XLA GSPMD
    # inserts the all-gather from the sharding constraints below. Requires
    # tracing under ``jax.set_mesh`` (Trainer does this) and forces the
    # einsum attention path (the Pallas flash kernel is per-device).
    seq_shard: bool = False

    @property
    def kv_heads(self) -> int:
        return self.num_key_value_heads or self.num_attention_heads

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @staticmethod
    def from_json(path: str) -> "LlamaConfig":
        """Load one of the reference model-zoo configs
        (``scripts/configs/llama_*.json``)."""
        with open(path) as f:
            raw = json.load(f)
        known = {f.name for f in dataclasses.fields(LlamaConfig)}
        return LlamaConfig(**{k: v for k, v in raw.items() if k in known})


# Reference SoW target set for llama pretraining (simple_train.py:318).
LLAMA_TARGET_MODULES = (
    "q_proj",
    "k_proj",
    "v_proj",
    "o_proj",
    "gate_proj",
    "up_proj",
    "down_proj",
)
# finetune.py:292-298 excludes o_proj / gate_proj for the 7B adapter runs.
LLAMA_FINETUNE_TARGET_MODULES = ("q_proj", "k_proj", "v_proj", "up_proj", "down_proj")


# -- init --------------------------------------------------------------------

def _init_linear(key, d_in, d_out, std, bias=False, dtype=jnp.float32):
    p = {"kernel": (std * jax.random.normal(key, (d_in, d_out), jnp.float32)).astype(dtype)}
    if bias:
        p["bias"] = jnp.zeros((d_out,), dtype)
    return p


def init_params(key: jax.Array, cfg: LlamaConfig, dtype=jnp.float32) -> dict:
    """Initialize the parameter tree (N(0, initializer_range) like HF)."""
    std = cfg.initializer_range
    h, kvh, hd = cfg.hidden_size, cfg.kv_heads, cfg.head_dim
    keys = iter(jax.random.split(key, 4 + 7 * cfg.num_hidden_layers))

    layers = {}
    for i in range(cfg.num_hidden_layers):
        layers[str(i)] = {
            "attn": {
                "q_proj": _init_linear(next(keys), h, h, std, cfg.attention_bias, dtype),
                "k_proj": _init_linear(next(keys), h, kvh * hd, std, cfg.attention_bias, dtype),
                "v_proj": _init_linear(next(keys), h, kvh * hd, std, cfg.attention_bias, dtype),
                "o_proj": _init_linear(next(keys), h, h, std, cfg.attention_bias, dtype),
            },
            "mlp": {
                "gate_proj": _init_linear(next(keys), h, cfg.intermediate_size, std, cfg.mlp_bias, dtype),
                "up_proj": _init_linear(next(keys), h, cfg.intermediate_size, std, cfg.mlp_bias, dtype),
                "down_proj": _init_linear(next(keys), cfg.intermediate_size, h, std, cfg.mlp_bias, dtype),
            },
            "input_norm": {"scale": jnp.ones((h,), dtype)},
            "post_norm": {"scale": jnp.ones((h,), dtype)},
        }
    params = {
        "embed": {"embedding": (std * jax.random.normal(next(keys), (cfg.vocab_size, h), jnp.float32)).astype(dtype)},
        "layers": layers,
        "norm": {"scale": jnp.ones((h,), dtype)},
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = _init_linear(next(keys), h, cfg.vocab_size, std, False, dtype)
    return params


# -- forward -----------------------------------------------------------------

def rms_norm(x: jax.Array, scale: jax.Array, eps: float) -> jax.Array:
    """LLaMA RMSNorm in fp32 (variance over the hidden axis)."""
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    out = x32 * jax.lax.rsqrt(var + eps)
    return (out * scale.astype(jnp.float32)).astype(x.dtype)


def rope_tables(positions: jax.Array, head_dim: int, theta: float) -> tuple[jax.Array, jax.Array]:
    """cos/sin tables, HF half-split convention: (..., seq, head_dim)."""
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq  # (..., seq, hd/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: (batch, heads, seq, head_dim); HF rotate_half convention."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rot = jnp.concatenate([-x2, x1], axis=-1)
    cos = cos[:, None, :, :].astype(x.dtype)
    sin = sin[:, None, :, :].astype(x.dtype)
    return x * cos + rot * sin


def _cp_constrain(x: jax.Array, spec_entries: tuple) -> jax.Array:
    """Pin selected axes of ``x``'s sharding (context parallelism). Entries:
    "seq" = shard over the mesh seq axis, None = replicated, "unc" = leave
    to GSPMD propagation. Must run under an active mesh (``jax.set_mesh``)."""
    from jax.sharding import PartitionSpec

    unc = PartitionSpec.UNCONSTRAINED
    spec = PartitionSpec(*(unc if e == "unc" else e for e in spec_entries))
    return jax.lax.with_sharding_constraint(x, spec)


def grouped_attention(
    q: jax.Array,  # (b, nh, t, hd)
    k: jax.Array,  # (b, kvh, s, hd) — q.dtype, or int8 cache values
    v: jax.Array,  # (b, kvh, s, hd) — likewise
    mask,  # (b or 1, 1, t, s) bool, or None (no masking)
    hd: int,
    k_scale: jax.Array | None = None,  # (b, kvh, s) int8 dequant scales
    v_scale: jax.Array | None = None,  # (b, kvh, s)
) -> jax.Array:
    """Grouped-query attention without materializing repeated K/V.

    The reference repeats KV heads to full head count before the matmuls
    (HF ``repeat_kv``); on TPU that turns every decode step's cache read
    into ``nh/kvh``x the HBM traffic. Instead reshape q to
    (b, kvh, rep, t, hd) and contract each group against its single KV head
    — identical math, cache read once.

    Also the int8-KV read path: per-(batch, head, position) dequant scales
    factor OUT of both contractions — ``(q·(k_int*s_k)) = (q·k_int)*s_k``
    on the score axis, and ``(p·(v_int*s_v)) = ((p*s_v)·v_int)`` by folding
    the v-scale into the probabilities — so the cache is read as raw int8
    (half the bytes of bf16) and no dequantized copy ever exists.
    """
    b, nh, t, _ = q.shape
    kvh, s = k.shape[1], k.shape[2]
    rep = nh // kvh
    qg = q.reshape(b, kvh, rep, t, hd)
    scores = jnp.einsum("bgrqd,bgkd->bgrqk", qg, k.astype(q.dtype)).astype(jnp.float32)
    if k_scale is not None:
        scores = scores * k_scale[:, :, None, None, :]
    scores = scores / math.sqrt(hd)
    if mask is not None:
        scores = jnp.where(mask[:, :, None], scores, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(scores, axis=-1)
    if v_scale is not None:
        probs = probs * v_scale[:, :, None, None, :]
    probs = probs.astype(q.dtype)
    out = jnp.einsum("bgrqk,bgkd->bgrqd", probs, v.astype(q.dtype))
    return out.reshape(b, nh, t, hd)


# Auto-policy budget: estimated bytes of fp32 attention scores resident in
# backward (all layers' saved scores+probs) above which the flash kernel is
# selected. 12 GiB ~= the measured envelope on a 16 GiB v5e chip: XLA trains
# llama-60m at bs-256 seq-256 (8.6 GiB of scores) but OOMs at bs-64 seq-1024
# (34 GiB); flash extends the envelope at a measured step-time cost only
# above the threshold.
AUTO_FLASH_BYTES = 12 * 1024**3


def _flash_shapes_ok(cfg: LlamaConfig, t: int) -> bool:
    return (
        jax.default_backend() == "tpu"
        and cfg.head_dim % 8 == 0
        and t % 128 == 0
    )


def _score_bytes(cfg: LlamaConfig, b: int, t: int) -> int:
    """fp32 scores+probs saved for backward across all layers. ``b`` is the
    trace-time (global) batch, so under a data-sharded mesh this
    overestimates per-device bytes — conservative: flash turns on earlier,
    never later, than the true per-device envelope requires."""
    per_layer = 2 * b * cfg.num_attention_heads * t * t * 4
    return per_layer * cfg.num_hidden_layers


def _flash_ok(cfg: LlamaConfig, b: int, t: int) -> bool:
    if cfg.seq_shard:
        return False  # CP needs the einsum path (kernel is per-device)
    if cfg.attention_impl == "flash":
        return _flash_shapes_ok(cfg, t)
    if cfg.attention_impl == "auto":
        return _flash_shapes_ok(cfg, t) and _score_bytes(cfg, b, t) > AUTO_FLASH_BYTES
    return False


def _attention(
    layer_p: dict, x: jax.Array, cfg: LlamaConfig, cos, sin, mask,
    attn_segment_ids=None, prefix=None,
) -> jax.Array:
    b, t, h = x.shape
    nh, kvh, hd = cfg.num_attention_heads, cfg.kv_heads, cfg.head_dim

    q = linear_apply(layer_p["q_proj"], x).reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
    k = linear_apply(layer_p["k_proj"], x).reshape(b, t, kvh, hd).transpose(0, 2, 1, 3)
    v = linear_apply(layer_p["v_proj"], x).reshape(b, t, kvh, hd).transpose(0, 2, 1, 3)

    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    if cfg.seq_shard:
        # Megatron-style context parallelism: queries stay sequence-sharded,
        # K/V become global — pinning their position axis (2) to replicated
        # makes GSPMD insert one K/V all-gather over the "seq" axis per
        # layer (cheap: K/V are kv_heads*head_dim wide). Scores/probs then
        # stay sharded on the query axis; softmax is local.
        k = _cp_constrain(k, ("unc", "unc", None, "unc"))
        v = _cp_constrain(v, ("unc", "unc", None, "unc"))

    if prefix is not None:
        # Prefix tuning (ref finetune.py:286-291 via peft): learned post-RoPE
        # KV vectors prepended on the key axis; every query may attend to
        # them. Forces the einsum path (the flash kernel assumes square
        # causal structure).
        nv = prefix["k"].shape[0]
        pk = jnp.broadcast_to(
            prefix["k"].astype(k.dtype).transpose(1, 0, 2)[None], (b, kvh, nv, hd)
        )
        pv = jnp.broadcast_to(
            prefix["v"].astype(v.dtype).transpose(1, 0, 2)[None], (b, kvh, nv, hd)
        )
        k = jnp.concatenate([pk, k], axis=2)
        v = jnp.concatenate([pv, v], axis=2)
        mask = jnp.concatenate(
            [jnp.ones(mask.shape[:-1] + (nv,), bool), mask], axis=-1
        )

    if prefix is None and _flash_ok(cfg, b, t):
        # Pallas flash-attention kernel (jax.experimental.pallas.ops.tpu);
        # padding/document structure is expressed through segment ids.
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            SegmentIds, flash_attention,
        )

        seg = None
        if attn_segment_ids is not None:
            s = attn_segment_ids.astype(jnp.int32)
            seg = SegmentIds(q=s, kv=s)
        kf, vf = k, v
        if kvh != nh:  # the shipped kernel wants equal head counts
            kf = jnp.repeat(kf, nh // kvh, axis=1)
            vf = jnp.repeat(vf, nh // kvh, axis=1)
        out = flash_attention(
            q, kf, vf, segment_ids=seg, causal=True, sm_scale=1.0 / math.sqrt(hd)
        )
    else:
        out = grouped_attention(q, k, v, mask, hd)
    out = out.transpose(0, 2, 1, 3).reshape(b, t, nh * hd)
    return linear_apply(layer_p["o_proj"], out)


def _mlp(layer_p: dict, x: jax.Array) -> jax.Array:
    gate = jax.nn.silu(linear_apply(layer_p["gate_proj"], x))
    up = linear_apply(layer_p["up_proj"], x)
    return linear_apply(layer_p["down_proj"], gate * up)


def forward(
    params: dict,
    input_ids: jax.Array,
    cfg: LlamaConfig,
    attention_mask: Optional[jax.Array] = None,
    positions: Optional[jax.Array] = None,
    segment_ids: Optional[jax.Array] = None,
) -> jax.Array:
    """Logits ``(batch, seq, vocab)``.

    ``attention_mask``: (batch, seq), 1 = attend, 0 = padding.
    ``segment_ids``: (batch, seq) document ids for packed batches —
    attention stays block-diagonal per document (0 = padding).
    """
    b, t = input_ids.shape
    x = params["embed"]["embedding"][input_ids]
    if cfg.seq_shard:
        # Anchor the activation layout: tokens sharded over the "seq" mesh
        # axis end to end (embed -> blocks -> loss); batch/hidden left to
        # GSPMD propagation.
        x = _cp_constrain(x, ("unc", "seq", "unc"))

    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32), (b, t))
    cos, sin = rope_tables(positions, cfg.head_dim, cfg.rope_theta)

    mask = jnp.tril(jnp.ones((t, t), bool))[None, None]
    if attention_mask is not None:
        mask = mask & attention_mask[:, None, None, :].astype(bool)
    if segment_ids is not None:
        same_seg = segment_ids[:, None, :, None] == segment_ids[:, None, None, :]
        mask = mask & same_seg & (segment_ids != 0)[:, None, None, :]

    prefix = params.get("prefix")  # prefix-tuning subtree (nn/prefix.py)

    def block(x, lp, pfx):
        x = x + _attention(
            lp["attn"], rms_norm(x, lp["input_norm"]["scale"], cfg.rms_norm_eps),
            cfg, cos, sin, mask, prefix=pfx,
        )
        x = x + _mlp(lp["mlp"], rms_norm(x, lp["post_norm"]["scale"], cfg.rms_norm_eps))
        return x

    if cfg.remat:
        block = jax.checkpoint(block)

    for i in range(cfg.num_hidden_layers):
        pfx = None if prefix is None else prefix["layers"][str(i)]
        x = block(x, params["layers"][str(i)], pfx)

    x = rms_norm(x, params["norm"]["scale"], cfg.rms_norm_eps)
    if cfg.tie_word_embeddings:
        logits = x @ params["embed"]["embedding"].T
    else:
        logits = linear_apply(params["lm_head"], x)
    return logits


def causal_lm_loss(
    logits: jax.Array, labels: jax.Array, ignore_index: int = -100
) -> jax.Array:
    """Shifted next-token cross entropy with ignore mask, mean over valid
    targets (HF ``LlamaForCausalLM`` convention; the pretrain loop masks pad
    positions to -100, ``simple_train.py:606-609``). fp32 softmax."""
    logits = logits[:, :-1].astype(jnp.float32)
    targets = labels[:, 1:]
    valid = targets != ignore_index
    safe = jnp.where(valid, targets, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    return nll.sum() / jnp.maximum(valid.sum(), 1)


# -- sequence classification --------------------------------------------------

def init_classifier_head(key: jax.Array, cfg: LlamaConfig, num_labels: int, dtype=jnp.float32) -> dict:
    """Score head for sequence classification (HF ``LlamaForSequenceClassification``
    uses a single bias-free linear over the last non-pad token's hidden
    state; ref GLUE-LLaMA path ``run_glue.py:517-553``)."""
    return {
        "score": {
            "kernel": (
                cfg.initializer_range
                * jax.random.normal(key, (cfg.hidden_size, num_labels), jnp.float32)
            ).astype(dtype)
        }
    }


def forward_classify(
    params: dict,
    classifier: dict,
    input_ids: jax.Array,
    cfg: LlamaConfig,
    attention_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Classification logits (batch, num_labels) from the last real token."""
    b, t = input_ids.shape
    if attention_mask is None:
        attention_mask = jnp.ones_like(input_ids)
    hidden = forward_hidden(params, input_ids, cfg, attention_mask)
    last = jnp.maximum(attention_mask.sum(axis=1) - 1, 0)  # (b,)
    pooled = hidden[jnp.arange(b), last]
    return linear_apply(classifier["score"], pooled)


def forward_hidden(
    params: dict,
    input_ids: jax.Array,
    cfg: LlamaConfig,
    attention_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Final-norm hidden states (batch, seq, hidden) — the trunk of
    ``forward`` without the LM head."""
    b, t = input_ids.shape
    x = params["embed"]["embedding"][input_ids]
    positions = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32), (b, t))
    cos, sin = rope_tables(positions, cfg.head_dim, cfg.rope_theta)
    mask = jnp.tril(jnp.ones((t, t), bool))[None, None]
    if attention_mask is not None:
        mask = mask & attention_mask[:, None, None, :].astype(bool)
    for i in range(cfg.num_hidden_layers):
        lp = params["layers"][str(i)]
        x = x + _attention(lp["attn"], rms_norm(x, lp["input_norm"]["scale"], cfg.rms_norm_eps), cfg, cos, sin, mask)
        x = x + _mlp(lp["mlp"], rms_norm(x, lp["post_norm"]["scale"], cfg.rms_norm_eps))
    return rms_norm(x, params["norm"]["scale"], cfg.rms_norm_eps)


# -- KV-cache decoding -------------------------------------------------------

def init_cache(cfg: LlamaConfig, batch: int, max_len: int, dtype=jnp.bfloat16) -> list[dict]:
    """Per-layer KV cache buffers ``(batch, kv_heads, max_len, head_dim)``.

    Static shapes: the cache is allocated once for prompt+generation length
    (XLA-friendly; replaces HF's dynamically-growing past_key_values).

    ``dtype=jnp.int8`` selects a quantized cache: values are symmetric
    absmax int8 with one fp32 scale per (batch, head, position), stored as
    sidecar ``k_scale``/``v_scale`` buffers. Halves decode-attention HBM
    traffic vs bf16 — the scales factor out of both attention contractions
    (see ``grouped_attention``), so the int8 values are consumed directly.
    """
    hd, kvh = cfg.head_dim, cfg.kv_heads
    cache = [
        {
            "k": jnp.zeros((batch, kvh, max_len, hd), dtype),
            "v": jnp.zeros((batch, kvh, max_len, hd), dtype),
        }
        for _ in range(cfg.num_hidden_layers)
    ]
    if dtype == jnp.int8:
        for layer in cache:
            layer["k_scale"] = jnp.zeros((batch, kvh, max_len), jnp.float32)
            layer["v_scale"] = jnp.zeros((batch, kvh, max_len), jnp.float32)
    return cache


def _quantize_kv_block(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(b, kvh, t, hd) -> int8 values + per-(b, head, pos) fp32 scales."""
    x32 = x.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(x32), axis=-1), 1e-12) / 127.0
    q = jnp.clip(jnp.round(x32 / scale[..., None]), -127, 127).astype(jnp.int8)
    return q, scale


# Cache-write strategy crossover (measured, llama-1b v5e-1): a masked
# broadcast select (full-buffer rewrite, perfectly vectorized) beats the
# serializing scatter/dynamic-slice writes while the buffer is small; past
# ~24 MiB the 2x buffer traffic costs more than the serialization it avoids.
_WHERE_WRITE_MAX_BYTES = 24 * 1024 * 1024


def _cached_forward(
    params: dict,
    input_ids: jax.Array,  # (B, T)
    cfg: LlamaConfig,
    cache: list[dict],
    positions: jax.Array,  # (B, T) RoPE positions
    mask: jax.Array,  # (B|1, 1, T, max_len) attention mask over cache slots
    write,  # write(buf, new_vals) -> buf with this block's K/V inserted
) -> tuple[jax.Array, list[dict]]:
    """Shared decoder stack for every cache path: the uniform prefill/decode
    (``forward_with_cache``) and the ragged per-slot decode
    (``forward_decode_ragged``) differ ONLY in mask/position/write
    construction, which callers pass in."""
    b, t = input_ids.shape
    nh, kvh, hd = cfg.num_attention_heads, cfg.kv_heads, cfg.head_dim

    x = params["embed"]["embedding"][input_ids]
    cos, sin = rope_tables(positions, hd, cfg.rope_theta)

    new_cache = []
    for i in range(cfg.num_hidden_layers):
        lp = params["layers"][str(i)]
        h = rms_norm(x, lp["input_norm"]["scale"], cfg.rms_norm_eps)
        ap = lp["attn"]

        q = linear_apply(ap["q_proj"], h).reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
        k = linear_apply(ap["k_proj"], h).reshape(b, t, kvh, hd).transpose(0, 2, 1, 3)
        v = linear_apply(ap["v_proj"], h).reshape(b, t, kvh, hd).transpose(0, 2, 1, 3)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        quantized = cache[i]["k"].dtype == jnp.int8
        if quantized:
            kq, ks = _quantize_kv_block(k)
            vq, vs = _quantize_kv_block(v)
            layer_cache = {
                "k": write(cache[i]["k"], kq),
                "v": write(cache[i]["v"], vq),
                "k_scale": write(cache[i]["k_scale"], ks),
                "v_scale": write(cache[i]["v_scale"], vs),
            }
            k_scale, v_scale = layer_cache["k_scale"], layer_cache["v_scale"]
        else:
            layer_cache = {
                "k": write(cache[i]["k"], k),
                "v": write(cache[i]["v"], v),
            }
            k_scale = v_scale = None
        new_cache.append(layer_cache)

        attn = grouped_attention(
            q, layer_cache["k"], layer_cache["v"], mask, hd,
            k_scale=k_scale, v_scale=v_scale,
        )
        attn = attn.transpose(0, 2, 1, 3).reshape(b, t, nh * hd)
        x = x + linear_apply(ap["o_proj"], attn)

        h2 = rms_norm(x, lp["post_norm"]["scale"], cfg.rms_norm_eps)
        x = x + _mlp(lp["mlp"], h2)

    x = rms_norm(x, params["norm"]["scale"], cfg.rms_norm_eps)
    if cfg.tie_word_embeddings:
        logits = x @ params["embed"]["embedding"].T
    else:
        logits = linear_apply(params["lm_head"], x)
    return logits, new_cache


def forward_with_cache(
    params: dict,
    input_ids: jax.Array,  # (B, T) — prompt block (prefill) or 1 token (decode)
    cfg: LlamaConfig,
    cache: list[dict],
    start,  # int or traced scalar: global index of input_ids[:, 0] in the cache
    positions: jax.Array,  # (B, T) RoPE positions (true token index, pads excluded)
    key_mask: jax.Array,  # (B, max_len) — 1 for attendable cache slots
) -> tuple[jax.Array, list[dict]]:
    """Unified prefill/decode forward: writes this block's K/V into the cache
    at ``start`` and attends over ``cache[:, :, :start+T]`` under
    ``key_mask`` + causality. Returns (logits, updated cache)."""
    t = input_ids.shape[1]
    max_len = cache[0]["k"].shape[2]

    # query i (global start+i) attends cache slot j iff j <= start+i and
    # key_mask[b, j]
    q_pos = start + jax.lax.broadcasted_iota(jnp.int32, (t, max_len), 0)
    k_pos = jax.lax.broadcasted_iota(jnp.int32, (t, max_len), 1)
    causal = (k_pos <= q_pos)[None, None]  # (1, 1, t, max_len)
    mask = causal & key_mask[:, None, None, :].astype(bool)

    def write(buf, val):
        # single-token decode into a SMALL cache: broadcast select over a
        # position mask beats dynamic_update_slice at a traced offset (7.6
        # -> 6.0 ms/tick, llama-1b bs-8 maxlen-288). The select rewrites the
        # whole buffer though (~2x cache traffic), so big caches keep dus:
        # at bf16 maxlen-1024 the select REGRESSES 671 -> 467 tok/s while
        # int8 (half the bytes) still gains (698 -> 744). Gate on bytes.
        val = val.astype(buf.dtype)
        if t == 1 and buf.nbytes <= _WHERE_WRITE_MAX_BYTES:
            wp = jax.lax.broadcasted_iota(jnp.int32, (max_len,), 0) == start
            wm = wp[None, None, :, None] if buf.ndim == 4 else wp[None, None, :]
            return jnp.where(wm, val, buf)
        idx = (0, 0, start) + (0,) * (buf.ndim - 3)
        return jax.lax.dynamic_update_slice(buf, val, idx)

    return _cached_forward(params, input_ids, cfg, cache, positions, mask, write)


def forward_decode_ragged(
    params: dict,
    tokens: jax.Array,  # (B,) — one new token per slot
    cfg: LlamaConfig,
    cache: list[dict],
    lengths: jax.Array,  # (B,) — tokens already in each slot's cache
) -> tuple[jax.Array, list[dict]]:
    """One decode step where every batch slot sits at its OWN position —
    the continuous-batching primitive (``eval/serve.py``). Unlike
    ``forward_with_cache`` (uniform scalar ``start``), each slot b writes
    its K/V at ``lengths[b]`` and attends to cache slots
    ``< lengths[b] + 1``. Returns (logits (B, vocab), updated cache).

    While the cache buffer is small (<= _WHERE_WRITE_MAX_BYTES) the per-slot
    write is a broadcast ``where`` over a position mask, NOT a batched
    scatter: TPU scatters serialize, and the select fuses into the cache
    traffic the attention already pays — measured 10.8 -> 6.0 ms/tick
    (llama-1b, pool 8, max_len 288, v5e-1), bit-identical results. Big
    buffers fall back to the scatter (the select's full-buffer rewrite
    stops paying for itself, same crossover as ``forward_with_cache``)."""
    b = tokens.shape[0]
    max_len = cache[0]["k"].shape[2]
    bidx = jnp.arange(b)

    # slot b attends to cache positions <= lengths[b] (its own new token
    # lands at lengths[b])
    k_pos = jax.lax.broadcasted_iota(jnp.int32, (b, max_len), 1)
    mask = (k_pos <= lengths[:, None])[:, None, None, :]  # (B, 1, 1, max_len)
    wpos = k_pos == lengths[:, None]  # (B, max_len): slot b's write position

    def write(buf, val):
        # val is (B, kvh, 1[, hd]) — one new position per slot
        if buf.nbytes <= _WHERE_WRITE_MAX_BYTES:
            wm = wpos[:, None, :, None] if buf.ndim == 4 else wpos[:, None, :]
            return jnp.where(wm, val.astype(buf.dtype), buf)
        return buf.at[bidx, :, lengths].set(val[:, :, 0].astype(buf.dtype))

    logits, new_cache = _cached_forward(
        params, tokens[:, None], cfg, cache, lengths[:, None], mask, write
    )
    return logits[:, 0], new_cache


def forward_block_ragged(
    params: dict,
    tokens: jax.Array,  # (B, S) — a block of S tokens per slot
    cfg: LlamaConfig,
    cache: list[dict],
    lengths: jax.Array,  # (B,) — tokens already in each slot's cache
) -> tuple[jax.Array, list[dict]]:
    """S-token generalization of ``forward_decode_ragged``: slot b ingests
    ``tokens[b, s]`` at its own cache position ``lengths[b] + s``, attending
    slots ``<= lengths[b] + s``. Returns (logits (B, S, vocab), cache).

    This is the speculative-verify primitive for the continuous-batching
    server (left-aligned slot layout, so RoPE position == cache position):
    the target model scores a draft's gamma proposals in ONE forward while
    every pool slot sits at a different length. Same select-vs-scatter
    cache-write gate as the single-token path."""
    b, s_len = tokens.shape
    max_len = cache[0]["k"].shape[2]
    bidx = jnp.arange(b)

    k_pos = jax.lax.broadcasted_iota(jnp.int32, (max_len,), 0)
    q_end = lengths[:, None, None] + jnp.arange(s_len)[None, :, None]  # (B, S, 1)
    mask = (k_pos[None, None, :] <= q_end)[:, None]  # (B, 1, S, max_len)
    positions = lengths[:, None] + jnp.arange(s_len)  # (B, S)

    def write(buf, val):
        # val: (B, kvh, S[, hd]) -> slot b's positions lengths[b] + [0, S)
        val = val.astype(buf.dtype)
        if buf.nbytes <= _WHERE_WRITE_MAX_BYTES:
            s_idx = k_pos[None, :] - lengths[:, None]  # (B, max_len)
            valid = (s_idx >= 0) & (s_idx < s_len)
            gidx = jnp.clip(s_idx, 0, s_len - 1)[:, None, :]  # (B, 1, max_len)
            if buf.ndim == 4:
                gathered = jnp.take_along_axis(val, gidx[..., None], axis=2)
                return jnp.where(valid[:, None, :, None], gathered, buf)
            gathered = jnp.take_along_axis(val, gidx, axis=2)
            return jnp.where(valid[:, None, :], gathered, buf)
        return buf.at[bidx[:, None], :, positions].set(jnp.moveaxis(val, 2, 1))

    return _cached_forward(params, tokens, cfg, cache, positions, mask, write)


# -- HF interop --------------------------------------------------------------

def params_from_hf_state_dict(state_dict: dict, cfg: LlamaConfig, dtype=jnp.float32) -> dict:
    """Convert an HF ``LlamaForCausalLM`` torch state dict to our tree.

    HF linear weights are (out, in); ours are (in, out) — transposed on
    import. Accepts torch tensors or numpy arrays.
    """
    import numpy as np

    def arr(t):
        if hasattr(t, "detach"):
            t = t.detach().to("cpu").float().numpy()
        return jnp.asarray(np.asarray(t), dtype=dtype)

    def lin(prefix):
        p = {"kernel": arr(state_dict[f"{prefix}.weight"]).T}
        if f"{prefix}.bias" in state_dict:
            p["bias"] = arr(state_dict[f"{prefix}.bias"])
        return p

    layers = {}
    for i in range(cfg.num_hidden_layers):
        pre = f"model.layers.{i}"
        layers[str(i)] = {
            "attn": {
                "q_proj": lin(f"{pre}.self_attn.q_proj"),
                "k_proj": lin(f"{pre}.self_attn.k_proj"),
                "v_proj": lin(f"{pre}.self_attn.v_proj"),
                "o_proj": lin(f"{pre}.self_attn.o_proj"),
            },
            "mlp": {
                "gate_proj": lin(f"{pre}.mlp.gate_proj"),
                "up_proj": lin(f"{pre}.mlp.up_proj"),
                "down_proj": lin(f"{pre}.mlp.down_proj"),
            },
            "input_norm": {"scale": arr(state_dict[f"{pre}.input_layernorm.weight"])},
            "post_norm": {"scale": arr(state_dict[f"{pre}.post_attention_layernorm.weight"])},
        }
    params = {
        "embed": {"embedding": arr(state_dict["model.embed_tokens.weight"])},
        "layers": layers,
        "norm": {"scale": arr(state_dict["model.norm.weight"])},
    }
    if "lm_head.weight" in state_dict:
        params["lm_head"] = {"kernel": arr(state_dict["lm_head.weight"]).T}
    return params


def count_params(params) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))


def merge_sow_to_dense(params: dict) -> dict:
    """Fold every SoW layer back to a plain dense linear subtree.

    The reference's merged-checkpoint flow (``commonsense_evaluate.py:41-48``
    loads merged safetensors into the base model): ``kernel = W_acc +
    scale * sum_i A_i B_i``.
    """
    from sow_tpu.nn.surgery import map_sow

    def fold(_, layer):
        out = {"kernel": layer.effective_weight()}
        if layer.bias is not None:
            out["bias"] = layer.bias
        return out

    return map_sow(params, fold)


def params_to_hf_state_dict(params: dict, cfg: LlamaConfig) -> dict:
    """Export to an HF ``LlamaForCausalLM`` state dict (numpy tensors,
    (out, in)-transposed linears). SoW layers are folded dense first, so the
    result loads into stock transformers for serving/eval interop."""
    import numpy as np

    params = merge_sow_to_dense(params)

    def t(x):
        # C-contiguous: device_get can hand back strided views (tunneled
        # runtime, non-lane-aligned shapes) and downstream consumers may
        # serialize raw memory — see checkpoint._flatten_with_paths
        a = np.asarray(jax.device_get(x))
        return a if a.flags.c_contiguous else np.ascontiguousarray(a)

    sd: dict = {"model.embed_tokens.weight": t(params["embed"]["embedding"])}
    for i in range(cfg.num_hidden_layers):
        lp = params["layers"][str(i)]
        pre = f"model.layers.{i}"
        for name, sub in (
            (f"{pre}.self_attn.q_proj", lp["attn"]["q_proj"]),
            (f"{pre}.self_attn.k_proj", lp["attn"]["k_proj"]),
            (f"{pre}.self_attn.v_proj", lp["attn"]["v_proj"]),
            (f"{pre}.self_attn.o_proj", lp["attn"]["o_proj"]),
            (f"{pre}.mlp.gate_proj", lp["mlp"]["gate_proj"]),
            (f"{pre}.mlp.up_proj", lp["mlp"]["up_proj"]),
            (f"{pre}.mlp.down_proj", lp["mlp"]["down_proj"]),
        ):
            sd[f"{name}.weight"] = t(sub["kernel"]).T
            if sub.get("bias") is not None:
                sd[f"{name}.bias"] = t(sub["bias"])
        sd[f"{pre}.input_layernorm.weight"] = t(lp["input_norm"]["scale"])
        sd[f"{pre}.post_attention_layernorm.weight"] = t(lp["post_norm"]["scale"])
    sd["model.norm.weight"] = t(params["norm"]["scale"])
    if "lm_head" in params:
        sd["lm_head.weight"] = t(params["lm_head"]["kernel"]).T
    return sd

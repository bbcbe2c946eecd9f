"""Cross-framework numerics parity against the PyTorch reference.

BASELINE.md gate: "Numerical parity vs PyTorch reference ... rtol <= 1e-3".
These tests run the ACTUAL reference implementation (``/root/reference``'s
``tn_gradient``, torch CPU) side by side with sow_tpu from identical weights
on identical data: forward logits through SoW-prepared models, and N
optimizer steps of factor-only finetuning with per-step loss comparison.

The bridge is ``sow_tpu.models.interop.load_reference_sow_state_dict`` — the
``load_sow`` import direction (``tn_gradient/prepare.py:188-215``) the
round-1 review flagged missing.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_PATH = "/root/reference"
if REF_PATH not in sys.path:
    sys.path.insert(0, REF_PATH)

try:
    from tn_gradient.prepare import SoWConfig as RefSoWConfig
    from tn_gradient.prepare import prepare_sow as ref_prepare_sow

    HAVE_REF = True
except Exception:  # reference tree not present (e.g. CI elsewhere)
    HAVE_REF = False

from sow_tpu.models.configs import get_config
from sow_tpu.models.interop import (
    load_reference_sow_state_dict,
    params_to_reference_sow_state_dict,
)
from sow_tpu.models.llama import (
    LLAMA_TARGET_MODULES,
    causal_lm_loss,
    forward,
    init_params,
)
from sow_tpu.nn import SoWConfig, prepare_sow
from sow_tpu.nn.sow import SoWLinear

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not HAVE_REF, reason="reference tree not available"),
]

CFG = get_config("llama_test")
RANK = 4


def build_reference_model(decompose):
    """Tiny HF llama + the reference's prepare_sow.

    init_method="normal" — the reference's "normal_QR" init hardcodes
    ``.to("cuda")`` (``tn_gradient/layer/sow.py:91``) and cannot run on CPU.
    """
    from transformers import LlamaConfig as HFConfig
    from transformers import LlamaForCausalLM

    hf_cfg = HFConfig(
        vocab_size=CFG.vocab_size,
        hidden_size=CFG.hidden_size,
        intermediate_size=CFG.intermediate_size,
        num_hidden_layers=CFG.num_hidden_layers,
        num_attention_heads=CFG.num_attention_heads,
        num_key_value_heads=CFG.kv_heads,
        max_position_embeddings=CFG.max_position_embeddings,
        rms_norm_eps=CFG.rms_norm_eps,
        rope_theta=CFG.rope_theta,
        attention_bias=False,
        tie_word_embeddings=False,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = LlamaForCausalLM(hf_cfg)
    cfg = RefSoWConfig(
        target_modules=list(LLAMA_TARGET_MODULES),
        rank=RANK,
        scale=1.0,
        device="cpu",
        init_method="normal",
        decompose=decompose,
    )
    return ref_prepare_sow(model, cfg)


def import_into_sow_tpu(model):
    """Reference model -> sow_tpu params via the interop loader."""
    template = init_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    template = prepare_sow(
        template,
        SoWConfig(
            target_modules=LLAMA_TARGET_MODULES,
            rank=RANK,
            decompose=None,
            dtype=jnp.float32,
        ),
        jax.random.PRNGKey(1),
    )
    return load_reference_sow_state_dict(template, model.state_dict(), CFG)


class TestImport:
    def test_logits_parity_keep_mode(self):
        model = build_reference_model("keep").eval()
        params = import_into_sow_tpu(model)
        ids = np.random.default_rng(0).integers(0, CFG.vocab_size, (2, 16))
        with torch.no_grad():
            ref = model(torch.tensor(ids)).logits.numpy()
        ours = np.asarray(forward(params, jnp.asarray(ids), CFG))
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=2e-4)

    def test_logits_parity_blank_mode(self):
        model = build_reference_model(None).eval()
        params = import_into_sow_tpu(model)
        # blank layers: acc buffers stayed None after import
        layer = params["layers"]["0"]["attn"]["q_proj"]
        assert isinstance(layer, SoWLinear) and layer.acc_down is None
        ids = np.random.default_rng(1).integers(0, CFG.vocab_size, (2, 12))
        with torch.no_grad():
            ref = model(torch.tensor(ids)).logits.numpy()
        ours = np.asarray(forward(params, jnp.asarray(ids), CFG))
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=2e-4)

    def test_export_roundtrip(self):
        # our tree -> reference-format tensors -> back: bit-identical values
        model = build_reference_model("keep")
        params = import_into_sow_tpu(model)
        sd = params_to_reference_sow_state_dict(params, CFG)
        again = load_reference_sow_state_dict(import_into_sow_tpu(model), sd, CFG)
        for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(again)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_export_through_safetensors_file(self, tmp_path):
        """Round-trip through an ACTUAL safetensors file into the reference's
        own ``load_sow``. This must go through real serialization:
        safetensors.numpy writes the raw buffer without normalizing memory
        order, and jax.device_get hands back Fortran-ordered arrays — the
        in-memory roundtrip above cannot catch that corruption."""
        from safetensors.numpy import save_file
        from tn_gradient.prepare import load_sow as ref_load_sow

        model = build_reference_model("keep").eval()
        params = import_into_sow_tpu(model)
        path = str(tmp_path / "ours.safetensors")
        save_file(params_to_reference_sow_state_dict(params, CFG), path)

        fresh = build_reference_model("keep").eval()
        with torch.no_grad():  # scramble — load_sow must overwrite everything
            for p in fresh.parameters():
                if p.numel():
                    p.add_(torch.randn_like(p) * 0.1)
        ref_load_sow(fresh, path)
        ids = np.random.default_rng(5).integers(0, CFG.vocab_size, (1, 10))
        with torch.no_grad():
            a = model(torch.tensor(ids)).logits.numpy()
            b = fresh(torch.tensor(ids)).logits.numpy()
        np.testing.assert_array_equal(a, b)


class TestTrainingParity:
    def test_finetune_losses_match_rtol_1e3(self):
        """N steps of factor-only AdamW finetuning, identical data: per-step
        losses within the BASELINE.md rtol-1e-3 gate (fp32)."""
        model = build_reference_model("keep")
        params = import_into_sow_tpu(model)

        # torch side: train only the SoW factor stacks
        factor_params = [
            p for n, p in model.named_parameters()
            if "downscale_weights" in n or "upscale_weights" in n
        ]
        assert factor_params
        opt = torch.optim.AdamW(factor_params, lr=1e-3, betas=(0.9, 0.999),
                                eps=1e-8, weight_decay=0.0)

        # sow_tpu side: same — the "sow" group at lr, everything else frozen
        from sow_tpu.nn import param_labels
        from sow_tpu.optim.adamw import apply_updates, grouped_adamw

        labels = param_labels(params)
        jopt = grouped_adamw(labels, lrs={"sow": 1e-3, "regular": 0.0})
        jstate = jopt.init(params)

        def loss_fn(p, ids):
            logits = forward(p, ids, CFG)
            return causal_lm_loss(logits, ids)

        @jax.jit
        def jstep(p, s, ids):
            l, g = jax.value_and_grad(loss_fn)(p, ids)
            u, s = jopt.update(g, s, p)
            return apply_updates(p, u), s, l

        rng = np.random.default_rng(7)
        drift = []
        for step in range(5):
            ids = rng.integers(0, CFG.vocab_size, (4, 16))
            tids = torch.tensor(ids)
            out = model(tids, labels=tids)
            opt.zero_grad()
            out.loss.backward()
            opt.step()
            ref_loss = float(out.loss.detach())

            params, jstate, jl = jstep(params, jstate, jnp.asarray(ids))
            ours_loss = float(jl)
            drift.append(abs(ours_loss - ref_loss) / ref_loss)
            np.testing.assert_allclose(ours_loss, ref_loss, rtol=1e-3)
        # measured drift is recorded in PARITY.md; keep a visible trace here
        print("per-step relative loss drift:", [f"{d:.2e}" for d in drift])

"""On-chip parity check for the orbax checkpoint path.

The safetensors path was corrupted by the tunneled runtime returning
non-contiguous device_get views (see checkpoint.py postmortem); orbax
serializes through tensorstore, which goes through the numpy API and
should be stride-safe — but on a runtime that has burned us once, verify:
train a small model with donated steps, orbax-save, restore into a fresh
trainer, and assert bit-level equality + eval-loss parity.
"""
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from sow_tpu.checkpoint import _checksum_single
from sow_tpu.checkpoint_orbax import OrbaxCheckpointer
from sow_tpu.data.c4 import make_pretrain_stream
from sow_tpu.train.trainer import TrainConfig, Trainer

MODEL = sys.argv[1] if len(sys.argv) > 1 else "llama_9m"
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 32
SEQ = int(sys.argv[3]) if len(sys.argv) > 3 else 128
STEPS = int(sys.argv[4]) if len(sys.argv) > 4 else 30
cfg = TrainConfig(model=MODEL, architecture="linear", batch_size=BATCH, max_length=SEQ)
tr = Trainer(cfg)
stream = iter(make_pretrain_stream(BATCH, SEQ, tr.model_cfg.vocab_size, seed=0, synthetic=True))
batches = [next(stream) for _ in range(STEPS + 1)]
for b in batches[:STEPS]:
    tr.step(jnp.asarray(b["input_ids"]))
live = tr.evaluate(iter([batches[STEPS]]), max_tokens=BATCH * SEQ)["eval_loss"]
with tempfile.TemporaryDirectory() as d:
    ck = OrbaxCheckpointer(os.path.join(d, "o"), max_to_keep=1, async_save=False)
    ck.save(STEPS, tr.params, tr.opt_state)
    ck.wait()
    tr2 = Trainer(cfg)
    restored, _ = ck.restore_params(tr2.params)
    tr2.params = restored
    rest = tr2.evaluate(iter([batches[STEPS]]), max_tokens=BATCH * SEQ)["eval_loss"]
    flat1 = jax.tree_util.tree_flatten_with_path(tr.params)[0]
    flat2 = {jax.tree_util.keystr(p): l for p, l in jax.tree_util.tree_flatten_with_path(tr2.params)[0]}
    bad = [jax.tree_util.keystr(p) for p, l in flat1
           if int(_checksum_single(l)) != int(_checksum_single(flat2[jax.tree_util.keystr(p)]))]
    ck.close()
print(json.dumps({
    "metric": "orbax_chip_parity", "live_eval": live, "restored_eval": rest,
    "bit_mismatched_leaves": len(bad), "ok": not bad and abs(live - rest) < 1e-4,
    "first_bad": bad[:3],
}))

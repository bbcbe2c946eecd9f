"""Built-in byte-level tokenizer — no network, no vocab files.

The reference always pulls a tokenizer from the HF hub (t5-base for
pretraining, the base model's for finetuning). For smoke tests, offline
environments and byte-level experiments this provides a dependency-free
stand-in with the HF call convention the data pipelines use
(``__call__(text, max_length=, truncation=, padding=, return_tensors=)``,
``decode``, ``pad_token_id`` / ``eos_token_id``).

Vocabulary: 0 = pad, 1 = eos/bos, bytes b are 2 + b (vocab size 258).
"""

from __future__ import annotations

import numpy as np

VOCAB_SIZE = 258
PAD_ID = 0
EOS_ID = 1
_OFFSET = 2


class ByteTokenizer:
    pad_token_id = PAD_ID
    eos_token_id = EOS_ID
    bos_token_id = EOS_ID
    pad_token = "<pad>"
    eos_token = "</s>"
    vocab_size = VOCAB_SIZE

    def __call__(self, text, max_length=None, truncation=False, padding=None,
                 return_tensors=None, **_):
        if isinstance(text, (list, tuple)):
            outs = [self(t, max_length, truncation, padding, None) for t in text]
            ids = [o["input_ids"] for o in outs]
            mask = [o["attention_mask"] for o in outs]
            if return_tensors == "np":
                return {"input_ids": np.asarray(ids, np.int32),
                        "attention_mask": np.asarray(mask, np.int32)}
            return {"input_ids": ids, "attention_mask": mask}

        ids = [_OFFSET + b for b in text.encode("utf-8")]
        if truncation and max_length:
            ids = ids[:max_length]
        mask = [1] * len(ids)
        if padding == "max_length" and max_length:
            pad = max_length - len(ids)
            ids = ids + [PAD_ID] * pad
            mask = mask + [0] * pad
        if return_tensors == "np":
            return {"input_ids": np.asarray([ids], np.int32),
                    "attention_mask": np.asarray([mask], np.int32)}
        return {"input_ids": ids, "attention_mask": mask}

    def decode(self, ids, skip_special_tokens: bool = True):
        out = bytearray()
        for i in np.asarray(ids).ravel().tolist():
            if i >= _OFFSET:
                out.append(i - _OFFSET)
            elif not skip_special_tokens:
                out.extend(b"<pad>" if i == PAD_ID else b"</s>")
        return out.decode("utf-8", errors="replace")

    def batch_decode(self, batch, skip_special_tokens: bool = True):
        return [self.decode(row, skip_special_tokens) for row in np.asarray(batch)]


def load_tokenizer_or_byte(name: str | None):
    """HF tokenizer by name, or the builtin when ``name`` is "byte"/None and
    the hub is unreachable."""
    if name == "byte":
        return ByteTokenizer()
    try:
        from transformers import AutoTokenizer

        return AutoTokenizer.from_pretrained(name or "t5-base", model_max_length=int(1e9))
    except Exception as e:
        print(f"[tokenizer] {name!r} unavailable ({type(e).__name__}); using byte tokenizer")
        return ByteTokenizer()

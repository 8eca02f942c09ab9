"""Tokenizer loading with an offline-safe fallback.

The reference always loads HF tokenizers (duo_attn/utils.py:288-299). This
environment may have no checkpoints, so eval harnesses and tests can fall
back to a deterministic byte-level tokenizer — the harness logic is
tokenizer-agnostic.
"""

from __future__ import annotations

from typing import List, Optional


class ByteTokenizer:
    """Deterministic byte-level tokenizer: id = byte + 3 (0=pad, 1=bos, 2=eos)."""

    pad_token_id = 0
    bos_token_id = 1
    eos_token_id = 2
    vocab_size = 259

    def encode(self, text: str, add_bos: bool = True) -> List[int]:
        ids = [b + 3 for b in text.encode("utf-8")]
        return [self.bos_token_id] + ids if add_bos else ids

    def decode(self, ids, skip_special_tokens: bool = True) -> str:
        # ids outside the byte range (e.g. from random-weight test models
        # with a larger vocab) are dropped rather than crashing
        data = bytes(int(i) - 3 for i in ids if 3 <= int(i) < 259)
        return data.decode("utf-8", errors="ignore")

    def __call__(self, text: str, **kw):
        return {"input_ids": self.encode(text)}


def get_tokenizer(name_or_path: Optional[str] = None):
    """HF tokenizer when available, ByteTokenizer otherwise."""
    if name_or_path in (None, "byte"):
        return ByteTokenizer()
    try:
        from transformers import AutoTokenizer

        return AutoTokenizer.from_pretrained(name_or_path, trust_remote_code=True)
    except Exception:
        return ByteTokenizer()


def encode_ids(tokenizer, text: str) -> List[int]:
    if isinstance(tokenizer, ByteTokenizer):
        return tokenizer.encode(text)
    return tokenizer(text, truncation=False, return_tensors=None)["input_ids"]


def decode_ids(tokenizer, ids) -> str:
    return tokenizer.decode(list(map(int, ids)), skip_special_tokens=True)

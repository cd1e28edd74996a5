"""Tokenizers: local-HF loader + a self-contained byte tokenizer.

The reference tokenizes through HF AutoProcessor/AutoTokenizer pulled from
the hub (mm/forget.py:53, nlp/finetune.py:*).  TPU pods here are zero-egress,
so the framework accepts either:

- a *local* HF tokenizer directory (``load_tokenizer(path)`` wraps
  ``transformers.AutoTokenizer`` — files must already be on disk), or
- ``ByteTokenizer`` — a dependency-free byte-level tokenizer used by tests,
  synthetic benchmarks, and any tiny-* model family.
"""

from __future__ import annotations

from pathlib import Path


class ByteTokenizer:
    """Byte-level tokenizer with reserved special ids.

    ids: 0=pad, 1=bos, 2=eos, ``image_token_id`` reserved for the image
    placeholder; bytes occupy the remaining id space (wrapped to fit small
    test vocabs).
    """

    def __init__(self, vocab_size: int = 256, image_token: str = "<image>", image_token_id: int = 250):
        self.vocab_size = vocab_size
        self.pad_token_id = 0
        self.bos_token_id = 1
        self.eos_token_id = 2
        self.image_token = image_token
        self.image_token_id = image_token_id
        self._byte_base = 3
        # bytes wrap around the usable id range, skipping the image id
        self._span = vocab_size - self._byte_base

    def _byte_id(self, b: int) -> int:
        i = self._byte_base + (b % self._span)
        if i == self.image_token_id:
            i = self._byte_base
        return i

    def encode(self, text: str, add_special_tokens: bool = False) -> list[int]:
        ids: list[int] = []
        if add_special_tokens:
            ids.append(self.bos_token_id)
        rest = text
        while rest:
            j = rest.find(self.image_token)
            if j == -1:
                ids.extend(self._byte_id(b) for b in rest.encode("utf-8"))
                break
            ids.extend(self._byte_id(b) for b in rest[:j].encode("utf-8"))
            ids.append(self.image_token_id)
            rest = rest[j + len(self.image_token):]
        return ids

    def decode(self, ids, skip_special_tokens: bool = True) -> str:
        out = []
        for i in ids:
            i = int(i)
            if i == self.image_token_id:
                if not skip_special_tokens:
                    out.append(self.image_token.encode())
                continue
            if i < self._byte_base or i >= self._byte_base + 256:
                # ids past the byte range (models whose vocab_size exceeds the
                # byte table, e.g. random-init gen) decode to nothing — same
                # as HF tokenizers silently skipping unknown ids
                continue
            out.append(bytes([i - self._byte_base]))
        return b"".join(
            o if isinstance(o, bytes) else o for o in out
        ).decode("utf-8", errors="ignore")


class HFTokenizerWrapper:
    """Thin adapter over a local transformers tokenizer."""

    def __init__(self, tok, image_token: str = "<image>"):
        self.tok = tok
        self.image_token = image_token
        self.pad_token_id = tok.pad_token_id if tok.pad_token_id is not None else tok.eos_token_id
        self.eos_token_id = tok.eos_token_id
        self.bos_token_id = tok.bos_token_id
        self.vocab_size = len(tok)
        ids = tok.convert_tokens_to_ids([image_token])
        self.image_token_id = ids[0] if ids and ids[0] is not None else -1

    def encode(self, text: str, add_special_tokens: bool = False) -> list[int]:
        return self.tok.encode(text, add_special_tokens=add_special_tokens)

    def decode(self, ids, skip_special_tokens: bool = True) -> str:
        return self.tok.decode(list(map(int, ids)), skip_special_tokens=skip_special_tokens)


def load_tokenizer(path: str | Path | None, **kw):
    """Local HF dir → HFTokenizerWrapper; None/'byte' → ByteTokenizer."""
    if path is None or str(path) == "byte":
        return ByteTokenizer(**kw)
    from transformers import AutoTokenizer

    tok = AutoTokenizer.from_pretrained(str(path), local_files_only=True)
    return HFTokenizerWrapper(tok, image_token=kw.get("image_token", "<image>"))

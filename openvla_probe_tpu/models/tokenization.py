"""Host-side tokenizer loading (Llama sentencepiece-BPE via `tokenizers`).

The accelerator never tokenizes; this wraps a fast tokenizer with the small
contract the framework needs (encode with BOS, decode, vocab_size) and
enforces the reference's BOS contract (prismatic models/backbones/llm/
base_llm.py:175-180: every encode must start with BOS).
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional, Union


class HostTokenizer:
    """Thin adapter over a HF fast tokenizer object."""

    def __init__(self, hf_tokenizer, bos_token_id: int = 1) -> None:
        self.hf = hf_tokenizer
        self.bos_token_id = bos_token_id
        vocab = getattr(hf_tokenizer, "vocab_size", None)
        self.vocab_size = int(vocab) if vocab else len(hf_tokenizer.get_vocab())

    def encode(self, text: str) -> List[int]:
        ids = self.hf.encode(text)
        if hasattr(ids, "ids"):  # raw `tokenizers.Tokenizer` returns Encoding
            ids = ids.ids
        if not ids or ids[0] != self.bos_token_id:
            ids = [self.bos_token_id] + list(ids)
        return list(ids)

    def decode(self, ids: List[int], skip_special_tokens: bool = False) -> str:
        return self.hf.decode(list(ids), skip_special_tokens=skip_special_tokens)

    def __call__(self, text: str):
        return self.encode(text)


def load_tokenizer(path_or_id: Union[str, Path]) -> HostTokenizer:
    """Load from a local checkpoint dir (tokenizer.json / tokenizer.model)."""
    path = Path(path_or_id)
    if (path / "tokenizer.json").exists():
        from tokenizers import Tokenizer

        tok = Tokenizer.from_file(str(path / "tokenizer.json"))
        bos = tok.token_to_id("<s>")
        return HostTokenizer(tok, bos_token_id=bos if bos is not None else 1)
    # fall back to transformers (requires local files; no hub egress)
    from transformers import AutoTokenizer

    hf = AutoTokenizer.from_pretrained(str(path_or_id), local_files_only=True)
    return HostTokenizer(hf, bos_token_id=hf.bos_token_id or 1)

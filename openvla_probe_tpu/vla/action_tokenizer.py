"""Discrete action <-> token codec (pure jnp; host numpy mirror for the data pipeline).

Semantics match the reference exactly so greedy action tokens are bit-comparable
(reference: prismatic/vla/action_tokenizer.py:13-72 and the serving-twin inverse in
prismatic/extern/hf/modeling_prismatic.py:500-535):

  * 256 uniform bin edges over [-1, 1]; 255 bin centers at edge midpoints.
  * tokenize:   a -> clip(a, -1, 1) -> digitize over edges (index in [1, 256])
                -> token_id = vocab_size - index   (actions live in the LAST 256
                vocabulary slots, overwriting the least-used text tokens).
  * detokenize: token_id -> index = vocab_size - token_id
                -> center = bin_centers[clip(index - 1, 0, 254)]
                (the off-by-one clip is part of the contract: edge-value 1.0
                digitizes to 256, whose "center" is the last midpoint).
  * The serving twin computes vocab_size = text_vocab - pad_to_multiple_of
    (32064 - 64 = 32000 for Llama-2 + Vicuña pad round-up); the native model
    uses the tokenizer's true vocab_size (32000 for Llama-2). Both land on the
    same 32000 for the released OpenVLA models.

On-device everything is jnp so the whole decode -> detokenize -> unnormalize chain
fuses into one jit; ``ActionTokenizer`` is the numpy twin used by the host-side
RLDS pipeline (string round-trip through the text tokenizer).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import TYPE_CHECKING, List, Optional, Union

import jax.numpy as jnp
import numpy as np

if TYPE_CHECKING:  # host tokenizer protocol (anything with decode/vocab_size)
    from typing import Protocol

    class _HostTokenizer(Protocol):
        vocab_size: int

        def decode(self, ids: List[int]) -> str: ...


@dataclass(frozen=True)
class ActionCodec:
    """Stateless jnp codec: token ids <-> continuous actions in [-1, 1]."""

    vocab_size: int = 32000
    n_bins: int = 256
    min_action: float = -1.0
    max_action: float = 1.0

    @property
    def bins(self) -> np.ndarray:
        return np.linspace(self.min_action, self.max_action, self.n_bins)

    @property
    def bin_centers(self) -> np.ndarray:
        b = self.bins
        return (b[:-1] + b[1:]) / 2.0

    @property
    def action_token_begin_idx(self) -> int:
        return self.vocab_size - (self.n_bins + 1)

    # --- device path (jnp, jit-safe) ---------------------------------------
    def encode(self, actions: jnp.ndarray) -> jnp.ndarray:
        """Continuous actions -> token ids. jnp equivalent of np.digitize over
        uniform edges: index = ceil((a - lo) / step) for a in (lo, hi], 1 at lo."""
        a = jnp.clip(actions, self.min_action, self.max_action)
        # NOTE: TPU runs f32 (x64 disabled); actions inside the ~6e-8 window
        # between an exact float64 linspace edge and its float32 rounding can
        # tokenize one bin off vs the reference's float64 np.digitize. The
        # data pipeline and parity harnesses therefore use the numpy host
        # twin (`ActionTokenizer`); this device encoder exists for in-graph
        # uses where that boundary dust is acceptable.
        edges = jnp.asarray(self.bins, dtype=jnp.float32)
        # digitize(right=False): number of edges <= a ... np.digitize returns
        # the index i such that bins[i-1] <= a < bins[i]; implement via searchsorted.
        idx = jnp.searchsorted(edges, a.astype(jnp.float32), side="right")
        return (self.vocab_size - idx).astype(jnp.int32)

    def decode(self, token_ids: jnp.ndarray) -> jnp.ndarray:
        """Token ids -> bin-center actions (the documented off-by-one clip)."""
        centers = jnp.asarray(self.bin_centers, dtype=jnp.float32)
        idx = self.vocab_size - token_ids.astype(jnp.int32)
        idx = jnp.clip(idx - 1, 0, self.n_bins - 2)
        return centers[idx]

    def unnormalize(
        self,
        actions: jnp.ndarray,
        q01: jnp.ndarray,
        q99: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Invert q01/q99 bounds normalization: a in [-1,1] -> raw action units.
        Dims where ``mask`` is False pass through untouched (e.g. gripper)."""
        q01 = jnp.asarray(q01, dtype=jnp.float32)
        q99 = jnp.asarray(q99, dtype=jnp.float32)
        raw = 0.5 * (actions + 1.0) * (q99 - q01) + q01
        if mask is None:
            return raw
        return jnp.where(jnp.asarray(mask, dtype=bool), raw, actions)

    def decode_and_unnormalize(
        self,
        token_ids: jnp.ndarray,
        q01: jnp.ndarray,
        q99: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        return self.unnormalize(self.decode(token_ids), q01, q99, mask)


class ActionTokenizer:
    """Host-side numpy twin wrapping a text tokenizer (data-pipeline use).

    ``__call__`` renders actions as the decoded string of their action tokens
    (what gets appended to the training prompt); ``decode_token_ids_to_actions``
    is the inverse used for L1 metrics during training.
    """

    def __init__(
        self,
        tokenizer: "_HostTokenizer",
        bins: int = 256,
        min_action: float = -1.0,
        max_action: float = 1.0,
    ) -> None:
        self.tokenizer = tokenizer
        self.codec = ActionCodec(
            vocab_size=int(tokenizer.vocab_size),
            n_bins=bins,
            min_action=min_action,
            max_action=max_action,
        )
        self.bins = self.codec.bins
        self.bin_centers = self.codec.bin_centers

    @property
    def vocab_size(self) -> int:
        return self.codec.vocab_size

    @property
    def action_token_begin_idx(self) -> int:
        return self.codec.action_token_begin_idx

    def encode_to_ids(self, action: np.ndarray) -> np.ndarray:
        a = np.clip(action, self.codec.min_action, self.codec.max_action)
        idx = np.digitize(a, self.bins)
        return (self.vocab_size - idx).astype(np.int64)

    def __call__(self, action: np.ndarray) -> Union[str, List[str]]:
        ids = self.encode_to_ids(np.asarray(action))
        if ids.ndim <= 1:
            return self.tokenizer.decode(ids.tolist())
        return [self.tokenizer.decode(row.tolist()) for row in ids]

    def decode_token_ids_to_actions(self, token_ids: np.ndarray) -> np.ndarray:
        idx = self.vocab_size - np.asarray(token_ids)
        idx = np.clip(idx - 1, 0, self.codec.n_bins - 2)
        return self.bin_centers[idx]

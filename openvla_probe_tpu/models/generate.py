"""Greedy text generation + candidate-string scoring for the base VLM.

Equivalent of the reference VLM's GenerationMixin surface
(prismatic/models/vlms/prismatic.py:488-621: generate, generate_batch with
string-probability scoring). Greedy only (the reference's VLA/eval paths are
greedy); EOS-terminated; prompts right-padded to a bucket so one compilation
serves a session.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import llama, vlm

EOS_TOKEN_ID = 2


def _bucket(n: int, step: int = 64) -> int:
    return ((n + step - 1) // step) * step


@functools.partial(jax.jit, static_argnames=("cfg", "max_new_tokens", "do_sample", "top_k"))
def _generate_jit(
    params, cfg: vlm.VLMConfig,
    input_ids, prompt_len, pixel_values,
    max_new_tokens: int,
    do_sample: bool = False,
    temperature=1.0,
    top_k: int = 50,
    rng_key=None,
):
    def pick(logits, t):
        """Next token: greedy argmax, or temperature/top-k sampling (the
        reference REPL's do_sample/temperature flags route into HF generate,
        whose sampling default applies top_k=50 — mirrored here)."""
        if not do_sample:
            return logits.argmax(-1).astype(jnp.int32)
        lg = logits.astype(jnp.float32) / jnp.maximum(temperature, 1e-6)
        if top_k:
            kth = jax.lax.top_k(lg, top_k)[0][:, -1:]
            lg = jnp.where(lg < kth, -jnp.inf, lg)
        return jax.random.categorical(jax.random.fold_in(rng_key, t), lg).astype(jnp.int32)

    B, P = input_ids.shape
    prompt_mask = (jnp.arange(P)[None] < prompt_len[:, None]).astype(jnp.int32)
    if pixel_values is not None:
        mm = vlm.build_multimodal_inputs(params, cfg, input_ids, prompt_mask, pixel_values)
        embeds, mask = mm["inputs_embeds"], mm["attn_mask"]
        N = cfg.num_patches
    else:
        embeds = llama.embed_tokens(params["llm"], input_ids)
        mask, N = prompt_mask, 0
    T = embeds.shape[1]
    S = T + max_new_tokens
    mm_len = N + prompt_len if pixel_values is not None else prompt_len

    cache = llama.KVCache.zeros(cfg.llm, B, S, dtype=cfg.llm.dtype)
    positions = jnp.broadcast_to(jnp.arange(T), (B, T))
    out = llama.forward(
        params["llm"], cfg.llm, embeds, jnp.pad(mask, ((0, 0), (0, S - T))), positions,
        cache=cache, cache_index=jnp.int32(0), compute_logits=False,
    )
    D = out["last_hidden_state"].shape[-1]
    last_idx = (mm_len - 1)[:, None, None]
    last_h = jnp.take_along_axis(
        out["last_hidden_state"], jnp.broadcast_to(last_idx, (B, 1, D)), axis=1
    )[:, 0]
    from ..ops.linear import matmul_t

    first = pick(matmul_t(last_h, params["llm"]["lm_head"]), 0)
    slots = jnp.arange(S)[None, :]

    def step(carry, t):
        cache, tok, done = carry
        e = llama.embed_tokens(params["llm"], tok[:, None])
        pos = (mm_len + t)[:, None]
        valid = (slots < mm_len[:, None]) | ((slots >= T) & (slots <= T + t))
        o = llama.forward(params["llm"], cfg.llm, e, valid.astype(jnp.int32), pos,
                          cache=cache, cache_index=jnp.int32(T) + t)
        nxt = pick(o["logits"][:, -1], t + 1)
        done = done | (tok == EOS_TOKEN_ID)
        nxt = jnp.where(done, EOS_TOKEN_ID, nxt)
        return (o["cache"], nxt, done), nxt

    (_, _, _), toks = jax.lax.scan(
        step, (out["cache"], first, jnp.zeros((B,), bool)),
        jnp.arange(max_new_tokens - 1, dtype=jnp.int32),
    )
    return jnp.concatenate([first[:, None], toks.T], axis=1)  # [B, max_new_tokens]


def generate_text(
    params: Dict[str, Any],
    cfg: vlm.VLMConfig,
    tokenizer: Any,
    prompt_ids: Sequence[int],
    pixel_values: Optional[jnp.ndarray] = None,
    max_new_tokens: int = 128,
    do_sample: bool = False,
    temperature: float = 1.0,
    top_k: int = 50,
    seed: int = 0,
) -> str:
    """Single-prompt generation -> decoded text (EOS-trimmed).

    do_sample=False is greedy (bit-exact path); do_sample=True mirrors the
    reference REPL's temperature sampling (scripts/generate.py:44-45,119-120
    -> HF generate, whose sampling default applies top_k=50)."""
    ids = list(prompt_ids)
    P = _bucket(len(ids))
    padded = np.zeros((1, P), np.int32)
    padded[0, : len(ids)] = ids
    toks = np.asarray(_generate_jit(
        params, cfg, jnp.asarray(padded), jnp.asarray([len(ids)], jnp.int32),
        None if pixel_values is None else jnp.asarray(pixel_values),
        max_new_tokens,
        do_sample=do_sample,
        temperature=jnp.float32(temperature),
        top_k=top_k if do_sample else 0,
        rng_key=jax.random.key(seed) if do_sample else jax.random.key(0),
    ))[0]
    out = []
    for t in toks:
        if t == EOS_TOKEN_ID:
            break
        out.append(int(t))
    return tokenizer.decode(out, skip_special_tokens=True).strip()


def generate_greedy(
    params: Dict[str, Any],
    cfg: vlm.VLMConfig,
    tokenizer: Any,
    prompt_ids: Sequence[int],
    pixel_values: Optional[jnp.ndarray] = None,
    max_new_tokens: int = 128,
) -> str:
    """Single-prompt greedy generation -> decoded text (EOS-trimmed)."""
    return generate_text(params, cfg, tokenizer, prompt_ids, pixel_values,
                         max_new_tokens)


def generate_greedy_batch(
    params: Dict[str, Any],
    cfg: vlm.VLMConfig,
    tokenizer: Any,
    prompts_ids: Sequence[Sequence[int]],
    pixel_values: Optional[jnp.ndarray] = None,   # [B, 3K, S, S] preprocessed per-row, or None
    max_new_tokens: int = 128,
) -> List[str]:
    """Batched greedy generation: ONE bucketed jit call decodes every prompt.

    _generate_jit is already per-row (per-row prompt_len masks, per-row EOS
    latching), so rows are independent: prompts right-pad to a length bucket,
    the batch pads to a row bucket by duplicating row 0 (discarded), and the
    same compilation serves any batch within the buckets — the batched twin
    of the reference's generate_batch (prismatic.py:569-621), which looped
    examples one generate() at a time."""
    B = len(prompts_ids)
    P = _bucket(max(len(p) for p in prompts_ids))
    Bb = _bucket(B, 8)
    padded = np.zeros((Bb, P), np.int32)
    lens = np.zeros((Bb,), np.int32)
    for i, ids in enumerate(prompts_ids):
        padded[i, : len(ids)] = list(ids)
        lens[i] = len(ids)
    padded[B:] = padded[0]
    lens[B:] = lens[0]
    pix = None
    if pixel_values is not None:
        pv = jnp.asarray(pixel_values)
        if pv.shape[0] != B:
            raise ValueError(f"pixel_values rows {pv.shape[0]} != batch {B}")
        pad = jnp.broadcast_to(pv[:1], (Bb - B, *pv.shape[1:]))
        pix = jnp.concatenate([pv, pad], axis=0) if Bb > B else pv
    toks = np.asarray(_generate_jit(
        params, cfg, jnp.asarray(padded), jnp.asarray(lens), pix,
        max_new_tokens, rng_key=jax.random.key(0),
    ))
    outs = []
    for b in range(B):
        row = []
        for t in toks[b]:
            if t == EOS_TOKEN_ID:
                break
            row.append(int(t))
        outs.append(tokenizer.decode(row, skip_special_tokens=True).strip())
    return outs


IGNORE_INDEX = -100


@functools.partial(jax.jit, static_argnames=("cfg",))
def _score_jit(params, cfg: vlm.VLMConfig, ids, row_len, cand_start, pixel_values):
    """Sum of candidate-token logprobs per row. ids [C, L] right-padded;
    candidate tokens occupy [cand_start, row_len) of each (unspliced) row."""
    C, L = ids.shape
    pos = jnp.arange(L)[None, :]
    mask = (pos < row_len[:, None]).astype(jnp.int32)
    labels = jnp.where(
        (pos >= cand_start[:, None]) & (pos < row_len[:, None]),
        ids, IGNORE_INDEX,
    )
    out = vlm.forward(params, cfg, ids, mask, pixel_values, labels=labels)
    logits, lbls = out["logits"], out["labels"]
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    tgt = lbls[:, 1:]
    valid = tgt != IGNORE_INDEX
    tok_lp = jnp.take_along_axis(
        logp, jnp.where(valid, tgt, 0)[..., None], axis=-1
    )[..., 0]
    return jnp.sum(jnp.where(valid, tok_lp, 0.0), axis=1)


def score_continuation_rows(
    params: Dict[str, Any],
    cfg: vlm.VLMConfig,
    rows: List[Tuple[Sequence[int], int]],   # [(full_ids, start)]
    pixel_values: Optional[jnp.ndarray] = None,
) -> np.ndarray:
    """Log-probability of full_ids[start:] given full_ids[:start], per row.

    Per-row split points matter: a sentencepiece boundary token can re-merge
    with a continuation (e.g. trailing "▁" + "blue" -> "▁blue"), so each
    candidate owns its (context, continuation) split — scoring every choice
    against one shared prompt tokenization conditions different choices on
    different effective contexts (double space vs single) and biases the
    argmax. ONE batched, bucketed jit call scores all rows."""
    C = len(rows)
    L = _bucket(max(len(f) for f, _ in rows))
    Cb = _bucket(C, 8)
    ids = np.zeros((Cb, L), np.int32)
    row_len = np.zeros((Cb,), np.int32)
    starts = np.zeros((Cb,), np.int32)
    for i, (full, st) in enumerate(rows):
        ids[i, : len(full)] = list(full)
        row_len[i] = len(full)
        starts[i] = st
    ids[C:] = ids[0]
    row_len[C:] = row_len[0]
    starts[C:] = starts[0]
    pix = None
    if pixel_values is not None:
        pv = jnp.asarray(pixel_values)
        if pv.ndim == 4 and pv.shape[0] == C:
            # per-row pixels (cross-example batching): pad rows to the bucket
            pad = jnp.broadcast_to(pv[:1], (Cb - C, *pv.shape[1:]))
            pix = jnp.concatenate([pv, pad], axis=0) if Cb > C else pv
        else:
            # one shared image for every row (single-example scoring)
            pix = jnp.broadcast_to(pv, (Cb, *pv.shape[-3:]))
    scores = _score_jit(
        params, cfg, jnp.asarray(ids), jnp.asarray(row_len),
        jnp.asarray(starts), pix,
    )
    return np.asarray(scores)[:C]


def score_candidates(
    params: Dict[str, Any],
    cfg: vlm.VLMConfig,
    prompt_ids: Sequence[int],
    candidate_ids: List[Sequence[int]],
    pixel_values: Optional[jnp.ndarray] = None,
) -> np.ndarray:
    """Log-probability of each candidate continuation given the prompt — the
    reference's string-probability scoring (prismatic.py:569-621) used for
    multiple-choice VQA evals.

    ONE batched, bucketed jit call scores every candidate: sequences right-pad
    to a length bucket and the candidate count pads to a row bucket, so a
    16-way VQA eval compiles once (the reference — and round 1 — re-ran a
    full unjitted forward per candidate, recompiling per unique length)."""
    plen = len(prompt_ids)
    rows = [(list(prompt_ids) + list(c), plen) for c in candidate_ids]
    return score_continuation_rows(params, cfg, rows, pixel_values)

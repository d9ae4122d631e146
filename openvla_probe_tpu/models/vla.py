"""OpenVLA serving path: preprocess -> prefill -> greedy decode -> action, one jit.

TPU-first re-design of the reference's two-model, host-hopping hot path
(extern/hf/modeling_prismatic.py:506-536 predict_action +
prismatic/models/vlas/openvla.py:23-131): everything from the channel-stacked
pixel tensor to the un-normalized 7-DoF action runs inside a single compiled
graph —

  pixels -> dual ViT -> projector -> [BOS | patches | prompt] prefill (KV cache)
         -> lax.scan greedy decode of `action_dim` tokens
         -> 256-bin de-tokenize -> q01/q99 un-normalize

with optional per-layer mean-pooled hidden-state taps emitted from the SAME
prefill (the reference pays a second full forward for capture,
openvla_utils.py:188-203).

Shape policy (XLA static shapes): prompts are right-padded to a fixed bucket
`prompt_pad_len`; true lengths ride in as traced scalars, so one compilation
serves every prompt up to the bucket. Decoded tokens are written at fixed
cache slots after the pad region with their true (un-padded) RoPE positions,
and pad slots are masked out of attention — results are identical to an
unpadded run. Batched serving works out of the box (the reference is
hard-limited to batch 1, modeling_prismatic.py:326).

Greedy semantics match the reference exactly: argmax over the FULL vocab at
every step, exactly `action_dim` new tokens, no EOS handling; the trailing
empty token 29871 is appended host-side if absent (modeling_prismatic.py:512-515)
and excluded from capture pooling (the reference's capture forward runs on the
un-appended inputs).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.image import ImageTransformConfig, apply_image_transform
from ..vla.action_tokenizer import ActionCodec
from . import llama, vlm

Params = Dict[str, Any]

EMPTY_TOKEN_ID = 29871  # Llama sentencepiece "▁"; the reference's forced prompt suffix

_top2_margin = llama.top2_margin


@dataclasses.dataclass(frozen=True)
class VLAServingConfig:
    vlm: vlm.VLMConfig
    action_dim: int = 7
    prompt_pad_len: int = 48
    codec_vocab_size: int = 32000  # text vocab minus the 64-row pad round-up

    @property
    def prefill_len(self) -> int:
        return 1 + self.vlm.num_patches + self.prompt_pad_len - 1  # BOS + patches + prompt[1:]

    @property
    def cache_len(self) -> int:
        return self.prefill_len + self.action_dim


def predict_action_core(
    params: Params,
    cfg: VLAServingConfig,
    pixel_values: jnp.ndarray,    # [B, 3K, S, S] preprocessed (or raw via preprocess=True path)
    input_ids: jnp.ndarray,       # [B, P] right-padded, starts with BOS, ends (at prompt_len-1) with 29871
    prompt_len: jnp.ndarray,      # [B] true prompt lengths (incl. BOS and 29871)
    q01: jnp.ndarray,             # [B, A] or [A]
    q99: jnp.ndarray,
    action_mask: jnp.ndarray,     # [B, A] or [A] bool; False dims pass through
    collect_hidden_states: bool = False,
    return_first_logits: bool = False,
) -> Dict[str, jnp.ndarray]:
    import os

    c = cfg.vlm
    B, P = input_ids.shape
    N = c.num_patches
    A = cfg.action_dim
    codec = ActionCodec(vocab_size=cfg.codec_vocab_size)

    # --- multimodal prefill ---------------------------------------------
    prompt_mask = (jnp.arange(P)[None, :] < prompt_len[:, None]).astype(jnp.int32)
    mm = vlm.build_multimodal_inputs(params, c, input_ids, prompt_mask, pixel_values)
    embeds, mm_mask = mm["inputs_embeds"], mm["attn_mask"]            # [B, T], T = 1+N+P-1...
    T = embeds.shape[1]                                               # = 1 + N + (P - 1) + 1 = N + P
    mm_len = 1 + N + (prompt_len - 1)                                 # [B] true multimodal length

    positions = jnp.broadcast_to(jnp.arange(T), (B, T))
    pool_mask = None
    if collect_hidden_states:
        # capture parity: pool over [BOS | patches | prompt] EXCLUDING the
        # appended trailing 29871 (reference forward #1 runs without it)
        pool_mask = (jnp.arange(T)[None, :] < (mm_len - 1)[:, None]).astype(jnp.int32)

    # A/B-measured on 1x v5e (int8, this round): the stacked-cache scan is the
    # FASTEST decode (B=24: 613 ms vs 641 unrolled / 654 scan-xs split-KV;
    # B=16: 434 vs 450) — XLA fuses the carry's dynamic_index into attention,
    # so the split-prefill-KV redesign buys nothing under XLA. It stays
    # env-gated (OVLA_LEGACY_DECODE=0) as the structural basis for a future
    # Pallas decode kernel (which needs the frozen-KV layout).
    # OVLA_KV_INT8 lives on the frozen-KV path, so requesting it implies
    # OVLA_LEGACY_DECODE=0 unless the user forces legacy explicitly (before
    # this, OVLA_KV_INT8=1 alone was a silent no-op: legacy defaults on, the
    # quantize call never ran, and the "int8 KV" measurement was unquantized)
    kv_int8 = os.environ.get("OVLA_KV_INT8", "0") == "1"
    legacy_default = "0" if kv_int8 else "1"
    legacy = os.environ.get("OVLA_LEGACY_DECODE", legacy_default) == "1"
    if legacy:
        S = cfg.cache_len
        if os.environ.get("OVLA_SPLIT_PREFILL", "0") == "1":
            # hybrid path: prefill emits each layer's K/V through scan YS
            # (no S-slot cache riding the layer-scan carry), then ONE
            # contiguous pad builds the standard S-slot cache for the decode
            # scan (the stacked-cache layout that A/B-measured fastest for
            # decode). Token-identical to the carry path
            # (tests/test_decode_fastpath.py::test_split_prefill_matches_carry).
            out = llama.prefill(
                params["llm"], c.llm, embeds, mm_mask, positions,
                collect_hidden_states=collect_hidden_states, pool_mask=pool_mask,
            )
            pad = ((0, 0), (0, 0), (0, S - T), (0, 0), (0, 0))
            cache = llama.KVCache(jnp.pad(out["kv"].k, pad), jnp.pad(out["kv"].v, pad))
        else:
            cache = llama.KVCache.zeros(c.llm, B, S, dtype=c.llm.dtype)
            attn_mask_S = jnp.pad(mm_mask, ((0, 0), (0, S - T)))
            out = llama.forward(
                params["llm"], c.llm, embeds, attn_mask_S, positions,
                cache=cache, cache_index=jnp.int32(0),
                collect_hidden_states=collect_hidden_states, pool_mask=pool_mask,
                compute_logits=False,
            )
            cache = out["cache"]
    else:
        # serving fast path: prefill emits frozen per-layer K/V; decode
        # attends over [frozen prefill KV | tiny generated-token buffer]
        # (llama.py prefill/greedy_decode — no per-step cache copies)
        out = llama.prefill(
            params["llm"], c.llm, embeds, mm_mask, positions,
            collect_hidden_states=collect_hidden_states, pool_mask=pool_mask,
        )
        if kv_int8:
            # turbo tier: int8 frozen prefill KV — halves the decode-step
            # cache stream; decode runs int8 q·K and scale-folded int8
            # probs·V (llama._split_attention_i8)
            out["kv"] = llama.quantize_prefill_kv(out["kv"])

    # hidden state at the last REAL token -> lm_head -> first generated token
    D = out["last_hidden_state"].shape[-1]
    last_idx = (mm_len - 1)[:, None, None]                            # [B,1,1]
    last_hidden = jnp.take_along_axis(
        out["last_hidden_state"], jnp.broadcast_to(last_idx, (B, 1, D)), axis=1
    )[:, 0]                                                           # [B, D]
    from ..ops.linear import matmul_t

    last_logits = matmul_t(last_hidden, params["llm"]["lm_head"]).astype(jnp.float32)
    first_tok = last_logits.argmax(-1).astype(jnp.int32)              # [B]
    margin0 = _top2_margin(last_logits, first_tok)                    # argmax robustness

    # --- greedy decode of the remaining A-1 tokens -------------------------
    if legacy:
        S = cfg.cache_len
        slot0 = T
        slots = jnp.arange(S)[None, :]

        def step(carry, t):
            cache, tok = carry
            e = llama.embed_tokens(params["llm"], tok[:, None])       # [B,1,D]
            pos = (mm_len + t)[:, None]                               # true RoPE position
            valid = (slots < mm_len[:, None]) | ((slots >= slot0) & (slots <= slot0 + t))
            step_out = llama.forward(
                params["llm"], c.llm, e, valid.astype(jnp.int32), pos,
                cache=cache, cache_index=jnp.int32(slot0) + t,
            )
            lg = step_out["logits"][:, -1]
            nxt = lg.argmax(-1).astype(jnp.int32)
            return (step_out["cache"], nxt), (nxt, _top2_margin(lg, nxt))

        (_, _), (toks, step_margins) = jax.lax.scan(
            step, (cache, first_tok), jnp.arange(A - 1, dtype=jnp.int32))
        toks = toks.T
        margins = jnp.concatenate([margin0[:, None], step_margins.T], axis=1)
    else:
        toks, step_margins = llama.greedy_decode(
            params["llm"], c.llm, out["kv"], mm_mask,
            first_token=first_tok, start_pos=mm_len, n_steps=A - 1,
        )
        margins = jnp.concatenate([margin0[:, None], step_margins], axis=1)
    action_tokens = jnp.concatenate([first_tok[:, None], toks], axis=1)  # [B, A]

    # --- de-tokenize + un-normalize (fused) -------------------------------
    norm_actions = codec.decode(action_tokens)
    actions = codec.unnormalize(norm_actions, q01, q99, action_mask)

    result = {
        "actions": actions,
        "action_tokens": action_tokens,
        "normalized_actions": norm_actions,
        # top1-top2 logit gap per generated token: an argmax flip under a
        # numeric perturbation requires |perturbation| >= margin/2 — the
        # quantization-safety statistic PARITY_r02.md certifies against
        "logit_margins": margins,
    }
    if return_first_logits:
        # full first-position logits: identically conditioned across serving
        # modes, so the cross-mode delta is a clean perturbation measurement
        result["first_logits"] = last_logits
    if collect_hidden_states:
        result["hidden_pooled"] = out["hidden_pooled"]                # [B, L+1, D]
    return result


def predict_action_from_image(
    params: Params,
    cfg: VLAServingConfig,
    image_u8: jnp.ndarray,        # [B, H, W, 3] uint8
    image_cfg: ImageTransformConfig,
    input_ids: jnp.ndarray,
    prompt_len: jnp.ndarray,
    q01: jnp.ndarray,
    q99: jnp.ndarray,
    action_mask: jnp.ndarray,
    collect_hidden_states: bool = False,
    return_first_logits: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Raw-uint8 entry: fuses the preprocessing graph into the same jit."""
    pixels = apply_image_transform(image_u8, image_cfg).astype(cfg.vlm.llm.dtype)
    return predict_action_core(
        params, cfg, pixels, input_ids, prompt_len, q01, q99, action_mask,
        collect_hidden_states, return_first_logits,
    )


def predict_action_speculative_core(
    params: Params,
    cfg: VLAServingConfig,
    pixel_values: jnp.ndarray,    # [B, 3K, S, S]
    input_ids: jnp.ndarray,       # [B, P]
    prompt_len: jnp.ndarray,      # [B]
    draft_tokens: jnp.ndarray,    # [B, A] proposed action tokens (e.g. the
                                  # previous control step's — robot actions
                                  # change slowly, so acceptance is high)
    q01: jnp.ndarray,
    q99: jnp.ndarray,
    action_mask: jnp.ndarray,
    collect_hidden_states: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Verified speculative serving: ONE forward scores all A draft tokens;
    the accepted prefix (+1 corrected token) comes out of that single weight
    stream, and only the rejected tail runs the sequential decode — inside a
    `lax.while_loop` whose trip count is data-dependent, so a fully-accepted
    draft costs ~a prefill and NOTHING else (vs prefill + A-1 sequential
    decode steps, each streaming every weight byte).

    Greedy tokens are IDENTICAL to predict_action_core by construction: a
    draft token is accepted only when it equals the model's own greedy argmax
    at that position, and the first mismatch is replaced by that argmax
    (standard verified speculation, specialised to the 7-token action decode).
    Caveat: "the model's argmax" here is computed by the batched verify
    forward, whose matmul reduction order differs from the per-step decode's;
    fp32 softmax + argmax absorb that float dust at trained-weight logit
    margins (PARITY_r02.md's margin framework), but on random weights
    hairline margins can flip positions between the two schedules.
    The reference has no analogue (bs=1 sequential decode only,
    modeling_prismatic.py:324-341); this is the bs=1 robot-control-loop
    latency lever (VERDICT r1 #10).
    """
    c = cfg.vlm
    B, P = input_ids.shape
    N = c.num_patches
    A = cfg.action_dim
    codec = ActionCodec(vocab_size=cfg.codec_vocab_size)
    from ..ops.linear import matmul_t

    # --- multimodal inputs + draft appended at fixed slots -----------------
    prompt_mask = (jnp.arange(P)[None, :] < prompt_len[:, None]).astype(jnp.int32)
    mm = vlm.build_multimodal_inputs(params, c, input_ids, prompt_mask, pixel_values)
    embeds, mm_mask = mm["inputs_embeds"], mm["attn_mask"]
    T = embeds.shape[1]
    mm_len = 1 + N + (prompt_len - 1)

    draft_embeds = llama.embed_tokens(params["llm"], draft_tokens)      # [B, A, D]
    embeds_full = jnp.concatenate([embeds, draft_embeds], axis=1)       # [B, T+A, D]
    pos_prompt = jnp.broadcast_to(jnp.arange(T), (B, T))
    pos_draft = mm_len[:, None] + jnp.arange(A)[None, :]
    positions = jnp.concatenate([pos_prompt, pos_draft], axis=1)

    # cache sized for [prompt | draft | continuation] slot regions
    S = T + 2 * A
    cont0 = T + A                                                       # continuation slot base
    cache = llama.KVCache.zeros(c.llm, B, S, dtype=c.llm.dtype)
    verify_mask = jnp.pad(
        jnp.concatenate([mm_mask, jnp.ones((B, A), jnp.int32)], axis=1),
        ((0, 0), (0, S - T - A)),
    )
    pool_mask = None
    if collect_hidden_states:
        full_T = T + A
        pool_mask = (jnp.arange(full_T)[None, :] < (mm_len - 1)[:, None]).astype(jnp.int32)
    out = llama.forward(
        params["llm"], c.llm, embeds_full, verify_mask, positions,
        cache=cache, cache_index=jnp.int32(0),
        collect_hidden_states=collect_hidden_states, pool_mask=pool_mask,
        compute_logits=False,
    )
    cache = out["cache"]
    hs = out["last_hidden_state"]                                       # [B, T+A, D]

    # greedy token i is the argmax after: last real prompt token (i=0) or
    # draft token i-1 (slot T+i-1)
    D = hs.shape[-1]
    idx = jnp.concatenate(
        [(mm_len - 1)[:, None], T - 1 + jnp.arange(1, A)[None, :] + jnp.zeros((B, 1), jnp.int32)],
        axis=1,
    )                                                                   # [B, A]
    sel = jnp.take_along_axis(hs, idx[..., None].astype(jnp.int32), axis=1)  # [B, A, D]
    greedy = matmul_t(sel, params["llm"]["lm_head"]).astype(jnp.float32).argmax(-1).astype(jnp.int32)

    match = (draft_tokens == greedy)
    # accept_len = leading run of matches; n_valid = accept_len + 1 corrected
    accept_len = jnp.sum(jnp.cumprod(match.astype(jnp.int32), axis=1), axis=1)  # [B]
    n_valid = jnp.minimum(accept_len + 1, A)
    # tokens: accepted draft == greedy there, corrected token = greedy too →
    # the first n_valid greedy entries are the true output prefix
    tokens0 = greedy

    # --- continuation: sequential decode of the rejected tail --------------
    i0 = jnp.min(n_valid)                                               # batch-uniform restart
    slots = jnp.arange(S)[None, :]

    def cond(carry):
        return carry[0] < A

    def body(carry):
        i, tokens, cache = carry
        tok = jnp.take_along_axis(tokens, (i - 1)[None, None].repeat(B, 0), axis=1)[:, 0]
        e = llama.embed_tokens(params["llm"], tok[:, None])
        # the INPUT token has index i-1, so its RoPE position is mm_len+i-1
        # (generated token j sits at absolute position mm_len+j — same
        # convention as the verify pass and the sequential decode)
        pos = (mm_len + i - 1)[:, None]
        valid = (
            (slots < mm_len[:, None])
            # accepted draft K/V: i0 = min(accept_len)+1, so accepted slots
            # are [T, T+i0-1) — the corrected token at index i0-1 has no
            # cache entry until the continuation writes it at cont0
            | ((slots >= T) & (slots < T + (i0 - 1)))
            | ((slots >= cont0) & (slots <= cont0 + (i - i0)))          # recomputed tail
        )
        step_out = llama.forward(
            params["llm"], c.llm, e, valid.astype(jnp.int32), pos,
            cache=cache, cache_index=jnp.int32(cont0) + (i - i0),
        )
        nxt = step_out["logits"][:, -1].argmax(-1).astype(jnp.int32)
        tokens = jax.lax.dynamic_update_slice(tokens, nxt[:, None], (0, i))
        return (i + 1, tokens, step_out["cache"])

    _, action_tokens, _ = jax.lax.while_loop(cond, body, (i0, tokens0, cache))

    norm_actions = codec.decode(action_tokens)
    actions = codec.unnormalize(norm_actions, q01, q99, action_mask)
    result = {
        "actions": actions,
        "action_tokens": action_tokens,
        "normalized_actions": norm_actions,
        "n_accepted": accept_len,
    }
    if collect_hidden_states:
        result["hidden_pooled"] = out["hidden_pooled"]
    return result


def make_sharded_predict(
    params: Params,
    cfg: VLAServingConfig,
    mesh,                                   # jax.sharding.Mesh with tp/fsdp/dp axes
    image_cfg: Optional[ImageTransformConfig] = None,
    strategy: str = "tp",
    collect_hidden_states: bool = False,
) -> Tuple[Any, Params]:
    """Multi-chip serving: returns (jitted_fn, sharded_params).

    Parameters are placed per `parallel.sharding` rules (megatron-style tp for
    the trunk and/or fsdp); the batch rides the `dp` axis. XLA/GSPMD inserts
    the all-gathers/psums from the shardings — greedy tokens are identical to
    the single-device run (fp32 softmax + argmax absorb the collective
    reduction-order float dust; asserted by tests/test_sharded_serving.py).

    This is the multi-chip story 7B bf16 parity serving needs (15 GB weights
    vs 16 GB HBM/v5e — VERDICT r1 #2): tp=2 halves the per-chip weight
    stream, and decode stays bandwidth-bound on each chip's local shard.
    The reference has no serving sharding at all (bs=1, one GPU,
    modeling_prismatic.py:326).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.sharding import shard_params

    image_cfg = image_cfg or ImageTransformConfig.dinosiglip_224()
    param_shardings = shard_params(params, mesh, strategy=strategy)
    sharded_params = jax.device_put(params, param_shardings)

    batch_axes = ("dp",) if "dp" in mesh.axis_names and mesh.shape["dp"] > 1 else ()
    bspec = NamedSharding(mesh, P(*batch_axes)) if batch_axes else NamedSharding(mesh, P())
    rep = NamedSharding(mesh, P())

    def serve(p, image_u8, input_ids, prompt_len, q01, q99, action_mask):
        return predict_action_from_image(
            p, cfg, image_u8, image_cfg, input_ids, prompt_len,
            q01, q99, action_mask, collect_hidden_states,
        )

    fn = jax.jit(
        serve,
        in_shardings=(param_shardings, bspec, bspec, bspec, rep, rep, rep),
    )

    def call(p, image_u8, input_ids, prompt_len, q01, q99, action_mask):
        return fn(
            p, jnp.asarray(image_u8), jnp.asarray(input_ids),
            jnp.asarray(prompt_len), jnp.asarray(q01), jnp.asarray(q99),
            jnp.asarray(action_mask),
        )

    return call, sharded_params


class OpenVLA:
    """Stateful convenience wrapper: jit caching, tokenizer, norm-stats lookup.

    Mirrors the reference's `OpenVLAForActionPrediction.predict_action` +
    `OpenVLA.predict_action` public surface (unnorm_key semantics per
    prismatic/models/vlas/openvla.py:94-131).
    """

    def __init__(
        self,
        params: Params,
        cfg: VLAServingConfig,
        tokenizer: Any,                      # .encode(str) -> List[int] (with BOS)
        norm_stats: Dict[str, Dict[str, Any]],
        image_cfg: Optional[ImageTransformConfig] = None,
    ) -> None:
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.norm_stats = norm_stats
        self.image_cfg = image_cfg or ImageTransformConfig.dinosiglip_224()
        self._jit_cache: Dict[Any, Any] = {}

    # --- unnorm-key plumbing (reference openvla.py:103-131) ---------------
    def _check_unnorm_key(self, unnorm_key: Optional[str]) -> str:
        if unnorm_key is None:
            if len(self.norm_stats) != 1:
                raise ValueError(
                    f"Your model was trained on more than one dataset; "
                    f"please pass `unnorm_key` from {list(self.norm_stats.keys())}"
                )
            return next(iter(self.norm_stats))
        if unnorm_key not in self.norm_stats:
            raise ValueError(
                f"`unnorm_key={unnorm_key}` not in `norm_stats`; "
                f"choose from {list(self.norm_stats.keys())}"
            )
        return unnorm_key

    def get_action_dim(self, unnorm_key: Optional[str] = None) -> int:
        return len(self.get_action_stats(unnorm_key)["q01"])

    def get_action_stats(self, unnorm_key: Optional[str] = None) -> Dict[str, Any]:
        return self.norm_stats[self._check_unnorm_key(unnorm_key)]["action"]

    # --- host-side prompt prep -------------------------------------------
    def prepare_ids(self, prompt: str) -> Tuple[np.ndarray, int]:
        ids = list(self.tokenizer.encode(prompt))
        if ids[-1] != EMPTY_TOKEN_ID:
            ids.append(EMPTY_TOKEN_ID)
        P = self.cfg.prompt_pad_len
        if len(ids) > P:
            raise ValueError(f"Prompt of {len(ids)} tokens exceeds pad bucket {P}")
        out = np.zeros((P,), np.int32)
        out[: len(ids)] = ids
        return out, len(ids)

    def _get_jit(self, collect: bool, first_logits: bool = False):
        key = (collect, first_logits)
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(
                functools.partial(
                    predict_action_from_image,
                    cfg=self.cfg,
                    image_cfg=self.image_cfg,
                    collect_hidden_states=collect,
                    return_first_logits=first_logits,
                ),
                static_argnames=(),
            )
        return self._jit_cache[key]

    def _get_spec_jit(self, collect: bool):
        key = ("spec", collect)
        if key not in self._jit_cache:
            def fn(params, image_u8, input_ids, prompt_len, draft_tokens,
                   q01, q99, action_mask):
                pixels = apply_image_transform(image_u8, self.image_cfg).astype(
                    self.cfg.vlm.llm.dtype)
                return predict_action_speculative_core(
                    params, self.cfg, pixels, input_ids, prompt_len,
                    draft_tokens, q01, q99, action_mask,
                    collect_hidden_states=collect,
                )

            self._jit_cache[key] = jax.jit(fn)
        return self._jit_cache[key]

    def predict_action(
        self,
        image: np.ndarray,                  # [H, W, 3] or [B, H, W, 3] uint8
        prompt: str,
        unnorm_key: Optional[str] = None,
        return_hidden_states: bool = False,
        return_first_logits: bool = False,
        draft_tokens: Optional[np.ndarray] = None,  # [A] or [B, A]: verified
        # speculation — pass the PREVIOUS control step's action_tokens; greedy
        # outputs are identical, a fully-accepted draft skips the sequential
        # decode entirely (bs=1 robot-loop latency lever)
    ) -> Dict[str, np.ndarray]:
        stats = self.get_action_stats(unnorm_key)
        image = np.asarray(image)
        squeeze = image.ndim == 3
        if squeeze:
            image = image[None]
        B = image.shape[0]
        ids, plen = self.prepare_ids(prompt)
        common = dict(
            image_u8=jnp.asarray(image),
            input_ids=jnp.broadcast_to(jnp.asarray(ids), (B, ids.shape[0])),
            prompt_len=jnp.full((B,), plen, jnp.int32),
            q01=jnp.asarray(np.asarray(stats["q01"], np.float32)),
            q99=jnp.asarray(np.asarray(stats["q99"], np.float32)),
            action_mask=jnp.asarray(
                np.asarray(stats.get("mask", np.ones_like(stats["q01"], bool)), bool)
            ),
        )
        if draft_tokens is not None:
            if return_first_logits:
                raise ValueError(
                    "return_first_logits is not supported with draft_tokens "
                    "(the speculative core does not compute first_logits); "
                    "run without a draft for the parity-certificate outputs"
                )
            draft = np.asarray(draft_tokens, np.int32)
            if draft.ndim == 1:
                draft = np.broadcast_to(draft, (B, draft.shape[0]))
            out = self._get_spec_jit(return_hidden_states)(
                self.params, draft_tokens=jnp.asarray(draft), **common,
            )
        else:
            out = self._get_jit(return_hidden_states, return_first_logits)(
                self.params, **common)
        result = {k: np.asarray(v) for k, v in out.items()}
        if squeeze:
            result = {k: v[0] for k, v in result.items()}
        return result

    def predict_action_batch(
        self,
        images: np.ndarray,                 # [B, H, W, 3] uint8 (same shape)
        prompts: Sequence[str],             # B prompts (lengths may differ)
        unnorm_keys: Optional[Sequence[Optional[str]]] = None,
        batch_buckets: Tuple[int, ...] = (1, 2, 4, 8, 16, 24, 32),
    ) -> List[Dict[str, np.ndarray]]:
        """Heterogeneous-request batch: per-row prompts and per-row norm
        stats in ONE device call (the reference is bs=1-only). The batch pads
        up to a fixed bucket (rows replicated) so XLA never sees a new shape.
        Returns one result dict per request."""
        images = np.asarray(images)
        B = len(prompts)
        assert images.shape[0] == B, "one image per prompt"
        if unnorm_keys is None:
            unnorm_keys = [None] * B
        rows = [self.prepare_ids(p) for p in prompts]
        ids = np.stack([r[0] for r in rows])
        lens = np.asarray([r[1] for r in rows], np.int32)
        stats = [self.get_action_stats(k) for k in unnorm_keys]
        A = len(stats[0]["q01"])
        q01 = np.stack([np.asarray(s["q01"], np.float32) for s in stats])
        q99 = np.stack([np.asarray(s["q99"], np.float32) for s in stats])
        mask = np.stack([
            np.asarray(s.get("mask", np.ones(A, bool)), bool) for s in stats
        ])

        bucket = next((b for b in batch_buckets if b >= B), None)
        if bucket is None:
            raise ValueError(f"Batch {B} exceeds largest bucket {batch_buckets[-1]}")
        pad = bucket - B

        def pad_rows(x):
            return np.concatenate([x, np.repeat(x[:1], pad, axis=0)]) if pad else x

        out = self._get_jit(False)(
            self.params,
            image_u8=jnp.asarray(pad_rows(images)),
            input_ids=jnp.asarray(pad_rows(ids)),
            prompt_len=jnp.asarray(pad_rows(lens)),
            q01=jnp.asarray(pad_rows(q01)),
            q99=jnp.asarray(pad_rows(q99)),
            action_mask=jnp.asarray(pad_rows(mask)),
        )
        host = {k: np.asarray(v) for k, v in out.items()}
        return [{k: v[i] for k, v in host.items()} for i in range(B)]

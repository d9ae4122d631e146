"""GPipe-style pipeline parallelism over the layer-stacked Llama trunk.

Beyond the reference (SURVEY.md §2.5: no TP/PP/SP of any kind) — a TPU-native
scale-out axis the stacked-layer design gives almost for free: the decoder's
parameters are [L, ...] arrays, so sharding dim 0 over a `pp` mesh axis hands
each device a contiguous block of layers, and `shard_map` presents exactly
that block as the device's local params. The schedule is the classic GPipe
loop:

    tick t (t = 0 .. M+P-2):
      stage 0 injects microbatch t (zeros past the end)
      every stage runs its local layer block on its resident activation
      activations ppermute one stage forward (ring over ICI)
      stage P-1 banks the finished microbatch t-(P-1)

Every tick computes identical shapes on every device (XLA static shapes; the
bubble ticks process don't-care values that are never banked). Autodiff flows
through `lax.ppermute` (its transpose is the reverse permute), so `jax.grad`
around the shard-mapped loss yields the correct cross-stage gradients — the
backward pipeline emerges from the forward schedule without hand-written
scheduling.

Gradient reductions (make_pipeline_train_step):
  * pp-sharded layer blocks — local to their stage; pmean over dp only.
  * pre-pipeline replicated params (vision towers, projector, embed_tokens) —
    only stage 0's compute feeds the pipeline (other stages' is masked), so
    true grads live on stage 0 and are psum'd over pp.
  * post-broadcast replicated params (final norm, lm_head) — every stage
    computes the identical global loss from the psum-broadcast hidden states,
    so local grads are already the full gradient; pmean over pp keeps them
    replicated.

The batch axis composes: shard_map maps batch over `dp` and layers over `pp`
simultaneously (tested on the 8-device CPU mesh, dp=2 x pp=2/4).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import llama

Params = Dict[str, Any]


def pipeline_trunk_forward(
    layers_local: Params,          # this stage's [L/P, ...] layer block
    x: jnp.ndarray,                # [B, T, D] inputs_embeds
    mask: jnp.ndarray,             # [B, 1, T, T] additive
    cos: jnp.ndarray,              # [B, T, Dh]
    sin: jnp.ndarray,
    cfg: llama.LlamaConfig,
    n_micro: int,
    axis_name: str = "pp",
) -> jnp.ndarray:
    """Run the decoder trunk through the pipeline. Call INSIDE shard_map with
    the layer stack sharded on `axis_name`. Returns [B, T, D] hidden states
    (psum-broadcast from the last stage to all stages)."""
    Pn = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    B, T, D = x.shape
    M = n_micro
    assert B % M == 0, f"batch {B} must divide into {M} microbatches"

    mb = x.reshape(M, B // M, T, D)
    mb_mask = mask.reshape(M, B // M, *mask.shape[1:])
    mb_cos = cos.reshape(M, B // M, *cos.shape[1:])
    mb_sin = sin.reshape(M, B // M, *sin.shape[1:])

    def block(h, m, c, s):
        """This stage's local layer block on one microbatch."""
        def body(h, lp):
            h_out, _, _ = llama._layer_forward(cfg, lp, h, m, c, s, None)
            return h_out, ()

        h, _ = jax.lax.scan(body, h, layers_local)
        return h

    perm = [(i, (i + 1) % Pn) for i in range(Pn)]

    def tick(carry, t):
        state, outputs = carry
        # microbatch resident at stage s during tick t is (t - s); stage 0
        # injects the fresh microbatch, later stages take the ring input
        smi = jnp.clip(t - idx, 0, M - 1)
        h_in = jnp.where(idx == 0, mb[smi], state)
        h_out = block(h_in, mb_mask[smi], mb_cos[smi], mb_sin[smi])
        # last stage banks finished microbatch t-(P-1)
        oi = jnp.clip(t - (Pn - 1), 0, M - 1)
        valid = (idx == Pn - 1) & (t >= Pn - 1)
        cur = jax.lax.dynamic_index_in_dim(outputs, oi, 0, keepdims=False)
        outputs = jax.lax.dynamic_update_index_in_dim(
            outputs, jnp.where(valid, h_out, cur), oi, 0
        )
        state = jax.lax.ppermute(h_out, axis_name, perm)
        return (state, outputs), ()

    init = (jnp.zeros_like(mb[0]), jnp.zeros_like(mb))
    (_, outputs), _ = jax.lax.scan(
        tick, init, jnp.arange(M + Pn - 1, dtype=jnp.int32)
    )
    # broadcast the last stage's banked outputs to every stage. transpose of
    # psum is psum, and every stage consumes the broadcast identically, so the
    # backward cotangent arrives P-fold — scale it back by 1/P (identity
    # forward) so trunk/embedding grads match the unsharded baseline exactly
    outputs = jax.lax.psum(
        jnp.where(idx == Pn - 1, outputs, jnp.zeros_like(outputs)), axis_name
    )
    outputs = _grad_scaled(outputs, 1.0 / Pn)
    return outputs.reshape(B, T, D)


@jax.custom_vjp
def _grad_scaled(x, c):
    return x


def _grad_scaled_fwd(x, c):
    return x, c


def _grad_scaled_bwd(c, ct):
    return (ct * c, None)


_grad_scaled.defvjp(_grad_scaled_fwd, _grad_scaled_bwd)


def llama_forward_pipelined(
    params: Params,                # llm params; layer leaves are pp-local inside shard_map
    cfg: llama.LlamaConfig,
    inputs_embeds: jnp.ndarray,    # [B, T, D]
    attn_mask: jnp.ndarray,        # [B, T]
    positions: jnp.ndarray,        # [B, T]
    n_micro: int,
    axis_name: str = "pp",
) -> jnp.ndarray:
    """Trunk-pipelined equivalent of llama.forward(...)['logits'] for
    training (no cache). Call inside shard_map."""
    B, T, D = inputs_embeds.shape
    mask = llama.make_causal_mask(attn_mask, T, T, offset=0)
    cos, sin = llama.rope_tables(cfg, positions)
    x = pipeline_trunk_forward(
        params["layers"], inputs_embeds, mask, cos, sin, cfg, n_micro, axis_name
    )
    x = llama.rms_norm(x, params["norm"], cfg.rms_norm_eps)
    from ..ops.linear import matmul_t

    return matmul_t(x, params["lm_head"]).astype(jnp.float32)


# --- pp/dp train step ---------------------------------------------------------

def _path_keys(path) -> Tuple[str, ...]:
    return tuple(str(getattr(p, "key", getattr(p, "name", p))) for p in path)


def _pp_spec_tree(tree: Any, pp_axis: str) -> Any:
    """PartitionSpec per leaf: layer stacks (any path containing 'layers')
    sharded on dim 0 over pp, everything else replicated. Works for params
    AND optimizer state (optax's mu/nu mirror the param tree paths)."""
    def leaf(path, x):
        if "layers" in _path_keys(path) and getattr(x, "ndim", 0) >= 1:
            return P(pp_axis)
        return P()

    return jax.tree_util.tree_map_with_path(leaf, tree)


def make_pipeline_train_step(
    cfg,                            # vlm.VLMConfig
    optimizer,
    mesh: Mesh,
    n_micro: int,
    codec=None,
    dp_axis: str = "dp",
    pp_axis: str = "pp",
) -> Tuple[Callable, Callable]:
    """(place_state, step_fn) for dp x pp training of the full VLA objective."""
    from jax.experimental.shard_map import shard_map

    from ..models import vlm

    if getattr(cfg.llm, "moe_experts", 0):
        # the pipeline body drops per-layer aux outputs, so an MoE router
        # would silently train with zero load-balance pressure here —
        # inconsistent with the GSPMD (dp/ep/tp) path for the same config
        raise NotImplementedError(
            "MoE trunks are not supported by the pipeline-parallel step; "
            "train them on a dp x ep x tp mesh (parallel.sharding ep rule)")
    from ..training.train_state import TrainState
    from ..training.train_step import cross_entropy_loss

    def place_state(state: "TrainState") -> "TrainState":
        def put(tree):
            specs = _pp_spec_tree(tree, pp_axis)
            return jax.device_put(
                tree, jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                                   is_leaf=lambda x: isinstance(x, P)))

        return type(state)(
            step=jax.device_put(state.step, NamedSharding(mesh, P())),
            params=put(state.params),
            opt_state=put(state.opt_state),
        )

    batch_spec = {k: P(dp_axis) for k in
                  ("input_ids", "attention_mask", "pixel_values", "labels")}

    def local_loss(params, batch):
        out = vlm.build_multimodal_inputs(
            params, cfg, batch["input_ids"], batch["attention_mask"],
            batch["pixel_values"], labels=batch["labels"],
        )
        embeds, mm_mask, labels = out["inputs_embeds"], out["attn_mask"], out["labels"]
        B, T, _ = embeds.shape
        positions = jnp.broadcast_to(jnp.arange(T), (B, T))
        logits = llama_forward_pipelined(
            params["llm"], cfg.llm, embeds, mm_mask, positions,
            n_micro=n_micro, axis_name=pp_axis,
        )
        return cross_entropy_loss(logits, labels)

    def sharded_step(params, opt_state, step_count, batch):
        loss, grads = jax.value_and_grad(lambda p: local_loss(p, batch))(params)
        loss = jax.lax.pmean(loss, dp_axis)

        def reduce_grad(path, g):
            keys = _path_keys(path)
            g = jax.lax.pmean(g, dp_axis)
            if "layers" in keys:
                return g                                   # stage-local
            if keys[-1] in ("norm", "lm_head") and "llm" in keys:
                return jax.lax.pmean(g, pp_axis)           # identical copies
            # pre-pipeline params: only stage 0's compute feeds the pipeline
            return jax.lax.psum(g, pp_axis)

        grads = jax.tree_util.tree_map_with_path(reduce_grad, grads)
        updates, new_opt = optimizer.update(grads, opt_state, params)
        new_params = jax.tree.map(
            lambda p, u: (p.astype(jnp.float32) + u.astype(jnp.float32)).astype(p.dtype),
            params, updates,
        )
        return new_params, new_opt, step_count + 1, {"loss": loss}

    def step(state: "TrainState", batch):
        pspecs = _pp_spec_tree(state.params, pp_axis)
        ospecs = _pp_spec_tree(state.opt_state, pp_axis)
        fn = shard_map(
            sharded_step, mesh=mesh,
            in_specs=(pspecs, ospecs, P(), batch_spec),
            out_specs=(pspecs, ospecs, P(), {"loss": P()}),
            check_rep=False,
        )
        new_params, new_opt, new_count, metrics = fn(
            state.params, state.opt_state, state.step, batch)
        return type(state)(step=new_count, params=new_params, opt_state=new_opt), metrics

    return place_state, jax.jit(step)

"""Parameter/optimizer sharding rules over a named mesh (fsdp / tp / dp).

Replaces the reference's torch-FSDP wrapping policies
(prismatic/training/strategies/fsdp.py:135-157 auto-wrap + MixedPrecision)
with declarative PartitionSpecs: XLA inserts all-gather / reduce-scatter from
the specs (scaling-book recipe — pick a mesh, annotate shardings, let the
compiler place collectives on ICI).

Strategies
  * fsdp  — ZeRO-3: every sizable tensor sharded along one dim over the
            `fsdp` axis (params, grads and optimizer state all inherit it).
            Maps the reference's "fsdp-full-shard".
  * zero2 — ZeRO-2 ("fsdp-shard-grad-op"): parameters replicated, optimizer
            state sharded (leaf paths under opt_state/ get the fsdp rules).
  * tp    — megatron-style tensor parallelism for the Llama trunk: qkv/gate/up
            sharded on the output-feature dim, o/down on the input-feature
            dim, embeddings on vocab. Not in the reference (SURVEY.md §2.5:
            absent) — needed on TPU to fit 7B bf16 beyond one 16 GB chip.
  * fsdp+tp — both, on a 2-D mesh.

Rules operate on pytree paths, so they cover every model family here
(llama / vit / projector) without per-module wrapping code.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

MIN_SHARD_ELEMS = 2**14  # replicate tiny tensors (norms, biases)


def _path_str(path: Tuple[Any, ...]) -> str:
    parts = []
    for p in path:
        if isinstance(p, jax.tree_util.DictKey):
            parts.append(str(p.key))
        elif isinstance(p, jax.tree_util.SequenceKey):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


# --- tp rules: path-pattern -> dim to shard --------------------------------
# Llama stacked-layer weights are [L, out, in]; embeddings [V, D].
_TP_DIM_BY_SUFFIX = {
    "q_proj": 1, "k_proj": 1, "v_proj": 1,       # shard heads (out dim)
    "gate_proj": 1, "up_proj": 1,                # shard ffn (out dim)
    "o_proj": 2, "down_proj": 2,                 # shard contraction (in dim)
    "embed_tokens": 0, "lm_head": 0,             # shard vocab
    # ViT blocks [L, out, in]
    "qkv_w": 1, "fc1_w": 1,
    "proj_w": 2, "fc2_w": 2,
}


_MOE_EXPERT_LEAVES = ("gate_proj", "up_proj", "down_proj")


def _tp_dim(path: str, shape: Tuple[int, ...],
            grouped_int4: bool = False) -> Optional[int]:
    parts = path.rsplit("/", 2)
    leaf = parts[-1]
    # MoE expert stacks carry an extra [E] axis at dim 1 ([L, E, F, D] /
    # [L, E, D, F]) — the tp dim shifts right by one
    if leaf in _MOE_EXPERT_LEAVES and len(shape) == 4:
        return _TP_DIM_BY_SUFFIX[leaf] + 1
    # quantized weights are {"q": codes, "s": scales} under the real weight
    # name (e.g. layers/q_proj/q) — shard by the PARENT's rule, addressed
    # from the END so lead stack/expert dims drop out:
    #   int8:          q [..., O, I],        s [..., O]
    #   grouped int4:  q [..., G, O, gsz],   s [..., O, G]
    # Output-sharded weights split O in q and s alike. Contraction-sharded
    # weights (o_proj, down_proj) split I for int8 q (s replicated — O stays
    # whole); for grouped int4 the contraction splits along the GROUP axis
    # (gsz stays whole), and s's matching G axis shards with it.
    if leaf in ("q", "s") and len(parts) >= 2:
        parent = parts[-2]
        d0 = _TP_DIM_BY_SUFFIX.get(parent)
        if d0 is None:
            return None
        is_out = d0 != 2     # suffix table: 2 == the contraction (in) dim
        n = len(shape)
        if grouped_int4:
            if leaf == "q":
                return n - 2 if is_out else n - 3
            return n - 2 if is_out else n - 1
        if leaf == "q":
            return n - 2 if is_out else n - 1
        return n - 1 if is_out else None
    # LoRA factors under a target weight's name (streamed {A [.., r, I],
    # B [.., O, r]} and multi-LoRA banks {A [.., N, r, I], Bt [.., N, r, O]}):
    # the delta must land with the BASE's layout — an out-sharded base
    # (column-parallel) shards the O-carrying factor (Bt last dim / B's -2),
    # a contraction-sharded base (row-parallel) shards A's I so the partial
    # delta psums together with the base matmul's partial. The rank dim is
    # never sharded (r ~ 16-32 lanes).
    if leaf in ("A", "B", "Bt") and len(parts) >= 2:
        d0 = _TP_DIM_BY_SUFFIX.get(parts[-2])
        if d0 is None:
            return None
        is_out = d0 != 2
        if leaf == "A":
            return None if is_out else len(shape) - 1
        if leaf == "Bt":
            return len(shape) - 1 if is_out else None
        return len(shape) - 2 if is_out else None        # B [.., O, r]
    # projector dicts are {fc*: {w,b}} — path ends in w/b
    if leaf == "w" and len(shape) == 2:
        if "/fc1/" in path or path.endswith("fc1/w"):
            return 0
        return 1 if "/fc2/" in path or "/fc3/" in path else None
    return _TP_DIM_BY_SUFFIX.get(leaf)


def _fsdp_dim(shape: Tuple[int, ...], axis_size: int, skip: Tuple[int, ...] = ()) -> Optional[int]:
    """Largest dim divisible by the axis size (excluding `skip` dims)."""
    best, best_size = None, 0
    for d, s in enumerate(shape):
        if d in skip:
            continue
        if s % axis_size == 0 and s > best_size:
            best, best_size = d, s
    return best


def param_spec(
    path: str,
    shape: Tuple[int, ...],
    mesh: Mesh,
    strategy: str = "fsdp",
    grouped_int4: bool = False,
) -> P:
    """PartitionSpec for one parameter tensor.

    `grouped_int4`: the leaf belongs to a grouped-int4 {"q","s"} pair
    (group-major code storage — shard_params sets this from the sibling
    dtype, which a path+shape rule alone cannot recover)."""
    if int(np.prod(shape)) < MIN_SHARD_ELEMS:
        return P()
    entries: list = [None] * len(shape)
    used_dims = set()

    # expert parallelism: whenever the mesh has an `ep` axis, MoE expert
    # stacks shard their E dim over it (the only sensible placement — the
    # dispatch/combine einsums become expert-parallel all-to-alls under
    # GSPMD). Applies regardless of the strategy string, like dp for data.
    # Covers the plain [L, E, O, I] weights AND their derived leaves, which
    # keep the E axis at dim 1: quantized q [L, E, O, I] / s [L, E, O] and
    # LoRA A [L, E, r, I] / B [L, E, O, r] under an expert-named parent.
    if "ep" in mesh.axis_names and mesh.shape["ep"] > 1:
        parts = path.rsplit("/", 2)
        leaf = parts[-1]
        name = parts[-2] if leaf in ("q", "s", "A", "B") and len(parts) >= 2 else leaf
        min_ndim = (3 if leaf == "s" else 4) + (1 if grouped_int4 else 0)
        if (name in _MOE_EXPERT_LEAVES and len(shape) == min_ndim
                and shape[1] % mesh.shape["ep"] == 0):
            entries[1] = "ep"
            used_dims.add(1)

    if "tp" in strategy and "tp" in mesh.axis_names and mesh.shape["tp"] > 1:
        d = _tp_dim(path, shape, grouped_int4=grouped_int4)
        if d is not None and shape[d] % mesh.shape["tp"] == 0:
            entries[d] = "tp"
            used_dims.add(d)

    if "fsdp" in strategy and "fsdp" in mesh.axis_names and mesh.shape["fsdp"] > 1:
        # layer-stacked tensors (path contains 'layers' or 'blocks'): never
        # shard the stack axis (it is scanned over)
        skip = set(used_dims)
        if ("layers/" in path or "blocks/" in path) and len(shape) >= 2:
            skip.add(0)
        d = _fsdp_dim(shape, mesh.shape["fsdp"], skip=tuple(skip))
        if d is not None:
            entries[d] = "fsdp"

    return P(*entries)


def shard_params(
    params: Any,
    mesh: Mesh,
    strategy: str = "fsdp",
) -> Any:
    """Pytree of NamedShardings mirroring `params` (pass as out_shardings/put target)."""
    from ..ops.linear import is_grouped_int4, is_nibble_quant, is_quantized

    def leaf_sharding(path, leaf):
        p = _path_str(path)
        if is_nibble_quant(leaf):
            # nibble-plane leaves: both 4-bit planes are per-channel [.., O, I]
            # (the int8 "q" layout — shard identically), "s" is the int8
            # per-channel scale row
            return {
                k: NamedSharding(mesh, param_spec(
                    f"{p}/{'s' if k == 's' else 'q'}", np.shape(leaf[k]),
                    mesh, strategy))
                for k in leaf
            }
        if is_quantized(leaf):
            # visit {"q","s"} pairs wholesale: the grouped-int4 layout is a
            # dtype property of q that s's spec also depends on. Dual-
            # precision leaves (quantize_weight_mixed) add grouped-layout
            # "q4"/"s4" siblings next to per-channel int8 "q"/"s": each key
            # shards by ITS copy's layout rule.
            grouped = is_grouped_int4(leaf)
            return {
                k: NamedSharding(mesh, param_spec(
                    f"{p}/{k.rstrip('4')}", np.shape(leaf[k]), mesh, strategy,
                    grouped_int4=grouped or k in ("q4", "s4")))
                for k in leaf
            }
        spec = param_spec(p, np.shape(leaf), mesh, strategy)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(
        leaf_sharding, params,
        is_leaf=lambda l: is_quantized(l) or is_nibble_quant(l))


def place_params(params: Any, mesh: Mesh, strategy: str = "fsdp") -> Any:
    """device_put the pytree according to the strategy's shardings."""
    shardings = shard_params(params, mesh, strategy)
    return jax.device_put(params, shardings)


def shard_train_state(state: Any, mesh: Mesh, strategy: str = "fsdp") -> Any:
    """Shardings for a TrainState (step, params, opt_state).

    `zero2` (the reference's "fsdp-shard-grad-op"): parameters replicated
    (optionally tp-sharded with "zero2+tp"), optimizer moments fsdp-sharded —
    grads reduce-scatter into sharded Adam state while the forward keeps
    whole parameters resident. Any other strategy applies uniformly.
    """
    if "zero2" in strategy:
        p_strategy = strategy.replace("zero2", "").strip("+") or "none"
        o_strategy = strategy.replace("zero2", "fsdp")
    else:
        p_strategy = o_strategy = strategy
    return type(state)(
        step=NamedSharding(mesh, P()),
        params=shard_params(state.params, mesh, p_strategy),
        opt_state=shard_params(state.opt_state, mesh, o_strategy),
    )

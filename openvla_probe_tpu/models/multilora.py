"""Multi-adapter LoRA serving: N finetuned adapters, ONE frozen base, one jit.

The reference's deployment story is one merged finetuned checkpoint per
process (vla-scripts/finetune.py:326-361 merges adapters into the base and
saves a full model; deploy loads exactly one). Serving a fleet of robots
finetuned per-task therefore costs one full model replica per task.

This module is the TPU-native alternative (beyond reference): keep the
quantized base resident ONCE, stack every task's LoRA adapters into device
"banks" (A [N, r, I] / Bt [N, r, O] per target weight, Bt pre-transposed),
and let each request row pick its adapter with a one-hot `sel` [B, N] — so
one batched serving call mixes tasks freely. `ops.linear.matmul_t`
dispatches on the wrapper (`is_multilora`) with the dense-N masked form:

    u     = x . A_bank^T          # ONE [B*T, K] x [K, N*r] matmul
    u    *= repeat(sel, r)        # zero the non-selected rank columns
    delta = u . Bt_bank           # ONE [B*T, N*r] x [N*r, O] matmul

never as a per-example gather of weight copies — both matmuls are flat
full-lane MXU shapes (N*r = 128 at the N=4/r=32 deployment point), the HBM
cost is the bank stream itself (~2 * N * r * (I+O) bytes per target,
restreamed by every decode step), and the MXU cost is N*r*(1/I + 1/O) of
the base matmul FLOPs (~6% at 7B / N=4 / r=32). Measured numbers in
PERF_r03.md's multi-LoRA section. (A per-example batched-einsum
formulation — gather A_sel per row, r=32-lane batched dots — measured
116 ms/call of overhead at B=24 and was replaced by this form.)

Numerics: one-hot masking zeroes the non-selected columns exactly (their
matmul terms are 0.0 * w), so row b computes the same FUNCTION as
single-adapter streamed serving of adapter sel[b]. Token-level equality at
trained margins is certified by scripts/multilora_parity.py; bitwise
equality across DIFFERENT compiled graphs is not promised (XLA fuses the
base matmul differently with the delta path attached — reduction-order
dust, same caveat as batched-vs-sequential decode).

Works over every base representation matmul_t serves: bf16 (parity), int8,
grouped int4, and dual-precision "mix" — i.e. N QLoRA-finetuned tasks share
one quantized base, the exact deployment PARITY_r03.md certifies. Not
compatible with `fuse_serving_params` (adapters target the unfused leaves).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..training.lora import LoRAConfig, _is_ab

Params = Dict[str, Any]


def stack_adapter_banks(
    adapters: Sequence[Any],
    cfg: LoRAConfig,
    dtype: Any = jnp.bfloat16,
) -> Any:
    """Stack N per-adapter LoRA trees (init_lora_params layout: {"A","B"} at
    target leaves, None elsewhere) into serving banks.

    A leaves [*, r, I] stack to [*, N, r, I]; B leaves [*, O, r] are
    PRE-TRANSPOSED and stack to "Bt" [*, N, r, O], so matmul_t's dense-N
    projection back to O is one flat [N*r, O] matmul with no per-call
    transpose of the bank bytes (axis=-3 stacking handles both the
    layer-stacked LLM leaves [L, ...] and flat leaves uniformly). The
    alpha/r scaling folds into the stored Bt (as attach_lora does at trace
    time) and the banks are cast to the serving dtype — adapters train as
    fp32 masters, serve as bf16.
    """
    if not adapters:
        raise ValueError("need at least one adapter")
    scale = cfg.scaling

    def stack(*nodes):
        if nodes[0] is None:
            if any(n is not None for n in nodes):
                raise ValueError("adapters disagree on target leaves — all "
                                 "banks must come from the same LoRAConfig")
            return None
        A = jnp.stack([jnp.asarray(n["A"]) for n in nodes], axis=-3).astype(dtype)
        Bt = jnp.stack([jnp.swapaxes(jnp.asarray(n["B"]), -1, -2) * scale
                        for n in nodes], axis=-3).astype(dtype)
        return {"A": A, "Bt": Bt}

    return jax.tree.map(stack, *adapters, is_leaf=_is_ab)


def _is_bank(x) -> bool:
    """Bank-tree leaf: {"A": [*, N, r, I], "Bt": [*, N, r, O]} or None."""
    return x is None or (isinstance(x, dict) and set(x.keys()) == {"A", "Bt"})


def attach_multilora(params: Params, bank: Any, sel: jnp.ndarray) -> Params:
    """Wrap target leaves as {"base", "A", "Bt", "sel"} for matmul_t dispatch.

    `sel` [B, N] is the per-example one-hot (adapter_one_hot). Leaves with
    leading model-stack dims (the LLM trunk's [L, N, r, I]) get `sel`
    broadcast to [L, B, N] so the wrapper rides the layer scan's xs — the
    same transparent-slicing property attach_lora relies on. Call INSIDE the
    serving jit with `sel` as a traced argument: one compiled graph serves
    every adapter mixture.
    """

    def attach(bw, w):
        if bw is None:
            return w
        A = bw["A"]
        nb = A.ndim - 3                      # leading model-stack dims (L,)
        sel_leaf = sel if nb == 0 else jnp.broadcast_to(
            sel, (*A.shape[:nb], *sel.shape))
        return {"base": w, "A": A, "Bt": bw["Bt"], "sel": sel_leaf}

    return jax.tree.map(attach, bank, params, is_leaf=_is_bank)


def fuse_bank_into_base(params: Params, bank: Any,
                        free_source: bool = False) -> Params:
    """Concat-fuse the A banks onto the base weights OFFLINE (once, at bank
    load — not per call), so serving pays ONE widened dot per target instead
    of base dot + separate rank projection (VERDICT r4 #3a).

    int8 bases {"q": [*, O, I], "s": [*, O]}: each A leaf's N*r rank rows are
    int8-quantized per row (ops.linear.quantize_weight — the same symmetric
    per-output-channel rule as the base) and concatenated onto the output
    rows: {"qf": [*, O+N*r, I], "sf": [*, O+N*r], "Bt": [*, N, r, O]}.
    bf16/f32 bases concat the A rows verbatim: {"wf": [*, O+N*r, I], "Bt"}.

    Numerics: the first O output rows of the widened int8 dot are BITWISE
    the plain base result (int32 accumulation is exact per output row —
    widening O cannot perturb them), so bare-base (sel=-1) rows and the
    carried KV cache are unchanged. The rank projection u moves from bf16
    x·Aᵀ to the base's w8a8 form (int8 A rows, int8 per-row-quantized x):
    a ~0.4%-of-delta perturbation, inside trained-margin token equality —
    certified end-to-end by scripts/multilora_parity.py --fused.

    Mix/int4 bases are rejected: multi-LoRA's one-chip deployment base is
    int8 (PERF_r03.md tenth session — the mix dual-copy graph OOMs at B=24).

    Single-chip serving form: the sharded path
    (vla.make_sharded_multilora_predict) keeps the masked banks — a tp
    split of the widened [O+N*r] rows would interleave base and bank output
    channels across shards and break matmul_t's static y/u split.
    """
    from ..ops.linear import is_grouped_int4, is_nibble_quant, quantize_weight

    def unsupported(bw, w):
        return (bw is not None and isinstance(w, dict)
                and (is_nibble_quant(w)
                     or ("q" in w
                         and ("q4" in w or is_grouped_int4(w)
                              or w["q"].dtype != jnp.int8))))

    # validate EVERYTHING before touching any buffer: with free_source the
    # walk deletes source leaves as it goes, so a mid-walk raise would leave
    # the caller's tree half-destroyed
    bad = jax.tree.map(unsupported, bank, params, is_leaf=_is_bank)
    if any(jax.tree.leaves(bad)):
        raise NotImplementedError(
            "fuse_bank_into_base supports int8 and bf16 bases only "
            "(multi-LoRA's deployment base; mix/int4 bases OOM or "
            "lack a widened-dot form)")

    def fuse(bw, w):
        if bw is None:
            return w
        A, Bt = bw["A"], bw["Bt"]                  # [*, N, r, I], [*, N, r, O]
        nr = A.shape[-3] * A.shape[-2]
        A2 = A.reshape(*A.shape[:-3], nr, A.shape[-1])
        if isinstance(w, dict) and ("q" in w or is_nibble_quant(w)):
            if (is_nibble_quant(w) or "q4" in w or is_grouped_int4(w)
                    or w["q"].dtype != jnp.int8):
                raise NotImplementedError(
                    "fuse_bank_into_base supports int8 and bf16 bases only "
                    "(multi-LoRA's deployment base; mix/int4/nibble bases "
                    "OOM or lack a widened-dot form)")
            qa = quantize_weight(A2.astype(jnp.float32))
            out = {"qf": jnp.concatenate([w["q"], qa["q"]], axis=-2),
                   "sf": jnp.concatenate(
                       [w["s"], qa["s"].astype(w["s"].dtype)], axis=-1),
                   "Bt": Bt}
        else:
            out = {"wf": jnp.concatenate([jnp.asarray(w), A2.astype(w.dtype)],
                                         axis=-2),
                   "Bt": Bt}
        if free_source:
            # 7B deployment: the fused copy replaces the base trunk — delete
            # source buffers as each fused leaf lands so base + fused are
            # never co-resident. The wait must be a VALUE FETCH, not
            # block_until_ready: on the tunneled axon backend only a host
            # transfer reliably waits for real execution (CLAUDE.md), and
            # deleting a source buffer before its consumer actually ran
            # would corrupt the fused copy.
            for key in ("qf", "sf", "wf"):
                if key in out:  # fetch each derived output: every source
                    np.asarray(jax.device_get(out[key].ravel()[0]))
                    # consumer chain must have executed before the delete
            for arr in ([w["q"], w["s"]] if isinstance(w, dict) else [w]):
                if isinstance(arr, jax.Array):
                    arr.delete()
            if isinstance(A, jax.Array):
                A.delete()
        return out

    return jax.tree.map(fuse, bank, params, is_leaf=_is_bank)


def _is_fused(x) -> bool:
    return x is None or (isinstance(x, dict)
                         and ("qf" in x or "wf" in x) and "Bt" in x)


def attach_multilora_fused(fused_params: Params, sel: jnp.ndarray) -> Params:
    """Add the per-example one-hot `sel` to every fused leaf (trace-time,
    like attach_multilora — sel broadcasts over leading model-stack dims so
    the wrapper rides the layer scan's xs)."""

    def attach(w):
        if not (isinstance(w, dict) and ("qf" in w or "wf" in w)):
            return w
        Bt = w["Bt"]
        nb = Bt.ndim - 3
        sel_leaf = sel if nb == 0 else jnp.broadcast_to(
            sel, (*Bt.shape[:nb], *sel.shape))
        return {**w, "sel": sel_leaf}

    return jax.tree.map(attach, fused_params, is_leaf=_is_fused)


def adapter_one_hot(
    adapter_ids: Union[int, Sequence[int], np.ndarray, jnp.ndarray],
    n_adapters: int,
    batch: Optional[int] = None,
    dtype: Any = jnp.float32,
) -> jnp.ndarray:
    """[B] adapter indices -> [B, N] one-hot selection rows.

    A scalar id broadcasts over `batch`. Index -1 selects NO adapter (a
    zero row): that request row serves the bare base model."""
    ids = jnp.asarray(adapter_ids, jnp.int32)
    if ids.ndim == 0:
        if batch is None:
            raise ValueError("scalar adapter id needs `batch`")
        ids = jnp.full((batch,), ids, jnp.int32)
    if ids.ndim != 1:
        raise ValueError(f"adapter_ids must be a scalar or [B], got {ids.shape}")
    # one_hot maps out-of-range (-1) to an all-zero row already
    return jax.nn.one_hot(ids, n_adapters, dtype=dtype)


def infer_lora_config(tree: Any) -> LoRAConfig:
    """Recover the LoRAConfig a saved adapter tree was trained with (rank from
    the A factors; lm_head/embedding targeting from which leaves are adapted).
    Only `scaling` matters for serving — alpha keeps the reference default
    rule min(r, 16), which scripts/finetune.py also uses."""
    r = None
    lm = emb = False
    flat, _ = jax.tree_util.tree_flatten_with_path(tree, is_leaf=_is_ab)
    for path, leaf in flat:
        if leaf is None:
            continue
        r = int(np.shape(leaf["A"])[-2])
        name = [str(k.key) for k in path if hasattr(k, "key")][-1]
        lm = lm or name in ("lm_head", "lm_head_w")
        emb = emb or name == "embed_tokens"
    if r is None:
        raise ValueError("adapter tree has no adapted leaves")
    return LoRAConfig(r=r, include_lm_head=lm, include_embeddings=emb)


def load_adapter_checkpoint(path: Union[str, Path]) -> Any:
    """Read the LoRA tree from a finetune checkpoint dir.

    Accepts either a bare adapters tree or scripts/finetune.py's periodic
    {"lora": ..., "opt_state": ...} pair (the Adam moments are dropped).
    Template-free orbax restore: adapter trees are plain dicts of arrays, so
    the default-typed restore round-trips them exactly."""
    import orbax.checkpoint as ocp

    from ..training.checkpointing import latest_checkpoint

    p = Path(path)
    resolved = latest_checkpoint(p) or p
    with ocp.StandardCheckpointer() as ckptr:
        tree = ckptr.restore(str(Path(resolved).resolve()))
    return tree["lora"] if isinstance(tree, dict) and "lora" in tree else tree


def load_adapter_bank(
    paths: Sequence[Union[str, Path]],
    cfg: LoRAConfig,
    dtype: Any = jnp.bfloat16,
) -> Any:
    """Load N finetune-run adapter checkpoints and stack them into banks."""
    return stack_adapter_banks(
        [load_adapter_checkpoint(p) for p in paths], cfg, dtype=dtype)

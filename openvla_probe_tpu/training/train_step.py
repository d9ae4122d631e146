"""Jitted VLA/VLM train step: masked CE + in-graph action metrics + pjit sharding.

Replaces the reference's per-step host loop
(prismatic/training/strategies/base_strategy.py:245-389 run_vla_training):
the forward, loss, action-token accuracy and continuous-L1 metrics, backward,
clip, and optimizer update are ONE compiled graph — the reference's per-step
device->host syncs for metrics (base_strategy.py:303-332) become on-device
reductions returned once per step.

Loss semantics match exactly: next-token CE with IGNORE_INDEX(-100) masking so
loss lands only on action tokens (+ stop token), labels pre-masked by the data
pipeline (prismatic/vla/datasets/datasets.py:62-66); action accuracy and L1
are computed over positions where label > action_token_begin_idx
(base_strategy.py:303-332).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models import vlm
from ..vla.action_tokenizer import ActionCodec
from .train_state import TrainState

IGNORE_INDEX = -100


def _apply_mask(g: jnp.ndarray, t) -> jnp.ndarray:
    """Zero gradients where the trainable mask is False. Masks may be python
    bools (whole-leaf freezing) or arrays broadcastable against the leaf —
    e.g. a [L, 1, 1] layer mask over stacked decoder weights implements the
    reference's unfreeze_last_llm_layer."""
    if isinstance(t, bool):
        return g if t else jnp.zeros_like(g)
    t = jnp.asarray(t)
    shaped = t.reshape(t.shape + (1,) * (g.ndim - t.ndim))
    return g * shaped.astype(g.dtype)


def cross_entropy_loss(
    logits: jnp.ndarray,    # [B, T, V]
    labels: jnp.ndarray,    # [B, T] with IGNORE_INDEX
) -> jnp.ndarray:
    """Mean next-token CE over non-ignored positions (labels already aligned
    to inputs; we shift internally like the HF reference)."""
    shift_logits = logits[:, :-1]
    shift_labels = labels[:, 1:]
    valid = shift_labels != IGNORE_INDEX
    safe_labels = jnp.where(valid, shift_labels, 0)
    logp = jax.nn.log_softmax(shift_logits.astype(jnp.float32), axis=-1)
    ll = jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    total = jnp.sum(jnp.where(valid, -ll, 0.0))
    count = jnp.maximum(jnp.sum(valid), 1)
    return total / count


def action_metrics(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    codec: ActionCodec,
) -> Dict[str, jnp.ndarray]:
    """Action-token accuracy + continuous L1, on-device (reference computes
    these per-step on host, base_strategy.py:303-332)."""
    preds = logits[:, :-1].argmax(-1)
    targets = labels[:, 1:]
    mask = targets > codec.action_token_begin_idx
    n = jnp.maximum(mask.sum(), 1)
    acc = jnp.sum((preds == targets) & mask) / n
    cont_pred = codec.decode(jnp.where(mask, preds, codec.vocab_size - 1))
    cont_tgt = codec.decode(jnp.where(mask, targets, codec.vocab_size - 1))
    l1 = jnp.sum(jnp.where(mask, jnp.abs(cont_pred - cont_tgt), 0.0)) / n
    return {"action_accuracy": acc, "l1_loss": l1}


def per_example_metrics(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    codec: ActionCodec,
) -> Dict[str, jnp.ndarray]:
    """[B]-shaped loss/accuracy/L1 per example — the host groups these by
    dataset_name for the reference's per-dataset trackers
    (base_strategy.py:334-356, metrics.py:208-348). XLA CSEs the shared
    subexpressions with the batch-level reductions in the same jit."""
    shift_logits = logits[:, :-1]
    shift_labels = labels[:, 1:]
    valid = shift_labels != IGNORE_INDEX
    safe_labels = jnp.where(valid, shift_labels, 0)
    logp = jax.nn.log_softmax(shift_logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    loss = jnp.sum(jnp.where(valid, nll, 0.0), axis=1) / jnp.maximum(valid.sum(axis=1), 1)

    preds = shift_logits.argmax(-1)
    mask = shift_labels > codec.action_token_begin_idx
    n = jnp.maximum(mask.sum(axis=1), 1)
    acc = jnp.sum((preds == shift_labels) & mask, axis=1) / n
    cont_pred = codec.decode(jnp.where(mask, preds, codec.vocab_size - 1))
    cont_tgt = codec.decode(jnp.where(mask, shift_labels, codec.vocab_size - 1))
    l1 = jnp.sum(jnp.where(mask, jnp.abs(cont_pred - cont_tgt), 0.0), axis=1) / n
    return {"loss": loss, "action_accuracy": acc, "l1_loss": l1}


def vla_loss_fn(
    params: Any,
    cfg: vlm.VLMConfig,
    batch: Dict[str, jnp.ndarray],
    codec: ActionCodec,
    with_per_example: bool = True,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    out = vlm.forward(
        params, cfg,
        input_ids=batch["input_ids"],
        attn_mask=batch["attention_mask"],
        pixel_values=batch.get("pixel_values"),
        labels=batch["labels"],
    )
    logits, labels = out["logits"], out["labels"]
    loss = cross_entropy_loss(logits, labels)
    metrics = {"loss": loss, **action_metrics(logits, labels, codec)}
    if "moe_aux" in out:
        # MoE router losses (models/moe.py): load-balance + ST-MoE z-loss;
        # gradients flow through the router; metrics["loss"] stays the CE
        # (comparable across configs)
        loss = (loss + getattr(cfg.llm, "moe_aux_coef", 0.0) * out["moe_aux"]
                + getattr(cfg.llm, "moe_z_coef", 0.0) * out["moe_z"])
        metrics["moe_aux"] = out["moe_aux"]
        metrics["moe_z"] = out["moe_z"]
    if with_per_example:
        metrics["per_example"] = per_example_metrics(logits, labels, codec)
    return loss, metrics


def make_train_step(
    cfg: vlm.VLMConfig,
    optimizer: optax.GradientTransformation,
    codec: Optional[ActionCodec] = None,
    trainable_mask: Optional[Any] = None,   # pytree of bool: False => frozen
    loss_fn: Optional[Callable] = None,
    donate: bool = True,
    grad_accum_steps: int = 1,
) -> Callable[[TrainState, Dict[str, jnp.ndarray]], Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    """Build the jitted (state, batch) -> (state, metrics) step.

    `trainable_mask` implements stage freezing (reference
    vlms/prismatic.py:129-241 freeze_backbones): frozen leaves get zero
    gradients, so optimizer momentum never moves them.

    `grad_accum_steps > 1` scans micro-batches (batch leading dim must divide)
    accumulating mean gradients — the reference's accumulation-normalized VLM
    loop (base_strategy.py:85,208-221) as one compiled step.
    """
    codec = codec or ActionCodec()
    loss_fn = loss_fn or functools.partial(vla_loss_fn, codec=codec)

    def compute_grads(params, batch):
        if grad_accum_steps <= 1:
            return jax.value_and_grad(lambda p: loss_fn(p, cfg, batch), has_aux=True)(params)
        micro = jax.tree.map(
            lambda x: x.reshape(grad_accum_steps, x.shape[0] // grad_accum_steps, *x.shape[1:]),
            batch,
        )

        def body(carry, mb):
            g_acc, l_acc, m_acc = carry
            (loss, metrics), grads = jax.value_and_grad(
                lambda p: loss_fn(p, cfg, mb), has_aux=True
            )(params)
            # per-example arrays can't be meaningfully summed across
            # micro-batches (different examples share a slot); drop them here
            metrics = {k: v for k, v in metrics.items() if k != "per_example"}
            g_acc = jax.tree.map(lambda a, g: a + g, g_acc, grads)
            m_acc = jax.tree.map(lambda a, m: a + m, m_acc, metrics)
            return (g_acc, l_acc + loss, m_acc), ()

        zeros_g = jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32), params)
        sample = jax.tree.map(lambda x: x[0], micro)
        _, zeros_m = jax.eval_shape(lambda p: loss_fn(p, cfg, sample), params)
        zeros_m = {k: v for k, v in zeros_m.items() if k != "per_example"}
        zeros_m = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), zeros_m)
        (g, l, m), _ = jax.lax.scan(body, (zeros_g, jnp.float32(0), zeros_m), micro)
        scale = 1.0 / grad_accum_steps
        g = jax.tree.map(lambda x: x * scale, g)
        m = jax.tree.map(lambda x: x * scale, m)
        return (l * scale, m), g

    def step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        (loss, metrics), grads = compute_grads(state.params, batch)
        if trainable_mask is not None:
            grads = jax.tree.map(_apply_mask, grads, trainable_mask)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        if trainable_mask is not None:
            # also mask the updates: AdamW's decoupled weight decay would
            # otherwise move frozen parameters despite zero gradients
            updates = jax.tree.map(_apply_mask, updates, trainable_mask)
        new_params = jax.tree.map(
            lambda p, u: (p.astype(jnp.float32) + u.astype(jnp.float32)).astype(p.dtype),
            state.params, updates,
        )
        new_state = TrainState(step=state.step + 1, params=new_params, opt_state=new_opt)
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_sharded_train_step(
    cfg: vlm.VLMConfig,
    optimizer: optax.GradientTransformation,
    mesh,
    state_shardings,
    batch_sharding,
    codec: Optional[ActionCodec] = None,
    trainable_mask: Optional[Any] = None,
    loss_fn: Optional[Callable] = None,
):
    """pjit variant: state/batch shardings pin the fsdp/tp/dp layout; XLA
    inserts the all-gather / reduce-scatter collectives (the entire FSDP
    machinery of the reference, fsdp.py:40-270, reduces to these specs)."""
    codec = codec or ActionCodec()
    loss_fn = loss_fn or functools.partial(vla_loss_fn, codec=codec)

    def step(state: TrainState, batch):
        (loss, metrics), grads = jax.value_and_grad(
            lambda p: loss_fn(p, cfg, batch), has_aux=True
        )(state.params)
        if trainable_mask is not None:
            grads = jax.tree.map(_apply_mask, grads, trainable_mask)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        if trainable_mask is not None:
            # also mask the updates: AdamW's decoupled weight decay would
            # otherwise move frozen parameters despite zero gradients
            updates = jax.tree.map(_apply_mask, updates, trainable_mask)
        new_params = jax.tree.map(
            lambda p, u: (p.astype(jnp.float32) + u.astype(jnp.float32)).astype(p.dtype),
            state.params, updates,
        )
        new_state = TrainState(step=state.step + 1, params=new_params, opt_state=new_opt)
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return jax.jit(
        step,
        in_shardings=(state_shardings, batch_sharding),
        out_shardings=(state_shardings, None),
        donate_argnums=(0,),
    )

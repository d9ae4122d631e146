#!/usr/bin/env python
"""Trained-weight parity certificate: finetune on-chip, then measure margins.

Closes the round-2 gap (VERDICT r2 Missing #1): every previous parity run used
RANDOM weights, where top1-top2 logit margins are ~0.2 logits and the int8
perturbation (~0.8-1.3 logits) trivially flips argmaxes — so the measured
~50% agreement said nothing about trained-model behavior. This script
produces the measurement the conjecture was standing in for:

  1. TRAIN  — streamed-LoRA finetune of the full OpenVLA-7B stack (int8 frozen
     base, the single-chip QLoRA path) on a deterministic, *learnable*
     synthetic task: each image's 7 action tokens encode coarse (16-level)
     per-stripe brightness, so the mapping generalizes to held-out images and
     cross-entropy -> 0 drives action-token margins to trained-regime values
     (CE loss concentrates mass on one of 256 bins, exactly like real VLA
     training, reference vla-scripts/finetune.py + modeling_prismatic.py
     greedy contract :506-536).
  2. BF16 EVAL — the trained bf16 model IS the streamed tree
     dequant(int8 base) + adapters (exactly the function training optimized);
     serve it in the bit-parity config and record greedy tokens, top1-top2
     margins, and first-position logits over the standard parity corpus
     (train images + held-out images).
  3. INT8 EVAL — merge + REquantize leaf-by-leaf ON DEVICE (no 15 GB
     host<->device transfers through the tunnel), serve with the full shipped
     turbo config (vlm.VLMConfig.turbo(), same single definition bench.py
     uses), record the same statistics.
  4. SPECULATIVE — at trained margins, (a) verify-pass vs sequential-decode
     token equality (the round-2 "reduction-order hole", models/vla.py
     caveat) and (b) draft-acceptance along a simulated robot rollout
     (morphing frames, draft = previous step's tokens).

Certificate lines append to --report (PARITY_r03.md). The pass rule is the
one PARITY_r02.md set: bf16_margin_p1 > 2 x int8_perturb_linf_max
=> int8 greedy tokens are guaranteed equal over the corpus.

Phases are restartable: adapters checkpoint to --run_dir; bf16 results cache
to bf16_results.npz; `--phase train|eval|all` (the int8/base tree regenerates
deterministically from --seed).
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time
import zlib
from dataclasses import dataclass
from pathlib import Path
from typing import Optional

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

from openvla_probe_tpu.utils.platform import apply_platform_env

apply_platform_env()
from openvla_probe_tpu.conf.registry import parse_config
from openvla_probe_tpu.overwatch import initialize_overwatch

overwatch = initialize_overwatch(__name__)

INSTRUCTION = "put spoon on towel"
PROMPT = f"In: What action should the robot take to {INSTRUCTION}?\nOut:"


@dataclass(frozen=True)
class TrainedParityConfig:
    scale: str = "full"                  # full | tiny (CI smoke)
    phase: str = "all"                   # all | train | eval
    run_dir: str = "runs/trained_parity"
    report: Optional[str] = None         # e.g. PARITY_r03.md

    # training
    steps: int = 800
    batch: int = 8
    lr: float = 1e-3
    rank: int = 32
    seed: int = 0
    save_every: int = 200
    stop_loss: float = 0.01              # early stop when smoothed loss < this

    # corpus: first n_train images are the train set, the rest held out
    n_train_images: int = 64
    n_eval_images: int = 128
    bf16_batch: int = 4
    int8_batch: int = 16
    spec_images: int = 32                # spec-vs-sequential check set size
    rollout_steps: int = 24              # morphing-frame acceptance rollout
    # which quantized serving tier the quantized phase certifies: "turbo"
    # (the int8 bench headline), "turbo_kv8" (+ int8 frozen prefill KV — the
    # wider perturbation row of the tier matrix), "pallas_kv8" (int8 stacked
    # cache + fused-dequant Pallas decode kernel), "int4" (grouped int4
    # weights served through the turbo config — the widest perturbation of
    # the matrix, and the 13B-on-one-chip / halved-decode-stream tier), or
    # "mix" (dual-precision int8-prefill + int4-decode leaves — prefill
    # positions see the int8 perturbation, decode matmuls the int4 one), or
    # "nibble" (nibble-plane int8: prefill positions see EXACTLY the int8
    # perturbation, decode matmuls the hi-plane ~absmax/7.94 per-channel one)
    int8_tier: str = "turbo"
    fleet_batch: int = 24                # steady-state fleet-serving batch


class CRC32Tokenizer:
    """Deterministic pseudo-tokenizer (no tokenizer download in this env).

    Unlike `hash()` (randomized per process), crc32 is stable across runs, so
    the prompt token ids the adapters were trained against survive a restart.
    """

    vocab_size = 32000

    def encode(self, t: str):
        return [1] + [(zlib.crc32(w.encode()) % 30000) + 1000 for w in t.split()]


def stripe_targets(images, vocab_size: int, action_dim: int = 7):
    """Per-image action tokens from coarse (16-level) stripe brightness.

    Deterministic and *generalizing*: dim d's token encodes the mean
    brightness of the d-th vertical stripe, quantized to 16 well-separated
    levels whose bin centers sit 16 action-bins apart — a near-boundary
    image can cost task accuracy but the decision regions are wide, so a
    model at CE ~ 0 is confident (large-margin) on held-out images too.
    """
    import numpy as np

    toks = []
    for img in images:
        W = img.shape[1]
        t = []
        for d in range(action_dim):
            s0, s1 = (d * W) // action_dim, ((d + 1) * W) // action_dim
            m = float(img[:, s0:s1].astype(np.float32).mean()) / 255.0
            level = min(int(m * 16.0), 15)
            bin_index = 8 + level * 16          # in [8, 248], centers of 16 blocks
            t.append(vocab_size - bin_index)
        toks.append(t)
    return np.asarray(toks, np.int32)


def _configs(scale: str):
    from openvla_probe_tpu.models import vlm
    from openvla_probe_tpu.ops.image import (
        BackboneTransformSpec,
        ImageTransformConfig,
    )

    if scale == "tiny":
        cfg = vlm.VLMConfig.tiny()
        s = cfg.vision[0].image_size
        img_cfg = ImageTransformConfig(specs=(
            BackboneTransformSpec((s, s), "bicubic",
                                  (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)),
            BackboneTransformSpec((s, s), "bicubic", (0.5, 0.5, 0.5), (0.5, 0.5, 0.5)),
        ))
        pad = 24
    else:
        cfg = vlm.VLMConfig.openvla_7b()
        img_cfg = ImageTransformConfig.dinosiglip_224()
        pad = 32
    return cfg, img_cfg, pad


# the full shipped turbo quantization set — single definition in ops.linear
from openvla_probe_tpu.ops.linear import TURBO_QUANT_SUFFIXES


def make_base_params(cfg, seed: int):
    """Deterministic int8 base tree (regenerable: no need to checkpoint 7.5 GB).

    `random_params_like` over the quantized eval_shape — never materializes
    the bf16 twin (16 GB chip; see bench.py:70-79). The trained model is
    DEFINED as dequant(this base) + adapters, so the base never needs a bf16
    original to exist.
    """
    import jax

    from openvla_probe_tpu.models import vlm
    from openvla_probe_tpu.ops.linear import quantize_params, random_params_like

    shapes = jax.eval_shape(
        lambda key: quantize_params(vlm.init_params(cfg, key),
                                    suffixes=TURBO_QUANT_SUFFIXES),
        jax.random.key(seed))
    return jax.jit(lambda key: random_params_like(shapes, key))(jax.random.key(seed))


def make_batches(cfg, img_cfg, images, targets, pad_len: int):
    """Pre-transformed pixels + fixed-shape token batches for the train set."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    tok = CRC32Tokenizer()
    prompt_ids = tok.encode(PROMPT) + [29871]   # serving appends 29871 too
    A = targets.shape[1]
    T = pad_len + A + 1                         # prompt bucket + actions + stop
    assert len(prompt_ids) <= pad_len

    # transform on device in chunks (same function the serving jit fuses)
    from openvla_probe_tpu.ops.image import apply_image_transform

    tf = jax.jit(lambda u8: apply_image_transform(u8, img_cfg))
    pixels = np.concatenate([
        np.asarray(tf(jnp.asarray(np.stack(images[i:i + 8]))), np.float32)
        for i in range(0, len(images), 8)
    ])

    n = len(images)
    ids = np.zeros((n, T), np.int32)
    mask = np.zeros((n, T), np.int32)
    labels = np.full((n, T), -100, np.int32)
    L = len(prompt_ids)
    for i in range(n):
        row = prompt_ids + list(targets[i]) + [2]
        ids[i, :len(row)] = row
        mask[i, :len(row)] = 1
        labels[i, L:L + A + 1] = list(targets[i]) + [2]
    return pixels, ids, mask, labels


def run_train(cfg, img_cfg, pad_len, base, images, targets, pc: TrainedParityConfig):
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from openvla_probe_tpu.training import checkpointing as ckpt
    from openvla_probe_tpu.training import lora
    from openvla_probe_tpu.training.train_state import OptimizerConfig, make_optimizer
    from openvla_probe_tpu.training.train_step import vla_loss_fn
    from openvla_probe_tpu.vla.action_tokenizer import ActionCodec

    tcfg = dataclasses.replace(
        cfg,
        llm=dataclasses.replace(cfg.llm, remat=True),
        vision=tuple(dataclasses.replace(v, remat=True) for v in cfg.vision),
    )
    codec = ActionCodec(vocab_size=min(cfg.llm.vocab_size, 32000))
    lcfg = lora.LoRAConfig(r=pc.rank, include_lm_head=True)
    lora_params = jax.jit(
        lambda k: lora.init_lora_params(base, lcfg, k))(jax.random.key(pc.seed + 1))
    prev = ckpt.latest_checkpoint(pc.run_dir)
    if prev is not None:
        # continue from the previous run's adapters (fresh Adam moments:
        # they re-warm within ~20 steps) — lets a follow-up run push the
        # margins further without repaying the converged steps
        lora_params = ckpt.load_checkpoint(prev, {"lora": lora_params})["lora"]
        overwatch.info(f"resuming adapters from {prev}")
    loss_fn = lora.make_lora_loss_with_base(
        functools.partial(vla_loss_fn, codec=codec, with_per_example=False),
        lcfg, stream=True)

    opt = make_optimizer(
        OptimizerConfig(learning_rate=pc.lr, lr_schedule_type="constant",
                        max_steps=pc.steps, weight_decay=0.0), lora_params)
    opt_state = opt.init(lora_params)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step_fn(lp, opt_state, base, batch):
        (loss, m), g = jax.value_and_grad(
            lambda l: loss_fn(l, base, tcfg, batch), has_aux=True)(lp)
        up, opt_state = opt.update(g, opt_state, lp)
        return optax.apply_updates(lp, up), opt_state, loss, m["action_accuracy"]

    pixels, ids, mask, labels = make_batches(cfg, img_cfg, images, targets, pad_len)
    n = len(images)
    rng = np.random.default_rng(pc.seed)
    run_dir = Path(pc.run_dir)
    run_dir.mkdir(parents=True, exist_ok=True)

    t0, losses = time.time(), []
    for step in range(1, pc.steps + 1):
        sel = rng.integers(0, n, pc.batch)
        batch = {
            "input_ids": jnp.asarray(ids[sel]),
            "attention_mask": jnp.asarray(mask[sel]),
            "pixel_values": jnp.asarray(pixels[sel], cfg.llm.dtype),
            "labels": jnp.asarray(labels[sel]),
        }
        lora_params, opt_state, loss, acc = step_fn(lora_params, opt_state, base, batch)
        if step % 10 == 0 or step == 1:
            lv, av = float(np.asarray(loss)), float(np.asarray(acc))
            losses.append(lv)
            overwatch.info(f"step {step}: loss={lv:.4f} action_acc={av:.3f} "
                           f"({(time.time() - t0):.0f}s)")
            if len(losses) >= 3 and max(losses[-3:]) < pc.stop_loss:
                overwatch.info(f"early stop at step {step} (loss < {pc.stop_loss})")
                break
        if step % pc.save_every == 0:
            ckpt.save_checkpoint(run_dir, {"lora": lora_params}, step=step)

    final = ckpt.save_checkpoint(run_dir, {"lora": lora_params}, step=pc.steps + 1)
    overwatch.info(f"saved final adapters to {final}")
    del opt_state
    return lora_params, lcfg


def load_adapters(base, pc: TrainedParityConfig):
    import jax

    from openvla_probe_tpu.training import checkpointing as ckpt
    from openvla_probe_tpu.training import lora

    lcfg = lora.LoRAConfig(r=pc.rank, include_lm_head=True)
    template = jax.eval_shape(
        lambda: lora.init_lora_params(base, lcfg, jax.random.key(pc.seed + 1)))
    path = ckpt.latest_checkpoint(pc.run_dir)
    if path is None:
        raise FileNotFoundError(f"no adapter checkpoint under {pc.run_dir}; "
                                f"run --phase train first")
    restored = ckpt.load_checkpoint(path, {"lora": template})
    overwatch.info(f"loaded adapters from {path}")
    return restored["lora"], lcfg


def merge_requantize_on_device(holder, lcfg, bits=8):
    """Merged turbo tree, leaf by leaf on device (bounded transients).

    Quantized {"q","s"} leaves: dequant + scale*B@A in fp32 per stacked layer
    (lax.map bounds the fp32 transient to ONE layer's weight), requantize —
    per-channel int8, grouped int4 with `bits=4`, or dual-precision with
    `bits="mix"` (BOTH copies quantized from the same merged fp32 weights —
    exactly load_vla(quantize_bits="mix")'s relation to the bf16 master).
    Leaves whose in-dim has no usable group fall back to int8, mirroring
    ops.linear.quantize_params. Plain adapted leaves merge in fp32 and keep
    their dtype.

    `holder` is a [base, lora] list whose entries this function POPS: the
    caller must hold no other references, so each replaced base leaf frees as
    soon as its merged successor exists — peak HBM stays ~ one tree, which is
    what lets the 7B bf16-parity and int8-turbo phases run back to back on a
    16 GB chip.
    """
    import jax
    import jax.numpy as jnp

    from openvla_probe_tpu.ops.linear import (
        is_quantized, materialize_int4, quantize_weight, quantize_weight_int4,
        quantize_weight_nibble)
    from openvla_probe_tpu.training.lora import _is_ab

    base, lora_params = holder
    holder.clear()
    scale = lcfg.scaling

    def merge_q(q, s, A, B, mode: str = "int8"):
        wf = (q.astype(jnp.float32) * s[..., None].astype(jnp.float32)
              + scale * (B.astype(jnp.float32) @ A.astype(jnp.float32)))
        # int4 code leaves leave the jit as int8 CODES; the caller
        # materializes s4 eagerly per leaf (s4 jit outputs carry poisoned
        # layout metadata on TPU — ops.linear._canonical_s4_format)
        if mode == "int4":
            return quantize_weight_int4(wf, emit_codes=True)
        if mode == "mix":
            w8 = quantize_weight(wf)
            w4 = quantize_weight_int4(wf, emit_codes=True)
            return {"q": w8["q"], "s": w8["s"], "q4": w4["q"], "s4": w4["s"]}
        if mode == "nibble":
            return quantize_weight_nibble(wf, emit_codes=True)
        return quantize_weight(wf)

    def merge_plain(w, A, B):
        wf = w.astype(jnp.float32) + scale * (B.astype(jnp.float32) @ A.astype(jnp.float32))
        return wf.astype(w.dtype)

    pflat, ptree = jax.tree_util.tree_flatten(base, is_leaf=is_quantized)
    lflat, _ = jax.tree_util.tree_flatten(lora_params, is_leaf=_is_ab)
    assert len(pflat) == len(lflat), "adapter/base tree mismatch"
    del base, lora_params
    stacked_q = jax.jit(lambda q, s, A, B, mode="int8": jax.lax.map(
        lambda args: merge_q(*args, mode=mode), (q, s, A, B)),
        static_argnames=("mode",))
    flat_q = jax.jit(merge_q, static_argnames=("mode",))
    plain = jax.jit(merge_plain)
    for i in range(len(pflat)):
        w, lw = pflat[i], lflat[i]
        if lw is None:
            continue
        if is_quantized(w):
            I = w["q"].shape[-1]
            groupable = I % min(128, I) == 0
            # nibble needs no group structure (per-channel planes); int4/mix
            # fall back to int8 on ungroupable in-dims like quantize_params
            mode = bits if (bits == "nibble"
                            or (bits in (4, "mix") and groupable)) else 8
            mode = {4: "int4", "mix": "mix", "nibble": "nibble", 8: "int8"}[mode]
            fn = stacked_q if w["q"].ndim >= 3 else flat_q
            new = fn(w["q"], w["s"], lw["A"], lw["B"], mode=mode)
            if mode == "int4":
                new = {"q": materialize_int4(new["q"]), "s": new["s"]}
            elif mode == "mix":
                new = {**new, "q4": materialize_int4(new["q4"])}
            elif mode == "nibble":
                new = {"hi": materialize_int4(new["hi"]),
                       "lo": materialize_int4(new["lo"]), "s": new["s"]}
        else:
            new = plain(w, lw["A"], lw["B"])
        pflat[i] = new
        lflat[i] = None          # drop adapter + old base refs as we go
        jax.block_until_ready(new)
    return jax.tree_util.tree_unflatten(ptree, pflat)


def make_model(params, cfg, img_cfg, pad_len, tier: str = "parity"):
    import numpy as np

    from openvla_probe_tpu.models import vla

    decode_impl = {"turbo_kv8": "frozen_kv", "pallas_kv8": "stacked_kv8"}.get(
        tier, "stacked")
    serving = vla.VLAServingConfig(
        vlm=cfg, prompt_pad_len=pad_len,
        codec_vocab_size=min(cfg.llm.vocab_size, 32000),
        # "int4"/"mix" are WEIGHT changes, not serving-graph changes: they
        # serve through the turbo config (same as load_vla(quantize_bits=...))
        tier="turbo" if tier in ("int4", "mix", "nibble") else tier,
        decode_impl=decode_impl,
        kv_int8=(tier == "turbo_kv8"),
        # this harness MEASURES the parity-tier speculative disagreement the
        # serving gate exists to prevent — explicit opt-in
        speculative_in_parity="allow")
    stats = {"bridge_orig": {"action": {
        "q01": -np.ones(7, np.float32), "q99": np.ones(7, np.float32),
        "mask": np.array([True] * 6 + [False]),
    }}}
    return vla.OpenVLA(params, serving, CRC32Tokenizer(), stats, img_cfg)


def run_eval_mode(model, images, batch: int):
    import numpy as np

    toks, margins, first_logits = [], [], []
    for i in range(0, len(images), batch):
        chunk = images[i:i + batch]
        if len(chunk) < batch:                      # keep ONE compiled shape
            chunk = chunk + [chunk[-1]] * (batch - len(chunk))
        out = model.predict_action(np.stack(chunk), PROMPT,
                                   unnorm_key="bridge_orig",
                                   return_first_logits=True)
        k = min(batch, len(images) - i)
        toks.append(out["action_tokens"][:k])
        margins.append(out["logit_margins"][:k])
        first_logits.append(out["first_logits"][:k])
    return (np.concatenate(toks), np.concatenate(margins),
            np.concatenate(first_logits))


def run_spec_checks(model, images, ref_tokens, batch: int, n_images: int):
    """Speculative-vs-sequential token equality under adversarial drafts."""
    import numpy as np

    n = min(n_images, len(images))
    mismatches, accepted = 0, []
    A = ref_tokens.shape[1]
    V = model.cfg.codec_vocab_size
    for i in range(0, n, batch):
        chunk = images[i:i + batch]
        ref = ref_tokens[i:i + batch]
        if len(chunk) < batch:
            pad = batch - len(chunk)
            chunk = chunk + [chunk[-1]] * pad
            ref = np.concatenate([ref, np.repeat(ref[-1:], pad, axis=0)])
        k = min(batch, n - i)
        for draft in (
            ref,                                            # full acceptance
            np.roll(ref, 1, axis=0),                        # neighbor's tokens
            np.full_like(ref, V - 128),                     # constant wrong bin
            np.concatenate([ref[:, :A // 2],                # right prefix,
                            np.full((batch, A - A // 2),    # wrong tail
                                    V - 5, ref.dtype)], axis=1),
        ):
            out = model.predict_action(np.stack(chunk), PROMPT,
                                       unnorm_key="bridge_orig",
                                       draft_tokens=draft)
            mismatches += int((out["action_tokens"][:k] != ref[:k]).sum())
            accepted.extend(np.asarray(out["n_accepted"][:k]).tolist())
    return {"spec_token_mismatches": mismatches,
            "spec_positions_checked": 4 * n * A,
            "spec_accept_hist": np.bincount(accepted, minlength=A + 1).tolist()}


def run_fleet_bench(model, images, batch: int, n_calls: int = 30):
    """Steady-state fleet serving: B independent control streams, each
    drafting with its own previous step's tokens. At trained margins the
    verify pass equals sequential decode (measured: 0/1792 mismatches), so
    stable frames accept 7/7 and the whole batch step costs ~one verify
    prefill — the sequential-decode share vanishes. Random-weight benches
    cannot show this: hairline margins cap acceptance at ~2 and the
    batch-uniform restart (min over rows) re-runs the decode."""
    import numpy as np

    import jax.numpy as jnp

    frames = np.stack((images * ((batch // len(images)) + 1))[:batch])
    out = model.predict_action(frames, PROMPT, unnorm_key="bridge_orig")
    draft = np.asarray(out["action_tokens"], np.int32)

    # bench-style timing: drive the spec jit directly, feed the DEVICE token
    # array back as the next draft, fetch values once at the end — the
    # wrapper's per-call np.asarray fetches cost ~200 ms of tunnel round
    # trips per call on this backend (verify skill: only a fetch truly waits)
    stats = model.get_action_stats("bridge_orig")
    ids, plen = model.prepare_ids(PROMPT)
    fn = model._get_spec_jit(False)
    common = dict(
        image_u8=jnp.asarray(frames),
        input_ids=jnp.broadcast_to(jnp.asarray(ids), (batch, ids.shape[0])),
        prompt_len=jnp.full((batch,), plen, jnp.int32),
        q01=jnp.asarray(np.asarray(stats["q01"], np.float32)),
        q99=jnp.asarray(np.asarray(stats["q99"], np.float32)),
        action_mask=jnp.asarray(np.asarray(stats["mask"], bool)),
    )
    o = fn(model.params, draft_tokens=jnp.asarray(draft), **common)
    accepted = np.asarray(o["n_accepted"])           # fetch = warmup sync
    for _ in range(2):
        o = fn(model.params, draft_tokens=o["action_tokens"], **common)
    _ = np.asarray(o["n_accepted"])
    t0 = time.time()
    for _ in range(n_calls):
        o = fn(model.params, draft_tokens=o["action_tokens"], **common)
    _ = np.asarray(o["action_tokens"])
    dt = (time.time() - t0) / n_calls
    return {
        "fleet_batch": batch,
        "fleet_p50_ms": round(dt * 1e3, 2),
        "fleet_calls_per_s": round(batch / dt, 2),
        "fleet_min_accepted": int(accepted.min()),
        "fleet_mean_accepted": round(float(accepted.mean()), 2),
    }


def run_rollout_acceptance(model, images, steps: int):
    """Morphing-frame rollout: draft = previous step's tokens (the robot-loop
    operating mode). Reports the acceptance distribution at trained weights."""
    import numpy as np

    a = images[0].astype(np.float32)
    b = images[1 % len(images)].astype(np.float32)
    prev = None
    accepted = []
    for t in range(steps):
        w = t / max(steps - 1, 1)
        frame = np.clip((1 - w) * a + w * b, 0, 255).astype(np.uint8)
        if prev is None:
            out = model.predict_action(frame, PROMPT, unnorm_key="bridge_orig")
        else:
            out = model.predict_action(frame, PROMPT, unnorm_key="bridge_orig",
                                       draft_tokens=prev)
            accepted.append(int(out["n_accepted"]))
        prev = out["action_tokens"]
    A = model.cfg.action_dim
    return {"rollout_steps": steps,
            "rollout_accept_hist": np.bincount(accepted, minlength=A + 1).tolist(),
            "rollout_accept_mean": round(float(np.mean(accepted)), 3)}


def split_stats(ref_toks, ref_margins, ref_fl, t_toks, t_fl, n_train: int):
    import numpy as np

    out = {}
    for name, sl in (("train", slice(0, n_train)), ("heldout", slice(n_train, None)),
                     ("all", slice(None))):
        rt, tt = ref_toks[sl], t_toks[sl]
        m = ref_margins[sl].astype(np.float64)
        delta = np.abs(ref_fl[sl].astype(np.float64) - t_fl[sl].astype(np.float64))
        dinf = delta.max(axis=1)
        eq = rt == tt
        out[name] = {
            "n": int(rt.shape[0]),
            "per_dim_agreement": [round(float(r), 4) for r in eq.mean(axis=0)],
            "overall_agreement": round(float(eq.mean()), 4),
            "max_bin_drift": int(np.abs(rt.astype(np.int64) - tt.astype(np.int64)).max()),
            "bf16_margin_p1": round(float(np.quantile(m, 0.01)), 4),
            "bf16_margin_p50": round(float(np.quantile(m, 0.5)), 4),
            "bf16_margin_min": round(float(m.min()), 4),
            "int8_perturb_linf_p50": round(float(np.quantile(dinf, 0.5)), 4),
            "int8_perturb_linf_max": round(float(dinf.max()), 4),
        }
    return out


def main(pc: TrainedParityConfig) -> None:
    import gc

    import jax
    import numpy as np

    from scripts.check_parity import make_image_corpus

    cfg, img_cfg, pad_len = _configs(pc.scale)
    hw = (224, 224) if pc.scale == "full" else (64, 64)
    images = make_image_corpus(pc.n_eval_images, hw=hw)   # SAME corpus as r2
    train_images = images[:pc.n_train_images]
    targets = stripe_targets(np.stack(images),
                             min(cfg.llm.vocab_size, 32000))

    run_dir = Path(pc.run_dir)
    run_dir.mkdir(parents=True, exist_ok=True)
    base = make_base_params(cfg, pc.seed)
    jax.block_until_ready(base)
    overwatch.info("int8 base materialized")

    if pc.phase in ("all", "train"):
        lora_params, lcfg = run_train(cfg, img_cfg, pad_len, base,
                                      train_images, targets[:pc.n_train_images], pc)
    else:
        lora_params, lcfg = load_adapters(base, pc)
    if pc.phase == "train":
        return

    from openvla_probe_tpu.training.lora import attach_lora

    results = {}
    bf16_cache = run_dir / "bf16_results.npz"
    if bf16_cache.exists() and pc.phase == "eval":
        z = np.load(bf16_cache)
        ref_toks, ref_margins, ref_fl = z["tokens"], z["margins"], z["first_logits"]
        results["bf16_spec"] = json.loads(str(z["spec_json"]))
        overwatch.info(f"loaded cached bf16 results from {bf16_cache}")
    else:
        # ---- bf16 parity mode: the streamed trained model ------------------
        streamed = attach_lora(base, lora_params, lcfg)
        model = make_model(streamed, cfg, img_cfg, pad_len)
        t0 = time.time()
        ref_toks, ref_margins, ref_fl = run_eval_mode(model, images, pc.bf16_batch)
        overwatch.info(f"bf16 eval done in {time.time() - t0:.0f}s")
        results["bf16_spec"] = run_spec_checks(model, images, ref_toks,
                                               pc.bf16_batch, pc.spec_images)
        overwatch.info(f"bf16 spec checks: {results['bf16_spec']}")
        np.savez(bf16_cache, tokens=ref_toks, margins=ref_margins,
                 first_logits=ref_fl,
                 spec_json=json.dumps(results["bf16_spec"]))
        del model, streamed
        gc.collect()

    # task sanity: did training actually learn the mapping?
    task_acc_train = float((ref_toks[:pc.n_train_images]
                            == targets[:pc.n_train_images]).mean())
    task_acc_held = float((ref_toks[pc.n_train_images:]
                           == targets[pc.n_train_images:]).mean())
    overwatch.info(f"bf16 task accuracy: train={task_acc_train:.3f} "
                   f"heldout={task_acc_held:.3f}")

    # ---- int8 turbo mode: merged + requantized, full shipped config --------
    holder = [base, lora_params]
    del base, lora_params
    turbo_tree = merge_requantize_on_device(
        holder, lcfg,
        bits={"int4": 4, "mix": "mix", "nibble": "nibble"}.get(pc.int8_tier, 8))
    gc.collect()
    tcfg = cfg.turbo() if pc.scale == "full" else cfg
    model = make_model(turbo_tree, tcfg, img_cfg, pad_len, tier=pc.int8_tier)
    t0 = time.time()
    t_toks, t_margins, t_fl = run_eval_mode(model, images, pc.int8_batch)
    overwatch.info(f"int8 eval done in {time.time() - t0:.0f}s")
    results["int8_spec"] = run_spec_checks(model, images, t_toks,
                                           pc.int8_batch, pc.spec_images)
    overwatch.info(f"int8 spec checks: {results['int8_spec']}")
    results["rollout"] = run_rollout_acceptance(model, images, pc.rollout_steps)
    overwatch.info(f"rollout acceptance: {results['rollout']}")
    if pc.scale == "full":
        results["fleet"] = run_fleet_bench(model, images, batch=pc.fleet_batch)
        overwatch.info(f"fleet steady state: {results['fleet']}")

    stats = split_stats(ref_toks, ref_margins, ref_fl, t_toks, t_fl,
                        pc.n_train_images)
    margin_p1 = stats["all"]["bf16_margin_p1"]
    perturb_max = stats["all"]["int8_perturb_linf_max"]
    payload = {
        "kind": "trained_weight_certificate",
        "scale": pc.scale,
        "tier": pc.int8_tier,
        "backend": jax.default_backend(),
        "train_steps": pc.steps,
        "rank": pc.rank,
        "task_acc_train": round(task_acc_train, 4),
        "task_acc_heldout": round(task_acc_held, 4),
        "splits": stats,
        "pass_margin_rule": bool(margin_p1 > 2 * perturb_max),
        **{f"bf16_{k}": v for k, v in results["bf16_spec"].items()},
        **{f"int8_{k}": v for k, v in results["int8_spec"].items()},
        **results["rollout"],
        **results.get("fleet", {}),
    }
    line = json.dumps(payload)
    if pc.report:
        with open(pc.report, "a") as f:
            f.write(line + "\n")
        overwatch.info(f"appended certificate to {pc.report}")
    print(line)


if __name__ == "__main__":
    main(parse_config(TrainedParityConfig))

#!/usr/bin/env python
"""Token-agreement harness: bf16 parity mode vs int8 turbo serving mode.

Greedy action tokens are the serving contract (SURVEY.md §7: argmax-token
equality, not float equality). This script runs N images through BOTH modes
of a model and reports exact-token agreement per dimension — the
quantization-drift check that gates enabling the turbo mode in deployment.

Modes
  --checkpoint <dir>   real HF-layout checkpoint (run wherever weights exist)
  --scale full         full OpenVLA-7B architecture, random weights (seeded:
                       both modes quantize the SAME weights). Random weights
                       are the conservative case for agreement: logit gaps
                       between adjacent bins are much smaller than with
                       trained weights.
  (default)            tiny random model (CI smoke)

Image corpus: structured frames (gradients, checkerboards, blobs, solids)
plus uniform noise — `--image_dir` supplies real frames when available.
Writes a markdown certificate to --report (e.g. PARITY_r02.md).
"""

from __future__ import annotations

import json
import sys
import time
from dataclasses import dataclass
from pathlib import Path
from typing import Optional, Union

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

from openvla_probe_tpu.utils.platform import apply_platform_env

apply_platform_env()
from openvla_probe_tpu.conf.registry import parse_config
from openvla_probe_tpu.overwatch import initialize_overwatch

overwatch = initialize_overwatch(__name__)


@dataclass(frozen=True)
class ParityConfig:
    checkpoint: Optional[str] = None     # local HF-layout dir; None = random
    scale: str = "tiny"                  # tiny | full (random weights)
    n_images: int = 128
    batch: int = 8                       # bf16-mode batch (HBM-bound)
    turbo_batch: int = 16
    image_dir: Optional[str] = None      # real frames if available
    instruction: str = "put spoon on towel"
    unnorm_key: Optional[str] = None
    quant_vit: bool = False              # also quantize the ViT towers (BENCH_QUANT_VIT)
    bits: Union[int, str] = 8            # turbo bits: 8 | 4 | "mix" | "nibble"
    report: Optional[str] = None         # markdown artifact path


def make_image_corpus(n: int, hw=(224, 224), image_dir: Optional[str] = None):
    """Structured frames + noise: gradients, checkerboards, gaussian blobs,
    solid colors — exercises the preprocessing + ViT paths with non-noise
    statistics (noise-only corpora underestimate logit-gap sensitivity)."""
    import numpy as np

    if image_dir:
        from PIL import Image

        paths = sorted(Path(image_dir).glob("*.jpg")) + sorted(Path(image_dir).glob("*.png"))
        return [np.asarray(Image.open(p).convert("RGB").resize(hw)) for p in paths[:n]]

    g = np.random.default_rng(0)
    H, W = hw
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    images = []
    for i in range(n):
        kind = i % 5
        if kind == 0:    # linear gradient, random direction/colors
            a, b = g.random(3), g.random(3)
            t = ((xx * g.normal() + yy * g.normal()) / (H + W))
            t = (t - t.min()) / max(float(np.ptp(t)), 1e-6)
            img = (a[None, None] * t[..., None] + b[None, None] * (1 - t[..., None]))
        elif kind == 1:  # checkerboard at random scale
            s = int(g.integers(4, 40))
            chk = ((xx // s + yy // s) % 2)[..., None]
            c1, c2 = g.random(3), g.random(3)
            img = chk * c1[None, None] + (1 - chk) * c2[None, None]
        elif kind == 2:  # gaussian blobs on a solid background
            img = np.tile(g.random(3)[None, None], (H, W, 1))
            for _ in range(int(g.integers(1, 6))):
                cy, cx = g.integers(0, H), g.integers(0, W)
                sig = float(g.uniform(8, 50))
                blob = np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * sig**2))
                img = img + blob[..., None] * (g.random(3) - 0.5)[None, None]
        elif kind == 3:  # solid color
            img = np.tile(g.random(3)[None, None], (H, W, 1))
        else:            # uniform noise
            img = g.random((H, W, 3))
        images.append((np.clip(img, 0, 1) * 255).astype(np.uint8))
    return images


def _full_model(quant: bool, quant_vit: bool, bits: int = 8):
    import numpy as np

    import jax
    import jax.numpy as jnp

    from openvla_probe_tpu.models import vla, vlm
    from openvla_probe_tpu.ops.image import ImageTransformConfig

    cfg = vlm.VLMConfig.openvla_7b()
    if quant:
        from openvla_probe_tpu.ops.linear import quantize_params

        # the FULL turbo numerics bench.py ships (not just weight rounding):
        # int8 weights + bf16 attention scores + bf16 RoPE — the measured
        # perturbation then covers the deployed turbo config end-to-end.
        # Single definition (vlm.VLMConfig.turbo) so the certificate can
        # never drift from the shipped bench config.
        cfg = cfg.turbo()
        from openvla_probe_tpu.ops.linear import (
            _DEFAULT_QUANT_SUFFIXES,
            TURBO_QUANT_SUFFIXES,
        )

        # single turbo suffix definition (ops.linear), shared with bench.py
        suffixes = TURBO_QUANT_SUFFIXES if quant_vit else _DEFAULT_QUANT_SUFFIXES
        if bits == 8:
            init = jax.jit(lambda key: quantize_params(
                vlm.init_params(cfg, key), suffixes=suffixes, bits=bits))
            params = init(jax.random.key(0))   # SAME seed both modes
        else:
            # int4/mix/nibble tiers carry s4 leaves: the jit emits int8
            # CODES and each leaf materializes to canonical s4 eagerly
            # (s4 jit outputs carry poisoned layout metadata on TPU —
            # ops.linear._canonical_s4_format)
            from openvla_probe_tpu.ops.linear import materialize_int4_tree

            shapes = jax.eval_shape(lambda key: quantize_params(
                vlm.init_params(cfg, key), suffixes=suffixes, bits=bits),
                jax.random.key(0))
            raw = jax.jit(lambda key: quantize_params(
                vlm.init_params(cfg, key), suffixes=suffixes, bits=bits,
                emit_codes=True))(jax.random.key(0))
            params = materialize_int4_tree(shapes, raw)
    else:
        init = jax.jit(lambda key: vlm.init_params(cfg, key))
        params = init(jax.random.key(0))   # SAME seed both modes
    jax.block_until_ready(params)

    serving = vla.VLAServingConfig(vlm=cfg, prompt_pad_len=32,
                                   tier="turbo" if quant else "parity")

    class _Tok:
        def encode(self, t):
            # deterministic pseudo-tokenizer (no tokenizer download in env)
            return [1] + [(hash(w) % 30000) + 1000 for w in t.split()]

    stats = {"bridge_orig": {"action": {
        "q01": -np.ones(7, np.float32), "q99": np.ones(7, np.float32),
        "mask": np.array([True] * 6 + [False]),
    }}}
    return vla.OpenVLA(params, serving, _Tok(), stats,
                       ImageTransformConfig.dinosiglip_224())


def _tiny_model(quant: bool, bits: int = 8):
    import numpy as np

    import jax

    from openvla_probe_tpu.models import vla, vlm
    from openvla_probe_tpu.ops.image import BackboneTransformSpec, ImageTransformConfig

    cfg = vlm.VLMConfig.tiny()
    params = vlm.init_params(cfg, jax.random.key(0))
    if quant:
        from openvla_probe_tpu.ops.linear import quantize_params

        params = {**params, "llm": quantize_params(params["llm"], bits=bits)}
    serving = vla.VLAServingConfig(vlm=cfg, prompt_pad_len=16,
                                   codec_vocab_size=cfg.llm.vocab_size)
    img_cfg = ImageTransformConfig(specs=(
        BackboneTransformSpec((28, 28), "bicubic", (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)),
        BackboneTransformSpec((28, 28), "bicubic", (0.5, 0.5, 0.5), (0.5, 0.5, 0.5))))

    class _Tok:
        def encode(self, t):
            return [1] + [(hash(w) % 400) + 3 for w in t.split()]

    stats = {"bridge_orig": {"action": {"q01": -np.ones(7, np.float32),
                                        "q99": np.ones(7, np.float32)}}}
    return vla.OpenVLA(params, serving, _Tok(), stats, img_cfg)


def _run_mode(model, images, prompt: str, unnorm: Optional[str], batch: int):
    """(tokens, logit margins, first-position logits) for every image."""
    import numpy as np

    toks, margins, first_logits = [], [], []
    for i in range(0, len(images), batch):
        chunk = np.stack(images[i:i + batch])
        out = model.predict_action(chunk, prompt, unnorm_key=unnorm,
                                   return_first_logits=True)
        toks.append(out["action_tokens"])
        margins.append(out["logit_margins"])
        first_logits.append(out["first_logits"])
    return (np.concatenate(toks, axis=0), np.concatenate(margins, axis=0),
            np.concatenate(first_logits, axis=0))


def main(cfg: ParityConfig) -> None:
    import gc

    import numpy as np

    hw = (224, 224) if (cfg.scale == "full" or cfg.checkpoint) else (64, 64)
    images = make_image_corpus(cfg.n_images, hw=hw, image_dir=cfg.image_dir)
    prompt = f"In: What action should the robot take to {cfg.instruction.lower()}?\nOut:"

    def build(quant: bool):
        if cfg.checkpoint:
            from openvla_probe_tpu.models.load import load_vla

            return load_vla(cfg.checkpoint, quantize_int8=quant,
                            quantize_bits=cfg.bits if quant else 8
                            ), cfg.unnorm_key
        if cfg.scale == "full":
            return _full_model(quant, cfg.quant_vit, cfg.bits), "bridge_orig"
        return _tiny_model(quant, cfg.bits), "bridge_orig"

    # run the two modes SEQUENTIALLY — 7B bf16 + int8 don't fit HBM together
    overwatch.info("mode 1/2: bf16 (bit-parity)")
    model, unnorm = build(False)
    t0 = time.time()
    ref_toks, ref_margins, ref_fl = _run_mode(model, images, prompt, unnorm, cfg.batch)
    bf16_s = time.time() - t0
    del model
    gc.collect()

    overwatch.info(f"mode 2/2: int{cfg.bits} (turbo)")
    model, unnorm = build(True)
    t0 = time.time()
    turbo_toks, _, turbo_fl = _run_mode(model, images, prompt, unnorm, cfg.turbo_batch)
    turbo_s = time.time() - t0
    del model
    gc.collect()

    total = ref_toks.shape[0]
    eq = ref_toks == turbo_toks
    rates = eq.mean(axis=0)
    bin_diff = np.abs(ref_toks.astype(np.int64) - turbo_toks.astype(np.int64))
    overwatch.info(f"per-dim exact-token agreement over {total} images: "
                   + " ".join(f"{r:.3f}" for r in rates))
    overwatch.info(f"overall agreement: {rates.mean():.4f}; "
                   f"max bin drift: {int(bin_diff.max())}; "
                   f"mean bin drift: {float(bin_diff.mean()):.4f}")

    # margin-vs-perturbation certificate: an argmax flip requires the int8
    # logit perturbation to reach HALF the bf16 top1-top2 margin. The
    # first-position logits are identically conditioned in both modes, so
    # their delta is a clean perturbation measurement; margins come from the
    # bf16 (ground-truth) pass. With trained weights margins are large; with
    # random weights they are ~0, which is why random-weight agreement is a
    # LOWER bound, not a verdict on the turbo mode.
    delta = np.abs(ref_fl.astype(np.float64) - turbo_fl.astype(np.float64))
    delta_inf = delta.max(axis=1)                        # [N] per-image L_inf
    m = ref_margins.astype(np.float64)
    overwatch.info(
        "bf16 top1-top2 margin percentiles (p1/p50/p99): "
        f"{np.quantile(m, 0.01):.4f}/{np.quantile(m, 0.5):.4f}/{np.quantile(m, 0.99):.4f}; "
        f"int8 first-logit L_inf perturbation p50/p99/max: "
        f"{np.quantile(delta_inf, 0.5):.4f}/{np.quantile(delta_inf, 0.99):.4f}/{delta_inf.max():.4f}"
    )

    if cfg.report:
        import jax

        payload = {
            "scale": cfg.scale if not cfg.checkpoint else f"checkpoint:{cfg.checkpoint}",
            "backend": jax.default_backend(),
            "n_images": int(total),
            "quant_vit": cfg.quant_vit,
            "turbo_bits": cfg.bits,   # int8_* keys read as int4_* when 4
            "per_dim_agreement": [round(float(r), 4) for r in rates],
            "overall_agreement": round(float(rates.mean()), 4),
            "max_bin_drift": int(bin_diff.max()),
            "mean_bin_drift": round(float(bin_diff.mean()), 4),
            "p99_bin_drift": int(np.quantile(bin_diff, 0.99)),
            "bf16_margin_p1": round(float(np.quantile(m, 0.01)), 4),
            "bf16_margin_p50": round(float(np.quantile(m, 0.5)), 4),
            "bf16_margin_p99": round(float(np.quantile(m, 0.99)), 4),
            "int8_perturb_linf_p50": round(float(np.quantile(delta_inf, 0.5)), 4),
            "int8_perturb_linf_p99": round(float(np.quantile(delta_inf, 0.99)), 4),
            "int8_perturb_linf_max": round(float(delta_inf.max()), 4),
            "bf16_wall_s": round(bf16_s, 1),
            "int8_wall_s": round(turbo_s, 1),
        }
        line = json.dumps(payload)
        with open(cfg.report, "a") as f:
            f.write(line + "\n")
        overwatch.info(f"appended certificate line to {cfg.report}")
    print(json.dumps({"overall_agreement": round(float(rates.mean()), 4),
                      "max_bin_drift": int(bin_diff.max())}))


if __name__ == "__main__":
    main(parse_config(ParityConfig))

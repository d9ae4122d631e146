#!/usr/bin/env python
"""Probe-bank training throughput: all 33 layers in one jit on the chip.

The reference trains one nn.Linear probe per layer SEQUENTIALLY
(experiment_utils/train_object_probes.py:105-233 — 33 separate training
loops over the cached episode embeddings, CPU/single-GPU). Here the bank is
one {w: [L, K, D], b: [L, K]} tensor and every AdamW step updates all layers
at once with per-layer masked losses (probe/train_probes.py). This bench
times the full reference recipe — keep-filter, episode split, pos-weight,
20 epochs, majority baseline, metrics — at LIBERO-Object scale
(33 layers x 4096 dims, 461+20 label columns) on synthetic episodes.

Prints ONE JSON line. Env knobs: PB_EPISODES (default 24), PB_STEPS (default
250 frames/episode), PB_LABELS (default 481), PB_EPOCHS (default 20),
PB_SCALE=tiny for a smoke run.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openvla_probe_tpu.utils.platform import apply_platform_env

apply_platform_env()


def main() -> None:

    from openvla_probe_tpu.probe.train_probes import ProbeTrainConfig, train_probes

    tiny = os.environ.get("PB_SCALE", "full") == "tiny"
    n_eps = int(os.environ.get("PB_EPISODES", "4" if tiny else "24"))
    n_steps = int(os.environ.get("PB_STEPS", "20" if tiny else "250"))
    n_labels = int(os.environ.get("PB_LABELS", "12" if tiny else "481"))
    epochs = int(os.environ.get("PB_EPOCHS", "2" if tiny else "20"))
    L, D = (5, 64) if tiny else (33, 4096)

    rng = np.random.default_rng(0)
    # planted linear structure so training has real signal (decodability from
    # a random per-layer projection + noise)
    w_true = rng.normal(size=(D, n_labels)).astype(np.float32) / np.sqrt(D)
    episodes = []
    for _ in range(n_eps):
        h = rng.normal(size=(L, n_steps, D)).astype(np.float32)  # [L, T, D]
        logits = h[L // 2] @ w_true
        y = (logits > 0).astype(np.int8)
        y[:, : n_labels // 4] = -1  # a not-applicable block, like real data
        episodes.append({
            "visual_semantic_encoding": h,
            "symbolic_state_object_relations": y,
        })

    cfg = ProbeTrainConfig(epochs=epochs)
    t0 = time.time()
    out = train_probes(episodes, cfg,
                       label_keys=("symbolic_state_object_relations",))
    dt = time.time() - t0

    frames = n_eps * n_steps
    best = max(out["records"], key=lambda r: r.get("val_f1", 0.0))
    import jax

    print(json.dumps({
        "metric": "probe-bank train wall-time (all layers, one jit)",
        "value": round(dt, 2),
        "unit": "s",
        "layers": L,
        "dims": D,
        "frames": frames,
        "epochs": epochs,
        "best_layer": int(best["layer"]),
        "best_val_f1": round(float(best["val_f1"]), 4),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()

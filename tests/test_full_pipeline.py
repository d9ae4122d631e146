"""Integration: serving capture -> episodes -> probe bank -> analysis -> CSVs.

Exercises the fork's flagship workflow end-to-end on the tiny model: rollout
capture with a synthetic symbolic detector, probe training on the captured
episodes, per-label metrics + family AUPRC + heatmap figure.
"""

import csv

import numpy as np
import pytest

import jax

from openvla_probe_tpu.models import vla, vlm
from openvla_probe_tpu.ops.image import BackboneTransformSpec, ImageTransformConfig
from openvla_probe_tpu.probe import analysis, plots
from openvla_probe_tpu.probe.capture import CaptureSession
from openvla_probe_tpu.probe.train_probes import ProbeTrainConfig, save_metrics_csv, train_probes

K_REL, K_ACT = 6, 2


class FakeTok:
    def encode(self, s):
        return [1] + [(11 + 7 * i) % 400 for i in range(len(s.split()))]


class ScriptedDetector:
    """Symbolic oracle whose labels depend deterministically on a counter."""

    def __init__(self, k):
        self.k = k
        self.t = 0

    def detect_binary_states(self):
        self.t += 1
        g = np.random.default_rng(self.t)
        out = g.integers(0, 2, self.k).astype(np.int8)
        out[0] = -1 if self.t % 3 == 0 else out[0]
        return out


@pytest.fixture(scope="module")
def model():
    cfg = vlm.VLMConfig.tiny()
    params = vlm.init_params(cfg, jax.random.key(0))
    serving = vla.VLAServingConfig(vlm=cfg, prompt_pad_len=16,
                                   codec_vocab_size=cfg.llm.vocab_size)
    img_cfg = ImageTransformConfig(specs=(
        BackboneTransformSpec((28, 28), "bicubic", (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)),
        BackboneTransformSpec((28, 28), "bicubic", (0.5, 0.5, 0.5), (0.5, 0.5, 0.5))))
    stats = {"libero_object": {"action": {"q01": -np.ones(7, np.float32),
                                          "q99": np.ones(7, np.float32),
                                          "mask": np.array([True] * 6 + [False])}}}
    return vla.OpenVLA(params, serving, FakeTok(), stats, img_cfg)


def test_capture_to_analysis(model, tmp_path):
    g = np.random.default_rng(0)
    rel_det = ScriptedDetector(K_REL)
    act_det = ScriptedDetector(K_ACT)
    session = CaptureSession(
        model, tmp_path,
        detectors={"symbolic_state_object_relations": rel_det,
                   "symbolic_state_action_subgoals": act_det},
        unnorm_key="libero_object",
    )
    n_eps, T = 6, 8
    for ep in range(n_eps):
        for _ in range(T):
            out = session.step(
                g.integers(0, 256, (64, 64, 3), dtype=np.uint8),
                "What action should the robot take to pick up the cup?",
            )
            assert out["actions"].shape == (7,)
            assert out["hidden_pooled"].shape == (model.cfg.vlm.llm.num_hidden_layers + 1,
                                                  model.cfg.vlm.llm.hidden_size)
        session.end_episode(ep, success=(ep % 2 == 0))

    # probes on the captured corpus
    result = train_probes(
        tmp_path, ProbeTrainConfig(epochs=3, batch_size=16, learning_rate=1e-2)
    )
    bank = result["bank"]
    assert len(result["records"]) == model.cfg.vlm.llm.num_hidden_layers + 1
    csv_path = save_metrics_csv(result["records"], tmp_path / "probe_metrics.csv")
    rows = list(csv.DictReader(open(csv_path)))
    assert len(rows) == len(result["records"])

    # analysis chain
    names = [f"(rel-{i} a b)" for i in range(K_REL)] + ["(grasp x)", "(open y)"]
    kept = [names[i] for i in bank.keep]
    collected = analysis.collect_logits(bank, tmp_path)
    metric_rows = analysis.per_label_metrics(collected, kept)
    assert metric_rows
    fams = analysis.family_auprc(collected, kept)
    assert fams
    p = plots.plot_family_heatmap(metric_rows, tmp_path / "hm.png")
    assert p.exists()

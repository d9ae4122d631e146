"""Data-layer tests: tf transforms, OXE registry, batch transform, collators,
prompt builders — all on synthetic in-memory trajectories (no TFDS needed)."""

import numpy as np
import pytest
import tensorflow as tf

from openvla_probe_tpu.models.prompting import (
    LLaMa2ChatPromptBuilder,
    PurePromptBuilder,
    VicunaV15ChatPromptBuilder,
)
from openvla_probe_tpu.utils.collators import (
    PaddedCollatorForActionPrediction,
    PaddedCollatorForLanguageModeling,
)
from openvla_probe_tpu.vla.action_tokenizer import ActionTokenizer
from openvla_probe_tpu.vla.datasets.datasets import IGNORE_INDEX, DummyDataset, RLDSBatchTransform
from openvla_probe_tpu.vla.datasets.rlds import dataset as rlds_dataset
from openvla_probe_tpu.vla.datasets.rlds import traj_transforms
from openvla_probe_tpu.vla.datasets.rlds.oxe import materialize as oxe_mat
from openvla_probe_tpu.vla.datasets.rlds.oxe.configs import OXE_DATASET_CONFIGS
from openvla_probe_tpu.vla.datasets.rlds.oxe.mixtures import OXE_NAMED_MIXTURES
from openvla_probe_tpu.vla.datasets.rlds.oxe.rotation import quat_to_euler
from openvla_probe_tpu.vla.datasets.rlds.oxe.transforms import OXE_STANDARDIZATION_TRANSFORMS
from openvla_probe_tpu.vla.datasets.rlds.utils import data_utils
from openvla_probe_tpu.vla.norm_stats import NormalizationType


# --- prompt builders --------------------------------------------------------

def test_pure_prompt_builder():
    b = PurePromptBuilder("openvla")
    b.add_turn("human", "What action should the robot take to pick up the cup?")
    b.add_turn("gpt", "TOKENS")
    assert b.get_prompt() == "In: What action should the robot take to pick up the cup?\nOut: TOKENS</s>"


def test_llama2_chat_builder_has_system():
    b = LLaMa2ChatPromptBuilder("openvla")
    b.add_turn("human", "hi")
    p = b.get_prompt()
    assert p.startswith("[INST] <<SYS>")
    assert p.rstrip().endswith("hi [/INST]")


def test_vicuna_builder_prefixes_system():
    b = VicunaV15ChatPromptBuilder("openvla")
    b.add_turn("human", "hi")
    p = b.get_prompt()
    assert "USER: hi ASSISTANT:" in p
    assert p.startswith("You are a helpful")


# --- gripper relabeling -----------------------------------------------------

def test_binarize_gripper():
    a = tf.constant([1.0, 0.8, 0.4, 0.02, 0.01, 0.5, 0.97], tf.float32)
    out = data_utils.binarize_gripper_actions(a).numpy()
    # intermediates take the NEXT decisive state's value
    np.testing.assert_allclose(out, [1, 0, 0, 0, 0, 1, 1])


def test_rel2abs_gripper():
    # raw: -0.9 = opening command, +0.9 = closing command
    a = tf.constant([0.0, 0.0, -0.9, 0.0, 0.0, 0.9, 0.0], tf.float32)
    out = data_utils.rel2abs_gripper_actions(a).numpy()
    # started closed (first decisive is an open), open from t=2, closed at t=5
    np.testing.assert_allclose(out, [0, 0, 1, 1, 1, 0, 0])


def test_quat_to_euler_identity():
    np.testing.assert_allclose(
        quat_to_euler(tf.constant([[0.0, 0.0, 0.0, 1.0]])).numpy(), [[0, 0, 0]], atol=1e-6
    )
    # 90 deg about z
    q = tf.constant([[0.0, 0.0, np.sin(np.pi / 4), np.cos(np.pi / 4)]])
    np.testing.assert_allclose(quat_to_euler(q).numpy(), [[0, 0, np.pi / 2]], atol=1e-5)


# --- traj transforms --------------------------------------------------------

def _toy_traj(T=6, act_dim=7):
    return {
        "observation": {"image_primary": tf.constant([f"im{t}" for t in range(T)]),
                        "proprio": tf.random.normal((T, 8)),
                        "timestep": tf.range(T)},
        "task": {"language_instruction": tf.constant(["do it"] * T)},
        "action": tf.cast(tf.reshape(tf.range(T * act_dim), (T, act_dim)), tf.float32),
        "dataset_name": tf.constant(["toy"] * T),
    }


def test_chunk_act_obs_windows():
    traj = traj_transforms.chunk_act_obs(_toy_traj(), window_size=2, future_action_window_size=1)
    assert traj["action"].shape == (6, 3, 7)  # W + F = 3
    assert traj["observation"]["pad_mask"].numpy()[0].tolist() == [False, True]
    # frame 0's window: [t-1 (padded -> clamped to 0), t0]
    np.testing.assert_array_equal(traj["action"][0, 1].numpy(), np.arange(7))
    # actions past the goal become neutral: relative dims (no absolute mask) zeroed
    np.testing.assert_array_equal(traj["action"][5, 2].numpy(), np.zeros(7))


def test_chunk_act_obs_absolute_mask_and_goal_timestep():
    traj = _toy_traj()
    T = 6
    traj["absolute_action_mask"] = tf.tile(
        tf.constant([[False] * 6 + [True]]), [T, 1]
    )
    traj["task"]["timestep"] = tf.fill([T], 3)  # goal at t=3
    out = traj_transforms.chunk_act_obs(traj, window_size=1, future_action_window_size=2)
    a = out["action"].numpy()
    # frame 3's future entries index past the goal: relative dims zeroed,
    # absolute dim (gripper) repeats the clamped goal action
    goal_action = np.arange(3 * 7, 4 * 7)
    np.testing.assert_array_equal(a[3, 1, :6], np.zeros(6))
    assert a[3, 1, 6] == goal_action[6]
    # frame 1's future entries (t=2, t=3) are within the goal: untouched
    np.testing.assert_array_equal(a[1, 1], np.arange(2 * 7, 3 * 7))


def test_normalization_bounds_q99_in_graph():
    traj = _toy_traj()
    meta = {
        "action": {
            "mean": tf.zeros(7), "std": tf.ones(7),
            "min": tf.zeros(7), "max": tf.fill([7], 41.0),
            "q01": tf.zeros(7), "q99": tf.fill([7], 41.0),
            "mask": tf.constant([True] * 6 + [False]),
        }
    }
    out = data_utils.normalize_action_and_proprio(traj, meta, NormalizationType.BOUNDS_Q99)
    a = out["action"].numpy()
    assert a[:, :6].min() >= -1.0 and a[:, :6].max() <= 1.0
    np.testing.assert_array_equal(a[:, 6], _toy_traj()["action"].numpy()[:, 6])  # masked dim


# --- OXE registry -----------------------------------------------------------

def test_registry_complete():
    assert len(OXE_DATASET_CONFIGS) == 70
    assert len(OXE_NAMED_MIXTURES) == 18
    # every dataset referenced by a mixture has a config and transform
    for mix, pairs in OXE_NAMED_MIXTURES.items():
        for name, _ in pairs:
            assert name in OXE_DATASET_CONFIGS, (mix, name)
            assert name in OXE_STANDARDIZATION_TRANSFORMS, (mix, name)


def test_make_oxe_kwargs_bridge():
    kw = oxe_mat.make_oxe_dataset_kwargs("bridge_orig", "/data")
    assert kw["image_obs_keys"] == {"primary": "image_0"}
    assert kw["action_normalization_mask"] == [True] * 6 + [False]
    assert kw["absolute_action_mask"] == [False] * 6 + [True]
    assert kw["language_key"] == "language_instruction"
    assert callable(kw["standardize_fn"])


def test_libero_transform_semantics():
    T = 4
    traj = {
        "observation": {"state": tf.random.normal((T, 8)), "image": tf.constant(["x"] * T)},
        "action": tf.concat(
            [tf.random.normal((T, 6)), tf.constant([[-1.0], [1.0], [0.5], [-0.2]])], axis=1
        ),
    }
    out = OXE_STANDARDIZATION_TRANSFORMS["libero_object_no_noops"](traj)
    g = out["action"][:, -1].numpy()
    np.testing.assert_allclose(g, [1.0, 0.0, 0.5, 1.0])  # clip + invert
    assert out["observation"]["gripper_state"].shape == (T, 2)


def test_thread_allocation():
    alloc = data_utils.allocate_threads(16, np.array([0.5, 0.3, 0.2]))
    assert alloc.sum() == 16 and (alloc >= 1).all()
    alloc = data_utils.allocate_threads(3, np.array([0.99, 0.005, 0.005]))
    assert alloc.sum() == 3 and (alloc >= 1).all()


# --- end-to-end synthetic pipeline -----------------------------------------

def _synthetic_source(split):
    def gen():
        g = np.random.default_rng(0)
        for _ in range(4):
            T = 5
            yield {
                "observation": {
                    "image_0": np.array([b""] * T, object),
                    "state": g.normal(size=(T, 7)).astype(np.float32),
                },
                "action": g.normal(size=(T, 7)).astype(np.float32),
                "language_instruction": np.array([b"pick up the cup"] * T, object),
            }

    return tf.data.Dataset.from_generator(
        gen,
        output_signature={
            "observation": {
                "image_0": tf.TensorSpec((None,), tf.string),
                "state": tf.TensorSpec((None, 7), tf.float32),
            },
            "action": tf.TensorSpec((None, 7), tf.float32),
            "language_instruction": tf.TensorSpec((None,), tf.string),
        },
    )


def test_make_dataset_from_rlds_synthetic():
    ds, stats = rlds_dataset.make_dataset_from_rlds(
        "synthetic", "",
        image_obs_keys={"primary": "image_0", "wrist": None},
        state_obs_keys=["state", None],
        language_key="language_instruction",
        action_proprio_normalization_type=NormalizationType.BOUNDS_Q99,
        action_normalization_mask=[True] * 6 + [False],
        trajectory_dataset_fn=_synthetic_source,
    )
    traj = next(iter(ds.as_numpy_iterator()))
    assert traj["observation"]["image_primary"].shape == (5,)
    assert traj["observation"]["image_wrist"].shape == (5,)  # padded empties
    assert traj["observation"]["proprio"].shape == (5, 8)    # 7 + 1 pad col
    assert traj["action"].shape == (5, 7)
    assert abs(traj["action"][:, :6]).max() <= 1.0
    assert stats["num_trajectories"] == 4
    ds2 = rlds_dataset.apply_trajectory_transforms(ds, window_size=1, future_action_window_size=0)
    frames = rlds_dataset.flatten_trajectories(ds2)
    frame = next(iter(frames.as_numpy_iterator()))
    assert frame["action"].shape == (1, 7)


# --- batch transform + collators -------------------------------------------

class FakeTok:
    vocab_size = 32000

    def encode(self, s):
        return [1] + [100 + (hash(w) % 1000) for w in s.split()]

    def decode(self, ids):
        return " ".join(map(str, ids))


def test_rlds_batch_transform_label_masking():
    tok = FakeTok()
    at = ActionTokenizer(tok)
    bt = RLDSBatchTransform(at, tok, image_transform=lambda im: np.zeros((6, 8, 8), np.float32))
    frame = {
        "dataset_name": b"toy",
        "action": np.random.default_rng(0).uniform(-1, 1, (1, 7)).astype(np.float32),
        "observation": {"image_primary": np.zeros((1, 8, 8, 3), np.uint8)},
        "task": {"language_instruction": b"Pick Up The Cup"},
    }
    out = bt(frame)
    labels = out["labels"]
    assert (labels[:-8] == IGNORE_INDEX).all()      # only 7 action tokens + stop
    assert (labels[-8:] != IGNORE_INDEX).all()
    assert out["input_ids"][0] == 1


def test_dummy_dataset_schema():
    tok = FakeTok()
    ds = DummyDataset(ActionTokenizer(tok), tok, lambda im: np.zeros((6, 8, 8), np.float32))
    ex = ds[0]
    assert set(ex.keys()) == {"pixel_values", "input_ids", "labels"}
    assert "dummy_dataset" in ds.dataset_statistics


def test_action_collator_buckets():
    coll = PaddedCollatorForActionPrediction(pad_token_id=0, length_buckets=(16, 32))
    batch = coll([
        {"pixel_values": np.zeros((6, 4, 4)), "input_ids": np.arange(1, 11),
         "labels": np.arange(1, 11), "dataset_name": "a"},
        {"pixel_values": np.zeros((6, 4, 4)), "input_ids": np.arange(1, 8),
         "labels": np.arange(1, 8), "dataset_name": "b"},
    ])
    assert batch["input_ids"].shape == (2, 16)       # bucketed, not max-len
    assert batch["attention_mask"][0, :10].all() and not batch["attention_mask"][0, 10:].any()
    assert (batch["labels"][1, 7:] == IGNORE_INDEX).all()
    assert batch["dataset_names"] == ["a", "b"]


def test_lm_collator_multimodal_indices():
    coll = PaddedCollatorForLanguageModeling(pad_token_id=0, default_image_resolution=(6, 4, 4))
    batch = coll([
        {"pixel_values": np.ones((6, 4, 4)), "input_ids": np.arange(1, 5), "labels": np.arange(1, 5)},
        {"pixel_values": None, "input_ids": np.arange(1, 7), "labels": np.arange(1, 7)},
    ])
    np.testing.assert_array_equal(batch["multimodal_indices"], [0])
    assert batch["pixel_values"].shape == (2, 6, 4, 4)
    assert (batch["pixel_values"][1] == 0).all()


def test_goal_relabel_then_task_augmentation():
    from openvla_probe_tpu.vla.datasets.rlds import goal_relabeling as gr
    from openvla_probe_tpu.vla.datasets.rlds import task_augmentation as ta

    traj = _toy_traj()
    traj = traj_transforms.add_pad_mask_dict(traj)
    traj = gr.uniform(traj)
    # goal obs keys mirrored into task; language mask preserved in merged dict
    assert "image_primary" in traj["task"]
    assert "timestep" in traj["task"]
    assert "language_instruction" in traj["task"]["pad_mask_dict"]
    assert "image_primary" in traj["task"]["pad_mask_dict"]

    out = ta.delete_task_conditioning(traj, keep_image_prob=1.0)
    # all frames keep images -> language padded everywhere
    assert (out["task"]["language_instruction"].numpy() == b"").all()
    assert not out["task"]["pad_mask_dict"]["language_instruction"].numpy().any()

    traj2 = traj_transforms.add_pad_mask_dict(_toy_traj())
    traj2 = gr.uniform(traj2)
    out2 = ta.delete_task_conditioning(traj2, keep_image_prob=0.0)
    # all frames keep language -> goal images padded, timestep falls back to T-1
    assert (out2["task"]["image_primary"].numpy() == b"").all()
    np.testing.assert_array_equal(out2["task"]["timestep"].numpy(), np.full(6, 5))

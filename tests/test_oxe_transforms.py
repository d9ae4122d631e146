"""Behavioral tests for key OXE standardization transforms."""

import zlib

import numpy as np
import tensorflow as tf

from openvla_probe_tpu.vla.datasets.rlds.oxe import transforms as T
from openvla_probe_tpu.vla.datasets.rlds.oxe.materialize import zero_action_filter
from openvla_probe_tpu.vla.datasets.rlds.oxe.rotation import (
    euler_to_rmat,
    rmat_to_euler,
    rmat_to_rot6d,
    velocity_act_to_wrist_frame,
)


def _rt1_style_traj(n=4):
    g = np.random.default_rng(0)
    return {
        "action": {
            "world_vector": tf.constant(g.normal(size=(n, 3)), tf.float32),
            "rotation_delta": tf.constant(g.normal(size=(n, 3)), tf.float32),
            "gripper_closedness_action": tf.constant([[0.0], [1.0], [0.0], [-1.0]], tf.float32),
        },
        "observation": {
            "natural_language_instruction": tf.constant([b"pick"] * n),
        },
    }


def test_rt1_transform():
    out = T.rt1(_rt1_style_traj())
    a = out["action"].numpy()
    assert a.shape == (4, 7)
    # raw closedness [0, +1(close), 0, -1(open)] -> absolute open-ness:
    # started open (first decisive is a close), closed from t=1, reopened at t=3
    np.testing.assert_allclose(a[:, -1], [1.0, 0.0, 0.0, 1.0])
    assert out["language_instruction"].numpy()[0] == b"pick"


def test_kuka_zlib_state_decode():
    g = np.random.default_rng(1)
    n = 3
    eef = g.normal(size=(n, 7)).astype(np.float32)
    grip = g.normal(size=(n, 1)).astype(np.float32)
    traj = _rt1_style_traj(n)
    traj["action"]["gripper_closedness_action"] = tf.constant([[1.0], [0.0], [0.0]], tf.float32)
    traj["observation"]["clip_function_input/base_pose_tool_reached"] = tf.constant(
        [zlib.compress(row.tobytes()) for row in eef])
    traj["observation"]["gripper_closed"] = tf.constant(
        [zlib.compress(row.tobytes()) for row in grip])
    out = T.kuka(traj)
    np.testing.assert_allclose(
        out["observation"]["clip_function_input/base_pose_tool_reached"].numpy(), eef, rtol=1e-6)
    assert out["action"].shape == (3, 7)


def test_language_table_unicode_decode():
    text = "push the red block"
    codepoints = np.zeros((2, 64), np.int32)
    for i, ch in enumerate(text):
        codepoints[:, i] = ord(ch)
    traj = {
        "action": tf.constant(np.random.default_rng(0).normal(size=(2, 2)), tf.float32),
        "observation": {"instruction": tf.constant(codepoints)},
    }
    out = T.language_table(traj)
    assert out["action"].shape == (2, 7)
    np.testing.assert_allclose(out["action"].numpy()[:, -1], 1.0)  # gripper open
    assert out["language_instruction"].numpy()[0].decode() == text


def test_droid_baseact():
    g = np.random.default_rng(2)
    n = 3
    traj = {
        "action_dict": {
            "cartesian_velocity": tf.constant(g.normal(size=(n, 6)), tf.float32),
            "gripper_position": tf.constant(g.uniform(0, 1, (n, 1)), tf.float32),
        },
        "observation": {
            "exterior_image_1_left": tf.constant([b"a"] * n),
            "exterior_image_2_left": tf.constant([b"b"] * n),
            "cartesian_position": tf.constant(g.normal(size=(n, 6)), tf.float32),
            "gripper_position": tf.constant(g.uniform(0, 1, (n, 1)), tf.float32),
        },
    }
    out = T.droid_baseact(dict(traj))
    a = out["action"].numpy()
    assert a.shape == (n, 7)
    # gripper inverted: 1 - gripper_position
    np.testing.assert_allclose(
        a[:, -1], 1.0 - traj["action_dict"]["gripper_position"].numpy()[:, 0], rtol=1e-6)
    assert out["observation"]["proprio"].shape == (n, 7)


def test_rotation_roundtrip():
    g = np.random.default_rng(3)
    euler = g.uniform(-1.2, 1.2, (5, 3)).astype(np.float32)
    R = euler_to_rmat(tf.constant(euler))
    back = rmat_to_euler(R).numpy()
    np.testing.assert_allclose(back, euler, atol=1e-5)
    r6 = rmat_to_rot6d(R).numpy()
    assert r6.shape == (5, 6)
    np.testing.assert_allclose(r6[:, :3], R.numpy()[:, 0, :], atol=1e-6)


def test_wrist_frame_identity():
    """Zero wrist rotation: wrist-frame velocity == base-frame velocity + identity R6."""
    vel = tf.constant([[0.1, 0.2, 0.3, 0.0, 0.0, 0.0]], tf.float32)
    wrist = tf.constant([[0.0] * 6], tf.float32)
    out = velocity_act_to_wrist_frame(vel, wrist).numpy()
    np.testing.assert_allclose(out[0, :3], [0.1, 0.2, 0.3], atol=1e-6)
    np.testing.assert_allclose(out[0, 3:], [1, 0, 0, 0, 1, 0], atol=1e-6)


def test_zero_action_filter():
    q01 = np.array([-0.7776297926902771, -0.5803514122962952, -0.5795090794563293,
                    -0.6464047729969025, -0.7041108310222626, -0.8895104378461838])
    q99 = np.array([0.7597932070493698, 0.5726242214441299, 0.7351000607013702,
                    0.6705610305070877, 0.6464948207139969, 0.8897542208433151])
    norm_zero = np.clip(2 * (0 - q01) / (q99 - q01 + 1e-8) - 1, -1, 1)
    all_zero = {"action": tf.constant(np.concatenate(
        [np.tile(norm_zero, (3, 1)), np.zeros((3, 1))], axis=1), tf.float32)}
    assert not bool(zero_action_filter(all_zero))
    moving = {"action": tf.constant(np.random.default_rng(0).normal(size=(3, 7)), tf.float32)}
    assert bool(zero_action_filter(moving))

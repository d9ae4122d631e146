"""Per-dataset standardization transforms for the 73 Open-X entries.

Behavioral re-implementation of the reference's standardization registry
(prismatic/vla/datasets/rlds/oxe/transforms.py:30-930): every raw RLDS
trajectory is mapped to the common schema (7-DoF EEF action with +1=open /
0=close gripper in the last slot, canonical state keys, top-level
language_instruction).

Architecture differs from the reference's 73 standalone functions: the shared
motifs (dict-action assembly, the four gripper conventions, state slicing,
frame dropping) are combinators, and each dataset's transform composes them.
Rotation math uses the pure-TF utilities in .rotation (no tensorflow_graphics
dependency).
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import tensorflow as tf

from ..utils.data_utils import (
    binarize_gripper_actions,
    invert_gripper_actions,
    rel2abs_gripper_actions,
    relabel_bridge_actions,
)
from .rotation import quat_to_euler, velocity_act_to_wrist_frame

Traj = Dict[str, Any]
Transform = Callable[[Traj], Traj]


# --- combinators ------------------------------------------------------------

def _drop_first_frame(traj: Traj, skip_keys=("traj_metadata",), flat_action: bool = True) -> Traj:
    """Remove timestep 0 everywhere (bridge's all-zero first action)."""
    for key in list(traj.keys()):
        if key in skip_keys:
            continue
        if key == "observation" or (key == "action" and not flat_action):
            for k2 in traj[key]:
                traj[key][k2] = traj[key][k2][1:]
        else:
            traj[key] = traj[key][1:]
    return traj


def _eef_action(world, rot, gripper) -> tf.Tensor:
    return tf.concat((world, rot, gripper), axis=-1)


def _lang_from_obs(traj: Traj, key: str = "natural_language_instruction") -> Traj:
    traj["language_instruction"] = traj["observation"][key]
    return traj


def _state_slices(traj: Traj, mapping: Dict[str, tuple]) -> Traj:
    """mapping: new_key -> (source_key, start, stop)."""
    for new, (src, a, b) in mapping.items():
        traj["observation"][new] = traj["observation"][src][:, a:b]
    return traj


# --- per-dataset transforms -------------------------------------------------

def bridge_oxe(traj: Traj) -> Traj:
    traj = _drop_first_frame(traj, flat_action=False)
    traj["action"] = _eef_action(
        traj["action"]["world_vector"],
        traj["action"]["rotation_delta"],
        tf.cast(traj["action"]["open_gripper"][:, None], tf.float32),
    )
    traj = _lang_from_obs(traj)
    traj = relabel_bridge_actions(traj)
    return _state_slices(traj, {"EEF_state": ("state", 0, 6), "gripper_state": ("state", -1, None)})


def bridge_orig(traj: Traj) -> Traj:
    traj = _drop_first_frame(traj)
    traj["action"] = tf.concat(
        [traj["action"][:, :6], binarize_gripper_actions(traj["action"][:, -1])[:, None]], axis=1
    )
    traj = relabel_bridge_actions(traj)
    return _state_slices(traj, {"EEF_state": ("state", 0, 6), "gripper_state": ("state", -1, None)})


def ppgm(traj: Traj) -> Traj:
    traj["action"] = tf.concat(
        [traj["action"][:, :6], binarize_gripper_actions(traj["action"][:, -1])[:, None]], axis=1
    )
    traj["observation"]["EEF_state"] = traj["observation"]["cartesian_position"][:, :6]
    traj["observation"]["gripper_state"] = traj["observation"]["gripper_position"][:, -1:]
    return traj


def rt1(traj: Traj) -> Traj:
    grip = rel2abs_gripper_actions(traj["action"]["gripper_closedness_action"][:, 0])
    traj["action"] = _eef_action(
        traj["action"]["world_vector"], traj["action"]["rotation_delta"], grip[:, None]
    )
    return _lang_from_obs(traj)


def kuka(traj: Traj) -> Traj:
    grip = rel2abs_gripper_actions(traj["action"]["gripper_closedness_action"][:, 0])
    traj["action"] = _eef_action(
        traj["action"]["world_vector"], traj["action"]["rotation_delta"], grip[:, None]
    )
    # zlib-compressed proprio blobs
    for key, width in [("clip_function_input/base_pose_tool_reached", 7), ("gripper_closed", 1)]:
        raw = tf.io.decode_compressed(traj["observation"][key], compression_type="ZLIB")
        traj["observation"][key] = tf.reshape(tf.io.decode_raw(raw, tf.float32), (-1, width))
    return _lang_from_obs(traj)


def taco_play(traj: Traj) -> Traj:
    traj["observation"]["state_eef"] = traj["observation"]["robot_obs"][:, :6]
    traj["observation"]["state_gripper"] = traj["observation"]["robot_obs"][:, 7:8]
    act = traj["action"]["rel_actions_world"]
    traj["action"] = tf.concat((act[:, :6], tf.clip_by_value(act[:, -1:], 0, 1)), axis=-1)
    return _lang_from_obs(traj)


def jaco_play(traj: Traj) -> Traj:
    traj["observation"]["state_eef"] = traj["observation"]["end_effector_cartesian_pos"][:, :6]
    traj["observation"]["state_gripper"] = traj["observation"]["end_effector_cartesian_pos"][:, -1:]
    grip = rel2abs_gripper_actions(traj["action"]["gripper_closedness_action"][:, 0])
    traj["action"] = _eef_action(
        traj["action"]["world_vector"],
        tf.zeros_like(traj["action"]["world_vector"]),
        grip[:, None],
    )
    return _lang_from_obs(traj)


def berkeley_cable_routing(traj: Traj) -> Traj:
    traj["action"] = _eef_action(
        traj["action"]["world_vector"],
        traj["action"]["rotation_delta"],
        tf.zeros_like(traj["action"]["world_vector"][:, :1]),
    )
    return _lang_from_obs(traj)


def roboturk(traj: Traj) -> Traj:
    grip = invert_gripper_actions(
        tf.clip_by_value(traj["action"]["gripper_closedness_action"], 0, 1)
    )
    traj["action"] = _eef_action(
        traj["action"]["world_vector"], traj["action"]["rotation_delta"], grip
    )
    return _lang_from_obs(traj)


def nyu_door_opening(traj: Traj) -> Traj:
    return rt1(traj)


def viola(traj: Traj) -> Traj:
    grip = invert_gripper_actions(
        tf.clip_by_value(traj["action"]["gripper_closedness_action"][:, None], 0, 1)
    )
    traj["action"] = _eef_action(
        traj["action"]["world_vector"], traj["action"]["rotation_delta"], grip
    )
    return _lang_from_obs(traj)


def berkeley_autolab_ur5(traj: Traj) -> Traj:
    traj["observation"]["state"] = traj["observation"]["robot_state"][:, 6:14]
    traj["observation"]["depth"] = traj["observation"].pop("image_with_depth")
    grip = rel2abs_gripper_actions(traj["action"]["gripper_closedness_action"])
    traj["action"] = _eef_action(
        traj["action"]["world_vector"], traj["action"]["rotation_delta"], grip[:, None]
    )
    return _lang_from_obs(traj)


def toto(traj: Traj) -> Traj:
    traj["action"] = _eef_action(
        traj["action"]["world_vector"],
        traj["action"]["rotation_delta"],
        tf.cast(traj["action"]["open_gripper"][:, None], tf.float32),
    )
    return _lang_from_obs(traj)


def language_table(traj: Traj) -> Traj:
    # 2D push actions -> 7D (pad rotation, gripper always open)
    traj["action"] = tf.concat(
        (
            traj["action"],
            tf.zeros_like(traj["action"]),
            tf.zeros_like(traj["action"]),
            tf.ones_like(traj["action"][:, :1]),
        ),
        axis=-1,
    )
    # instruction stored as unicode codepoints padded with NUL
    enc = tf.strings.unicode_encode(traj["observation"]["instruction"], output_encoding="UTF-8")
    traj["language_instruction"] = tf.strings.split(enc, "\x00")[:, :1].to_tensor()[:, 0]
    return traj


def pusht(traj: Traj) -> Traj:
    traj["action"] = _eef_action(
        traj["action"]["world_vector"],
        traj["action"]["rotation_delta"],
        traj["action"]["gripper_closedness_action"][:, None],
    )
    return _lang_from_obs(traj)


def stanford_kuka_multimodal(traj: Traj) -> Traj:
    traj["observation"]["depth_image"] = traj["observation"]["depth_image"][..., 0]
    traj["action"] = tf.concat(
        (traj["action"][:, :3], tf.zeros_like(traj["action"][:, :3]), traj["action"][:, -1:]),
        axis=-1,
    )
    return traj


def nyu_rot(traj: Traj) -> Traj:
    traj["observation"]["eef_state"] = traj["observation"]["state"][..., :6]
    traj["observation"]["gripper_state"] = traj["observation"]["state"][..., -1:]
    traj["action"] = traj["action"][..., :7]
    return traj


def stanford_hydra(traj: Traj) -> Traj:
    traj["action"] = tf.concat(
        (traj["action"][:, :6], invert_gripper_actions(traj["action"][:, -1:])), axis=-1
    )
    traj["observation"]["eef_state"] = tf.concat(
        (traj["observation"]["state"][:, :3], traj["observation"]["state"][:, 7:10]), axis=-1
    )
    traj["observation"]["gripper_state"] = traj["observation"]["state"][:, -3:-2]
    return traj


def _invert_clip_gripper_tail(traj: Traj) -> Traj:
    traj["action"] = tf.concat(
        (traj["action"][:, :6], invert_gripper_actions(tf.clip_by_value(traj["action"][:, -1:], 0, 1))),
        axis=-1,
    )
    return traj


def austin_buds(traj: Traj) -> Traj:
    traj = _invert_clip_gripper_tail(traj)
    traj["observation"]["state"] = traj["observation"]["state"][:, :8]
    return traj


def nyu_franka_play(traj: Traj) -> Traj:
    traj["observation"]["depth"] = tf.cast(traj["observation"]["depth"][..., 0], tf.float32)
    traj["observation"]["depth_additional_view"] = tf.cast(
        traj["observation"]["depth_additional_view"][..., 0], tf.float32
    )
    traj["observation"]["eef_state"] = traj["observation"]["state"][:, -6:]
    traj["action"] = tf.concat(
        (traj["action"][:, -8:-2], tf.clip_by_value(traj["action"][:, -2:-1], 0, 1)), axis=-1
    )
    return traj


def maniskill(traj: Traj) -> Traj:
    traj["observation"]["gripper_state"] = traj["observation"]["state"][..., 7:8]
    return traj


def furniture_bench(traj: Traj) -> Traj:
    traj["observation"]["state"] = tf.concat(
        (traj["observation"]["state"][:, :7], traj["observation"]["state"][:, -1:]), axis=-1
    )
    traj["action"] = tf.concat(
        (
            traj["action"][:, :3],
            quat_to_euler(traj["action"][:, 3:7]),
            invert_gripper_actions(tf.clip_by_value(traj["action"][:, -1:], 0, 1)),
        ),
        axis=-1,
    )
    return traj


def cmu_franka_exploration(traj: Traj) -> Traj:
    traj["action"] = traj["action"][..., :-1]
    return traj


def ucsd_kitchen(traj: Traj) -> Traj:
    traj["observation"]["joint_state"] = traj["observation"]["state"][:, :7]
    traj["action"] = traj["action"][..., :-1]
    return traj


def ucsd_pick_place(traj: Traj) -> Traj:
    traj["observation"]["eef_state"] = traj["observation"]["state"][:, :6]
    traj["observation"]["gripper_state"] = traj["observation"]["state"][:, -1:]
    traj["action"] = tf.concat(
        (traj["action"][:, :3], tf.zeros_like(traj["action"][:, :3]), traj["action"][:, -1:]),
        axis=-1,
    )
    return traj


def austin_sailor(traj: Traj) -> Traj:
    return _invert_clip_gripper_tail(traj)


def austin_sirius(traj: Traj) -> Traj:
    return _invert_clip_gripper_tail(traj)


def bc_z(traj: Traj) -> Traj:
    traj["action"] = tf.concat(
        (
            traj["action"]["future/xyz_residual"][:, :3],
            traj["action"]["future/axis_angle_residual"][:, :3],
            invert_gripper_actions(tf.cast(traj["action"]["future/target_close"][:, :1], tf.float32)),
        ),
        axis=-1,
    )
    return _lang_from_obs(traj)


def _eef_state_tail_drop_last_action(traj: Traj) -> Traj:
    traj["observation"]["eef_state"] = traj["observation"]["state"][:, :6]
    traj["observation"]["gripper_state"] = traj["observation"]["state"][:, -1:]
    traj["action"] = traj["action"][..., :-1]
    return traj


def utokyo_pr2_opening_fridge(traj: Traj) -> Traj:
    return _eef_state_tail_drop_last_action(traj)


def utokyo_pr2_tabletop(traj: Traj) -> Traj:
    return _eef_state_tail_drop_last_action(traj)


def utokyo_xarm_pick_place(traj: Traj) -> Traj:
    return traj


def utokyo_xarm_bimanual(traj: Traj) -> Traj:
    traj["action"] = traj["action"][..., -7:]
    return traj


def robo_net(traj: Traj) -> Traj:
    traj["observation"]["eef_state"] = tf.concat(
        (traj["observation"]["state"][:, :4], tf.zeros_like(traj["observation"]["state"][:, :2])),
        axis=-1,
    )
    traj["observation"]["gripper_state"] = traj["observation"]["state"][:, -1:]
    traj["action"] = tf.concat(
        (traj["action"][:, :4], tf.zeros_like(traj["action"][:, :2]), traj["action"][:, -1:]),
        axis=-1,
    )
    return traj


def identity(traj: Traj) -> Traj:
    return traj


def kaist_nonprehensile(traj: Traj) -> Traj:
    traj["observation"]["state"] = traj["observation"]["state"][:, -7:]
    traj["action"] = tf.concat(
        (traj["action"][:, :6], tf.zeros_like(traj["action"][:, :1])), axis=-1
    )
    return traj


def stanford_mask_vit(traj: Traj) -> Traj:
    traj["observation"]["eef_state"] = tf.concat(
        (
            traj["observation"]["end_effector_pose"][:, :4],
            tf.zeros_like(traj["observation"]["end_effector_pose"][:, :2]),
        ),
        axis=-1,
    )
    traj["observation"]["gripper_state"] = traj["observation"]["end_effector_pose"][:, -1:]
    traj["action"] = tf.concat(
        (traj["action"][:, :4], tf.zeros_like(traj["action"][:, :2]), traj["action"][:, -1:]),
        axis=-1,
    )
    return traj


def tokyo_lsmo(traj: Traj) -> Traj:
    traj["observation"]["eef_state"] = traj["observation"]["state"][:, :6]
    traj["observation"]["gripper_state"] = traj["observation"]["state"][:, -1:]
    return traj


def dlr_sara_grid_clamp(traj: Traj) -> Traj:
    traj["observation"]["state"] = traj["observation"]["state"][:, :6]
    return traj


def dlr_edan_shared_control(traj: Traj) -> Traj:
    traj["action"] = tf.concat(
        (traj["action"][:, :6], invert_gripper_actions(traj["action"][:, -1:])), axis=-1
    )
    return traj


def asu_table_top(traj: Traj) -> Traj:
    traj["observation"]["eef_state"] = traj["ground_truth_states"]["EE"]
    traj["observation"]["gripper_state"] = traj["observation"]["state"][:, -1:]
    return traj


def robocook(traj: Traj) -> Traj:
    traj["observation"]["eef_state"] = traj["observation"]["state"][:, :6]
    traj["observation"]["gripper_state"] = traj["observation"]["state"][:, -1:]
    return traj


def imperial_wristcam(traj: Traj) -> Traj:
    traj["action"] = traj["action"][..., :-1]
    return traj


def iamlab_pick_insert(traj: Traj) -> Traj:
    traj["observation"]["joint_state"] = traj["observation"]["state"][:, :7]
    traj["observation"]["gripper_state"] = traj["observation"]["state"][:, 7:8]
    traj["action"] = tf.concat(
        (traj["action"][:, :3], quat_to_euler(traj["action"][:, 3:7]), traj["action"][:, 7:8]),
        axis=-1,
    )
    return traj


def uiuc_d3field(traj: Traj) -> Traj:
    traj["action"] = tf.concat(
        (traj["action"], tf.zeros_like(traj["action"]), tf.zeros_like(traj["action"][:, :1])),
        axis=-1,
    )
    return traj


def utaustin_mutex(traj: Traj) -> Traj:
    traj["observation"]["state"] = traj["observation"]["state"][:, :8]
    return _invert_clip_gripper_tail(traj)


def berkeley_fanuc(traj: Traj) -> Traj:
    traj["observation"]["joint_state"] = traj["observation"]["state"][:, :6]
    traj["observation"]["gripper_state"] = traj["observation"]["state"][:, 6:7]
    traj["action"] = tf.concat(
        (traj["action"], invert_gripper_actions(traj["observation"]["gripper_state"])), axis=-1
    )
    return traj


def cmu_playing_with_food(traj: Traj) -> Traj:
    traj["action"] = tf.concat(
        (traj["action"][:, :3], quat_to_euler(traj["action"][:, 3:7]), traj["action"][:, -1:]),
        axis=-1,
    )
    return traj


def playfusion(traj: Traj) -> Traj:
    traj["action"] = tf.concat((traj["action"][:, :3], traj["action"][:, -4:]), axis=-1)
    return traj


def cmu_stretch(traj: Traj) -> Traj:
    traj["observation"]["eef_state"] = tf.concat(
        (traj["observation"]["state"][:, :3], tf.zeros_like(traj["observation"]["state"][:, :3])),
        axis=-1,
    )
    traj["observation"]["gripper_state"] = traj["observation"]["state"][:, -1:]
    traj["action"] = traj["action"][..., :-1]
    return traj


def gnm(traj: Traj) -> Traj:
    traj["observation"]["state"] = tf.concat(
        (
            traj["observation"]["position"],
            tf.zeros_like(traj["observation"]["state"][:, :3]),
            traj["observation"]["yaw"],
        ),
        axis=-1,
    )
    traj["action"] = tf.concat(
        (
            traj["action"],
            tf.zeros_like(traj["action"]),
            tf.zeros_like(traj["action"]),
            tf.zeros_like(traj["action"][:, :1]),
        ),
        axis=-1,
    )
    return traj


def _rand_swap_exterior(traj: Traj) -> Traj:
    img1 = traj["observation"]["exterior_image_1_left"]
    img2 = traj["observation"]["exterior_image_2_left"]
    swapped = tf.random.uniform(shape=[]) > 0.5
    traj["observation"]["exterior_image_1_left"] = tf.cond(swapped, lambda: img1, lambda: img2)
    traj["observation"]["exterior_image_2_left"] = tf.cond(swapped, lambda: img2, lambda: img1)
    return traj


def _droid_base_action(traj: Traj) -> Traj:
    vel = traj["action_dict"]["cartesian_velocity"]
    traj["action"] = tf.concat(
        (vel[:, :3], vel[:, 3:6], 1 - traj["action_dict"]["gripper_position"]), axis=-1
    )
    traj["observation"]["proprio"] = tf.concat(
        (traj["observation"]["cartesian_position"], traj["observation"]["gripper_position"]),
        axis=-1,
    )
    return traj


def droid_baseact(traj: Traj) -> Traj:
    return _rand_swap_exterior(_droid_base_action(traj))


def droid_wristact(traj: Traj) -> Traj:
    wrist_act = velocity_act_to_wrist_frame(
        traj["action_dict"]["cartesian_velocity"], traj["observation"]["cartesian_position"]
    )
    traj["action"] = tf.concat((wrist_act, traj["action_dict"]["gripper_position"]), axis=-1)
    traj["observation"]["proprio"] = tf.concat(
        (traj["observation"]["cartesian_position"], traj["observation"]["gripper_position"]),
        axis=-1,
    )
    return _rand_swap_exterior(traj)


def droid_finetuning(traj: Traj) -> Traj:
    return _droid_base_action(traj)


def fmb(traj: Traj) -> Traj:
    traj["observation"]["proprio"] = tf.concat(
        (traj["observation"]["eef_pose"], traj["observation"]["state_gripper_pose"][..., None]),
        axis=-1,
    )
    return traj


def dobbe(traj: Traj) -> Traj:
    traj["observation"]["proprio"] = traj["observation"]["state"]
    return traj


def roboset(traj: Traj) -> Traj:
    traj["observation"]["proprio"] = traj["observation"]["state"]
    grip = invert_gripper_actions(tf.clip_by_value(traj["action"][:, -1:], 0, 1))
    traj["action"] = tf.concat((traj["action"][:, :7], grip), axis=-1)
    return traj


def rh20t(traj: Traj) -> Traj:
    traj["action"] = tf.concat(
        (traj["action"]["tcp_base"], tf.cast(traj["action"]["gripper"][:, None], tf.float32)),
        axis=-1,
    )
    traj["observation"]["proprio"] = tf.concat(
        (traj["observation"]["tcp_base"], traj["observation"]["gripper_width"][..., None]),
        axis=-1,
    )
    return traj


def tdroid(traj: Traj) -> Traj:
    traj["action"] = tf.concat(
        [traj["action"][:, :6], binarize_gripper_actions(traj["action"][:, -1])[:, None]], axis=1
    )
    traj["observation"]["EEF_state"] = traj["observation"]["cartesian_position"][:, :6]
    traj["observation"]["gripper_state"] = traj["observation"]["gripper_position"][:, -1:]
    return traj


def libero(traj: Traj) -> Traj:
    # gripper: -1 open ... +1 close -> clip [0,1], invert -> +1 open / 0 close
    grip = invert_gripper_actions(tf.clip_by_value(traj["action"][:, -1:], 0, 1))
    traj["action"] = tf.concat([traj["action"][:, :6], grip], axis=1)
    traj["observation"]["EEF_state"] = traj["observation"]["state"][:, :6]
    traj["observation"]["gripper_state"] = traj["observation"]["state"][:, -2:]  # 2D gripper state
    return traj


OXE_STANDARDIZATION_TRANSFORMS: Dict[str, Transform] = {
    "bridge_oxe": bridge_oxe,
    "bridge_orig": bridge_orig,
    "bridge_dataset": bridge_orig,
    "ppgm": ppgm,
    "ppgm_static": ppgm,
    "ppgm_wrist": ppgm,
    "fractal20220817_data": rt1,
    "kuka": kuka,
    "taco_play": taco_play,
    "jaco_play": jaco_play,
    "berkeley_cable_routing": berkeley_cable_routing,
    "roboturk": roboturk,
    "nyu_door_opening_surprising_effectiveness": nyu_door_opening,
    "viola": viola,
    "berkeley_autolab_ur5": berkeley_autolab_ur5,
    "toto": toto,
    "language_table": language_table,
    "columbia_cairlab_pusht_real": pusht,
    "stanford_kuka_multimodal_dataset_converted_externally_to_rlds": stanford_kuka_multimodal,
    "nyu_rot_dataset_converted_externally_to_rlds": nyu_rot,
    "stanford_hydra_dataset_converted_externally_to_rlds": stanford_hydra,
    "austin_buds_dataset_converted_externally_to_rlds": austin_buds,
    "nyu_franka_play_dataset_converted_externally_to_rlds": nyu_franka_play,
    "maniskill_dataset_converted_externally_to_rlds": maniskill,
    "furniture_bench_dataset_converted_externally_to_rlds": furniture_bench,
    "cmu_franka_exploration_dataset_converted_externally_to_rlds": cmu_franka_exploration,
    "ucsd_kitchen_dataset_converted_externally_to_rlds": ucsd_kitchen,
    "ucsd_pick_and_place_dataset_converted_externally_to_rlds": ucsd_pick_place,
    "austin_sailor_dataset_converted_externally_to_rlds": austin_sailor,
    "austin_sirius_dataset_converted_externally_to_rlds": austin_sirius,
    "bc_z": bc_z,
    "utokyo_pr2_opening_fridge_converted_externally_to_rlds": utokyo_pr2_opening_fridge,
    "utokyo_pr2_tabletop_manipulation_converted_externally_to_rlds": utokyo_pr2_tabletop,
    "utokyo_xarm_pick_and_place_converted_externally_to_rlds": utokyo_xarm_pick_place,
    "utokyo_xarm_bimanual_converted_externally_to_rlds": utokyo_xarm_bimanual,
    "robo_net": robo_net,
    "berkeley_mvp_converted_externally_to_rlds": identity,
    "berkeley_rpt_converted_externally_to_rlds": identity,
    "kaist_nonprehensile_converted_externally_to_rlds": kaist_nonprehensile,
    "stanford_mask_vit_converted_externally_to_rlds": stanford_mask_vit,
    "tokyo_u_lsmo_converted_externally_to_rlds": tokyo_lsmo,
    "dlr_sara_pour_converted_externally_to_rlds": identity,
    "dlr_sara_grid_clamp_converted_externally_to_rlds": dlr_sara_grid_clamp,
    "dlr_edan_shared_control_converted_externally_to_rlds": dlr_edan_shared_control,
    "asu_table_top_converted_externally_to_rlds": asu_table_top,
    "stanford_robocook_converted_externally_to_rlds": robocook,
    "imperialcollege_sawyer_wrist_cam": imperial_wristcam,
    "iamlab_cmu_pickup_insert_converted_externally_to_rlds": iamlab_pick_insert,
    "uiuc_d3field": uiuc_d3field,
    "utaustin_mutex": utaustin_mutex,
    "berkeley_fanuc_manipulation": berkeley_fanuc,
    "cmu_playing_with_food": cmu_playing_with_food,
    "cmu_play_fusion": playfusion,
    "cmu_stretch": cmu_stretch,
    "berkeley_gnm_recon": gnm,
    "berkeley_gnm_cory_hall": gnm,
    "berkeley_gnm_sac_son": gnm,
    "droid": droid_baseact,
    "fmb_dataset": fmb,
    "dobbe": dobbe,
    "roboset": roboset,
    "rh20t": rh20t,  # config key is "rh20t" (reference configs.py:582)
    "tdroid_carrot_in_bowl": tdroid,
    "tdroid_pour_corn_in_pot": tdroid,
    "tdroid_flip_pot_upright": tdroid,
    "tdroid_move_object_onto_plate": tdroid,
    "tdroid_knock_object_over": tdroid,
    "tdroid_cover_object_with_towel": tdroid,
    "droid_wipe": droid_finetuning,
    "libero_spatial_no_noops": libero,
    "libero_object_no_noops": libero,
    "libero_goal_no_noops": libero,
    "libero_10_no_noops": libero,
}

"""State bridging: JaxSimModelData → MjData
(reference ``src/jaxsim/mujoco/utils.py:14-231``). The only host/device
boundary in the framework."""

from __future__ import annotations

import dataclasses

import mujoco
import numpy as np


def mujoco_data_from_jaxsim(
    mujoco_model,
    jaxsim_model,
    jaxsim_data,
    mujoco_data=None,
    update_removed_joints: bool = True,
):
    """Copy the JaxSim state into an MjData.

    When replaying a REDUCED model inside an MJCF built from the FULL
    description, ``update_removed_joints=True`` (default) sets the joints
    locked away by the reduction to their stored locked positions
    (``description.joints_removed[*].initial_position``) instead of leaving
    them at 0 — reference ``src/jaxsim/mujoco/utils.py:40-105``.
    """
    data = mujoco_data if mujoco_data is not None else mujoco.MjData(mujoco_model)

    if jaxsim_model.floating_base():
        data.qpos[0:3] = np.asarray(jaxsim_data.base_position)
        data.qpos[3:7] = np.asarray(jaxsim_data.base_orientation)

    def set_joint(name: str, value: float) -> None:
        jid = mujoco.mj_name2id(mujoco_model, mujoco.mjtObj.mjOBJ_JOINT, name)
        if jid >= 0:
            data.qpos[mujoco_model.jnt_qposadr[jid]] = value

    s = np.asarray(jaxsim_data.joint_positions)
    model_joint_names = set(jaxsim_model.joint_names())
    for k, name in enumerate(jaxsim_model.joint_names()):
        set_joint(name, s[k])

    if update_removed_joints:
        for joint in jaxsim_model.description.joints_removed:
            if joint.name not in model_joint_names:
                set_joint(joint.name, float(joint.initial_position))

    mujoco.mj_forward(mujoco_model, data)
    return data


@dataclasses.dataclass
class MujocoCamera:
    """Camera spec helper (reference ``mujoco/utils.py:108-231``)."""

    name: str = "camera"
    mode: str = "fixed"
    pos: tuple = (2.0, 2.0, 1.5)
    xyaxes: tuple | None = None
    fovy: float = 45.0

    @staticmethod
    def build_from_target_view(
        camera_name: str = "target_camera",
        lookat: tuple = (0.0, 0.0, 0.5),
        distance: float = 3.0,
        azimuth: float = 45.0,
        elevation: float = -30.0,
        fovy: float = 45.0,
    ) -> dict:
        az, el = np.deg2rad(azimuth), np.deg2rad(elevation)
        direction = np.array(
            [np.cos(el) * np.cos(az), np.cos(el) * np.sin(az), np.sin(el)]
        )
        pos = np.asarray(lookat) - distance * direction
        z = direction / np.linalg.norm(direction)
        x = np.cross(np.array([0.0, 0.0, 1.0]), z)
        x = x / np.linalg.norm(x)
        y = np.cross(z, x)
        return dict(
            name=camera_name,
            pos=f"{pos[0]} {pos[1]} {pos[2]}",
            xyaxes=f"{x[0]} {x[1]} {x[2]} {y[0]} {y[1]} {y[2]}",
            fovy=str(fovy),
        )

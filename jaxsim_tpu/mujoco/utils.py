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
    """Copy the JaxSim state into an MjData (handles reduced models whose
    locked joints don't exist in the MJCF)."""
    data = mujoco_data if mujoco_data is not None else mujoco.MjData(mujoco_model)

    offset = 0
    if jaxsim_model.floating_base():
        data.qpos[0:3] = np.asarray(jaxsim_data.base_position)
        data.qpos[3:7] = np.asarray(jaxsim_data.base_orientation)
        offset = 7

    s = np.asarray(jaxsim_data.joint_positions)
    for k, name in enumerate(jaxsim_model.joint_names()):
        jid = mujoco.mj_name2id(mujoco_model, mujoco.mjtObj.mjOBJ_JOINT, name)
        if jid < 0:
            continue
        data.qpos[mujoco_model.jnt_qposadr[jid]] = s[k]

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

"""Name-based helper over MjModel/MjData
(reference ``src/jaxsim/mujoco/model.py:19-482``)."""

from __future__ import annotations

import numpy as np
import numpy.typing as npt


class MujocoModelHelper:
    """Get/set state of a MuJoCo model by names."""

    def __init__(self, model, data=None) -> None:
        import mujoco

        self.model = model
        self.data = data if data is not None else mujoco.MjData(model)

    @staticmethod
    def build_from_xml(
        mjcf_description: str, mjcf_description_string: bool = True
    ) -> "MujocoModelHelper":
        import mujoco

        model = (
            mujoco.MjModel.from_xml_string(mjcf_description)
            if mjcf_description_string
            else mujoco.MjModel.from_xml_path(mjcf_description)
        )
        return MujocoModelHelper(model)

    # ----- naming -----

    def joint_names(self) -> list[str]:
        import mujoco

        return [
            mujoco.mj_id2name(self.model, mujoco.mjtObj.mjOBJ_JOINT, i)
            for i in range(self.model.njnt)
        ]

    def body_names(self) -> list[str]:
        import mujoco

        return [
            mujoco.mj_id2name(self.model, mujoco.mjtObj.mjOBJ_BODY, i)
            for i in range(self.model.nbody)
        ]

    def is_floating_base(self) -> bool:
        import mujoco

        return any(
            self.model.jnt_type[i] == mujoco.mjtJoint.mjJNT_FREE
            for i in range(self.model.njnt)
        )

    # ----- base state -----

    def set_base_position(self, position: npt.NDArray) -> None:
        if not self.is_floating_base():
            raise ValueError("Model is not floating-base")
        self.data.qpos[0:3] = np.asarray(position)

    def set_base_orientation(self, wxyz: npt.NDArray) -> None:
        if not self.is_floating_base():
            raise ValueError("Model is not floating-base")
        self.data.qpos[3:7] = np.asarray(wxyz)

    def base_position(self) -> npt.NDArray:
        return np.array(self.data.qpos[0:3])

    def base_orientation(self) -> npt.NDArray:
        return np.array(self.data.qpos[3:7])

    # ----- joints -----

    def _qpos_addr(self, joint_name: str) -> int:
        import mujoco

        jid = mujoco.mj_name2id(self.model, mujoco.mjtObj.mjOBJ_JOINT, joint_name)
        if jid < 0:
            raise ValueError(f"Joint '{joint_name}' not found")
        return int(self.model.jnt_qposadr[jid])

    def set_joint_position(self, joint_name: str, position: float) -> None:
        self.data.qpos[self._qpos_addr(joint_name)] = float(position)

    def set_joint_positions(self, joint_names, positions) -> None:
        for name, pos in zip(joint_names, np.atleast_1d(np.asarray(positions))):
            self.set_joint_position(name, pos)

    def joint_position(self, joint_name: str) -> float:
        return float(self.data.qpos[self._qpos_addr(joint_name)])

    def forward(self) -> None:
        import mujoco

        mujoco.mj_forward(self.model, self.data)

    @staticmethod
    def generate_hfield(
        heightmap, size: tuple[int, int] = (100, 100)
    ) -> npt.NDArray:
        """Sample a heightmap callable on a grid (reference
        ``mujoco/model.py:447-482``)."""
        xs = np.linspace(-1, 1, size[0])
        ys = np.linspace(-1, 1, size[1])
        X, Y = np.meshgrid(xs, ys)
        return np.asarray(heightmap(X, Y)).flatten()

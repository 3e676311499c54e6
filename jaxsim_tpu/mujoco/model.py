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

    def is_fixed_base(self) -> bool:
        return not self.is_floating_base()

    def base_link(self) -> str:
        """Name of the first non-world body (reference
        ``mujoco/model.py:174-179``)."""
        import mujoco

        return mujoco.mj_id2name(self.model, mujoco.mjtObj.mjOBJ_BODY, 1)

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

    def base_orientation(self, dcm: bool = False) -> npt.NDArray:
        """Base orientation as wxyz quaternion (default) or rotation
        matrix (``dcm=True``), reference ``mujoco/model.py:190-201``."""
        wxyz = np.array(self.data.qpos[3:7])
        if not dcm:
            return wxyz
        import mujoco

        R = np.zeros(9)
        mujoco.mju_quat2Mat(R, wxyz)
        return R.reshape(3, 3)

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

    def joint_positions(self, joint_names=None) -> npt.NDArray:
        names = joint_names if joint_names is not None else self.joint_names()
        names = [n for n in names if n is not None]
        return np.array([self.joint_position(n) for n in names])

    # ----- joint velocities (reference ``mujoco/model.py`` dof API) -----

    def _dof_addr(self, joint_name: str) -> int:
        import mujoco

        jid = mujoco.mj_name2id(self.model, mujoco.mjtObj.mjOBJ_JOINT, joint_name)
        if jid < 0:
            raise ValueError(f"Joint '{joint_name}' not found")
        return int(self.model.jnt_dofadr[jid])

    def set_joint_velocity(self, joint_name: str, velocity: float) -> None:
        self.data.qvel[self._dof_addr(joint_name)] = float(velocity)

    def set_joint_velocities(self, joint_names, velocities) -> None:
        for name, vel in zip(
            joint_names, np.atleast_1d(np.asarray(velocities))
        ):
            self.set_joint_velocity(name, vel)

    def joint_velocity(self, joint_name: str) -> float:
        return float(self.data.qvel[self._dof_addr(joint_name)])

    def joint_velocities(self, joint_names=None) -> npt.NDArray:
        names = joint_names if joint_names is not None else self.joint_names()
        names = [n for n in names if n is not None]
        return np.array([self.joint_velocity(n) for n in names])

    # ----- base velocity -----
    #
    # MuJoCo freejoint qvel convention: indices 0:3 are the base linear
    # velocity in the WORLD frame, 3:6 the angular velocity in the BODY
    # frame (validated against mj_objectVelocity in
    # ``tests/test_mujoco_oracle.py``).

    def set_base_linear_velocity(self, velocity: npt.NDArray) -> None:
        """World-frame linear velocity of the free base."""
        if not self.is_floating_base():
            raise ValueError("Model is not floating-base")
        self.data.qvel[0:3] = np.asarray(velocity)

    def set_base_angular_velocity(self, velocity: npt.NDArray) -> None:
        """Body-frame angular velocity of the free base."""
        if not self.is_floating_base():
            raise ValueError("Model is not floating-base")
        self.data.qvel[3:6] = np.asarray(velocity)

    def base_linear_velocity(self) -> npt.NDArray:
        return np.array(self.data.qvel[0:3])

    def base_angular_velocity(self) -> npt.NDArray:
        return np.array(self.data.qvel[3:6])

    # ----- free-form named qpos/qvel access -----

    def qpos_of(self, joint_name: str) -> npt.NDArray:
        """All qpos entries of a joint (7 for free, 1 for hinge/slide)."""
        import mujoco

        jid = mujoco.mj_name2id(self.model, mujoco.mjtObj.mjOBJ_JOINT, joint_name)
        if jid < 0:
            raise ValueError(f"Joint '{joint_name}' not found")
        adr = int(self.model.jnt_qposadr[jid])
        size = {
            mujoco.mjtJoint.mjJNT_FREE: 7,
            mujoco.mjtJoint.mjJNT_BALL: 4,
        }.get(self.model.jnt_type[jid], 1)
        return np.array(self.data.qpos[adr : adr + size])

    def set_qpos_of(self, joint_name: str, value: npt.NDArray) -> None:
        import mujoco

        jid = mujoco.mj_name2id(self.model, mujoco.mjtObj.mjOBJ_JOINT, joint_name)
        if jid < 0:
            raise ValueError(f"Joint '{joint_name}' not found")
        adr = int(self.model.jnt_qposadr[jid])
        value = np.atleast_1d(np.asarray(value, dtype=float))
        self.data.qpos[adr : adr + value.size] = value

    # ----- time / misc -----

    def time(self) -> float:
        return float(self.data.time)

    def timestep(self) -> float:
        return float(self.model.opt.timestep)

    def set_timestep(self, dt: float) -> None:
        self.model.opt.timestep = float(dt)

    def gravity(self) -> npt.NDArray:
        return np.array(self.model.opt.gravity)

    def set_gravity(self, gravity: npt.NDArray) -> None:
        self.model.opt.gravity = np.asarray(gravity)

    def number_of_joints(self) -> int:
        return int(self.model.njnt)

    def number_of_dofs(self) -> int:
        return int(self.model.nv)

    def joint_dofs(self, joint_name: str) -> int:
        """DoF count of a joint (6 free, 3 ball, 1 hinge/slide) —
        reference ``mujoco/model.py:274-280``."""
        import mujoco

        jid = mujoco.mj_name2id(self.model, mujoco.mjtObj.mjOBJ_JOINT, joint_name)
        if jid < 0:
            raise ValueError(f"Joint '{joint_name}' not found")
        return {
            mujoco.mjtJoint.mjJNT_FREE: 6,
            mujoco.mjtJoint.mjJNT_BALL: 3,
        }.get(self.model.jnt_type[jid], 1)

    # ----- bodies / geometries (reference ``mujoco/model.py:330-404``) -----

    def number_of_bodies(self) -> int:
        return int(self.model.nbody)

    def _body_id(self, body_name: str) -> int:
        import mujoco

        bid = mujoco.mj_name2id(self.model, mujoco.mjtObj.mjOBJ_BODY, body_name)
        if bid < 0:
            raise ValueError(f"Body '{body_name}' not found")
        return bid

    def body_position(self, body_name: str) -> npt.NDArray:
        return np.array(self.data.xpos[self._body_id(body_name)])

    def body_orientation(self, body_name: str, dcm: bool = False) -> npt.NDArray:
        bid = self._body_id(body_name)
        if dcm:
            return np.array(self.data.xmat[bid]).reshape(3, 3)
        return np.array(self.data.xquat[bid])

    def number_of_geometries(self) -> int:
        return int(self.model.ngeom)

    def geometry_names(self) -> list[str]:
        import mujoco

        return [
            mujoco.mj_id2name(self.model, mujoco.mjtObj.mjOBJ_GEOM, i)
            for i in range(self.model.ngeom)
        ]

    def _geom_id(self, geometry_name: str) -> int:
        import mujoco

        gid = mujoco.mj_name2id(self.model, mujoco.mjtObj.mjOBJ_GEOM, geometry_name)
        if gid < 0:
            raise ValueError(f"Geometry '{geometry_name}' not found")
        return gid

    def geometry_position(self, geometry_name: str) -> npt.NDArray:
        return np.array(self.data.geom_xpos[self._geom_id(geometry_name)])

    def geometry_orientation(
        self, geometry_name: str, dcm: bool = False
    ) -> npt.NDArray:
        R = np.array(self.data.geom_xmat[self._geom_id(geometry_name)]).reshape(3, 3)
        if dcm:
            return R
        import mujoco

        q = np.zeros(4)
        mujoco.mju_mat2Quat(q, R.flatten())
        return q

    def total_mass(self) -> float:
        return float(np.sum(self.model.body_mass))

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

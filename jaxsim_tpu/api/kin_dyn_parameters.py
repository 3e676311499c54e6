"""Vectorized kinematic/dynamic model parameters — the NumPy→JAX freeze point.

Role of reference ``src/jaxsim/api/kin_dyn_parameters.py:21-905``. A
:class:`KinDynParameters` freezes a parsed
:class:`~jaxsim_tpu.parsers.descriptions.ModelDescription` into:

* static topology (link names, parent array λ, boolean support matrix κb,
  depth levels) — compile-time constants, part of the JIT cache key;
* dynamic differentiable arrays (link inertial params, joint params, joint
  frame transforms, contact points, frame transforms).

TPU-first deviations from the reference:
* κb and the depth-level schedule are computed eagerly with NumPy at build
  time (the reference uses a traced scan, ``kin_dyn_parameters.py:208-237``);
* ``joint_transforms`` is one fused batched expression over all joints
  (no per-joint ``lax.switch``), supporting arbitrary leading batch dims.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import jaxsim_tpu.typing as jtp
from jaxsim_tpu.math import Adjoint, Inertia, JointModel, supported_joint_motion
from jaxsim_tpu.parsers.descriptions import JointDescription, ModelDescription
from jaxsim_tpu.utils import HashedNumpyArray, pytree_dataclass, static_field


@pytree_dataclass
class LinkParameters:
    """Inertial parameters of every link, stacked.

    ``inertia_elements`` stores the upper triangle (xx, xy, xz, yy, yz, zz) of
    the 3×3 inertia about the link CoM, link-frame oriented — the
    differentiable carrier used by hardware parametrization (reference
    ``kin_dyn_parameters.py:574-762``).
    """

    index: jtp.Int
    mass: jtp.Float
    center_of_mass: jtp.Vector
    inertia_elements: jtp.Vector

    @staticmethod
    def build_from_spatial_inertia(index, M: jtp.Matrix) -> "LinkParameters":
        # Offline (NumPy) path: called once per link at model-build time from
        # KinDynParameters.build — keep it off the eager-JAX dispatcher.
        from jaxsim_tpu.math import np_spatial

        m, c, I_com = np_spatial.spatial_inertia_to_params(np.asarray(M))
        return LinkParameters(
            index=np.asarray(index, dtype=int),
            mass=np.asarray(m, dtype=float),
            center_of_mass=np.asarray(c, dtype=float),
            inertia_elements=np.array(
                [I_com[0, 0], I_com[0, 1], I_com[0, 2], I_com[1, 1], I_com[1, 2], I_com[2, 2]]
            ),
        )

    @staticmethod
    def flatten_inertia(I: jtp.Matrix) -> jtp.Vector:
        I = jnp.asarray(I)
        return jnp.stack(
            [
                I[..., 0, 0],
                I[..., 0, 1],
                I[..., 0, 2],
                I[..., 1, 1],
                I[..., 1, 2],
                I[..., 2, 2],
            ],
            axis=-1,
        )

    @staticmethod
    def unflatten_inertia(params: jtp.Vector) -> jtp.Matrix:
        p = jnp.asarray(params)
        xx, xy, xz, yy, yz, zz = (p[..., i] for i in range(6))
        return jnp.stack(
            [
                jnp.stack([xx, xy, xz], axis=-1),
                jnp.stack([xy, yy, yz], axis=-1),
                jnp.stack([xz, yz, zz], axis=-1),
            ],
            axis=-2,
        )

    @property
    def inertia_tensor(self) -> jtp.Matrix:
        """3×3 inertia about the CoM (stacked)."""
        return LinkParameters.unflatten_inertia(self.inertia_elements)

    def spatial_inertia(self) -> jtp.Matrix:
        """6×6 spatial inertia of every link in its link frame, ``(nL, 6, 6)``."""
        return Inertia.to_sixd(self.mass, self.center_of_mass, self.inertia_tensor)


@pytree_dataclass
class JointParameters:
    """Per-joint dynamic parameters, stacked (reference
    ``kin_dyn_parameters.py:502-571``)."""

    index: jtp.Int
    friction_static: jtp.Float
    friction_viscous: jtp.Float
    position_limits_min: jtp.Float
    position_limits_max: jtp.Float
    position_limit_spring: jtp.Float
    position_limit_damper: jtp.Float

    @staticmethod
    def build_from_joint_descriptions(
        joints: list[JointDescription],
    ) -> "JointParameters":
        def arr(fn, dtype=float):
            # Offline (NumPy) — one device_put at the end of
            # KinDynParameters.build moves everything to device in one go.
            return np.array([fn(j) for j in joints], dtype=dtype)

        return JointParameters(
            index=arr(lambda j: j.index, dtype=int),
            friction_static=arr(lambda j: j.friction_static),
            friction_viscous=arr(lambda j: j.friction_viscous),
            position_limits_min=arr(lambda j: min(j.position_limit)),
            position_limits_max=arr(lambda j: max(j.position_limit)),
            position_limit_spring=arr(lambda j: j.position_limit_spring),
            position_limit_damper=arr(lambda j: j.position_limit_damper),
        )


@pytree_dataclass
class ContactParameters:
    """Collidable points: static parent-link indices + dynamic positions
    (reference ``kin_dyn_parameters.py:765-840``)."""

    body: tuple[int, ...] = static_field(default=())
    enabled: tuple[bool, ...] = static_field(default=())
    point: jtp.Matrix = dataclasses.field(default_factory=lambda: jnp.zeros((0, 3)))

    @property
    def indices_of_enabled_collidable_points(self) -> np.ndarray:
        return np.where(np.array(self.enabled))[0]

    @staticmethod
    def build_from(model_description: ModelDescription) -> "ContactParameters":
        points = model_description.all_enabled_collidable_points()
        # Also include disabled points so enabling them later is cheap.
        all_points = [
            p
            for shape in model_description.collision_shapes
            for p in shape.collidable_points
        ]
        if len(all_points) == 0:
            return ContactParameters()
        return ContactParameters(
            body=tuple(int(p.parent_link.index) for p in all_points),
            enabled=tuple(bool(p.enabled) for p in all_points),
            point=np.array([p.position for p in all_points], dtype=float),
        )
        del points


@pytree_dataclass
class FrameParameters:
    """Additional frames: static names/parents + dynamic transforms
    (reference ``kin_dyn_parameters.py:843-905``)."""

    name: tuple[str, ...] = static_field(default=())
    body: tuple[int, ...] = static_field(default=())
    transform: jtp.Array = dataclasses.field(
        default_factory=lambda: jnp.zeros((0, 4, 4))
    )

    @staticmethod
    def build_from(model_description: ModelDescription) -> "FrameParameters":
        if len(model_description.frames) == 0:
            return FrameParameters()
        return FrameParameters(
            name=tuple(f.name for f in model_description.frames),
            body=tuple(
                int(model_description.links_dict[f.parent_name].index)
                for f in model_description.frames
            ),
            transform=np.array(
                [f.pose for f in model_description.frames], dtype=float
            ),
        )


class ConstraintType:
    """Kinematic constraint types (reference ``kin_dyn_parameters.py:1247``)."""

    Weld = 0


@pytree_dataclass
class ConstraintMap:
    """Frame-pair kinematic constraints with Baumgarte stabilization
    (reference ``kin_dyn_parameters.py:1247-1347``)."""

    frame_idxs_1: tuple[int, ...] = static_field(default=())
    frame_idxs_2: tuple[int, ...] = static_field(default=())
    constraint_types: tuple[int, ...] = static_field(default=())
    K_P: jtp.Vector = dataclasses.field(default_factory=lambda: jnp.zeros(0))
    K_D: jtp.Vector = dataclasses.field(default_factory=lambda: jnp.zeros(0))

    def add_constraint(
        self,
        frame_idx_1: int,
        frame_idx_2: int,
        constraint_type: int = ConstraintType.Weld,
        K_P: float = 1000.0,
        K_D: float | None = None,
    ) -> "ConstraintMap":
        K_D = K_D if K_D is not None else 2 * np.sqrt(K_P)
        return ConstraintMap(
            frame_idxs_1=self.frame_idxs_1 + (int(frame_idx_1),),
            frame_idxs_2=self.frame_idxs_2 + (int(frame_idx_2),),
            constraint_types=self.constraint_types + (int(constraint_type),),
            K_P=jnp.concatenate([self.K_P, jnp.array([K_P], dtype=float)]),
            K_D=jnp.concatenate([self.K_D, jnp.array([K_D], dtype=float)]),
        )

    def __len__(self) -> int:
        return len(self.frame_idxs_1)


@pytree_dataclass
class KinDynParameters:
    r"""Frozen numeric model: topology + stacked parameters.

    Attributes:
        link_names: static link names, BFS order.
        _parent_array: static parent index λ(i) per link (λ(0) = -1).
        _depth_levels: static tuple of tuples — link indices grouped by tree
            depth (used by depth-levelled kernel variants).
        _support_body_array_bool: κb boolean support matrix, hashed static.
        _motion_subspaces: S, ``(nL, 6)`` hashed static.
    """

    link_names: tuple[str, ...] = static_field()
    _parent_array: tuple[int, ...] = static_field()
    _depth_levels: tuple[tuple[int, ...], ...] = static_field()
    _support_body_array_bool: HashedNumpyArray = static_field()
    _motion_subspaces: HashedNumpyArray = static_field()

    link_parameters: LinkParameters = None
    joint_model: JointModel = None
    joint_parameters: JointParameters = None
    contact_parameters: ContactParameters = None
    frame_parameters: FrameParameters = None
    constraints: ConstraintMap = None
    hw_link_metadata: "object" = None

    @staticmethod
    def build(
        model_description: ModelDescription,
        constraints: ConstraintMap | None = None,
    ) -> "KinDynParameters":
        ordered_links = sorted(
            model_description.links_dict.values(), key=lambda l: l.index
        )
        ordered_joints = sorted(
            model_description.joints_dict.values(), key=lambda j: j.index
        )

        link_parameters = jax.tree.map(
            lambda *l: np.stack(l),
            *[
                LinkParameters.build_from_spatial_inertia(link.index, link.inertia)
                for link in ordered_links
            ],
        )

        joint_parameters = (
            JointParameters.build_from_joint_descriptions(ordered_joints)
            if ordered_joints
            else JointParameters(
                index=np.array([], dtype=int),
                friction_static=np.array([], dtype=float),
                friction_viscous=np.array([], dtype=float),
                position_limits_min=np.array([], dtype=float),
                position_limits_max=np.array([], dtype=float),
                position_limit_spring=np.array([], dtype=float),
                position_limit_damper=np.array([], dtype=float),
            )
        )

        joint_model = JointModel.build(description=model_description)

        contact_parameters = ContactParameters.build_from(model_description)
        frame_parameters = FrameParameters.build_from(model_description)

        # Topology (eager NumPy — this runs once at build time).
        n_links = len(ordered_links)
        links_dict = model_description.links_dict
        parent_array = np.full(n_links, -1, dtype=int)
        for link in ordered_links:
            if link.parent_name is not None and link.parent_name in links_dict:
                parent_array[link.index] = links_dict[link.parent_name].index

        # Boolean support matrix κb: κb[i, j] = True iff link j is on the path
        # from the root to link i (inclusive).
        support = np.zeros((n_links, n_links), dtype=bool)
        depth = np.zeros(n_links, dtype=int)
        for i in range(n_links):
            j = i
            while j >= 0:
                support[i, j] = True
                j = parent_array[j]
            depth[i] = support[i].sum() - 1

        # Depth-level schedule: indices of links at each depth > 0.
        levels = tuple(
            tuple(int(i) for i in np.where(depth == d)[0])
            for d in range(1, int(depth.max()) + 1 if n_links > 1 else 1)
        )

        # Motion subspaces S (linear-first): revolute → [0; a], prismatic →
        # [a; 0]; row 0 is the world→base joint (zeros).
        from jaxsim_tpu.math.joint_model import JointType

        S = np.zeros((n_links, 6))
        for joint in ordered_joints:
            axis = np.asarray(joint.axis, dtype=float).squeeze()
            if joint.jtype == JointType.Revolute:
                S[joint.index, 3:6] = axis
            elif joint.jtype == JointType.Prismatic:
                S[joint.index, 0:3] = axis

        kdp = KinDynParameters(
            link_names=tuple(l.name for l in ordered_links),
            _parent_array=tuple(int(i) for i in parent_array),
            _depth_levels=levels,
            _support_body_array_bool=HashedNumpyArray(support),
            _motion_subspaces=HashedNumpyArray(S),
            link_parameters=link_parameters,
            joint_model=joint_model,
            joint_parameters=joint_parameters,
            contact_parameters=contact_parameters,
            frame_parameters=frame_parameters,
            constraints=constraints if constraints is not None else ConstraintMap(),
        )
        # The builders above are eager NumPy (no tiny per-op XLA compiles at
        # model-build time); move every dynamic leaf to device in ONE
        # transfer, with standard dtype canonicalization (f64→f32 etc.).
        return jax.device_put(kdp)

    # ----- sizes -----

    def number_of_links(self) -> int:
        return len(self.link_names)

    def number_of_joints(self) -> int:
        return len(self.joint_model.joint_names) - 1

    def number_of_frames(self) -> int:
        return len(self.frame_parameters.name)

    # ----- topology accessors -----

    @property
    def parent_array(self) -> jtp.Vector:
        r"""Parent array :math:`\lambda(i)` as a JAX array."""
        return jnp.array(self._parent_array, dtype=int)

    @property
    def parent_array_static(self) -> tuple[int, ...]:
        return self._parent_array

    @property
    def depth_levels(self) -> tuple[tuple[int, ...], ...]:
        return self._depth_levels

    @property
    def support_body_array_bool(self) -> jtp.Matrix:
        return jnp.asarray(self._support_body_array_bool.get())

    @property
    def motion_subspaces(self) -> jtp.Matrix:
        """S, shape ``(nL, 6)`` (linear-first; row 0 zeros)."""
        return jnp.asarray(self._motion_subspaces.get(), dtype=float)

    def support_parent_array(self, link_index: int) -> np.ndarray:
        """Ordered support array κ(i): path root → link (static)."""
        mask = self._support_body_array_bool.get()[link_index]
        return np.where(mask)[0]

    # ----- the single kinematic primitive -----

    def joint_transforms(
        self,
        joint_positions: jtp.VectorLike,
        base_transform: jtp.MatrixLike,
    ) -> jtp.Array:
        r"""Stacked inverse adjoints :math:`{}^{i} X_{\lambda(i)}(s)`.

        Row 0 encodes world→base from ``base_transform``. Supports arbitrary
        leading batch dims on both inputs. This is the one primitive every
        RBDA consumes (reference ``kin_dyn_parameters.py:396-451``).
        """
        s = jnp.asarray(joint_positions, dtype=float)
        W_H_B = jnp.asarray(base_transform, dtype=float)
        n_joints = self.number_of_joints()

        batch = jnp.broadcast_shapes(s.shape[:-1], W_H_B.shape[:-2])

        lambda_H_pre = self.joint_model.lambda_H_pre[1 : 1 + n_joints]
        suc_H_i = self.joint_model.suc_H_i

        if n_joints > 0:
            types = jnp.array(self.joint_model.joint_types[1:], dtype=int)
            pre_H_suc = supported_joint_motion(types, s, self.joint_model.joint_axis)
            # (..., nJ, 4, 4)
            H_J = lambda_H_pre @ pre_H_suc @ suc_H_i[1:]
        else:
            H_J = jnp.zeros(batch + (0, 4, 4))

        H_0 = (W_H_B @ suc_H_i[0])[..., None, :, :]
        H_0 = jnp.broadcast_to(H_0, batch + (1, 4, 4))
        H_J = jnp.broadcast_to(H_J, batch + (n_joints, 4, 4))
        H = jnp.concatenate([H_0, H_J], axis=-3)

        return Adjoint.from_transform(H, inverse=True)

    # ----- parameter update helpers -----

    def set_link_mass(self, link_index: int, mass: jtp.FloatLike) -> "KinDynParameters":
        link_parameters = self.link_parameters.replace(
            mass=self.link_parameters.mass.at[link_index].set(mass)
        )
        return self.replace(link_parameters=link_parameters)

    def set_link_inertia(
        self, link_index: int, inertia: jtp.MatrixLike
    ) -> "KinDynParameters":
        """Set the 3×3 inertia (about the CoM) of a link."""
        elems = LinkParameters.flatten_inertia(jnp.asarray(inertia))
        link_parameters = self.link_parameters.replace(
            inertia_elements=self.link_parameters.inertia_elements.at[link_index].set(
                elems
            )
        )
        return self.replace(link_parameters=link_parameters)

    # ----- hashing: key on topology only, not numeric values -----

    def __hash__(self) -> int:
        return hash(
            (
                self.link_names,
                self._parent_array,
                self.frame_parameters.name,
                self.frame_parameters.body,
                self.contact_parameters.body,
                self.contact_parameters.enabled,
                hash(self._support_body_array_bool),
                hash(self._motion_subspaces),
            )
        )

    def __eq__(self, other: object) -> bool:
        return isinstance(other, KinDynParameters) and hash(self) == hash(other)

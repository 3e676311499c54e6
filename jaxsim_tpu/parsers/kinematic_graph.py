"""Kinematic graph: the offline (NumPy) topology/indexing layer.

Role of reference ``src/jaxsim/parsers/kinematic_graph.py:20-981``:

* BFS link indexing (root = 0), joint index = child link index, frames
  indexed after links;
* graph construction that drops unconnected elements;
* ``reduce(considered_joints)``: lump removed links into their parents
  (leaf → root), re-pose affected joints, turn removed links into frames;
* offline forward kinematics at the initial joint positions
  (:class:`KinematicGraphTransforms`).

Everything here runs once at model-build time in plain Python/NumPy; nothing
is traced.
"""

from __future__ import annotations

import copy
import dataclasses
from collections.abc import Iterable, Sequence

import numpy as np
import numpy.typing as npt

from jaxsim_tpu import logging

from .descriptions.joint import JointDescription, JointType
from .descriptions.link import LinkDescription


@dataclasses.dataclass(frozen=True)
class RootPose:
    """World pose of the kinematic-graph root (wxyz quaternion)."""

    root_position: npt.NDArray = dataclasses.field(
        default_factory=lambda: np.zeros(3)
    )
    root_quaternion: npt.NDArray = dataclasses.field(
        default_factory=lambda: np.array([1.0, 0, 0, 0])
    )

    def to_matrix(self) -> npt.NDArray:
        from jaxsim_tpu.math import np_spatial

        return np_spatial.transform_from_quat_trans(
            self.root_quaternion, self.root_position
        )

    def __hash__(self) -> int:
        return hash(
            (tuple(self.root_position.tolist()), tuple(self.root_quaternion.tolist()))
        )

    def __eq__(self, other: object) -> bool:
        return isinstance(other, RootPose) and hash(self) == hash(other)


@dataclasses.dataclass(eq=False)
class KinematicGraph(Sequence[LinkDescription]):
    """A connected acyclic graph of links (nodes) and joints (edges)."""

    root: LinkDescription
    joints: list[JointDescription] = dataclasses.field(default_factory=list)
    frames: list[LinkDescription] = dataclasses.field(default_factory=list)
    root_pose: RootPose = dataclasses.field(default_factory=RootPose)

    # Joints removed by graph construction/reduction (kept for bookkeeping).
    _joints_removed: list[JointDescription] = dataclasses.field(default_factory=list)

    def __post_init__(self) -> None:
        # BFS link indexing: root gets 0.
        for index, link in enumerate(self):
            link.index = index

        link_names = [l.name for l in self]
        frame_names = [f.name for f in self.frames]
        joint_names = [j.name for j in self.joints]
        assert len(link_names) == len(set(link_names))
        assert len(frame_names) == len(set(frame_names))
        assert len(joint_names) == len(set(joint_names))
        assert set(link_names).isdisjoint(set(frame_names))

        # Frames: name-sorted, indexed after links.
        self.frames.sort(key=lambda f: f.name)
        for index, frame in enumerate(self.frames):
            frame.index = index + len(link_names)

        # Joint index = child link index (1-based).
        links_dict = {l.name: l for l in self}
        for joint in self.joints:
            joint.index = links_dict[joint.child.name].index
        assert len({j.index for j in self.joints}) == len(self.joints)
        self.joints.sort(key=lambda j: j.index)

    # ----- dict views -----

    @property
    def links_dict(self) -> dict[str, LinkDescription]:
        return {l.name: l for l in self}

    @property
    def frames_dict(self) -> dict[str, LinkDescription]:
        return {f.name: f for f in self.frames}

    @property
    def joints_dict(self) -> dict[str, JointDescription]:
        return {j.name: j for j in self.joints}

    @property
    def joints_connection_dict(self) -> dict[tuple[str, str], JointDescription]:
        return {(j.parent.name, j.child.name): j for j in self.joints}

    def link_names(self) -> list[str]:
        return [l.name for l in self]

    def joint_names(self) -> list[str]:
        return [j.name for j in self.joints]

    def frame_names(self) -> list[str]:
        return [f.name for f in self.frames]

    @property
    def joints_removed(self) -> list[JointDescription]:
        return self._joints_removed

    # ----- construction -----

    @staticmethod
    def build_from(
        links: list[LinkDescription],
        joints: list[JointDescription],
        frames: list[LinkDescription] | None = None,
        root_link_name: str | None = None,
        root_pose: RootPose = RootPose(),
    ) -> "KinematicGraph":
        if root_link_name is None:
            root_link_name = links[0].name
            logging.debug(f"Assuming '{root_link_name}' as the root link")

        (
            root_node,
            graph_joints,
            graph_frames,
            unconnected_links,
            unconnected_joints,
            unconnected_frames,
        ) = KinematicGraph._create_graph(
            links=links, joints=joints, root_link_name=root_link_name, frames=frames
        )

        for el in unconnected_links + unconnected_joints + unconnected_frames:
            logging.warning(f"Ignoring unconnected element: '{el.name}'")

        return KinematicGraph(
            root=root_node,
            joints=graph_joints,
            frames=graph_frames,
            root_pose=root_pose,
            _joints_removed=unconnected_joints,
        )

    @staticmethod
    def _create_graph(
        links: list[LinkDescription],
        joints: list[JointDescription],
        root_link_name: str,
        frames: list[LinkDescription] | None = None,
    ):
        links_dict = {l.name: l for l in links}
        frames = frames if frames is not None else []
        frames_dict = {f.name: f for f in frames}

        for frame in frames:
            assert frame.parent_name not in (None, "", "__model__"), frame
            assert frame.parent_name not in frames_dict, frame

        if root_link_name not in links_dict:
            raise ValueError(root_link_name)

        # Reset connectivity and re-derive it from the joints.
        for link in links_dict.values():
            link.children = tuple()

        for joint in joints:
            parent_link = links_dict[joint.parent.name]
            child_link = links_dict[joint.child.name]
            child_link.parent_name = parent_link.name
            if child_link.name not in {l.name for l in parent_link.children}:
                parent_link.children = (*parent_link.children, child_link)

        connected_links = list(
            KinematicGraph.breadth_first_search(root=links_dict[root_link_name])
        )
        connected_link_names = {l.name for l in connected_links}

        connected_joints = [
            j
            for j in joints
            if j.parent.name in connected_link_names
            and j.child.name in connected_link_names
        ]
        connected_joint_names = {j.name for j in connected_joints}

        connected_frames = [f for f in frames if f.parent_name in connected_link_names]
        connected_frame_names = {f.name for f in connected_frames}

        removed_joints = [j for j in joints if j.name not in connected_joint_names]
        unconnected_links = [l for l in links if l.name not in connected_link_names]
        for link in unconnected_links:
            link.children = tuple()
        unconnected_frames = [f for f in frames if f.name not in connected_frame_names]

        return (
            links_dict[root_link_name],
            connected_joints,
            connected_frames,
            unconnected_links,
            removed_joints,
            unconnected_frames,
        )

    @staticmethod
    def breadth_first_search(
        root: LinkDescription,
    ) -> Iterable[LinkDescription]:
        queue = [root]
        visited = {root.name}
        yield root
        while queue:
            node = queue.pop(0)
            for child in node.children:
                if child.name not in visited:
                    visited.add(child.name)
                    yield child
                    queue.append(child)

    # ----- reduction -----

    def reduce(self, considered_joints: Sequence[str]) -> "KinematicGraph":
        """Reduce the graph by removing every joint not in ``considered_joints``.

        Removed joints are locked at their ``initial_position``; their child
        links are lumped into the parents and become frames of the reduced
        graph (algorithm mirrors reference ``kinematic_graph.py:379-611``).
        """
        full_graph = self
        joint_names_to_remove = list(
            set(full_graph.joint_names()) - set(considered_joints)
        )

        if len(joint_names_to_remove) == 0:
            logging.info("The kinematic graph doesn't need to be reduced")
            return copy.deepcopy(self)

        if len(set(considered_joints) - set(full_graph.joint_names())) != 0:
            extra = set(considered_joints) - set(full_graph.joint_names())
            raise ValueError(f"Joints not part of the graph: {extra}")

        links_dict = copy.deepcopy(full_graph.links_dict)
        joints_dict = copy.deepcopy(full_graph.joints_dict)

        fk = KinematicGraphTransforms(graph=full_graph)

        # 1. Lump removed links into their parents, leaf → root.
        links_to_remove = [
            joint.child.name
            for joint_name, joint in joints_dict.items()
            if joint_name in joint_names_to_remove
        ]

        for link in reversed(list(full_graph)):
            if link.name not in links_to_remove:
                continue

            link_to_remove = links_dict[link.name]
            parent = links_dict[link.parent_name]

            lumped_link = parent.lump_with(
                link=link_to_remove,
                lumped_H_removed=fk.relative_transform(
                    relative_to=parent.name, name=link_to_remove.name
                ),
            )

            links_dict.pop(link_to_remove.name)
            links_dict.pop(parent.name)
            links_dict[lumped_link.name] = lumped_link
            # Alias the removed name to the lumped link (used by later steps).
            links_dict[link_to_remove.name] = lumped_link
            # Fix aliases created by earlier lumpings that pointed at the
            # link we just replaced.
            for alias in [
                name
                for name, l in links_dict.items()
                if name != l.name and l.name == link_to_remove.name
            ]:
                links_dict[alias] = lumped_link

        # 2. Re-pose joints whose parent link was removed.
        for joint_name in considered_joints:
            joint = joints_dict[joint_name]
            if joint.parent.name not in links_to_remove:
                continue
            joint.pose = fk.relative_transform(
                relative_to=links_dict[joint.parent.name].name, name=joint.name
            )
            joint.parent = links_dict[joint.parent.name]

        # 3. Rebuild the graph; removed links come back as frames.
        full_graph_links_dict = copy.deepcopy(full_graph.links_dict)
        links_to_keep = [
            l for name, l in links_dict.items() if name not in links_to_remove
        ]
        for link in links_to_keep:
            full_graph_links_dict[link.name] = link

        (
            reduced_root_node,
            reduced_joints,
            reduced_frames,
            unconnected_links,
            unconnected_joints,
            _unconnected_frames,
        ) = KinematicGraph._create_graph(
            links=list(full_graph_links_dict.values()),
            joints=[joints_dict[name] for name in considered_joints],
            root_link_name=full_graph.root.name,
        )

        for link in unconnected_links:
            logging.debug(f"Link '{link.name}' became a frame")

        reduced_graph = KinematicGraph(
            root=reduced_root_node,
            joints=reduced_joints,
            frames=copy.deepcopy(self.frames) + unconnected_links + reduced_frames,
            root_pose=full_graph.root_pose,
            _joints_removed=(
                self._joints_removed
                + unconnected_joints
                + [joints_dict[name] for name in joint_names_to_remove]
            ),
        )

        # 4. Re-pose frames onto their (possibly new) parent links, using the
        #    FULL-graph FK so the kinematics are unaltered.
        fk_reduced = KinematicGraphTransforms(graph=reduced_graph)
        for frame in reduced_graph.frames:
            new_parent = fk_reduced.find_parent_link_of_frame(name=frame.name)
            assert new_parent in reduced_graph.links_dict, new_parent
            frame.pose = fk.relative_transform(relative_to=new_parent, name=frame.name)
            frame.parent_name = new_parent
            frame.mass = 0.0
            frame.inertia = np.zeros((6, 6))

        return reduced_graph

    # ----- Sequence protocol (BFS order) -----

    def __iter__(self):
        yield from KinematicGraph.breadth_first_search(root=self.root)

    def __reversed__(self):
        yield from reversed(list(iter(self)))

    def __len__(self) -> int:
        return len(list(iter(self)))

    def __contains__(self, item: str | LinkDescription) -> bool:
        if isinstance(item, str):
            return item in self.link_names()
        if isinstance(item, LinkDescription):
            return item in set(iter(self))
        raise TypeError(type(item).__name__)

    def __getitem__(self, key: int | str) -> LinkDescription:
        if isinstance(key, str):
            if key not in self.link_names():
                raise KeyError(key)
            return self.links_dict[key]
        if isinstance(key, int):
            return list(iter(self))[key]
        raise TypeError(type(key).__name__)


@dataclasses.dataclass(frozen=True)
class KinematicGraphTransforms:
    """Offline FK over the graph at the (settable) initial joint positions
    (reference ``kinematic_graph.py:766-981``)."""

    graph: KinematicGraph

    _transform_cache: dict[str, npt.NDArray] = dataclasses.field(
        default_factory=dict, init=False, repr=False, compare=False
    )
    _initial_joint_positions: dict[str, float] = dataclasses.field(
        init=False, repr=False, compare=False
    )

    def __post_init__(self) -> None:
        object.__setattr__(
            self,
            "_initial_joint_positions",
            {j.name: j.initial_position for j in self.graph.joints},
        )

    @property
    def initial_joint_positions(self) -> npt.NDArray:
        return np.atleast_1d(
            np.array(list(self._initial_joint_positions.values()))
        ).astype(float)

    def set_initial_joint_positions(
        self,
        positions: npt.NDArray | Sequence,
        joint_names: Sequence[str] | None = None,
    ) -> None:
        joint_names = (
            joint_names
            if joint_names is not None
            else list(self._initial_joint_positions)
        )
        s = np.atleast_1d(np.array(positions).squeeze())
        if s.size != len(joint_names):
            raise ValueError(s.size, len(joint_names))
        for name in joint_names:
            if name not in self._initial_joint_positions:
                raise ValueError(name)
        self._transform_cache.clear()
        for name, pos in zip(joint_names, s, strict=True):
            self._initial_joint_positions[name] = float(pos)

    def transform(self, name: str) -> npt.NDArray:
        """4×4 pose of a link/joint/frame w.r.t. the model root frame."""
        if name in self._transform_cache:
            return self._transform_cache[name]

        if name in self.graph.joints_dict:
            joint = self.graph.joints_dict[name]
            M_H_L = self.transform(name=joint.parent.name)
            L_H_pre = joint.pose
            pre_H_J = self.pre_H_suc(
                joint_type=joint.jtype,
                joint_axis=joint.axis,
                joint_position=self._initial_joint_positions[joint.name],
            )
            self._transform_cache[name] = M_H_L @ L_H_pre @ pre_H_J
            return self._transform_cache[name]

        if name in self.graph.links_dict:
            link = self.graph.links_dict[name]
            if link.name == self.graph.root.name:
                return np.asarray(link.pose)
            parent_joint = self.graph.joints_connection_dict[
                link.parent_name, link.name
            ]
            M_H_J = self.transform(name=parent_joint.name)
            self._transform_cache[name] = M_H_J @ np.asarray(link.pose)
            return self._transform_cache[name]

        if name not in self.graph.frames_dict:
            raise ValueError(name)

        frame = self.graph.frames_dict[name]
        M_H_L = self.transform(name=frame.parent_name)
        self._transform_cache[name] = M_H_L @ np.asarray(frame.pose)
        return self._transform_cache[name]

    def relative_transform(self, relative_to: str, name: str) -> npt.NDArray:
        M_H_target = self.transform(name=name)
        M_H_R = self.transform(name=relative_to)
        R, p = M_H_R[:3, :3], M_H_R[:3, 3]
        inv = np.eye(4)
        inv[:3, :3] = R.T
        inv[:3, 3] = -R.T @ p
        return inv @ M_H_target

    @staticmethod
    def pre_H_suc(
        joint_type: int,
        joint_axis: npt.NDArray,
        joint_position: float | None = None,
    ) -> npt.NDArray:
        from jaxsim_tpu.math import np_spatial

        s = float(joint_position) if joint_position is not None else 0.0
        return np_spatial.joint_transform(joint_type, joint_axis, s)

    def find_parent_link_of_frame(self, name: str) -> str:
        try:
            frame = self.graph.frames_dict[name]
        except KeyError as e:
            raise ValueError(f"Frame '{name}' not in the kinematic graph") from e
        if frame.parent_name in self.graph.links_dict:
            return frame.parent_name
        if frame.parent_name in self.graph.frames_dict:
            return self.find_parent_link_of_frame(name=frame.parent_name)
        raise RuntimeError(
            f"Failed to find parent link of frame '{name}' (parent:"
            f" '{frame.parent_name}')"
        )


__all__ = [
    "KinematicGraph",
    "KinematicGraphTransforms",
    "RootPose",
    "JointType",
]

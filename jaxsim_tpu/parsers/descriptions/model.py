"""Complete model description: kinematic graph + collisions.

Role of reference ``src/jaxsim/parsers/descriptions/model.py:16-282``.
"""

from __future__ import annotations

import dataclasses
from collections.abc import Sequence

import numpy as np

from jaxsim_tpu import logging
from jaxsim_tpu.parsers.kinematic_graph import (
    KinematicGraph,
    KinematicGraphTransforms,
    RootPose,
)

from .collision import CollidablePoint, CollisionShape
from .joint import JointDescription
from .link import LinkDescription


@dataclasses.dataclass(eq=False)
class ModelDescription(KinematicGraph):
    """Intermediate full description of a robot model."""

    name: str = None
    fixed_base: bool = True
    collision_shapes: list[CollisionShape] = dataclasses.field(default_factory=list)

    @staticmethod
    def build_model_from(
        name: str,
        links: list[LinkDescription],
        joints: list[JointDescription],
        frames: list[LinkDescription] | None = None,
        collisions: list[CollisionShape] | None = None,
        fixed_base: bool = False,
        base_link_name: str | None = None,
        considered_joints: Sequence[str] | None = None,
        model_pose: RootPose = RootPose(),
    ) -> "ModelDescription":
        """Build a model description, optionally reducing it on the fly.

        Collision points of links that get lumped by the (optional) reduction
        are re-expressed on the new parent link (reference
        ``descriptions/model.py:35-155``).
        """
        collisions = collisions or []

        graph = KinematicGraph.build_from(
            links=links,
            joints=joints,
            frames=frames,
            root_link_name=base_link_name,
            root_pose=model_pose,
        )

        if considered_joints is not None:
            graph = graph.reduce(considered_joints=list(considered_joints))

        fk = KinematicGraphTransforms(graph=graph)

        final_collisions: list[CollisionShape] = []
        for shape in collisions:
            new_points: list[CollidablePoint] = []
            for point in shape.collidable_points:
                name_of_parent = point.parent_link.name
                if name_of_parent in graph.links_dict:
                    # Parent link survived; rebind to the graph's instance.
                    new_points.append(
                        CollidablePoint(
                            parent_link=graph.links_dict[name_of_parent],
                            position=np.asarray(point.position, dtype=float),
                            enabled=point.enabled,
                        )
                    )
                elif name_of_parent in graph.frames_dict:
                    # Parent link was lumped: move the point to the real link.
                    real_parent = fk.find_parent_link_of_frame(name=name_of_parent)
                    L_H_F = fk.relative_transform(
                        relative_to=real_parent, name=name_of_parent
                    )
                    new_points.append(
                        point.change_link(
                            new_link=graph.links_dict[real_parent],
                            new_H_old=L_H_F,
                        )
                    )
                else:
                    logging.debug(
                        f"Dropping collision point of removed link '{name_of_parent}'"
                    )
            if new_points:
                shape = dataclasses.replace(
                    shape, collidable_points=tuple(new_points)
                )
                final_collisions.append(shape)

        model = ModelDescription(
            name=name,
            root_pose=graph.root_pose,
            fixed_base=fixed_base,
            collision_shapes=final_collisions,
            root=graph.root,
            joints=graph.joints,
            frames=graph.frames,
            _joints_removed=graph.joints_removed,
        )
        assert model.name == name, (model.name, name)
        return model

    def reduce(self, considered_joints: Sequence[str]) -> "ModelDescription":
        """Reduce the model, lumping links and re-parenting collision points
        (reference ``descriptions/model.py:157-195``)."""
        if len(set(considered_joints) - set(self.joint_names())) != 0:
            extra = set(considered_joints) - set(self.joint_names())
            raise ValueError(f"Joints not part of the model: {extra}")

        reduced = ModelDescription.build_model_from(
            name=self.name,
            links=list(copy_links(self)),
            joints=list(copy_joints(self)),
            frames=list(copy_frames(self)),
            collisions=list(self.collision_shapes),
            fixed_base=self.fixed_base,
            base_link_name=next(iter(self)).name,
            model_pose=self.root_pose,
            considered_joints=considered_joints,
        )
        reduced._joints_removed.extend(self._joints_removed)
        return reduced

    def update_collision_shape_of_link(self, link_name: str, enabled: bool) -> None:
        """Enable/disable all collidable points attached to a link."""
        if link_name not in self.link_names():
            raise ValueError(link_name)
        for shape in self.collision_shapes:
            for point in shape.collidable_points:
                if point.parent_link.name == link_name:
                    point.enabled = enabled

    def collision_shape_of_link(self, link_name: str) -> CollisionShape:
        """Collision shape with every collidable point attached to a link."""
        if link_name not in self.link_names():
            raise ValueError(link_name)
        return CollisionShape(
            collidable_points=tuple(
                point
                for shape in self.collision_shapes
                for point in shape.collidable_points
                if point.parent_link.name == link_name
            )
        )

    def all_enabled_collidable_points(self) -> list[CollidablePoint]:
        """All enabled collidable points (reference ``model.py:233-248``)."""
        return [
            point
            for shape in self.collision_shapes
            for point in shape.collidable_points
            if point.enabled
        ]


def copy_links(graph: KinematicGraph):
    import copy as _copy

    yield from _copy.deepcopy(list(iter(graph)))


def copy_joints(graph: KinematicGraph):
    import copy as _copy

    yield from _copy.deepcopy(graph.joints)


def copy_frames(graph: KinematicGraph):
    import copy as _copy

    yield from _copy.deepcopy(graph.frames)

"""Hardware (morphology) parametrization for co-design.

Role of reference ``src/jaxsim/api/kin_dyn_parameters.py:920-1244`` +
``api/model.py:332-668``: per-link shape metadata (box/cylinder/sphere),
JIT-differentiable scaling of dimensions and density that consistently
updates masses, inertias, CoM offsets, child-joint placements, and contact
points — enabling gradient-based morphology optimization.

Shape metadata is recovered by introspecting the parsed collision shapes
(the reference re-loads the model through ``rod``; unavailable here).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import jaxsim_tpu.typing as jtp
from jaxsim_tpu.math import Inertia, Transform
from jaxsim_tpu.utils import pytree_dataclass, static_field

from .common import named_scope
from .kin_dyn_parameters import LinkParameters


class LinkShape:
    """Integer shape types (reference ``kin_dyn_parameters.py:926``)."""

    Box = 0
    Cylinder = 1
    Sphere = 2
    Unsupported = -1


@pytree_dataclass
class HwLinkMetadata:
    """Per-link morphology metadata, stacked over links.

    Attributes:
        link_shape: ``(nL,)`` int shape codes (static content, dynamic array).
        geometry: ``(nL, 3)`` dims — box: [lx,ly,lz]; cyl: [r,l,0]; sphere: [r,0,0].
        density: ``(nL,)``.
        L_H_G: ``(nL, 4, 4)`` link→CoM frames.
        L_H_vis: ``(nL, 4, 4)`` link→visual frames.
        L_H_pre_mask: ``(nL, 1+nJ)`` bool — joint j is a child joint of link l.
        L_H_pre: ``(nL, 1+nJ, 4, 4)`` nominal child-joint placements.
    """

    link_shape: jtp.Vector = None
    geometry: jtp.Matrix = None
    density: jtp.Vector = None
    L_H_G: jtp.Array = None
    L_H_vis: jtp.Array = None
    L_H_pre_mask: jtp.Matrix = None
    L_H_pre: jtp.Array = None


@pytree_dataclass
class ScalingFactors:
    """Differentiable morphology input: per-link dim + density multipliers
    (reference ``kin_dyn_parameters.py:1233-1244``)."""

    dims: jtp.Matrix = None  # (nL, 3)
    density: jtp.Vector = None  # (nL,)

    @staticmethod
    def ones(n_links: int) -> "ScalingFactors":
        return ScalingFactors(
            dims=jnp.ones((n_links, 3)), density=jnp.ones(n_links)
        )


# ----------------------------------------------------------------------
# Metadata construction (offline)
# ----------------------------------------------------------------------


def compute_hw_link_metadata(model) -> HwLinkMetadata:
    """Build :class:`HwLinkMetadata` by introspecting the model description
    (role of reference ``api/model.py:332-512``)."""
    from jaxsim_tpu.parsers.descriptions.collision import (
        BoxCollision,
        SphereCollision,
    )

    description = model.description
    nl = model.number_of_links()
    nj = model.number_of_joints()

    shapes = np.full(nl, LinkShape.Unsupported, dtype=int)
    geometry = np.zeros((nl, 3))
    density = np.ones(nl)
    L_H_G = np.tile(np.eye(4), (nl, 1, 1))
    L_H_vis = np.tile(np.eye(4), (nl, 1, 1))

    links_dict = description.links_dict
    kdp = model.kin_dyn_parameters

    # Collision-shape introspection per link (first shape wins).
    shape_of_link: dict[str, object] = {}
    for shape in description.collision_shapes:
        if not shape.collidable_points:
            continue
        name = shape.collidable_points[0].parent_link.name
        shape_of_link.setdefault(name, shape)

    masses = np.asarray(kdp.link_parameters.mass)
    coms = np.asarray(kdp.link_parameters.center_of_mass)

    for name, link in links_dict.items():
        i = link.index
        L_H_G[i][:3, 3] = coms[i]
        shape = shape_of_link.get(name)
        if isinstance(shape, BoxCollision):
            pts = np.array([p.position for p in shape.collidable_points])
            center = np.asarray(shape.center)
            dims = pts.max(axis=0) - pts.min(axis=0)
            if np.any(dims <= 0):
                continue
            shapes[i] = LinkShape.Box
            geometry[i] = dims
            density[i] = masses[i] / max(np.prod(dims), 1e-12)
            L_H_vis[i][:3, 3] = center
        elif isinstance(shape, SphereCollision):
            pts = np.array([p.position for p in shape.collidable_points])
            center = np.asarray(shape.center)
            r = float(np.linalg.norm(pts - center, axis=1).mean())
            if r <= 0:
                continue
            shapes[i] = LinkShape.Sphere
            geometry[i] = [r, 0.0, 0.0]
            density[i] = masses[i] / (4 / 3 * np.pi * r**3)
            L_H_vis[i][:3, 3] = center

    # Child-joint placements.
    mask = np.zeros((nl, 1 + nj), dtype=bool)
    L_H_pre = np.tile(np.eye(4), (nl, 1 + nj, 1, 1))
    lambda_H_pre = np.asarray(kdp.joint_model.lambda_H_pre)
    parent_array = kdp.parent_array_static
    for j in range(1, 1 + nj):
        parent_link = parent_array[j]  # joint j's parent link = λ(child j)
        mask[parent_link, j] = True
        L_H_pre[parent_link, j] = lambda_H_pre[j]

    return HwLinkMetadata(
        link_shape=jnp.asarray(shapes),
        geometry=jnp.asarray(geometry, dtype=float),
        density=jnp.asarray(density, dtype=float),
        L_H_G=jnp.asarray(L_H_G, dtype=float),
        L_H_vis=jnp.asarray(L_H_vis, dtype=float),
        L_H_pre_mask=jnp.asarray(mask),
        L_H_pre=jnp.asarray(L_H_pre, dtype=float),
    )


# ----------------------------------------------------------------------
# Traced morphology update
# ----------------------------------------------------------------------


def _scale_vector(link_shape: jtp.Vector, dims: jtp.Matrix) -> jtp.Matrix:
    """Per-link 3D position scaling from shape-specific dims
    (reference ``kin_dyn_parameters.py:1029-1065``)."""
    shape_indices = jnp.array(
        [
            [0, 1, 2],  # box
            [0, 0, 1],  # cylinder
            [0, 0, 0],  # sphere
        ]
    )
    safe_shape = jnp.clip(link_shape, 0, 2)
    idx = shape_indices[safe_shape]  # (nL, 3)
    return jnp.take_along_axis(dims, idx, axis=1)


def compute_mass_and_inertia(meta: HwLinkMetadata) -> tuple[jtp.Vector, jtp.Array]:
    """Mass + 3×3 CoM inertia from shape/dims/density, batched with mask
    blending (reference ``kin_dyn_parameters.py:958-1026``; no lax.switch)."""
    lx, ly, lz = meta.geometry[:, 0], meta.geometry[:, 1], meta.geometry[:, 2]
    rho = meta.density

    # Box.
    m_box = rho * lx * ly * lz
    I_box = jnp.stack(
        [
            m_box * (ly**2 + lz**2) / 12,
            m_box * (lx**2 + lz**2) / 12,
            m_box * (lx**2 + ly**2) / 12,
        ],
        axis=-1,
    )
    # Cylinder: dims [r, l, 0].
    r, length = lx, ly
    m_cyl = rho * jnp.pi * r**2 * length
    I_cyl = jnp.stack(
        [
            m_cyl * (3 * r**2 + length**2) / 12,
            m_cyl * (3 * r**2 + length**2) / 12,
            m_cyl * r**2 / 2,
        ],
        axis=-1,
    )
    # Sphere: dims [r, 0, 0].
    m_sph = rho * 4 / 3 * jnp.pi * lx**3
    I_sph = jnp.stack([2 / 5 * m_sph * lx**2] * 3, axis=-1)

    shape = meta.link_shape
    mass = jnp.where(
        shape == LinkShape.Box,
        m_box,
        jnp.where(shape == LinkShape.Cylinder, m_cyl, m_sph),
    )
    I_diag = jnp.where(
        (shape == LinkShape.Box)[:, None],
        I_box,
        jnp.where((shape == LinkShape.Cylinder)[:, None], I_cyl, I_sph),
    )
    I_com = jax.vmap(jnp.diag)(I_diag)
    return mass, I_com


def apply_scaling(meta: HwLinkMetadata, sf: ScalingFactors) -> HwLinkMetadata:
    """Scale dims/density and re-pose frames in the CoM frame
    (reference ``kin_dyn_parameters.py:1140-1230``), batched over links."""
    scale = _scale_vector(meta.link_shape, sf.dims)  # (nL, 3)

    L_H_G = meta.L_H_G
    G_H_L = Transform.inverse(L_H_G)
    G_H_vis = G_H_L @ meta.L_H_vis
    # (nL, 1+nJ, 4, 4)
    G_H_pre = jnp.einsum("lij,lkjm->lkim", G_H_L, meta.L_H_pre)

    G_H_vis_s = G_H_vis.at[:, :3, 3].set(scale * G_H_vis[:, :3, 3])
    G_H_pre_s = G_H_pre.at[:, :, :3, 3].set(
        jnp.where(
            meta.L_H_pre_mask[:, :, None],
            scale[:, None, :] * G_H_pre[:, :, :3, 3],
            G_H_pre[:, :, :3, 3],
        )
    )

    L_H_G_s = L_H_G.at[:, :3, 3].set(scale * L_H_G[:, :3, 3])
    L_H_vis_s = L_H_G_s @ G_H_vis_s
    L_H_pre_s = jnp.einsum("lij,lkjm->lkim", L_H_G_s, G_H_pre_s)

    return meta.replace(
        geometry=meta.geometry * sf.dims,
        density=meta.density * sf.density,
        L_H_G=L_H_G_s,
        L_H_vis=L_H_vis_s,
        L_H_pre=L_H_pre_s,
    )


def compute_contact_points(
    contact_parameters,
    link_shape: jtp.Vector,
    original_com: jtp.Matrix,
    updated_com: jtp.Matrix,
    sf: ScalingFactors,
) -> jtp.Matrix:
    """Rescale contact points about the link CoM
    (reference ``kin_dyn_parameters.py:1067-1129``)."""
    parents = jnp.array(contact_parameters.body, dtype=int)
    L_p_C = contact_parameters.point - original_com[parents]

    scale = _scale_vector(link_shape, sf.dims)[parents]  # (nC, 3)
    new_rel = L_p_C * scale
    return new_rel + updated_com[parents]


@named_scope
def update_hw_parameters(model, scaling_factors: ScalingFactors):
    """JIT-differentiable morphology update of a model
    (reference ``api/model.py:2461-2593``)."""
    kdp = model.kin_dyn_parameters
    meta = kdp.hw_link_metadata
    if meta is None:
        raise ValueError(
            "Model has no hardware metadata; build it with"
            " js.hw_parameters.with_hw_metadata(model)"
        )

    supported = (meta.link_shape != LinkShape.Unsupported)[:, None]

    scaled = apply_scaling(meta, scaling_factors)
    # Unsupported links keep their original metadata.
    scaled = jax.tree.map(
        lambda new, old: jnp.where(
            supported.reshape((-1,) + (1,) * (new.ndim - 1)), new, old
        )
        if new.ndim >= 1
        else new,
        scaled,
        meta,
    )

    mass_new, I_com_new = compute_mass_and_inertia(scaled)
    com_new = scaled.L_H_G[:, :3, 3]
    L_R_G = scaled.L_H_G[:, :3, :3]
    I_link_oriented = jnp.einsum("lij,ljk,lmk->lim", L_R_G, I_com_new, L_R_G)

    lp = kdp.link_parameters
    mass = jnp.where(supported[:, 0], mass_new, lp.mass)
    com = jnp.where(supported, com_new, lp.center_of_mass)
    inertia_elems = jnp.where(
        supported,
        LinkParameters.flatten_inertia(I_link_oriented),
        lp.inertia_elements,
    )
    link_parameters = lp.replace(
        mass=mass, center_of_mass=com, inertia_elements=inertia_elems
    )

    # Update child-joint placements λ_H_pre: joint j gets the row of its
    # parent link when that link is supported.
    lambda_H_pre = kdp.joint_model.lambda_H_pre
    parent_array = jnp.array(kdp.parent_array_static, dtype=int)
    nj = kdp.number_of_joints()
    if nj > 0:
        joint_rows = jnp.arange(1, nj + 1)
        parent_links = parent_array[joint_rows]
        new_rows = scaled.L_H_pre[parent_links, joint_rows]
        parent_supported = (meta.link_shape != LinkShape.Unsupported)[parent_links]
        updated = jnp.where(
            parent_supported[:, None, None],
            new_rows,
            lambda_H_pre[1:],
        )
        lambda_H_pre = lambda_H_pre.at[1:].set(updated)
    joint_model = kdp.joint_model.replace(lambda_H_pre=lambda_H_pre)

    # Rescale contact points.
    contact_parameters = kdp.contact_parameters
    if len(contact_parameters.body) > 0:
        new_points = compute_contact_points(
            contact_parameters,
            meta.link_shape,
            kdp.link_parameters.center_of_mass,
            com,
            scaling_factors,
        )
        contact_parameters = contact_parameters.replace(point=new_points)

    new_kdp = kdp.replace(
        link_parameters=link_parameters,
        joint_model=joint_model,
        contact_parameters=contact_parameters,
        hw_link_metadata=scaled,
    )
    return model.replace(kin_dyn_parameters=new_kdp)


def with_hw_metadata(model):
    """Return a model whose kin_dyn_parameters carry hardware metadata."""
    meta = compute_hw_link_metadata(model)
    return model.replace(
        kin_dyn_parameters=model.kin_dyn_parameters.replace(hw_link_metadata=meta)
    )


# ----------------------------------------------------------------------
# URDF export (offline)
# ----------------------------------------------------------------------


def export_updated_model(model) -> str:
    """Export the current (possibly rescaled) model as a URDF string
    (role of reference ``api/model.py:514-668``; non-JIT)."""
    kdp = model.kin_dyn_parameters
    lp = kdp.link_parameters
    masses = np.asarray(lp.mass)
    coms = np.asarray(lp.center_of_mass)
    inertias = np.asarray(
        jax.vmap(LinkParameters.unflatten_inertia)(lp.inertia_elements)
    )
    names = model.link_names()
    lambda_H_pre = np.asarray(kdp.joint_model.lambda_H_pre)
    axes = np.asarray(kdp.joint_model.joint_axis)
    types = kdp.joint_model.joint_types
    joint_names = kdp.joint_model.joint_names
    parent_static = kdp.parent_array_static

    def rpy_from_R(R):
        sy = np.sqrt(R[0, 0] ** 2 + R[1, 0] ** 2)
        if sy > 1e-6:
            return (
                np.arctan2(R[2, 1], R[2, 2]),
                np.arctan2(-R[2, 0], sy),
                np.arctan2(R[1, 0], R[0, 0]),
            )
        return (np.arctan2(-R[1, 2], R[1, 1]), np.arctan2(-R[2, 0], sy), 0.0)

    parts = [f'<robot name="{model.name()}">']
    if model.fixed_base():
        parts.append('  <link name="world"/>')
        parts.append(
            '  <joint name="world_to_base" type="fixed">'
            f'<parent link="world"/><child link="{names[0]}"/></joint>'
        )

    for i, name in enumerate(names):
        I = inertias[i]
        parts.append(
            f'  <link name="{name}"><inertial>'
            f'<origin xyz="{coms[i][0]} {coms[i][1]} {coms[i][2]}"/>'
            f'<mass value="{masses[i]}"/>'
            f'<inertia ixx="{I[0, 0]}" ixy="{I[0, 1]}" ixz="{I[0, 2]}"'
            f' iyy="{I[1, 1]}" iyz="{I[1, 2]}" izz="{I[2, 2]}"/>'
            "</inertial></link>"
        )

    type_names = {0: "fixed", 1: "revolute", 2: "prismatic"}
    for j in range(1, len(joint_names)):
        H = lambda_H_pre[j]
        rpy = rpy_from_R(H[:3, :3])
        parent = names[parent_static[j]]
        child = names[j]
        axis = axes[j - 1]
        jp = kdp.joint_parameters
        lo = float(np.asarray(jp.position_limits_min)[j - 1])
        hi = float(np.asarray(jp.position_limits_max)[j - 1])
        lo = lo if np.isfinite(lo) else -3.14159
        hi = hi if np.isfinite(hi) else 3.14159
        parts.append(
            f'  <joint name="{joint_names[j]}" type="{type_names[types[j]]}">'
            f'<origin xyz="{H[0, 3]} {H[1, 3]} {H[2, 3]}"'
            f' rpy="{rpy[0]} {rpy[1]} {rpy[2]}"/>'
            f'<parent link="{parent}"/><child link="{child}"/>'
            f'<axis xyz="{axis[0]} {axis[1]} {axis[2]}"/>'
            f'<limit lower="{lo}" upper="{hi}" effort="1000" velocity="100"/>'
            "</joint>"
        )
    parts.append("</robot>")
    return "\n".join(parts)

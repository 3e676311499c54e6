"""Mesh point-extraction strategies (reference ``tests/test_meshes.py:6-66``)."""

import numpy as np

from jaxsim_tpu.parsers import meshes


def _cube_vertices():
    return np.array(
        [[x, y, z] for x in (-1, 1) for y in (-1, 1) for z in (-1, 1)],
        dtype=float,
    )


def test_vertex_extraction():
    v = _cube_vertices()
    out = meshes.VertexExtraction()(vertices=v)
    assert out.shape == (8, 3)


def test_random_surface_sampling():
    v = _cube_vertices()
    out = meshes.RandomSurfaceSampling(num_points=4)(vertices=v)
    assert out.shape == (4, 3)
    # Deterministic under the same seed.
    out2 = meshes.RandomSurfaceSampling(num_points=4)(vertices=v)
    np.testing.assert_array_equal(out, out2)


def test_object_mapping_extraction():
    v = _cube_vertices()
    low = meshes.ObjectMappingExtraction(axis="z", direction="lower", num_points=4)(
        vertices=v
    )
    assert np.all(low[:, 2] == -1)
    high = meshes.ObjectMappingExtraction(axis="z", direction="higher", num_points=4)(
        vertices=v
    )
    assert np.all(high[:, 2] == 1)


def test_aap_extraction():
    v = _cube_vertices()
    out = meshes.AapExtraction(axis="z", operator="<", value=0.0)(vertices=v)
    assert out.shape == (4, 3)
    assert np.all(out[:, 2] < 0)
    import pytest

    with pytest.raises(ValueError):
        meshes.AapExtraction(axis="z", operator="!", value=0.0)(vertices=v)


def test_stl_roundtrip(tmp_path):
    """Binary STL written by hand → vertex extraction."""
    import struct

    from jaxsim_tpu.parsers.mesh_io import load_mesh_vertices

    tri = np.array(
        [
            [[0, 0, 0], [1, 0, 0], [0, 1, 0]],
            [[0, 0, 0], [0, 1, 0], [0, 0, 1]],
        ],
        dtype="<f4",
    )
    blob = b"\x00" * 80 + struct.pack("<I", len(tri))
    for t in tri:
        blob += b"\x00" * 12  # normal
        blob += t.tobytes()
        blob += b"\x00\x00"  # attribute byte count
    path = tmp_path / "mesh.stl"
    path.write_bytes(blob)
    verts = load_mesh_vertices(path)
    assert verts.shape == (4, 3)  # unique vertices

import numpy as np

from fmov_pose_tpu.native.mc import marching_cubes


def sphere_grid(res=48, radius=0.5):
    lin = np.linspace(-1, 1, res, dtype=np.float32)
    x, y, z = np.meshgrid(lin, lin, lin, indexing="ij")
    return np.sqrt(x**2 + y**2 + z**2) - radius


def test_sphere_surface():
    res = 48
    grid = sphere_grid(res)
    verts, tris = marching_cubes(-grid, 0.0)  # reference meshes -sdf
    assert len(verts) > 100
    assert len(tris) > 100
    # rescale voxel -> world
    world = verts / (res - 1.0) * 2.0 - 1.0
    radii = np.linalg.norm(world, axis=-1)
    np.testing.assert_allclose(radii, 0.5, atol=0.05)
    assert tris.min() >= 0 and tris.max() < len(verts)


def test_empty_grid():
    grid = np.ones((16, 16, 16), dtype=np.float32)
    verts, tris = marching_cubes(grid, 0.0)
    assert len(verts) == 0 and len(tris) == 0


def test_vertices_deduplicated():
    verts, tris = marching_cubes(-sphere_grid(24), 0.0)
    # every vertex should be referenced by >= 2 triangles on a closed surface
    counts = np.bincount(tris.reshape(-1), minlength=len(verts))
    assert (counts >= 2).mean() > 0.95


def test_mesh_closed_volume():
    """Signed volume of a closed surface ~ sphere volume (orientation up to
    sign)."""
    res = 64
    verts, tris = marching_cubes(-sphere_grid(res), 0.0)
    world = verts / (res - 1.0) * 2.0 - 1.0
    a, b, c = world[tris[:, 0]], world[tris[:, 1]], world[tris[:, 2]]
    vol = np.abs(np.einsum("ij,ij->i", a, np.cross(b, c)).sum() / 6.0)
    expected = 4.0 / 3.0 * np.pi * 0.5**3
    np.testing.assert_allclose(vol, expected, rtol=0.05)


def test_extract_geometry_api():
    import jax.numpy as jnp

    from fmov_pose_tpu.render.geometry import extract_geometry

    def query(pts):
        return 0.5 - jnp.linalg.norm(pts, axis=-1)  # -sdf of sphere

    verts, tris = extract_geometry([-1.0] * 3, [1.0] * 3, 32, 0.0, query)
    radii = np.linalg.norm(verts, axis=-1)
    np.testing.assert_allclose(radii, 0.5, atol=0.08)

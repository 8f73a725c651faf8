"""trimesh shim backed by pipeline/meshio.py.

Reference usage surface:
  - `trimesh.Trimesh(vertices, triangles, vertex_colors=color)` then
    `.export(path)` (`exp_runner.py:1673-1675`)
  - `trimesh.load(path)` / `load_mesh(path)` -> `.vertices`, `.faces`
    (`utils/align_poses.py:58`, `utils/textured_mesh.py:163`)
  - `.bounding_box_oriented.vertices` (`exp_runner.py:1826`, PCA OBB
    corners; interpolation mode only)
"""

import numpy as np

from fmov_pose_tpu.pipeline.meshio import read_ply, write_ply

__all__ = ["Trimesh", "load", "load_mesh"]


class _OBB:
    def __init__(self, vertices):
        v = np.asarray(vertices, np.float64)
        c = v.mean(axis=0)
        centered = v - c
        # principal axes; corners of the min/max extent box in that frame
        _, _, vt = np.linalg.svd(centered, full_matrices=False)
        proj = centered @ vt.T
        lo, hi = proj.min(axis=0), proj.max(axis=0)
        corners = np.array([[x, y, z]
                            for x in (lo[0], hi[0])
                            for y in (lo[1], hi[1])
                            for z in (lo[2], hi[2])])
        self.vertices = corners @ vt + c


class Trimesh:
    def __init__(self, vertices, faces, vertex_colors=None, process=True):
        self.vertices = np.asarray(vertices)
        self.faces = np.asarray(faces)
        self.vertex_colors = vertex_colors

    def export(self, path):
        write_ply(path, self.vertices, self.faces,
                  vertex_colors=self.vertex_colors)
        return path

    @property
    def bounding_box_oriented(self):
        return _OBB(self.vertices)

    def apply_transform(self, T):
        T = np.asarray(T)
        v = self.vertices @ T[:3, :3].T + T[:3, 3]
        self.vertices = v
        return self


def load(path, **kwargs):
    verts, faces = read_ply(str(path))
    return Trimesh(verts, faces)


load_mesh = load

"""open3d shim — geometry data-holders for the reference's pose vis.

Surface: `utils/nope_nerf_utils_poses/vis_cam_traj.py` (LineSet built
from frustums, `TriangleMesh.create_sphere`, `LineSet.
create_from_triangle_mesh`, `paint_uniform_color`) and
`utils/draw_plotly.py` (Geometry.Type dispatch, bounds/centers/colors).
Pure numpy containers; no rendering here (plotly shim draws the PNG).
"""

import numpy as np

__all__ = ["geometry", "utility", "visualization"]


def _arr(x):
    return np.asarray(x, np.float64)


class _Vector:
    """Mimics o3d.utility.Vector3dVector: np.asarray()-able container."""

    _dtype = np.float64

    def __init__(self, data):
        self._data = np.asarray(data, self._dtype)

    def __array__(self, dtype=None):
        return self._data.astype(dtype) if dtype else self._data

    def __len__(self):
        return len(self._data)


class _GeometryType:
    PointCloud = 1
    TriangleMesh = 6
    LineSet = 4


class _Geometry:
    Type = _GeometryType

    def get_max_bound(self):
        return self._points().max(axis=0)

    def get_min_bound(self):
        return self._points().min(axis=0)

    def get_center(self):
        return self._points().mean(axis=0)

    def paint_uniform_color(self, color):
        n = len(self._points())
        self.colors = _Vector(np.tile(_arr(color)[None, :], (n, 1)))
        return self


class LineSet(_Geometry):
    def __init__(self, points=None, lines=None):
        self.points = _Vector(points if points is not None else np.zeros((0, 3)))
        self.lines = _IntVector(lines if lines is not None else np.zeros((0, 2)))
        self.colors = _Vector(np.zeros((0, 3)))

    def _points(self):
        return np.asarray(self.points)

    def get_geometry_type(self):
        return _GeometryType.LineSet

    @staticmethod
    def create_from_triangle_mesh(mesh):
        tris = np.asarray(mesh.triangles, np.int64)
        edges = np.concatenate([tris[:, [0, 1]], tris[:, [1, 2]],
                                tris[:, [2, 0]]], axis=0)
        edges = np.unique(np.sort(edges, axis=1), axis=0)
        return LineSet(points=np.asarray(mesh.vertices), lines=edges)


class TriangleMesh(_Geometry):
    def __init__(self, vertices=None, triangles=None):
        self.vertices = _Vector(vertices if vertices is not None else np.zeros((0, 3)))
        self.triangles = _Vector(triangles if triangles is not None else np.zeros((0, 3)))
        self.colors = _Vector(np.zeros((0, 3)))

    def _points(self):
        return np.asarray(self.vertices)

    def get_geometry_type(self):
        return _GeometryType.TriangleMesh

    @staticmethod
    def create_sphere(radius=1.0, resolution=20):
        # lat-long sphere; only used as a wireframe guide in pose vis
        n = max(resolution * 2, 4)
        m = max(resolution, 2) + 1
        theta = np.linspace(0, np.pi, m)
        phi = np.linspace(0, 2 * np.pi, n, endpoint=False)
        t, p = np.meshgrid(theta, phi, indexing="ij")
        pts = radius * np.stack([np.sin(t) * np.cos(p),
                                 np.sin(t) * np.sin(p),
                                 np.cos(t)], axis=-1).reshape(-1, 3)
        tris = []
        for i in range(m - 1):
            for j in range(n):
                a, b = i * n + j, i * n + (j + 1) % n
                c, d = a + n, b + n
                tris.append([a, b, c])
                tris.append([b, d, c])
        return TriangleMesh(vertices=pts, triangles=np.array(tris))


class PointCloud(_Geometry):
    def __init__(self, points=None):
        self.points = _Vector(points if points is not None else np.zeros((0, 3)))
        self.colors = _Vector(np.zeros((0, 3)))
        self.normals = _Vector(np.zeros((0, 3)))

    def _points(self):
        return np.asarray(self.points)

    def get_geometry_type(self):
        return _GeometryType.PointCloud

    def has_colors(self):
        return len(self.colors) > 0

    def has_normals(self):
        return len(self.normals) > 0


class _GeometryNS:
    Geometry = _Geometry
    LineSet = LineSet
    TriangleMesh = TriangleMesh
    PointCloud = PointCloud


class _IntVector(_Vector):
    _dtype = np.int64


class _UtilityNS:
    Vector3dVector = _Vector
    Vector2iVector = _IntVector


class _VisualizationNS:
    @staticmethod
    def draw_geometries(*args, **kwargs):
        pass


geometry = _GeometryNS
utility = _UtilityNS
visualization = _VisualizationNS

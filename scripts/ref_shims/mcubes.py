"""PyMCubes shim -> first-party native marching cubes (native/mc.py).

The reference calls only `mcubes.marching_cubes(u, threshold)`
(`models/renderer.py:43`); our native implementation follows the same
voxel-coordinate convention.
"""

from fmov_pose_tpu.native.mc import marching_cubes  # noqa: F401

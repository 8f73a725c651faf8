"""Import shims that let the UNMODIFIED torch reference run on this box.

The reference (/root/reference, read-only) imports pyhocon, trimesh,
mcubes, plyfile, open3d, plotly, dash and xatlas — none of which are
installed (and nothing may be pip-installed).  Each shim implements just
the API surface the reference actually exercises, delegating the real
work to fmov-tpu first-party code (HOCON parser `data/hocon.py`, native
marching cubes `native/mc.py`, PLY IO `pipeline/meshio.py`).

Used only by scripts/run_reference.py (the head-to-head harness); the
shim directory is prepended to sys.path so `import pyhocon` etc resolve
here inside the reference process.
"""

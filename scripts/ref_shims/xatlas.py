"""xatlas shim — `utils/textured_mesh.py:1` imports it at module scope
(pulled in by exp_runner's top-level import); the head-to-head training
workflow never parametrizes a mesh.  Our own framework replaces xatlas
with a first-party grid atlas (`fmov_pose_tpu/pipeline/textured.py`)."""


def parametrize(*args, **kwargs):
    raise RuntimeError(
        "xatlas shim: UV parametrization is not available in the "
        "reference head-to-head harness")

"""plotly shim for the reference's pose-trajectory PNG export."""

from . import graph_objects  # noqa: F401

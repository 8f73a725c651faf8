"""plotly.graph_objects shim.

`utils/draw_plotly.py` builds Scatter3d/Mesh3d traces and calls
`go.Figure(data=..., layout=...)` -> `fig.update_layout(...)` ->
`fig.write_image(save_path)`.  Traces are kwargs holders; write_image
renders the line/marker traces with matplotlib (isometric projection)
so the saved pose-vis PNGs are real images, not empty files.
"""

import numpy as np

__all__ = ["Figure", "Scatter3d", "Mesh3d"]


class _Trace:
    def __init__(self, **kwargs):
        self.kwargs = kwargs


class Scatter3d(_Trace):
    pass


class Mesh3d(_Trace):
    pass


def _iso(x, y, z):
    # simple isometric projection for a legible 2D rendering
    x, y, z = (np.asarray(v, np.float64) for v in (x, y, z))
    return x - 0.5 * y, z + 0.25 * y


class Figure:
    def __init__(self, data=None, layout=None):
        self.data = list(data or [])
        self.layout = layout or {}

    def update_layout(self, **kwargs):
        self.layout.update(kwargs)
        return self

    def add_trace(self, trace):
        self.data.append(trace)
        return self

    def write_image(self, path, **kwargs):
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(6, 4), dpi=100)
        for tr in self.data:
            kw = tr.kwargs
            if not isinstance(tr, Scatter3d):
                continue
            x = [v if v is not None else np.nan for v in kw.get("x", [])]
            y = [v if v is not None else np.nan for v in kw.get("y", [])]
            z = [v if v is not None else np.nan for v in kw.get("z", [])]
            if len(x) == 0:
                continue
            px, py = _iso(x, y, z)
            mode = kw.get("mode", "lines")
            if "lines" in mode:
                ax.plot(px, py, linewidth=0.7)
            else:
                ax.scatter(px, py, s=1)
        ax.set_aspect("equal", adjustable="datalim")
        ax.axis("off")
        fig.savefig(path, bbox_inches="tight")
        plt.close(fig)

    def write_html(self, path, **kwargs):
        with open(path, "w") as f:
            f.write("<html><body>plotly shim</body></html>")

    def show(self, *a, **k):
        pass

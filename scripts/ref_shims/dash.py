"""dash shim — `utils/draw_plotly.py` imports html/dcc/Dash at module
scope but only uses them in `draw_plotly_server`, which the training
workflow never calls."""


class _Stub:
    def __init__(self, *a, **k):
        raise RuntimeError("dash shim: draw_plotly_server is not supported")

    def __getattr__(self, name):
        raise RuntimeError("dash shim: draw_plotly_server is not supported")


class _NS:
    def __getattr__(self, name):
        return _Stub


html = _NS()
dcc = _NS()
Dash = _Stub

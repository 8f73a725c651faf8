"""easydict shim — attribute-style dict (`models/camera.py:5`)."""


class EasyDict(dict):
    def __init__(self, d=None, **kwargs):
        super().__init__()
        if d:
            for k, v in dict(d).items():
                self[k] = v
        for k, v in kwargs.items():
            self[k] = v

    def __setitem__(self, k, v):
        if isinstance(v, dict) and not isinstance(v, EasyDict):
            v = EasyDict(v)
        super().__setitem__(k, v)
        super().__setattr__(k, v)

    __setattr__ = __setitem__

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

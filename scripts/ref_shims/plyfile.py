"""plyfile shim — the reference only WRITES point clouds with it.

Usage surface (`models/dataset.py:52`, `utils/util.py:75`):
    vertices = np.array([...], dtype=[("x", "f4"), ...])
    ply = PlyData([PlyElement.describe(vertices, "vertex")], text=True)
    ply.write(path)
"""

import numpy as np

__all__ = ["PlyData", "PlyElement"]

_TYPE = {"f4": "float", "f8": "double", "u1": "uchar", "i4": "int",
         "u4": "uint", "i2": "short", "u2": "ushort", "i1": "char"}


class PlyElement:
    def __init__(self, name, data):
        self.name = name
        self.data = np.asarray(data)

    @staticmethod
    def describe(data, name):
        return PlyElement(name, data)


class PlyData:
    def __init__(self, elements, text=False):
        self.elements = list(elements)
        self.text = text

    def write(self, path):
        lines = ["ply", "format ascii 1.0"]
        for el in self.elements:
            lines.append(f"element {el.name} {len(el.data)}")
            for fname in el.data.dtype.names:
                base = el.data.dtype[fname]
                code = f"{base.kind}{base.itemsize}"
                lines.append(f"property {_TYPE.get(code, 'float')} {fname}")
        lines.append("end_header")
        close = False
        if not hasattr(path, "write"):
            path = open(path, "w")
            close = True
        try:
            path.write("\n".join(lines) + "\n")
            for el in self.elements:
                for row in el.data:
                    path.write(" ".join(str(row[n])
                                        for n in el.data.dtype.names) + "\n")
        finally:
            if close:
                path.close()

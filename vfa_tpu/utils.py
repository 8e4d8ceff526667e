"""Small shared utilities (reference: `vfa/utils.py`)."""

from __future__ import annotations

import os
from collections import defaultdict, namedtuple

import numpy as np

# for MultiviewC-style 3D detection (`vfa/utils.py:10-11`)
Obj3D = namedtuple("Obj3D", ["classname", "dimension", "location", "rotation", "conf"])
# for MultiviewX / Wildtrack 2D detection (`vfa/utils.py:13-14`)
Obj2D = namedtuple("Obj2D", ["classname", "location", "conf"])


class MetricDict(defaultdict):
    """Running means of scalar metrics (`vfa/utils.py:61-73`)."""

    def __init__(self):
        super().__init__(float)
        self.count = defaultdict(int)

    def __add__(self, other):
        for key, value in other.items():
            self[key] += value
            self.count[key] += 1
        return self

    @property
    def mean(self):
        return {key: self[key] / self.count[key] for key in self.keys()}


def to_numpy(data) -> np.ndarray:
    if isinstance(data, np.ndarray):
        return data
    if hasattr(data, "__array__"):
        return np.asarray(data)
    return np.array(data)


def grid_rot180(arr):
    """Rotate a BEV map 180 degrees for display (`vfa/utils.py:83-90`)."""
    if arr.ndim == 2:
        return arr[::-1, ::-1]
    return arr[:, ::-1, ::-1]


def record(save_path: str, content: str):
    """Append a line to a text log, creating the directory (`vfa/utils.py:92-97`)."""
    os.makedirs(os.path.dirname(save_path), exist_ok=True)
    with open(save_path, encoding="utf-8", mode="a") as f:
        f.write(content)


def pad_objects(objects, max_objects: int, mode: str):
    """Pad a python list of Obj3D/Obj2D into fixed-shape arrays for jit.

    Returns dict of np arrays: location (M,3), valid (M,), and for 3D mode
    dimension (M,3), rotation (M,). Invalid rows are zeros with valid=0.
    """
    m = len(objects)
    if m > max_objects:
        objects = objects[:max_objects]
        m = max_objects
    loc = np.zeros((max_objects, 3), np.float32)
    valid = np.zeros((max_objects,), np.float32)
    for i, o in enumerate(objects):
        loc[i] = np.asarray(o.location, np.float32).reshape(3)
        valid[i] = 1.0
    out = {"location": loc, "valid": valid}
    if mode == "3D":
        dim = np.zeros((max_objects, 3), np.float32)
        rot = np.zeros((max_objects,), np.float32)
        for i, o in enumerate(objects):
            dim[i] = np.asarray(o.dimension, np.float32).reshape(3)
            rot[i] = float(o.rotation)
        out["dimension"] = dim
        out["rotation"] = rot
    return out

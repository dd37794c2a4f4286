"""Procedural obstacle terrain: long thin boxes added pre-compile.

Behavioral parity with /root/reference/pupperv3_mjx/obstacles.py:16-57,
including its quirks: the layout is drawn host-side with Python's global
``random`` module seeded once per call (one terrain shared by all envs of a
compiled model), and the per-box yaw helper ignores its seed argument and
instead advances the global RNG — both preserved so seeded layouts match.
"""

from __future__ import annotations

import math
import random
import xml.etree.ElementTree as ET
from typing import Tuple


def random_z_rotation_quaternion(seed: int = 0):
    """Quaternion (w,x,y,z) for a uniform random yaw.

    NOTE: like the reference (obstacles.py:7-13), the ``seed`` argument is
    ignored; the draw advances the module-global RNG seeded by the caller.
    """
    yaw = random.uniform(-math.pi, math.pi)
    return [math.cos(yaw / 2.0), 0, 0, math.sin(yaw / 2.0)]


def add_boxes_to_model(
    tree: ET.ElementTree,
    n_boxes: int,
    x_range: Tuple,
    y_range: Tuple,
    height: float = 0.02,
    depth: float = 0.02,
    length: float = 3.0,
    group: str = "0",
    seed: int = 0,
) -> ET.ElementTree:
    """Scatter n long thin collision boxes on the floor of the worldbody."""
    worldbody = tree.getroot().find("worldbody")
    random.seed(seed)
    for i in range(n_boxes):
        x = random.uniform(*x_range)
        y = random.uniform(*y_range)
        quat = random_z_rotation_quaternion(seed=seed)
        ET.SubElement(
            worldbody,
            "geom",
            name=f"box_geom_{i}",
            pos=f"{x} {y} 0",
            quat=" ".join(str(v) for v in quat),
            type="box",
            size=f"{depth / 2.0} {length / 2.0} {height}",
            rgba="0.1 0.5 0.8 1",
            conaffinity="1",
            contype="1",
            condim="3",
            group=group,
        )
    return tree

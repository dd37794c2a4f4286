"""XML surgery round-trip tests (mirrors reference
test/test_set_starting_position.py + custom-options coverage)."""

import xml.etree.ElementTree as ET

import mujoco
import numpy as np

from puppax.model import obstacles, surgery
from puppax.model.assets import pupper_xml


def _tree():
    return ET.ElementTree(ET.fromstring(pupper_xml()))


def test_set_robot_starting_position():
    tree = surgery.set_robot_starting_position(
        _tree(), [1.0, 2.0, 3.0], [0.0, 0.0, 0.0, 1.0]
    )
    body = tree.find(".//worldbody/body[@name='base_link']")
    assert body.get("pos") == "1.0 2.0 3.0"
    assert body.get("quat") == "0.0 0.0 0.0 1.0"
    key = tree.find(".//keyframe/key[@name='home']")
    qpos = [float(v) for v in key.get("qpos").split()]
    np.testing.assert_allclose(qpos[:3], [1.0, 2.0, 3.0])
    np.testing.assert_allclose(qpos[3:7], [0.0, 0.0, 0.0, 1.0])
    # still compiles
    mujoco.MjModel.from_xml_string(ET.tostring(tree.getroot(), encoding="unicode"))


def test_set_robot_starting_position_no_quat():
    tree = surgery.set_robot_starting_position(_tree(), [0.5, 0.0, 0.3])
    key = tree.find(".//keyframe/key[@name='home']")
    qpos = [float(v) for v in key.get("qpos").split()]
    np.testing.assert_allclose(qpos[:3], [0.5, 0.0, 0.3])
    np.testing.assert_allclose(qpos[3:7], [1.0, 0.0, 0.0, 0.0])


def test_set_mjx_custom_options():
    tree = surgery.set_mjx_custom_options(_tree(), 9, 7)
    assert tree is not None
    vals = {
        n.get("name"): n.get("data")
        for n in tree.getroot().find("custom").findall("numeric")
    }
    assert vals["max_contact_points"] == "9"
    assert vals["max_geom_pairs"] == "7"


def test_set_mjx_custom_options_missing_custom():
    tree = ET.ElementTree(ET.fromstring("<mujoco><worldbody/></mujoco>"))
    assert surgery.set_mjx_custom_options(tree, 5, 4) is None


def test_add_boxes_to_model_deterministic():
    t1 = obstacles.add_boxes_to_model(_tree(), 5, (-3, 3), (-3, 3), seed=7)
    t2 = obstacles.add_boxes_to_model(_tree(), 5, (-3, 3), (-3, 3), seed=7)
    g1 = [g.attrib for g in t1.getroot().find("worldbody").iter("geom")
          if g.get("name", "").startswith("box_geom")]
    g2 = [g.attrib for g in t2.getroot().find("worldbody").iter("geom")
          if g.get("name", "").startswith("box_geom")]
    assert len(g1) == 5 and g1 == g2
    m = mujoco.MjModel.from_xml_string(
        ET.tostring(t1.getroot(), encoding="unicode")
    )
    assert m.ngeom >= 5

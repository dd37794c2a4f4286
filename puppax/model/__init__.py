"""puppax.model — L1 model/asset layer.

Host-side, once-per-build compilation of MJCF XML into an immutable numeric
``RobotModel`` pytree (the only place the MuJoCo C library is touched on the
hot path boundary), plus the XML-surgery helpers and procedural obstacle
terrain that the reference provides
(/root/reference/pupperv3_mjx/utils.py:145-199, obstacles.py:16-57).
"""

from puppax.model.mjcf import CompiledModel, RobotModel, load_model  # noqa: F401
from puppax.model.obstacles import add_boxes_to_model  # noqa: F401
from puppax.model.terrain import (  # noqa: F401
    add_heightfield_to_model,
    generate_heights,
)
from puppax.model.surgery import (  # noqa: F401
    set_mjx_custom_options,
    set_robot_starting_position,
)

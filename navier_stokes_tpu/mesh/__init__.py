from .mesh import Mesh
from .generators import (
    unit_square_mesh,
    cavity_mesh,
    channel_with_cylinder_mesh,
    channel_with_cylinder_mesh_3d,
    extrude_to_tets,
    polygon_mesh,
    rectangle_mesh,
)

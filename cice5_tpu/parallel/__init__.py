from cice5_tpu.parallel.halo import (Topology, extend, extend_wide,
                                     extend_wide_groups, interior,
                                     shifted, global_sum, global_min)
from cice5_tpu.parallel.mesh import (AXIS_X, AXIS_Y, best_mesh_shape, make_mesh,
                                     mesh_topology, spatial_spec)

__all__ = [
    "Topology", "extend", "extend_wide", "extend_wide_groups", "interior",
    "shifted", "global_sum",
    "global_min",
    "AXIS_X", "AXIS_Y", "best_mesh_shape", "make_mesh", "mesh_topology",
    "spatial_spec",
]

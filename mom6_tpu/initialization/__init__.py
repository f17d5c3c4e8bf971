"""State/coordinate initialization helpers beyond the analytic
configs in ``mom6_tpu.user.configs``: horizontal regridding of
climatology-style files and Z-space initial conditions.

Re-design of /root/reference/src/framework/MOM_horizontal_regridding.F90
and /root/reference/src/initialization/MOM_state_initialization.F90
(MOM_temp_salt_initialize_from_Z, :2407).
"""

from mom6_tpu.initialization.horizontal_regrid import (  # noqa: F401
    bilinear_regrid, fill_missing)
from mom6_tpu.initialization.z_init import (  # noqa: F401
    z_edges_from_centers, thickness_from_z_edges, temp_salt_from_z,
    tracer_from_z)

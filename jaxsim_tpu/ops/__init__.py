"""RBDA kernels (JIT-traceable physics) — layer 3.

Role of reference ``src/jaxsim/rbda/__init__.py``. All kernels take a
:class:`~jaxsim_tpu.api.kin_dyn_parameters.KinDynParameters` plus raw arrays
(no model object), so they vmap/shard cleanly.
"""

from .aba import aba
from .collidable_points import collidable_points_pos_vel
from .common import gravity_sixd, mtv, mv
from .crba import crba
from .fk import forward_kinematics_model
from .jacobian import (
    base_kinematics_sweep,
    jacobian_derivative_full_doubly_left,
    jacobian_full_doubly_left,
    link_jacobians_doubly_left,
)
from .mass_inverse import mass_inverse
from .rnea import rnea

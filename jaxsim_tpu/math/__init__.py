from .adjoint import Adjoint
from .cross import Cross
from .inertia import Inertia
from .quaternion import Quaternion
from .rotation import Rotation
from .skew import Skew
from .transform import Transform
from .utils import safe_norm

# Imported last: joint_model depends on the classes above.
from .joint_model import JointModel, JointType, supported_joint_motion  # noqa: E402

STANDARD_GRAVITY = 9.81

"""jaxsim-tpu: a TPU-native differentiable multibody simulator.

A from-scratch JAX/XLA/Pallas framework with the capabilities of JaxSim
(reference: ami-iit/jaxsim): reduced-coordinate rigid-body dynamics
(ABA/RNEA/CRBA/M⁻¹), point contacts against smooth terrain (soft, rigid QP,
relaxed-rigid), fixed-step integrators, URDF/SDF parsing, model reduction,
three 6D velocity representations, hardware-parameter co-design, and
end-to-end forward/reverse AD — designed TPU-first (float32, batched layouts,
compile-friendly control flow, ICI-sharded environment batches).

Precision policy (differs from the reference, which is x64-first —
``/root/reference/src/jaxsim/__init__.py:6-41``): this framework is
float32-first everywhere, which is the native TPU arithmetic. Set
``JAX_ENABLE_X64=1`` to run float64 on CPU for verification workloads.
"""

from __future__ import annotations

import os as _os

from . import logging

__version__ = "0.1.0"


def _setup_logging() -> None:
    logging.configure(level=logging.default_level())


def _setup_numerics() -> None:
    # float32 by default (TPU-native). Honor an explicit opt-in to x64 via the
    # standard JAX env var; never force it ourselves.
    if _os.environ.get("JAX_ENABLE_X64", "").lower() in ("1", "true"):
        import jax

        jax.config.update("jax_enable_x64", True)


_setup_logging()
_setup_numerics()

from . import exceptions, typing, utils  # noqa: E402
from . import math  # noqa: E402
from . import terrain  # noqa: E402
from . import parsers  # noqa: E402
from . import ops  # noqa: E402
from . import api  # noqa: E402
from . import models  # noqa: E402
from .api.common import VelRepr  # noqa: E402
from .api.data import JaxSimModelData  # noqa: E402
from .api.model import IntegratorType, JaxSimModel  # noqa: E402
from .api.references import JaxSimModelReferences  # noqa: E402

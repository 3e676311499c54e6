"""Functional user API (reference ``src/jaxsim/api/__init__.py``).

Usage pattern: ``import jaxsim_tpu.api as js`` then ``js.model.step(...)``,
``js.data.JaxSimModelData.build(...)``, etc.
"""

from . import common  # isort: skip
from . import kin_dyn_parameters  # isort: skip
from . import model  # isort: skip
from . import data  # isort: skip
from . import (
    actuation_model,
    com,
    contact,
    frame,
    hw_parameters,
    integrators,
    joint,
    link,
    ode,
    references,
)
from .common import VelRepr
from .data import JaxSimModelData
from .kin_dyn_parameters import KinDynParameters
from .model import IntegratorType, JaxSimModel
from .references import JaxSimModelReferences

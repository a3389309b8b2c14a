"""mpm_tpu — TPU-native MLS-MPM fluid simulation engine.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
Miotismon/mls-mpm-godot (see SURVEY.md at the repo root for the structural
analysis of the reference)."""

from .core.params import FluidParams, SimConfig, BC_SLIP, BC_STICK, BC_FRICTION
from .core.state import Grid, SimState, make_state, zero_grid
from .ops.interact import Interaction
from .ops.step import make_step
from .models.scenes import Scene, get_scene, SCENES

__version__ = "0.1.0"

__all__ = [
    "FluidParams",
    "SimConfig",
    "SimState",
    "Grid",
    "Interaction",
    "Scene",
    "make_state",
    "make_step",
    "zero_grid",
    "get_scene",
    "SCENES",
    "BC_SLIP",
    "BC_STICK",
    "BC_FRICTION",
]

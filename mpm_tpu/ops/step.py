"""Jitted multi-substep step functions.

The reference runs `sim_iterations` substeps per rendered frame
(MLSMPM2DFluid.cs:94-97, MLSMPM3DFluidMultithreadGPU.cs:241-249). The
TPU-native equivalent is a single jitted function per frame: substeps roll up
in a `lax.scan` so the whole frame is one XLA computation with no host
round-trips, and the particle state buffers are donated so the step updates
in place (the analogue of the reference's persistent SSBOs,
MLSMPM3DFluidMultithreadGPU.cs:317-322).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Sequence

import jax
import jax.numpy as jnp

from ..core.params import FluidParams, SimConfig
from ..core.state import SimState
from .interact import Interaction
from . import reference


SubstepFn = Callable[..., SimState]


def _frame(
    state: SimState,
    fp: FluidParams,
    interactions: tuple[Interaction, ...],
    *,
    config: SimConfig,
    substep_fn: SubstepFn,
    substeps: int,
) -> SimState:
    def body(s, _):
        return substep_fn(s, config, fp, interactions), None

    state, _ = jax.lax.scan(body, state, None, length=substeps)
    return state


def resolve_substep(mode: str) -> SubstepFn:
    """The substep function for a mode name (shared by make_step and the
    air-window engine, which fuses extra outputs into the same jit)."""
    if mode == "auto":
        mode = "bucketed"
    if mode == "reference":
        return reference.substep
    if mode == "binned":
        from . import binned

        return binned.substep
    if mode == "bucketed":
        # state must be a BucketState (ops/bucketed.from_simstate)
        from . import bucketed

        return bucketed.substep
    if mode == "pallas":
        from .pallas import step as pallas_step

        return pallas_step.substep
    raise ValueError(f"unknown step mode: {mode}")


def make_frame_fn(
    config: SimConfig,
    mode: str = "auto",
    substeps: int | None = None,
    interpret: bool = False,
) -> Callable[[SimState, FluidParams, tuple[Interaction, ...]], SimState]:
    """The UNjitted per-frame function (scan over substeps). `interpret`
    runs the Pallas kernels in interpret mode (CPU tests)."""
    substep_fn = resolve_substep(mode)
    if interpret and mode == "pallas":
        substep_fn = partial(substep_fn, interpret=True)
    return partial(
        _frame,
        config=config,
        substep_fn=substep_fn,
        substeps=substeps if substeps is not None else config.substeps,
    )


def make_step(
    config: SimConfig,
    mode: str = "auto",
    substeps: int | None = None,
    donate: bool = True,
) -> Callable[[SimState, FluidParams, tuple[Interaction, ...]], SimState]:
    """Build the jitted per-frame step.

    mode: "reference" (dense scatter oracle), "binned" (sort-based fast path),
    "pallas" (fused TPU kernels), or "auto" (best available for the backend).
    """
    fn = make_frame_fn(config, mode, substeps)
    return jax.jit(fn, donate_argnums=(0,) if donate else ())

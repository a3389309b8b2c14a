"""Simulation parameter containers.

The reference splits parameters into three tiers (SURVEY.md §5 "Config / flag
system"): compile-time consts in each sim core (grid_res, substeps — e.g.
reference mls-mpm/2d/fluid/MLSMPM2DFluid.cs:22-40), runtime-tunable push
constants (dt, gravity, EOS params — MLSMPM3DFluidMultithreadGPU.cs:444-503),
and per-frame interaction state (mouse/sphere position —
MLSMPM3DFluidMultithreadGPU.cs:618-642).

We mirror that split the TPU-native way:

- :class:`SimConfig` — static, hashable; passed as a static argument to
  ``jax.jit``. Changing one of these recompiles (the analogue of rebuilding
  a Vulkan pipeline).
- :class:`FluidParams` — a pytree of traced scalars; changing one of these
  does NOT recompile (the analogue of re-packing push constants).
- :class:`Interaction` (mpm_tpu.ops.interact) — traced per-frame state.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

# Boundary-condition flavors, matching the three commented variants in the
# reference (mls-mpm/2d/fluid_multithread/MLSMPM2DFluidMultithread.cs:354-368).
BC_SLIP = "slip"
BC_STICK = "stick"
BC_FRICTION = "friction"


@dataclasses.dataclass(frozen=True)
class SimConfig:
    """Static simulation configuration (hashable; static under jit).

    Defaults follow the flagship GPU variant
    (reference mls-mpm/3d/fluid_multithread_gpu/MLSMPM3DFluidMultithreadGPU.cs:43-98
    and compute_shaders/g2p.glsl:112-140).
    """

    grid_res: tuple[int, ...] = (64, 64, 64)
    num_particles: int = 0
    substeps: int = 2

    # True physical domain resolution when the ARRAYS cover only a window of
    # it (the air-window engine, ops/window.py): every physics POSITION —
    # particle clamps, wall springs, grid BC bands — is computed against
    # `domain_res`, while array extents/strides use `grid_res`. None means
    # grid_res IS the domain (the default, every non-windowed config). The
    # reference has no such split (its grid allocation always equals the
    # domain, MLSMPM3DFluidMultithreadGPU.cs:43); it exists here because air
    # cells cost real DMA+VPU work per slot on TPU (ARCHITECTURE.md
    # "Occupancy is the cost model"), so the engine shrinks the arrays to
    # the occupied y-range without changing the physics.
    domain_res: tuple[int, ...] | None = None

    # Grid-level boundary conditions (update_grid.glsl:60-66): the velocity
    # component normal to a face is zeroed within `bc_band_lo` cells of the low
    # face and for cells with index > res - 1 - bc_band_hi on the high face.
    # Reference slip: x < 2 || x > res - 3  ->  band_lo=2, band_hi=2.
    # Reference friction variant uses x > res - 4 -> band_hi=3
    # (MLSMPM2DFluidMultithread.cs:365-368).
    bc: str = BC_SLIP
    friction: float = 0.5
    bc_band_lo: int = 2
    bc_band_hi: int = 2

    # Particle-level position clamp after advection (g2p.glsl:115-119 clamps to
    # [2, res-2]; the 2D serial variant clamps to [1, res-2],
    # MLSMPM2DFluid.cs:379).
    clamp_lo: float = 2.0
    clamp_hi_offset: float = 2.0  # clamp upper bound = res - clamp_hi_offset

    # Predictive wall spring ("particle boundaries", g2p.glsl:131-140):
    # x_n = pos + vel (NOT scaled by dt); vel += stiffness * (wall - x_n) when
    # x_n is outside [wall_min, wall_max], wall_max = res - wall_max_offset.
    # 3D GPU: wall_min=3, wall_max=res-3, stiffness=1.
    # 2D serial: wall_min=2, wall_max=res-3 (res-1-wall_min), stiffness=0.5
    # (MLSMPM2DFluid.cs:408-416).
    wall_min: float = 3.0
    wall_max_offset: float = 3.0
    wall_stiffness: float = 1.0

    # The 2D serial variant computes the viscous strain as C with only the
    # off-diagonals symmetrized (diagonal left unscaled,
    # MLSMPM2DFluid.cs:276-281), while the 3D kernels use the full C + C^T
    # (p2g_2.glsl:103-105). `legacy_strain=True` reproduces the 2D form.
    legacy_strain: bool = False

    # int32 fixed-point grid accumulation for bit-reproducibility parity with
    # the reference's atomic path (MLSMPM3DFluidMultithreadGPU.cs:98,
    # p2g_1.glsl:34-37). The float path is already deterministic here (ordered
    # segment sums), so this exists for cross-checks, not for correctness.
    fixed_point: bool = False
    fixed_point_mult: float = 1.0e7

    # Binned fast path: max particles resident in one cell. The reference's
    # flagship packs ~4.6 particles/cell at rest (spacing 0.6,
    # MLSMPM3DFluidMultithreadGPU.cs:656-671); 16 leaves ~3.5x compression
    # headroom. Overflowing particles are dropped from P2G for that substep
    # and counted in diagnostics (see mpm_tpu/ops/binning.py).
    bin_capacity: int = 16

    dtype: Any = jnp.float32

    # Storage dtype for the bucket-state vel and C arrays ("float32" or
    # "bfloat16"). The substep is HBM-streaming-bound on this platform and
    # vel+C are 48 of the 68 bytes/slot of state; bf16 storage cuts that in
    # half. ALL arithmetic stays float32 — values are rounded only at the
    # HBM boundary, identically in the XLA and Pallas engines (so the
    # engines remain bit-identical to each other). pos/mass stay float32:
    # position precision compounds across substeps.
    storage_dtype: str = "float32"

    # Static specialization of the EOS exponent: a traced `ratio ** power`
    # lowers to exp(power * log(ratio)) — dozens of transcendental VPU ops
    # per slot. When the scene knows its exponent is fixed (the reference
    # hard-codes 7.0 or 4.0 per variant), setting it here lets the kernels
    # unroll the power into 2-3 multiplies. 0.0 = use the traced
    # FluidParams.eos_power (fully runtime-tunable, slower).
    eos_power_static: float = 0.0

    # ---- derived ----
    @property
    def dres(self) -> tuple[int, ...]:
        """True domain resolution: domain_res if windowed, else grid_res.
        Use for every physics POSITION (clamps, springs, BC bands);
        use grid_res for array extents and strides."""
        return self.domain_res if self.domain_res is not None else self.grid_res

    @property
    def vc_dtype(self):
        return jnp.bfloat16 if self.storage_dtype == "bfloat16" else jnp.float32

    @property
    def dim(self) -> int:
        return len(self.grid_res)

    @property
    def num_cells(self) -> int:
        return math.prod(self.grid_res)

    def replace(self, **kw) -> "SimConfig":
        return dataclasses.replace(self, **kw)


def _dataclass_pytree(cls):
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])
    return cls


@_dataclass_pytree
@dataclasses.dataclass
class FluidParams:
    """Runtime-tunable fluid parameters (traced pytree; no recompiles).

    Values are the reference defaults shared by all variants
    (MLSMPM2DFluid.cs:30-40, MLSMPM3DFluidMultithreadGPU.cs:57-84).
    `gravity` is a D-vector: the 2D scenes use +y (screen-down, 0.3,
    MLSMPM2DFluid.cs:33), the 3D scenes -y (-0.3,
    MLSMPM3DFluidMultithread.cs:33).
    """

    dt: jax.Array
    gravity: jax.Array
    rest_density: jax.Array
    dynamic_viscosity: jax.Array
    eos_stiffness: jax.Array
    eos_power: jax.Array
    # Negative-pressure clamp preventing particle clumping
    # (MLSMPM2DFluid.cs:265-267, p2g_2.glsl:94).
    pressure_floor: jax.Array

    @staticmethod
    def create(
        dim: int,
        dt: float = 0.2,
        gravity: float | Sequence[float] | None = None,
        rest_density: float = 4.0,
        dynamic_viscosity: float = 0.1,
        eos_stiffness: float = 10.0,
        eos_power: float = 7.0,
        pressure_floor: float = -0.1,
        dtype=jnp.float32,
    ) -> "FluidParams":
        if gravity is None:
            # 2D: +0.3 on y (screen down); 3D: -0.3 on y.
            gravity = (0.0, 0.3) if dim == 2 else (0.0, -0.3, 0.0)
        elif isinstance(gravity, (int, float)):
            g = [0.0] * dim
            g[1] = float(gravity)
            gravity = tuple(g)
        return FluidParams(
            dt=np.asarray(dt, dtype),
            gravity=np.asarray(gravity, dtype),
            rest_density=np.asarray(rest_density, dtype),
            dynamic_viscosity=np.asarray(dynamic_viscosity, dtype),
            eos_stiffness=np.asarray(eos_stiffness, dtype),
            eos_power=np.asarray(eos_power, dtype),
            pressure_floor=np.asarray(pressure_floor, dtype),
        )

    def replace(self, **kw) -> "FluidParams":
        kw = {k: np.asarray(v, self.dt.dtype) for k, v in kw.items()}
        return dataclasses.replace(self, **kw)

"""Distributed SSFR render composite — BASELINE config 5's render clause
("16M on 256^3 sharded over TPU mesh ... + SSFR depth/thickness render").

The reference's sim->render handoff writes the render texture inside the
g2p compute pass (g2p.glsl:149-150) into a single-GPU storage image
(MLSMPM3DFluidMultithreadGPU.cs:342-355). The SPMD analogue, one jit per
frame:

  1. per shard: the sharded substeps (parallel/domain.py machinery), with
     kernel F EMITTING the per-cell splats on the last substep — each
     shard produces splats only for its own x-slab's cells;
  2. per shard: the raw z-buffer scatter-min over the local splats
     (render/splat.zbuffer_cells) — a full [H, W] depth buffer (and the
     packed velocity key for the velocity/lit modes);
  3. depth-min composite across the mesh: ONE `lax.pmin` of [H, W] per
     frame (~0.9 MB at 640x360 over ICI). Min over disjoint cell subsets
     equals the global min BIT-EXACTLY, so the composite needs no merge
     protocol — the same property that makes the sim's overflow rejection
     merge-free (ARCHITECTURE.md "Sharding");
  4. dilation + SSFR chain + u8 tonemap once, on the composited buffers
     (replicated across shards by the pmin).

Rendering a sharded run previously meant gathering the full bucket state to
one device — prohibitive at dense 16M, the very reason the state is
sharded. Here per-frame cross-device traffic is the [H, W] buffer, not the
state.
"""

from __future__ import annotations

import dataclasses as _dc

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..core.params import FluidParams, SimConfig
from ..render.pipeline import (
    RENDER_DEFAULT,
    RenderConfig,
    _active_crop,
    _needs_velocity,
    frame_to_u8,
    render_frame_from_zbuffer,
)


def make_sharded_frame_step(
    config: SimConfig,
    mesh: Mesh,
    rc: RenderConfig,
    substeps: int | None = None,
    axis: str = "x",
    interpret: bool = False,
    cubemap_faces=None,
    donate: bool = True,
):
    """Jitted (state, fluid, interactions, view, bg) -> (state, u8 frame)
    over a sharded BucketState: the sharded production substeps with
    in-kernel splat emission on the last, the per-shard z-buffer, the pmin
    composite, and the SSFR chain — one dispatch per frame, like the
    single-device make_full_frame_step."""
    from ..ops.pallas.fused import (
        _g2p_migrate_fused,
        _pack_scals,
        render_scals_for,
    )
    from ..ops.pallas.p2g_fused import p2g1_shard_pallas, p2g2u_shard_pallas
    from ..render.splat import zbuffer_cells
    from .domain import (
        _bucket_pspecs,
        _exchange_gvel,
        _exchange_state_halo,
        _plane_cells,
    )

    n = mesh.shape[axis]
    assert config.grid_res[0] % n == 0
    loc_x = config.grid_res[0] // n
    assert loc_x >= 2, "slabs must hold >= 2 planes (the halo depth)"
    pc = _plane_cells(config)
    nsub = substeps if substeps is not None else config.substeps
    pspecs = _bucket_pspecs(axis)
    cam = rc.camera
    with_vel = _needs_velocity(rc)
    with_thick = rc.ssfr.thickness_pass and rc.mode == RENDER_DEFAULT
    # static fluid crop (camera.crop_for_aabb): per-shard z-buffers, the
    # pmin/psum composites (LESS ICI traffic), and the SSFR chain all run
    # on the crop rectangle
    crop = _active_crop(rc)

    def substep_local(state, fp, interactions, rscals=None):
        ax = jax.lax.axis_index(axis)
        dtype = state.pos.dtype
        x0f = (ax * loc_x - 2).astype(dtype)
        padded = _exchange_state_halo(state, config, n, axis)
        gmass = p2g1_shard_pallas(padded, fp, config, x0f, interpret=interpret)
        gmass = _exchange_gvel(gmass, loc_x, n, axis)
        gvel = p2g2u_shard_pallas(
            padded, gmass, fp, config, x0f, interpret=interpret
        )
        gvel = _exchange_gvel(gvel, loc_x, n, axis)
        scals = _pack_scals(fp, interactions, dtype, x0=x0f)
        emit = rscals is not None
        if emit:
            scals = jnp.concatenate([scals, rscals.astype(dtype)])
        out = _g2p_migrate_fused(
            padded, gvel, scals, config, len(interactions),
            shard=True, interpret=interpret, emit_splats=emit,
        )
        out, splats = out if emit else (out, None)
        lo = 2 * pc
        hi = (loc_x + 2) * pc
        out = _dc.replace(
            out,
            pos=out.pos[..., lo:hi],
            vel=out.vel[..., lo:hi],
            C=out.C[..., lo:hi],
            mass=out.mass[..., lo:hi],
            ids=out.ids[..., lo:hi],
        )
        if emit:
            # halo planes' splats are redundantly computed from incomplete
            # state — drop them; the interior splats are exact and disjoint
            # across shards
            return out, splats[:, lo:hi]
        return out

    def local(state, fp, interactions, rscals):
        c0 = (state.lost, state.cfl_clamped, state.deferred, state.ceiling)

        def body(s, _):
            return substep_local(s, fp, interactions), None

        if nsub > 1:
            state, _ = jax.lax.scan(body, state, None, length=nsub - 1)
        state, splats = substep_local(state, fp, interactions, rscals=rscals)
        state = _dc.replace(
            state,
            lost=c0[0] + jax.lax.psum(state.lost - c0[0], axis),
            cfl_clamped=c0[1] + jax.lax.psum(state.cfl_clamped - c0[1], axis),
            deferred=c0[2] + jax.lax.psum(state.deferred - c0[2], axis),
            ceiling=c0[3] + jax.lax.psum(state.ceiling - c0[3], axis),
        )
        # per-shard z-buffer -> depth-min composite over the mesh: the
        # distributed z-test (step 3 of the module docstring)
        d, key = zbuffer_cells(splats, cam, with_velocity=with_vel,
                               crop=crop)
        d = jax.lax.pmin(d, axis)
        outs = (state, d)
        if key is not None:
            outs = outs + (jax.lax.pmin(key, axis),)
        if with_thick:
            # the thickness pass is ADDITIVE, so its mesh composite is the
            # psum of the per-shard deposits (render/splat.thickness_deposit)
            from ..render.splat import thickness_deposit

            tdep = thickness_deposit(
                splats, cam, sphere_radius=rc.ssfr.particle_sphere_radius,
                crop=crop)
            outs = outs + (jax.lax.psum(tdep, axis),)
        return outs

    out_specs = (pspecs, P()) + (P(),) * (int(with_vel) + int(with_thick))

    def frame(state, fp, interactions, view, bg):
        rscals = render_scals_for(view, cam)
        outs = jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(pspecs, P(), P(), P()),
            out_specs=out_specs,
            # pallas_call outputs carry no varying-mesh-axes metadata
            check_vma=False,
        )(state, fp, interactions, rscals)
        state, d = outs[0], outs[1]
        rest = list(outs[2:])
        key = rest.pop(0) if with_vel else None
        tdep = rest.pop(0) if with_thick else None
        img = render_frame_from_zbuffer(
            d, key, view, rc, cubemap_faces=cubemap_faces, bg=bg,
            thickness_deposits=tdep,
        )
        return state, frame_to_u8(img)

    return jax.jit(frame, donate_argnums=(0,) if donate else ())


def demo_sharded_render(n_devices: int) -> None:
    """Compile + run ONE distributed frame (sharded substeps + per-shard
    splat emission + pmin depth composite + SSFR + u8) on tiny shapes —
    the driver's dryrun_multichip exercises config 5's render clause.
    Also runs the WINDOWED sharded composite (the air-window engine under
    the mesh) — the full BASELINE config 5 stack."""
    from ..models.emitters import box_lattice
    from ..core.state import make_state
    from ..ops import bucketed
    from ..ops.window import window_config
    from ..render import Camera
    from ..render.camera import look_at
    from ..render.pipeline import background_for_view
    from .domain import shard_bucket_state

    devs = jax.devices()[:n_devices]
    mesh = Mesh(np.array(devs), ("x",))
    interpret = devs[0].platform == "cpu"

    grid = (16, 16, 16)
    pos = box_lattice(grid, (10.0, 6.0, 10.0), 0.8, center=(8.0, 6.0, 8.0))
    config = SimConfig(grid_res=grid, num_particles=pos.shape[0],
                       substeps=1, bin_capacity=8)
    fluid = FluidParams.create(dim=3, eos_stiffness=4.0, eos_power=4.0)
    rc = RenderConfig(camera=Camera(width=128, height=96))
    view = jnp.asarray(look_at((40.0, 30.0, 40.0), (8.0, 6.0, 8.0)))
    bg = background_for_view(rc, view)

    b0 = jax.jit(lambda s: bucketed.from_simstate(s, config))(make_state(pos))
    step = make_sharded_frame_step(config, mesh, rc, substeps=1,
                                   interpret=interpret)
    out, img = step(shard_bucket_state(b0, mesh), fluid, (), view, bg)
    assert int(out.lost) == 0
    assert np.asarray(img).shape == (96, 128, 3)

    # windowed + sharded + distributed render: the full config-5 stack
    tall = config.replace(grid_res=(16, 32, 16))
    wcfg = window_config(tall, 16)
    bw = jax.jit(lambda s: bucketed.from_simstate(s, wcfg))(make_state(pos))
    wstep = make_sharded_frame_step(wcfg, mesh, rc, substeps=1,
                                    interpret=interpret)
    wout, wimg = wstep(shard_bucket_state(bw, mesh), fluid, (), view, bg)
    assert int(wout.lost) == 0 and int(wout.ceiling) == 0
    np.asarray(wimg)

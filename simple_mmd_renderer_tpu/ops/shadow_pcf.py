"""Tiled Pallas kernel for the shadow-space 3x3 PCF lit map.

`render.shade.ground_lit_map` evaluates, for every shadow-map texel, the
ground plane's reference depth (affine in texel coords for the ortho light,
shader/ground.glsl:83-108 semantics) and averages the 3x3 depth comparison.
The jnp formulation does 9 shifted compares over the full map; the +-1
LANE-axis slices each force a Mosaic relayout of the whole 2048^2 buffer,
which made this the single most expensive non-raster stage (~2.5 ms of a
16 ms stress frame). Here each (TILE_H, 128) output tile DMAs one
(TILE_H+2, 384) halo window from a pre-padded copy of the map into VMEM and
evaluates all 9 taps as in-register shifts: one pass over the map, no
full-size relayouts.

Bit-exact vs the jnp reference (`tests/test_render.py::
test_pcf_kernel_matches_reference`): same edge-padding, same compare, same
/9. Used automatically by shade.ground_lit_map for 128-aligned maps;
non-aligned or tiny maps keep the jnp path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 32
TILE_W = 128


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pcf_kernel(params_ref, pad_hbm, lit_ref, scratch, sem, *, tile_h,
                tiles_x):
    b = pl.program_id(0)
    ty = pl.program_id(1)
    tx = pl.program_id(2)
    # window height tile_h + 8 (Mosaic: DMA slice shapes must be 8-aligned
    # in dim 0); rows [0..tile_h+1] of the window are the halo + tile
    cp = pltpu.make_async_copy(
        pad_hbm.at[b, pl.ds(ty * tile_h, tile_h + 8),
                   pl.ds(tx * TILE_W, 3 * TILE_W)],
        scratch, sem)
    cp.start()
    cp.wait()
    z0 = params_ref[0]
    zc = params_ref[1]
    zr = params_ref[2]
    # iota must be integer on Mosaic (f32 iota fails verification on TPU)
    row = (jax.lax.broadcasted_iota(jnp.int32, (tile_h, TILE_W), 0)
           + ty * tile_h).astype(jnp.float32)
    col = (jax.lax.broadcasted_iota(jnp.int32, (tile_h, TILE_W), 1)
           + tx * TILE_W).astype(jnp.float32)
    # zref - bias, affine in texel coords (ortho light)
    zref = z0 + zc * col + zr * row
    total = jnp.zeros((tile_h, TILE_W), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            w = scratch[dy:dy + tile_h,
                        TILE_W - 1 + dx:TILE_W - 1 + dx + TILE_W]
            total = total + jnp.where(zref < w, 1.0, 0.0)
    lit_ref[0] = jnp.clip(total * (1.0 / 9.0), 0.0, 1.0)


@partial(jax.jit, static_argnums=())
def pcf_lit_map_tiled(shadow_map, z0, zc, zr):
    """3x3 PCF lit map from a shadow map [..., S, S] (any leading batch
    dims — the crowd's per-instance maps ride the grid's leading axis;
    Pallas TPU cannot batch an ANY-space operand under vmap, so batching
    is native here) and the affine reference-depth plane
    zref(row, col) = z0 + zc*col + zr*row (bias already folded into z0 by
    the caller). Requires S % 128 == 0."""
    lead = shadow_map.shape[:-2]
    maps = shadow_map.reshape((-1,) + shadow_map.shape[-2:])
    b, s = maps.shape[0], maps.shape[-1]
    assert s % TILE_W == 0 and s % TILE_H == 0, "use the jnp path"
    # halo pre-pad: 1 edge row on top, 7 below (the kernel DMAs 8-aligned
    # (tile_h + 8)-row windows; the last window ends exactly at S + 8),
    # one full 128-lane block left/right (lane DMA offsets must be
    # 128-aligned; the kernel shifts by +-1 in-register)
    pad = jnp.pad(maps, ((0, 0), (1, 7), (TILE_W, TILE_W)), mode="edge")
    params = jnp.stack([z0, zc, zr]).astype(jnp.float32)
    tiles_y = s // TILE_H
    tiles_x = s // TILE_W
    lit, = pl.pallas_call(
        partial(_pcf_kernel, tile_h=TILE_H, tiles_x=tiles_x),
        grid=(b, tiles_y, tiles_x),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, TILE_H, TILE_W),
                         lambda bi, ty, tx: (bi, ty, tx),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((b, s, s), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((TILE_H + 8, 3 * TILE_W), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=_interpret(),
    )(params, pad)
    return lit.reshape(lead + (s, s))


# vmap-safe entry point: Pallas TPU cannot batch the ANY-space operand, so
# vmap over this function re-dispatches into the natively-batched kernel
# (the crowd fallback path vmaps render_frame, which lands here).
@jax.custom_batching.custom_vmap
def pcf_lit_map(shadow_map, z0, zc, zr):
    return pcf_lit_map_tiled(shadow_map, z0, zc, zr)


@pcf_lit_map.def_vmap
def _pcf_lit_map_vmap(axis_size, in_batched, shadow_map, z0, zc, zr):
    sb, b0, bc, br = in_batched

    def bcast(x, is_b):
        return x if is_b else jnp.broadcast_to(
            x, (axis_size,) + jnp.shape(x))

    if b0 or bc or br:
        # per-instance zref planes (per-instance light): map the kernel
        # over the batch — rare, correctness path
        out = jax.lax.map(
            lambda args: pcf_lit_map_tiled(*args),
            (bcast(shadow_map, sb), bcast(z0, b0), bcast(zc, bc),
             bcast(zr, br)))
        return out, True
    return pcf_lit_map_tiled(bcast(shadow_map, sb), z0, zc, zr), True

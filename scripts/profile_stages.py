"""Per-stage TPU timings for the bench scene (1080p flagship character).

Each stage is measured as a lax.scan over N iterations with a scalar carry
threaded through the inputs (prevents XLA from hoisting loop-invariant work
out of the scan) and a checksum carried out (prevents DCE). One dispatch per
stage, one tiny host transfer — the axon tunnel's per-dispatch latency never
enters the numbers.

Usage: python scripts/profile_stages.py [stage ...]   (default: all)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from simple_mmd_renderer_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from simple_mmd_renderer_tpu.app.sample import (sample_character,
                                                    sample_motion)
    from simple_mmd_renderer_tpu.config import AppConfig, RenderConfig
    from simple_mmd_renderer_tpu.core import anim as anim_mod
    from simple_mmd_renderer_tpu.core import model as model_mod
    from simple_mmd_renderer_tpu.core import physics as phys_mod
    from simple_mmd_renderer_tpu.core import pose as pose_mod
    from simple_mmd_renderer_tpu.core.scene import Scene
    from simple_mmd_renderer_tpu.render import raster
    from simple_mmd_renderer_tpu.render import pipeline as pl_mod
    from simple_mmd_renderer_tpu.ops import tiled_raster as tr

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        width, height, shadow, density, iters = 1920, 1080, 2048, 2.0, 30
    else:
        width, height, shadow, density, iters = 320, 180, 128, 0.5, 3
    # PROFILE_DENSITY=4.0 profiles the large-mesh stress scene instead
    density = float(os.environ.get("PROFILE_DENSITY", density))

    pm = sample_character(density=density)
    static = model_mod.build_model(pm)
    mo = anim_mod.bind_motion(static, sample_motion(240, fps_keys=5))
    ps = phys_mod.build_physics(static)
    cfg = AppConfig()
    cfg.render = RenderConfig(width=width, height=height,
                              shadow_map_size=shadow, show_skybox=False)
    scene = Scene(static, ps, mo, cfg)
    state0 = scene.init_state()

    # a fixed deformed frame to feed render-only stages
    _, pose, positions, normals = jax.jit(scene.step_pose)(state0)
    positions = jax.block_until_ready(positions)
    verts_m = positions * cfg.render.mmd_to_meter
    tris = jnp.asarray(static.triangles)[:, ::-1]
    mats = pl_mod.build_matrices(cfg.render, aspect=width / height)
    attrs = jnp.concatenate(
        [verts_m, jnp.asarray(normals), jnp.asarray(static.uvs)], -1)

    e_max, k_max = 6, 192

    def timed(name, body, n=iters):
        """body(carry_scalar) -> checksum scalar."""
        def scan_body(c, _):
            return body(c), None

        fn = jax.jit(lambda c: jax.lax.scan(scan_body, c, None, length=n)[0])
        c = fn(jnp.float32(0.0))
        c.block_until_ready()
        t0 = time.time()
        c = fn(c * 1e-20)
        c.block_until_ready()
        dt = (time.time() - t0) / n * 1000
        print(f"{name:24s} {dt:8.3f} ms   (checksum {float(c):.4g})",
              flush=True)
        return dt

    stages = {}

    def stage(name):
        def deco(f):
            stages[name] = f
            return f
        return deco

    @stage("full_frame")
    def _(c):
        st = state0.replace(time=state0.time + c * 1e-20)
        st, img = scene.step_and_render(st)
        return jnp.mean(img)

    @stage("pose_only")
    def _(c):
        st = state0.replace(time=state0.time + c * 1e-20)
        st, pose_, p, n = scene.step_pose(st)
        return jnp.mean(p)

    @stage("anim_sample")
    def _(c):
        frame = jnp.floor((state0.time + c * 1e-20) * cfg.fps)
        r, t, m = anim_mod.sample_motion(mo, frame)
        return jnp.mean(r) + jnp.mean(t)

    @stage("pre_physics_pose")
    def _(c):
        b = static.n_bones
        rot = jnp.broadcast_to(jnp.asarray([0, 0, 0, 1.0], jnp.float32),
                               (b, 4)) + c * 1e-20
        trans = jnp.zeros((b, 3), jnp.float32)
        rates = jnp.zeros((static.n_morphs,), jnp.float32)
        pose_ = pose_mod.pre_physics_posing(static, rot, trans, rates)
        return jnp.mean(pose_.skin)

    @stage("physics_react")
    def _(c):
        st = state0.physics.replace(pos=state0.physics.pos + c * 1e-20)
        st2, pose2 = phys_mod.physics_react(static, ps, st, pose, cfg.physics)
        return jnp.mean(st2.pos)

    @stage("deform")
    def _(c):
        pose2 = pose.replace(skin=pose.skin + c * 1e-20)
        p, n = pose_mod.deform(static, pose2)
        return jnp.mean(p)

    @stage("char_setup_rows")
    def _(c):
        clip = raster.transform_clip(verts_m + c * 1e-20, mats["mvp"])
        s = raster.setup(clip, tris, width, height, raster.CULL_BACK)
        s["tris_v"] = tris
        rows = tr._setup_rows(s, jnp.arange(tris.shape[0], dtype=jnp.int32),
                              attrs)
        return jnp.mean(rows)

    @stage("char_bin")
    def _(c):
        clip = raster.transform_clip(verts_m + c * 1e-20, mats["mvp"])
        s = raster.setup(clip, tris, width, height, raster.CULL_BACK)
        s["tris_v"] = tris
        rows = tr._setup_rows(s, jnp.arange(tris.shape[0], dtype=jnp.int32),
                              attrs)
        sorted_rows, starts, counts, big = tr._bin(s, rows, width, height,
                                                   e_max, k_max)
        return (jnp.mean(sorted_rows) + jnp.mean(starts.astype(jnp.float32))
                + jnp.mean(counts.astype(jnp.float32)))

    def _bin_pieces(c, upto):
        """Rebuild _bin step by step; upto selects how far to go."""
        import jax.numpy as jnp
        clip = raster.transform_clip(verts_m + c * 1e-20, mats["mvp"])
        s = raster.setup(clip, tris, width, height, raster.CULL_BACK)
        s["tris_v"] = tris
        rows = tr._setup_rows(s, jnp.arange(tris.shape[0], dtype=jnp.int32),
                              attrs)
        tiles_x = -(-width // tr.TILE_W)
        tiles_y = -(-height // tr.TILE_H)
        n_tiles = tiles_x * tiles_y
        xy = s["xy"]
        valid = s["valid"]
        xmin = jnp.clip(jnp.min(xy[:, :, 0], 1), 0.0, width - 1.0)
        xmax = jnp.clip(jnp.max(xy[:, :, 0], 1), 0.0, width - 1.0)
        ymin = jnp.clip(jnp.min(xy[:, :, 1], 1), 0.0, height - 1.0)
        ymax = jnp.clip(jnp.max(xy[:, :, 1], 1), 0.0, height - 1.0)
        tx0 = (xmin // tr.TILE_W).astype(jnp.int32)
        tx1 = (xmax // tr.TILE_W).astype(jnp.int32)
        ty0 = (ymin // tr.TILE_H).astype(jnp.int32)
        ty1 = (ymax // tr.TILE_H).astype(jnp.int32)
        bw = tx1 - tx0 + 1
        n_cover = bw * (ty1 - ty0 + 1)
        small = valid & (n_cover <= e_max)
        e = jnp.arange(e_max, dtype=jnp.int32)[None, :]
        bwc = jnp.clip(bw, 1, e_max)[:, None]
        dx = e
        dy = jnp.zeros_like(e)
        for width_c in range(1, e_max + 1):
            dxc = jnp.asarray([k % width_c for k in range(e_max)], jnp.int32)
            dyc = jnp.asarray([k // width_c for k in range(e_max)], jnp.int32)
            sel = bwc == width_c
            dx = jnp.where(sel, dxc[None, :], dx)
            dy = jnp.where(sel, dyc[None, :], dy)
        tile = (ty0[:, None] + dy) * tiles_x + (tx0[:, None] + dx)
        mask = small[:, None] & (e < n_cover[:, None])
        tile = jnp.where(mask, tile, n_tiles)
        flat_tile = tile.reshape(-1)
        if upto == "expand":
            return jnp.mean(flat_tile.astype(jnp.float32))
        t = tile.shape[0]
        flat_tri = jnp.broadcast_to(
            jnp.arange(t, dtype=jnp.int32)[:, None], (t, e_max)).reshape(-1)
        order = jnp.argsort(flat_tile, stable=True)
        sorted_tile = flat_tile[order]
        sorted_tri = flat_tri[order]
        if upto == "sort":
            return (jnp.mean(sorted_tile.astype(jnp.float32))
                    + jnp.mean(sorted_tri.astype(jnp.float32)))
        start = jnp.searchsorted(
            sorted_tile, jnp.arange(n_tiles + 1, dtype=jnp.int32),
            side="left").astype(jnp.int32)
        if upto == "starts":
            return (jnp.mean(start.astype(jnp.float32))
                    + jnp.mean(sorted_tri.astype(jnp.float32)))
        sorted_rows = rows[sorted_tri]
        lane_pad = (-rows.shape[1]) % 128
        sorted_rows = jnp.pad(sorted_rows, ((0, k_max), (0, lane_pad)))
        return jnp.mean(sorted_rows) + jnp.mean(start.astype(jnp.float32))

    @stage("bin_expand")
    def _(c):
        return _bin_pieces(c, "expand")

    @stage("bin_sort")
    def _(c):
        return _bin_pieces(c, "sort")

    @stage("bin_starts")
    def _(c):
        return _bin_pieces(c, "starts")

    @stage("bin_gather")
    def _(c):
        return _bin_pieces(c, "gather")

    @stage("char_raster_full")
    def _(c):
        clip = raster.transform_clip(verts_m + c * 1e-20, mats["mvp"])
        vis, attr_px = tr.rasterize_attrs_tiled(
            clip, tris, attrs, width, height, raster.CULL_BACK, e_max, k_max)
        return jnp.mean(attr_px) + jnp.mean(vis.depth)

    # PRODUCTION character raster: deferred-UV (3 normal channels only),
    # production e_max/chunk and the compacted-prefix binning — what
    # render_frame actually launches at this scene
    @stage("char_raster_prod")
    def _(c):
        clip = raster.transform_clip(verts_m + c * 1e-20, mats["mvp"])
        vis, attr_px = tr.rasterize_attrs_tiled(
            clip, tris, jnp.asarray(normals), width, height,
            raster.CULL_BACK, pl_mod._tiled_e_max(width, height), 256,
            None, True)
        return jnp.mean(attr_px) + jnp.mean(vis.depth)

    def _prefix_pieces(c, upto):
        """Decompose the PRODUCTION compacted-prefix bin (_bin_prefix) at
        the rung this frame actually selects."""
        clip = raster.transform_clip(verts_m + c * 1e-20, mats["mvp"])
        s = raster.setup(clip, tris, width, height, raster.CULL_BACK)
        s["tris_v"] = tris
        rows = tr._setup_rows(s, jnp.arange(tris.shape[0], dtype=jnp.int32),
                              jnp.asarray(normals))
        if upto == "setup_rows":
            return jnp.mean(rows)
        em = pl_mod._tiled_e_max(width, height)
        tiles_x = -(-width // tr.TILE_W)
        tiles_y = -(-height // tr.TILE_H)
        n_tiles = tiles_x * tiles_y
        tile, band, big = tr._expand_tiles(s, width, height, em)
        t = tile.shape[0]
        valid_tri = tile[:, 0] < n_tiles
        n_valid = jnp.sum(valid_tri.astype(jnp.int32))
        if upto == "expand":
            return jnp.mean(tile.astype(jnp.float32)) + n_valid
        vbits = max(int(t - 1).bit_length(), 1)
        key = (jnp.where(valid_tri, 0, 1 << vbits)
               + jnp.arange(t, dtype=jnp.int32))
        cids = jax.lax.sort(key, is_stable=False) & ((1 << vbits) - 1)
        if upto == "compact_ids":
            return jnp.mean(cids.astype(jnp.float32))
        sizes = sorted({min(t, -(-(t * num) // den))
                        for num, den in tr.COMPACT_RUNGS} | {t})
        # report which rung fires (printed via checksum fraction)
        c_n = sizes[1] if len(sizes) > 1 else sizes[0]
        ids = jax.lax.slice(cids, (0,), (c_n,))
        flat_tile = tile[ids].reshape(-1)
        flat_tri = jnp.broadcast_to(ids[:, None], (c_n, em)).reshape(-1)
        if upto == "rung_gather_tiles":
            return (jnp.mean(flat_tile.astype(jnp.float32))
                    + jnp.mean(flat_tri.astype(jnp.float32)))
        sorted_tri, start = tr._packed_sort(flat_tile, flat_tri, t, n_tiles)
        if upto == "rung_sort":
            return (jnp.mean(sorted_tri.astype(jnp.float32))
                    + jnp.mean(start.astype(jnp.float32)))
        counts = (start[1:] - start[:-1]).astype(jnp.int32)
        eidx = jnp.arange(sorted_tri.shape[0], dtype=jnp.int32)
        spread = 256 if t >= 256 else 1
        sorted_tri = jnp.where(eidx < start[n_tiles], sorted_tri,
                               eidx & (spread - 1))
        lane_pad = (-rows.shape[1]) % 128
        sorted_rows = rows[sorted_tri]
        sorted_rows = jnp.pad(sorted_rows, ((0, 256), (0, lane_pad)))
        return jnp.mean(sorted_rows) + jnp.mean(counts.astype(jnp.float32))

    @stage("prod_setup_rows")
    def _(c):
        return _prefix_pieces(c, "setup_rows")

    @stage("prod_expand")
    def _(c):
        return _prefix_pieces(c, "expand")

    @stage("prod_compact_ids")
    def _(c):
        return _prefix_pieces(c, "compact_ids")

    @stage("prod_rung_gather_tiles")
    def _(c):
        return _prefix_pieces(c, "rung_gather_tiles")

    @stage("prod_rung_sort")
    def _(c):
        return _prefix_pieces(c, "rung_sort")

    @stage("prod_rung_rows")
    def _(c):
        return _prefix_pieces(c, "rung_rows")

    @stage("shadow_pass")
    def _(c):
        sm = pl_mod.shadow_pass(verts_m + c * 1e-20, tris, mats["light_mvp"],
                                cfg.render.shadow_map_size,
                                tr.rasterize_tiled if on_tpu else None)
        return jnp.mean(sm)

    @stage("render_frame_only")
    def _(c):
        img = pl_mod.render_frame(static, positions + c * 1e-20, normals,
                                  cfg.render)
        return jnp.mean(img)

    @stage("ground_pass")
    def _(c):
        mask, hit, depth = pl_mod.ground_pass(
            cfg.render, mats["view"] + c * 1e-20, mats["proj"], width, height)
        return jnp.mean(depth)

    # shadow-space PCF lit map + the downsampled screen lookup (the
    # ground's shadow-receive cost in render_frame)
    from simple_mmd_renderer_tpu.render import shade as shade_mod
    sm_fixed = jax.block_until_ready(
        pl_mod.shadow_pass(verts_m, tris, mats["light_mvp"],
                           cfg.render.shadow_map_size,
                           tr.rasterize_tiled if on_tpu else None))

    @stage("ground_lit")
    def _(c):
        lit_map = shade_mod.ground_lit_map(sm_fixed + c * 1e-20,
                                           mats["light_vp"])
        ds = max(int(cfg.render.shadow_lookup_downsample), 1)
        lw, lh = width // ds, height // ds
        _, gpos_lo, _ = pl_mod.ground_pass(cfg.render, mats["view"],
                                           mats["proj"], lw, lh)
        lclip = raster.transform_clip(
            gpos_lo.reshape(-1, 3), mats["light_vp"]).reshape(lh, lw, 4)
        lit_lo = shade_mod.ground_shadow_lookup(lclip, lit_map,
                                                jnp.asarray(True))
        lit = jax.image.resize(lit_lo, (height, width, 1), "linear")
        return jnp.mean(lit)

    @stage("ground_lit_map_only")
    def _(c):
        lit_map = shade_mod.ground_lit_map(sm_fixed + c * 1e-20,
                                           mats["light_vp"])
        return jnp.mean(lit_map)

    @stage("ground_lookup_resize")
    def _(c):
        lit_map = sm_fixed + c * 1e-20   # stand-in map, same shape
        ds = max(int(cfg.render.shadow_lookup_downsample), 1)
        lw, lh = width // ds, height // ds
        _, gpos_lo, _ = pl_mod.ground_pass(cfg.render, mats["view"],
                                           mats["proj"], lw, lh)
        lclip = raster.transform_clip(
            gpos_lo.reshape(-1, 3), mats["light_vp"]).reshape(lh, lw, 4)
        lit_lo = shade_mod.ground_shadow_lookup(lclip, lit_map,
                                                jnp.asarray(True))
        lit = jax.image.resize(lit_lo, (height, width, 1), "linear")
        return jnp.mean(lit)

    @stage("shade_char")
    def _(c):
        nrm_px = jnp.ones((height, width, 3), jnp.float32) * 0.577 + c * 1e-20
        wp = jnp.zeros((height, width, 3), jnp.float32)
        col = shade_mod.shade_character(
            jnp.ones((height, width, 3), jnp.float32), nrm_px, wp,
            jnp.asarray(cfg.render.camera_pos, jnp.float32), cfg.render)
        return jnp.mean(col)

    @stage("unproject")
    def _(c):
        d = jnp.full((height, width), 0.5, jnp.float32) + c * 1e-20
        wp = pl_mod.unproject_depth(d, mats["proj"] @ mats["view"],
                                    width, height)
        return jnp.mean(wp)

    sel = sys.argv[1:] or list(stages)
    print(f"# backend={jax.default_backend()} {width}x{height} "
          f"shadow={shadow} verts={len(static.positions)} "
          f"tris={len(static.triangles)} iters={iters}", flush=True)
    for name in sel:
        timed(name, stages[name])


if __name__ == "__main__":
    main()

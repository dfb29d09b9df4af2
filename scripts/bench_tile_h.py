"""Tile-height sweep for the raster kernels (run once per SMR_TILE_H).

Measures the character attr-raster and the shadow depth-raster at 1080p /
2048 on the flagship scene, plus the 107k-tri stress mesh. Compares VPU-
native (8,128) and intermediate tile heights against the default 32.

Usage: SMR_TILE_H=16 python scripts/bench_tile_h.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from simple_mmd_renderer_tpu.app.sample import sample_character
    from simple_mmd_renderer_tpu.config import RenderConfig
    from simple_mmd_renderer_tpu.core import model as model_mod
    from simple_mmd_renderer_tpu.render import pipeline as pl_mod
    from simple_mmd_renderer_tpu.render import raster
    from simple_mmd_renderer_tpu.ops import tiled_raster as tr

    on_tpu = jax.default_backend() == "tpu"
    width, height, shadow = (1920, 1080, 2048) if on_tpu else (320, 180, 128)
    iters = 30 if on_tpu else 2
    print(f"# TILE_H={tr.TILE_H} {width}x{height} shadow={shadow}",
          flush=True)

    def timed(name, body, n=iters):
        def scan_body(c, _):
            return body(c), None
        fn = jax.jit(lambda c: jax.lax.scan(scan_body, c, None, length=n)[0])
        # host transfer (float()) flushes the axon tunnel;
        # block_until_ready does NOT — without this the first timed stage
        # absorbs leftover queued work and reads 4-40x high
        c = float(fn(jnp.float32(0.0)))
        t0 = time.time()
        c = float(fn(jnp.float32(c * 1e-20)))
        print(f"{name:28s} {(time.time() - t0) / n * 1000:8.3f} ms",
              flush=True)

    for label, density in [("flagship", 2.0), ("large", 4.0)]:
        pm = sample_character(density=density)
        static = model_mod.build_model(pm)
        cfg = RenderConfig(width=width, height=height,
                           shadow_map_size=shadow, show_skybox=False)
        mats = pl_mod.build_matrices(cfg, aspect=width / height)
        verts = jnp.asarray(static.positions) * 0.1
        tris = jnp.asarray(static.triangles)[:, ::-1]
        normals = jnp.asarray(static.normals)
        print(f"## {label}: {tris.shape[0]} tris", flush=True)

        def char(c):
            clip = raster.transform_clip(verts + c * 1e-20, mats["mvp"])
            vis, a = tr.rasterize_attrs_tiled(clip, tris, normals, width,
                                              height, raster.CULL_BACK, 6,
                                              256)
            return jnp.mean(vis.depth) + jnp.mean(a)

        def char_uv(c):
            uvs = jnp.asarray(static.uvs)
            attrs = jnp.concatenate([normals, uvs], -1)
            clip = raster.transform_clip(verts + c * 1e-20, mats["mvp"])
            vis, a = tr.rasterize_attrs_tiled(clip, tris, attrs, width,
                                              height, raster.CULL_BACK, 6,
                                              256)
            return jnp.mean(vis.depth) + jnp.mean(a)

        def shad(c):
            return jnp.mean(pl_mod.shadow_pass(
                verts + c * 1e-20, tris, mats["light_mvp"], shadow,
                tr.rasterize_tiled))

        timed(f"char_raster[{label}]", char)
        timed(f"char_raster_uv[{label}]", char_uv)
        timed(f"shadow[{label}]", shad)


if __name__ == "__main__":
    main()

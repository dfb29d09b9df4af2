"""Compiled-mode (non-interpret) parity check of the tiled raster kernels
against the exact scan rasterizer, on the real TPU, at production scales.

CPU tests run the Pallas kernels in interpreter mode — a Mosaic
miscompilation would never show there. This script compares, on the actual
bench character geometry:

  1. rasterize_attrs_tiled vs raster.rasterize + interpolate (1080p)
  2. rasterize_depth_tiled vs the scan depth (2048^2 shadow view)
  3. rasterize_attrs_tiled_msaa center visibility vs (1)

and prints depth/attr max-abs-diff over matching pixels plus the tri-id
mismatch fraction (z-fighting ties are the only legitimate source).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from simple_mmd_renderer_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from simple_mmd_renderer_tpu.app.sample import sample_character
    from simple_mmd_renderer_tpu.config import RenderConfig
    from simple_mmd_renderer_tpu.core import model as model_mod
    from simple_mmd_renderer_tpu.render import pipeline as pl_mod
    from simple_mmd_renderer_tpu.render import raster
    from simple_mmd_renderer_tpu.ops import tiled_raster as tr

    on_tpu = jax.default_backend() == "tpu"
    w, h, shadow = (1920, 1080, 2048) if on_tpu else (320, 180, 256)
    density = float(os.environ.get("PARITY_DENSITY", 2.0 if on_tpu else 0.5))

    pm = sample_character(density=density)
    static = model_mod.build_model(pm)
    verts_m = jnp.asarray(static.positions) * 0.1
    tris = jnp.asarray(static.triangles)[:, ::-1]
    cfg = RenderConfig(width=w, height=h, shadow_map_size=shadow)
    mats = pl_mod.build_matrices(cfg, aspect=w / h)
    attrs = jnp.asarray(static.normals)
    print(f"# backend={jax.default_backend()} {w}x{h} "
          f"tris={tris.shape[0]}", flush=True)

    clip = raster.transform_clip(verts_m, mats["mvp"])
    vis_t, attr_t = jax.jit(
        lambda c: tr.rasterize_attrs_tiled(c, tris, attrs, w, h,
                                           raster.CULL_BACK, 6, 256))(clip)
    vis_s = jax.jit(
        lambda c: raster.rasterize(c, tris, w, h, raster.CULL_BACK))(clip)
    attr_s = raster.interpolate(vis_s, clip, tris, attrs)

    dt, ds = np.asarray(vis_t.depth), np.asarray(vis_s.depth)
    tt, ts = np.asarray(vis_t.tri), np.asarray(vis_s.tri)
    at, as_ = np.asarray(attr_t), np.asarray(attr_s)
    cover = (ts >= 0) | (tt >= 0)
    mism = (tt != ts)[cover].mean() if cover.any() else 0.0
    same = (tt == ts) & cover
    print(f"attrs: tri mismatch {mism:.2e}  "
          f"depth maxdiff {np.abs(dt - ds)[same].max():.2e}  "
          f"attr maxdiff {np.abs(at - as_)[same].max():.2e}")
    assert mism < 1e-3, "tri-id mismatch beyond tie level"
    assert np.abs(dt - ds)[same].max() < 1e-5
    assert np.abs(at - as_)[same].max() < 1e-3

    # shadow view depth-only
    sclip = raster.transform_clip(verts_m, mats["light_mvp"])
    d_t = jax.jit(
        lambda c: tr.rasterize_depth_tiled(c, tris, shadow, shadow,
                                           raster.CULL_FRONT, 6, 256))(sclip)
    vis_sd = jax.jit(
        lambda c: raster.rasterize(c, tris, shadow, shadow,
                                   raster.CULL_FRONT))(sclip)
    dd = np.abs(np.asarray(d_t) - np.asarray(vis_sd.depth))
    print(f"depth: maxdiff {dd.max():.2e}")
    assert dd.max() < 1e-5

    # MSAA center visibility matches the standard tiled path where both cover
    vis_m, attr_m, sdepth = jax.jit(
        lambda c: tr.rasterize_attrs_tiled_msaa(c, tris, attrs, w, h,
                                                raster.CULL_BACK, 6,
                                                256))(clip)
    tm = np.asarray(vis_m.tri)
    both = (tm == tt) & (tt >= 0)
    frac_sup = ((tm >= 0) & (tt >= 0)).sum() / max((tt >= 0).sum(), 1)
    dmax = np.abs(np.asarray(vis_m.depth) - dt)[both].max()
    print(f"msaa: center-cover superset frac {frac_sup:.4f}  "
          f"depth maxdiff on shared {dmax:.2e}")
    assert frac_sup > 0.999 and dmax < 1e-5
    print("PARITY OK")


if __name__ == "__main__":
    main()

"""Decompose the vmapped tiled-raster cost for the crowd path.

Stages: vertex transform+setup+rows, binning (sort), pallas kernel, big-tri
merge — each vmapped over 64 instances at 256x144, measured as one scanned
dispatch. Identifies which piece carries the per-instance fixed cost.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from simple_mmd_renderer_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from simple_mmd_renderer_tpu.app.sample import sample_character
    from simple_mmd_renderer_tpu.config import RenderConfig
    from simple_mmd_renderer_tpu.core import model as model_mod
    from simple_mmd_renderer_tpu.render import pipeline as pl_mod
    from simple_mmd_renderer_tpu.render import raster
    from simple_mmd_renderer_tpu.ops import tiled_raster as tr

    on_tpu = jax.default_backend() == "tpu"
    n_inst = 64 if on_tpu else 4
    w, h = (256, 144) if on_tpu else (64, 36)
    iters = 10 if on_tpu else 2
    e_max, chunk = 6, 256

    pm = sample_character(density=0.5)
    static = model_mod.build_model(pm)
    cfg = RenderConfig(width=w, height=h, show_skybox=False)
    mats = pl_mod.build_matrices(cfg, aspect=w / h)
    tris = jnp.asarray(static.triangles)[:, ::-1]

    rng = np.random.default_rng(0)
    base = np.asarray(static.positions, np.float32)
    batch = jnp.asarray(
        base[None] + rng.normal(0, 0.05, (n_inst, 1, 3)).astype(np.float32))
    normals = jnp.broadcast_to(jnp.asarray(static.normals), batch.shape)

    def timed(name, body, n=iters):
        def scan_body(c, _):
            return body(c), None
        fn = jax.jit(lambda c: jax.lax.scan(scan_body, c, None, length=n)[0])
        c = fn(jnp.float32(0.0)).block_until_ready()
        t0 = time.time()
        c = fn(c * 1e-20).block_until_ready()
        dt = (time.time() - t0) / n * 1000
        print(f"{name:22s} {dt:9.3f} ms/crowd ({dt / n_inst:7.3f} ms/inst)",
              flush=True)

    def per_inst(p, a, upto):
        clip = raster.transform_clip(p * 0.1, mats["mvp"])
        g = jnp.concatenate([clip, a], -1)[tris]
        s = raster.setup(clip, tris, w, h, raster.CULL_BACK, cv=g[..., :4])
        s["tris_v"] = tris
        s["va"] = g[..., 4:]
        rows = tr._setup_rows(s, jnp.arange(tris.shape[0], dtype=jnp.int32), a)
        if upto == "rows":
            return jnp.mean(rows)
        sorted_rows, starts, counts, big = tr._bin(s, rows, w, h, e_max, chunk)
        if upto == "bin":
            return jnp.mean(sorted_rows) + jnp.mean(counts.astype(jnp.float32))
        vis, attr = tr._run_kernel(sorted_rows, starts, counts, w, h,
                                   a.shape[-1], chunk)
        if upto == "kernel":
            return jnp.mean(vis.depth) + jnp.mean(attr)
        vis, attr = tr._merge_big(vis, attr, clip, tris, w, h, s, big, a)
        return jnp.mean(vis.depth) + jnp.mean(attr)

    def stage(upto):
        def f(c):
            return jnp.mean(jax.vmap(
                lambda p, a: per_inst(p, a, upto))(batch + c * 1e-20, normals))
        return f

    print(f"# backend={jax.default_backend()} {n_inst} inst @ {w}x{h} "
          f"tris={tris.shape[0]}", flush=True)
    for upto in ["rows", "bin", "kernel", "merge"]:
        timed(f"upto_{upto}", stage(upto))


if __name__ == "__main__":
    main()

"""TPU parity + timing probe for the strip-carry row-window raster kernel.

Runs the real rasterize_attrs_tiled / rasterize_depth_tiled entry points on
a procedurally generated triangle soup shaped like the stress scene's screen
statistics, once with MMD_RASTER_WINDOWS=0 (the r4 kernel) and once =1 (the
strip-window kernel), asserting bit-identical outputs and printing per-call
times. Sized small enough to compile fast; timing uses a lax.scan rollout so
the axon tunnel's dispatch latency stays out of the numbers.

Usage: python scripts/probe_windows_tpu.py [mode]
  mode: both (default) | 0 | 1   — which RASTER_WINDOWS setting(s) to run
        (separate processes per mode let a Mosaic hang in one mode not
        block measuring the other)
"""

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WIDTH, HEIGHT = 1920, 1080
N_TRI = 107_000


def run_mode(win: str):
    os.environ["MMD_RASTER_WINDOWS"] = win
    import jax
    import jax.numpy as jnp
    import numpy as np

    from simple_mmd_renderer_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from simple_mmd_renderer_tpu.ops import tiled_raster as tr
    from simple_mmd_renderer_tpu.render import raster

    rng = np.random.default_rng(7)
    # triangle soup with MMD-like screen statistics: small triangles
    # clustered in a character-shaped region, a few large ones
    c = rng.uniform([0.2, 0.05, 0.2], [0.8, 0.95, 0.9], (N_TRI, 1, 3))
    d = rng.normal(0, 0.008, (N_TRI, 3, 3))  # small tris only: the big-
    # triangle exact-scan merge path would dominate timing and is
    # identical in both modes
    p = np.clip(c + d, 0.001, 0.999).astype(np.float32)
    verts = jnp.asarray(p.reshape(-1, 3))
    # clip-space-ish: x,y in [-1,1], z in (0,1), w=1
    clip = jnp.concatenate(
        [verts[:, :2] * 2.0 - 1.0, verts[:, 2:3],
         jnp.ones((verts.shape[0], 1), jnp.float32)], -1)
    tris = jnp.arange(N_TRI * 3, dtype=jnp.int32).reshape(N_TRI, 3)
    attrs = jnp.asarray(rng.uniform(0, 1, (N_TRI * 3, 8)).astype(np.float32))

    def frame(carry):
        cl = clip.at[:, 2].add(carry * 1e-20)
        vis, attr = tr.rasterize_attrs_tiled(cl, tris, attrs, WIDTH, HEIGHT,
                                             cull=raster.CULL_NONE)
        return vis, attr

    def roll(c0, n):
        def body(c, _):
            vis, attr = frame(c)
            return jnp.mean(vis.depth) + c * 0, jnp.mean(attr)
        return jax.lax.scan(body, c0, None, length=n)

    n = 20
    rj = jax.jit(lambda c: roll(c, n))
    t0 = time.time()
    c, cs = rj(jnp.float32(0.0))
    np.asarray(cs)
    print(f"win={win} compile+first: {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    c, cs = rj(c * 1e-20)
    np.asarray(cs)
    dt = (time.time() - t0) / n * 1000
    print(f"win={win} attrs-raster pass: {dt:.2f} ms", flush=True)

    vis, attr = jax.jit(frame)(jnp.float32(0.0))
    return {"depth": np.asarray(vis.depth), "tri": np.asarray(vis.tri),
            "attr": np.asarray(attr)}


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    if mode in ("0", "1"):
        out = run_mode(mode)
        import numpy as np
        np.savez(f"/tmp/probe_win_{mode}.npz", **out)
        return
    # both: run each mode in its own process (env var is read at import)
    for m in ("0", "1"):
        r = subprocess.run([sys.executable, __file__, m], timeout=1500)
        if r.returncode != 0:
            print(f"mode {m} FAILED rc={r.returncode}")
            sys.exit(1)
    import numpy as np
    a = np.load("/tmp/probe_win_0.npz")
    b = np.load("/tmp/probe_win_1.npz")
    for k in a.files:
        same = np.array_equal(a[k], b[k])
        print(f"parity {k}: {'BIT-IDENTICAL' if same else 'MISMATCH'}")
        assert same, k
    print("WINDOWS PROBE OK")


if __name__ == "__main__":
    main()

"""Pure gather cost vs TABLE FOOTPRINT on the real chip.

The 16-part realistic atlas costs +3.5 ms over a 21 MB atlas at the SAME
gather count and row width (scripts/bench_atlas16.py) — this isolates
whether that is footprint (TLB/page-range) or something else, and whether
4 narrow gathers from a 4x-smaller table beat 1 packed-neighborhood gather
from the big one.

Pattern: ~0.50M gathers (a 768x640 bbox window at 1080p), screen-coherent
addresses (u stride ~3 texels per lane, v drifts slowly per row) into a
[H, 2048] u32x4 table of varying H.
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

    on_tpu = jax.default_backend() == "tpu"
    wh, ww = (640, 768) if on_tpu else (64, 64)
    n = 30 if on_tpu else 2
    aw = 2048

    ys = np.arange(wh)[:, None]
    xs = np.arange(ww)[None, :]
    # coherent sampling: ~3 texels/px in u, v drifts ~0.3 texel/px row
    u = (xs * 3.1 + ys * 0.4) % aw
    v_base = ys * 2.7 % aw

    def run(label, rows_h, n_gather_rows, payload_lanes):
        table = jnp.asarray(
            np.random.default_rng(0).integers(
                0, 2**31, (rows_h * aw, payload_lanes), dtype=np.int64)
            .astype(np.uint32))
        mb = table.size * 4 / 1e6
        v = (v_base * (rows_h / aw)).astype(np.int64) % rows_h
        idx0 = jnp.asarray((v * aw + u).astype(np.int32))

        def body(t, c, i):
            acc = jnp.zeros(idx0.shape + (payload_lanes,), jnp.float32)
            for k in range(n_gather_rows):
                q = t[(idx0 + i.astype(jnp.int32) + k * 7) %
                      (rows_h * aw)]
                acc = acc + q.astype(jnp.float32)
            return c + jnp.mean(acc), None

        # table rides as a jit ARGUMENT (baked constants lower differently
        # and big ones are rejected by the remote-compile tunnel)
        roll = jax.jit(lambda t: jax.lax.scan(
            lambda c, i: body(t, c, i), jnp.float32(0.0),
            jnp.arange(n, dtype=jnp.float32))[0])
        float(roll(table))
        t0 = time.time()
        float(roll(table))
        ms = (time.time() - t0) / n * 1000.0
        print(f"{label:52s} {mb:7.0f} MB  {ms:7.2f} ms", flush=True)
        return ms

    for h in (128, 256, 384, 512, 640, 768, 1024, 2048, 4096, 8960):
        run(f"1 gather x u32x4 rows, table h={h}", h, 1, 4)
    # bilinear via 4 independent gathers from a 4x smaller (unpacked) table
    run("4 gathers x u32x1 rows (unpacked bilinear)", 8960, 4, 1)
    run("4 gathers x u32x1 rows, small table", 1024, 4, 1)


if __name__ == "__main__":
    main()

"""Micro-benchmark: texture-sampling strategies on TPU.

Measures per-1080p-frame cost of candidate texel fetch plans so the albedo
path is designed from data, not folklore. One scanned dispatch per strategy.
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

    H, W = 1080, 1920
    TH = TW = 1024
    n = 20 if jax.default_backend() == "tpu" else 2

    rng = np.random.default_rng(0)
    tex = jnp.asarray(rng.random((TH * TW, 3), np.float32))
    tex_u8 = (tex * 255).astype(jnp.uint8)
    # packed 2x2 neighborhoods: row i holds texel i and its +x/+y/+xy
    t4 = np.asarray(tex).reshape(TH, TW, 3)
    packed = np.concatenate([
        t4,
        np.roll(t4, -1, 1),
        np.roll(t4, -1, 0),
        np.roll(np.roll(t4, -1, 0), -1, 1)], -1).reshape(TH * TW, 12)
    packed = jnp.asarray(packed)
    packed_bf16 = packed.astype(jnp.bfloat16)

    uv = jnp.asarray(rng.random((H, W, 2), np.float32))

    def timed(name, body):
        def scan_body(c, _):
            return body(c), None
        fn = jax.jit(lambda c: jax.lax.scan(scan_body, c, None, length=n)[0])
        c = fn(jnp.float32(0.0))
        c.block_until_ready()
        t0 = time.time()
        c = fn(c * 1e-20)
        c.block_until_ready()
        dt = (time.time() - t0) / n * 1000
        print(f"{name:34s} {dt:8.3f} ms", flush=True)

    def coords(c):
        u = uv[..., 0] * (TW - 1) + c * 1e-20
        v = uv[..., 1] * (TH - 1)
        x0 = jnp.floor(u).astype(jnp.int32)
        y0 = jnp.floor(v).astype(jnp.int32)
        return u, v, x0, y0

    def bilinear4(c):
        u, v, x0, y0 = coords(c)
        fx = (u - x0)[..., None]
        fy = (v - y0)[..., None]
        x1 = jnp.minimum(x0 + 1, TW - 1)
        y1 = jnp.minimum(y0 + 1, TH - 1)
        c00 = tex[y0 * TW + x0]
        c10 = tex[y0 * TW + x1]
        c01 = tex[y1 * TW + x0]
        c11 = tex[y1 * TW + x1]
        top = c00 * (1 - fx) + c10 * fx
        bot = c01 * (1 - fx) + c11 * fx
        return jnp.mean(top * (1 - fy) + bot * fy)

    def nearest1(c):
        u, v, x0, y0 = coords(c)
        return jnp.mean(tex[y0 * TW + x0])

    def nearest1_u8(c):
        u, v, x0, y0 = coords(c)
        return jnp.mean(tex_u8[y0 * TW + x0].astype(jnp.float32))

    def packed1(c):
        u, v, x0, y0 = coords(c)
        fx = (u - x0)[..., None]
        fy = (v - y0)[..., None]
        q = packed[y0 * TW + x0]
        top = q[..., 0:3] * (1 - fx) + q[..., 3:6] * fx
        bot = q[..., 6:9] * (1 - fx) + q[..., 9:12] * fx
        return jnp.mean(top * (1 - fy) + bot * fy)

    def packed1_bf16(c):
        u, v, x0, y0 = coords(c)
        fx = (u - x0)[..., None].astype(jnp.bfloat16)
        fy = (v - y0)[..., None].astype(jnp.bfloat16)
        q = packed_bf16[y0 * TW + x0]
        top = q[..., 0:3] * (1 - fx) + q[..., 3:6] * fx
        bot = q[..., 6:9] * (1 - fx) + q[..., 9:12] * fx
        return jnp.mean((top * (1 - fy) + bot * fy).astype(jnp.float32))

    # 2x2 neighborhood bit-packed into 3 u32 lanes (RGB888 x 4 texels):
    # 12 bytes/row vs bf16x12's 24 — gather cost scales with row bytes
    p8 = (np.asarray(packed).reshape(TH * TW, 4, 3) * 255).astype(np.uint32)
    packed_u32 = jnp.asarray(
        p8[:, :, 0] | (p8[:, :, 1] << 8) | (p8[:, :, 2] << 16))  # [N,4] u32

    def packed1_u32(c):
        u, v, x0, y0 = coords(c)
        fx = (u - x0)[..., None]
        fy = (v - y0)[..., None]
        q = packed_u32[y0 * TW + x0]                  # [H,W,4] u32
        def rgb(i):
            w = q[..., i]
            return jnp.stack([(w & 0xFF), (w >> 8) & 0xFF, (w >> 16) & 0xFF],
                             -1).astype(jnp.float32) * (1.0 / 255.0)
        top = rgb(0) * (1 - fx) + rgb(1) * fx
        bot = rgb(2) * (1 - fx) + rgb(3) * fx
        return jnp.mean(top * (1 - fy) + bot * fy)

    # single-texel RGB888 in ONE u32 lane (4 bytes/row): nearest sampling,
    # the mip-chain candidate
    tex_u32 = jnp.asarray(p8[:, 0, 0] | (p8[:, 0, 1] << 8)
                          | (p8[:, 0, 2] << 16))

    def nearest1_u32(c):
        u, v, x0, y0 = coords(c)
        w = tex_u32[y0 * TW + x0]
        return jnp.mean(jnp.stack(
            [(w & 0xFF), (w >> 8) & 0xFF, (w >> 16) & 0xFF],
            -1).astype(jnp.float32)) * (1.0 / 255.0)

    def half_res_bilinear(c):
        u, v, x0, y0 = coords(c)
        hh, hw = H // 2, W // 2
        u2 = u[::2, ::2]
        v2 = v[::2, ::2]
        x2 = jnp.floor(u2).astype(jnp.int32)
        y2 = jnp.floor(v2).astype(jnp.int32)
        fx = (u2 - x2)[..., None]
        fy = (v2 - y2)[..., None]
        x1 = jnp.minimum(x2 + 1, TW - 1)
        y1 = jnp.minimum(y2 + 1, TH - 1)
        c00 = tex[y2 * TW + x2]
        c10 = tex[y2 * TW + x1]
        c01 = tex[y1 * TW + x2]
        c11 = tex[y1 * TW + x1]
        top = c00 * (1 - fx) + c10 * fx
        bot = c01 * (1 - fx) + c11 * fx
        img = top * (1 - fy) + bot * fy
        return jnp.mean(jax.image.resize(img, (H, W, 3), "linear"))

    print(f"# backend={jax.default_backend()} {W}x{H} px, {TW}x{TH} texture",
          flush=True)
    timed("bilinear 4 gathers f32", bilinear4)
    timed("nearest 1 gather f32", nearest1)
    timed("nearest 1 gather u8", nearest1_u8)
    timed("packed-2x2 1 gather f32x12", packed1)
    timed("packed-2x2 1 gather bf16x12", packed1_bf16)
    timed("packed-2x2 1 gather u32x4", packed1_u32)
    timed("nearest 1 gather u32x1", nearest1_u32)
    timed("half-res bilinear + upsample", half_res_bilinear)


if __name__ == "__main__":
    main()

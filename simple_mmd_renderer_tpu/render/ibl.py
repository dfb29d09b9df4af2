"""Image-based lighting: equirectangular HDR -> cubemap, skybox shading.

Rebuilds `LoadHDRAndCreateCubemap`/`EquirectUVToDir` (`main.cpp:1019-1185`) as
vectorized jnp (the reference converts on the CPU with nested loops) and the
skybox fragment program (`shader/ibl.glsl`): cube sample + ACES filmic
tonemap. Face layout, per-face direction mapping, the write-time Y flip and
nearest-neighbour equirect sampling match the reference exactly.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_PI = 3.14159265359


def equirect_to_cubemap(equirect, size=512):
    """equirect: [H,W,3+] float -> [6,size,size,3] cubemap.

    Face order and direction mapping per main.cpp:1093-1117; nearest sampling
    per main.cpp:1136-1142; output rows y-flipped per main.cpp:1144-1147."""
    h, w = equirect.shape[:2]
    uv = (jnp.arange(size, dtype=jnp.float32) + 0.5) / size * 2.0 - 1.0
    u = uv[None, :]
    v = uv[:, None]
    u = jnp.broadcast_to(u, (size, size))
    v = jnp.broadcast_to(v, (size, size))
    one = jnp.ones_like(u)

    faces = [
        jnp.stack([-one, v, -u], -1),   # +X (main.cpp:1096)
        jnp.stack([one, v, u], -1),     # -X
        jnp.stack([-u, one, -v], -1),   # +Y
        jnp.stack([-u, -one, v], -1),   # -Y
        jnp.stack([-u, v, one], -1),    # +Z
        jnp.stack([u, v, -one], -1),    # -Z
    ]
    dirs = jnp.stack(faces)  # [6,S,S,3]
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    theta = jnp.arctan2(dirs[..., 2], dirs[..., 0])
    phi = jnp.arccos(jnp.clip(dirs[..., 1], -1.0, 1.0))
    eu = jnp.clip(theta / (2.0 * _PI) + 0.5, 0.0, 1.0)
    ev = jnp.clip(phi / _PI, 0.0, 1.0)
    sx = jnp.minimum((eu * w).astype(jnp.int32), w - 1)
    sy = jnp.minimum((ev * h).astype(jnp.int32), h - 1)
    sampled = jnp.asarray(equirect)[sy, sx, :3]  # [6,S,S,3]
    return sampled[:, ::-1, :, :]  # y flip at write


def sample_cubemap(cubemap, dirs):
    """Cube lookup — the exact inverse of `equirect_to_cubemap`'s storage
    mapping, so `sample(convert(E), d) == E(d)`.

    Note: the reference stores its "+X" face looking down -X (main.cpp:1095-
    1097), so a spec-conformant GL lookup of its cubemap displays a mirrored
    environment; we invert the actual storage instead, which shows the
    environment unmirrored (the intended image). cubemap: [6,S,S,3]."""
    s = cubemap.shape[1]
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    ax, ay, az = jnp.abs(x), jnp.abs(y), jnp.abs(z)
    is_x = (ax >= ay) & (ax >= az)
    is_y = (~is_x) & (ay >= az)
    m = jnp.maximum(jnp.where(is_x, ax, jnp.where(is_y, ay, az)), 1e-12)
    dx, dy, dz = x / m, y / m, z / m

    # storage equations (main.cpp:1093-1117): face f holds direction d(f,u,v)
    #  f0: (-1, v, -u)  f1: (1, v, u)  f2: (-u, 1, -v)
    #  f3: (-u, -1, v)  f4: (-u, v, 1) f5: (u, v, -1)
    face = jnp.where(is_x, jnp.where(dx < 0, 0, 1),
                     jnp.where(is_y, jnp.where(dy > 0, 2, 3),
                               jnp.where(dz > 0, 4, 5)))
    u = (jnp.where(face == 0, -dz, 0) + jnp.where(face == 1, dz, 0)
         + jnp.where((face == 2) | (face == 3) | (face == 4), -dx, 0)
         + jnp.where(face == 5, dx, 0))
    v = (jnp.where(face == 2, -dz, 0) + jnp.where(face == 3, dz, 0)
         + jnp.where((face == 0) | (face == 1) | (face == 4) | (face == 5),
                     dy, 0))

    px = jnp.clip(((u * 0.5 + 0.5) * s).astype(jnp.int32), 0, s - 1)
    py = jnp.clip(((v * 0.5 + 0.5) * s).astype(jnp.int32), 0, s - 1)
    # rows were y-flipped at write time; cubemap may be a numpy constant
    return jnp.asarray(cubemap)[face, (s - 1) - py, px]


def aces_tonemap(x):
    """ACES filmic approximation (ibl.glsl:33-41)."""
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    return jnp.clip((x * (a * x + b)) / (x * (c * x + d) + e), 0.0, 1.0)


def skybox_colors(cubemap, view, proj, width, height):
    """Per-pixel skybox: ray directions from the inverse of proj@view-sans-
    translation (the reference draws a cube with the translation-free view,
    main.cpp:2064-2089), cube sample + ACES."""
    v = view.at[:3, 3].set(0.0)
    inv = jnp.linalg.inv(proj @ v)
    xs = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width * 2.0 - 1.0
    ys = 1.0 - (jnp.arange(height, dtype=jnp.float32) + 0.5) / height * 2.0
    ndc_x = jnp.broadcast_to(xs[None, :], (height, width))
    ndc_y = jnp.broadcast_to(ys[:, None], (height, width))
    near = jnp.stack([ndc_x, ndc_y, jnp.full_like(ndc_x, 0.5),
                      jnp.ones_like(ndc_x)], -1)
    world = near @ inv.T
    dirs = world[..., :3] / jnp.where(
        jnp.abs(world[..., 3:4]) > 1e-12, world[..., 3:4], 1.0)
    dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12)
    return aces_tonemap(sample_cubemap(cubemap, dirs))

"""Camera/projection math.

Equivalents of the HandmadeMath helpers the reference app uses
(`HMM_Perspective_RH_ZO`, `HMM_Orthographic_RH_ZO`, `HMM_LookAt_RH` —
`main.cpp:1897-1898, 2004-2008`): right-handed view space, zero-to-one clip
depth, column-vector convention.
"""

from __future__ import annotations

import jax.numpy as jnp


def perspective(fov_y_rad, aspect, near, far):
    """HMM_Perspective_RH_ZO."""
    f = 1.0 / jnp.tan(fov_y_rad / 2.0)
    m = jnp.zeros((4, 4), jnp.float32)
    m = m.at[0, 0].set(f / aspect)
    m = m.at[1, 1].set(f)
    m = m.at[2, 2].set(far / (near - far))
    m = m.at[2, 3].set(near * far / (near - far))
    m = m.at[3, 2].set(-1.0)
    return m


def orthographic(left, right, bottom, top, near, far):
    """HMM_Orthographic_RH_ZO."""
    m = jnp.zeros((4, 4), jnp.float32)
    m = m.at[0, 0].set(2.0 / (right - left))
    m = m.at[1, 1].set(2.0 / (top - bottom))
    m = m.at[2, 2].set(1.0 / (near - far))
    m = m.at[0, 3].set((left + right) / (left - right))
    m = m.at[1, 3].set((bottom + top) / (bottom - top))
    m = m.at[2, 3].set(near / (near - far))
    m = m.at[3, 3].set(1.0)
    return m


def look_at(eye, target, up):
    """HMM_LookAt_RH."""
    eye = jnp.asarray(eye, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    up = jnp.asarray(up, jnp.float32)
    f = target - eye
    f = f / jnp.maximum(jnp.linalg.norm(f), 1e-12)
    s = jnp.cross(f, up)
    s = s / jnp.maximum(jnp.linalg.norm(s), 1e-12)
    u = jnp.cross(s, f)
    m = jnp.eye(4, dtype=jnp.float32)
    m = m.at[0, :3].set(s)
    m = m.at[1, :3].set(u)
    m = m.at[2, :3].set(-f)
    m = m.at[0, 3].set(-jnp.dot(s, eye))
    m = m.at[1, 3].set(-jnp.dot(u, eye))
    m = m.at[2, 3].set(jnp.dot(f, eye))
    return m


def orbit_camera(target, distance, rotation_x, rotation_y):
    """The app's orbit camera (main.cpp:1884-1896): offset from target by
    spherical angles; distance is negative (camera behind target)."""
    target = jnp.asarray(target, jnp.float32)
    cos_y = jnp.cos(rotation_y)
    sin_y = jnp.sin(rotation_y)
    cos_x = jnp.cos(rotation_x)
    sin_x = jnp.sin(rotation_x)
    offset = distance * jnp.stack([cos_y * sin_x, sin_y, cos_y * cos_x])
    return target + offset


def directional_light_view(light_dir):
    """The shadow pass light frame (main.cpp:1941-2009): light placed 50 m
    against its direction, looking at the origin, with the robust up-vector
    chain."""
    d = jnp.asarray(light_dir, jnp.float32)
    d = d / jnp.maximum(jnp.linalg.norm(d), 1e-6)
    world_up = jnp.array([0.0, 1.0, 0.0], jnp.float32)
    alt_up = jnp.array([0.0, 0.0, 1.0], jnp.float32)
    right = jnp.cross(d, world_up)
    use_alt = jnp.linalg.norm(right) < 1e-3
    right = jnp.where(use_alt, jnp.cross(d, alt_up), right)
    right = right / jnp.maximum(jnp.linalg.norm(right), 1e-6)
    up = jnp.cross(right, d)
    up = up / jnp.maximum(jnp.linalg.norm(up), 1e-6)
    pos = -50.0 * d
    return look_at(pos, jnp.zeros(3, jnp.float32), up)

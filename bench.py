"""Benchmark: full step+render (animation, CCD IK, physics, skinning, shadow
pass, main pass) of the flagship procedural character at 1080p.

Baseline (BASELINE.md): the reference publishes no numbers; the north-star
target is 60+ fps for a full PMX-scale model with physics at 1080p on one TPU
chip. vs_baseline = fps / 60.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time


def main():
    import jax

    from simple_mmd_renderer_tpu.app.sample import (sample_character,
                                                    sample_motion)
    from simple_mmd_renderer_tpu.config import AppConfig, RenderConfig
    from simple_mmd_renderer_tpu.core import anim as anim_mod
    from simple_mmd_renderer_tpu.core import model as model_mod
    from simple_mmd_renderer_tpu.core import physics as phys_mod
    from simple_mmd_renderer_tpu.core.scene import Scene

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        width, height, shadow, density, frames = 1920, 1080, 2048, 2.0, 60
    else:  # CPU smoke fallback (driver runs this on real TPU)
        width, height, shadow, density, frames = 320, 180, 128, 0.5, 5

    pm = sample_character(density=density)
    static = model_mod.build_model(pm)
    mo = anim_mod.bind_motion(static, sample_motion(240, fps_keys=5))
    ps = phys_mod.build_physics(static)

    cfg = AppConfig()
    cfg.render = RenderConfig(width=width, height=height,
                              shadow_map_size=shadow, show_skybox=False)
    scene = Scene(static, ps, mo, cfg)

    print(f"# bench scene: {len(static.positions)} verts, "
          f"{len(static.triangles)} tris, {static.n_bones} bones, "
          f"{ps.n_bodies} bodies, {ps.n_joints} joints @ {width}x{height} "
          f"on {jax.default_backend()}", file=sys.stderr)

    state = scene.init_state()
    step = scene.jit_step(render=True)

    t0 = time.time()
    state, image = step(state)
    image.block_until_ready()
    print(f"# compile+first frame: {time.time() - t0:.1f}s", file=sys.stderr)

    # warmup
    for _ in range(3):
        state, image = step(state)
    image.block_until_ready()

    t0 = time.time()
    for _ in range(frames):
        state, image = step(state)
    image.block_until_ready()
    dt = time.time() - t0
    fps = frames / dt

    print(json.dumps({
        "metric": "fps_full_step_render_1080p" if on_tpu
        else "fps_full_step_render_cpu_smoke",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / 60.0, 3),
    }))


if __name__ == "__main__":
    main()

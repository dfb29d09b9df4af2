"""Mosaic capability probe for the banded raster kernel design:

1. vector -> scalar reduction (jnp.min of a [G] lane slice) used as a
   dynamic 8-aligned sublane offset into a VMEM ref (pl.ds load + store)
2. lax.cond inside the kernel body selecting between a 16-row window
   RMW path and a full 32-row path
3. output refs used as read-modify-write accumulators across a fori_loop

Run on the real TPU (interpret mode proves nothing for Mosaic).
"""

import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TH, TW, G = 32, 128, 8


def kernel(rows_ref, out_ref, scr, sem):
    i = pl.program_id(0)
    # init output (RMW accumulator)
    out_ref[0] = jnp.zeros((TH, TW), jnp.float32)

    cp = pltpu.make_async_copy(rows_ref.at[pl.ds(i * 16, 16), :], scr, sem)
    cp.start()
    cp.wait()

    def body(g, carry):
        rg = scr[pl.ds(g * G, G), :]
        ymin_l = rg[:, 0][:, None, None]                      # [G,1,1]
        ymax_l = rg[:, 1][:, None, None]
        val_l = rg[:, 2][:, None, None]
        in_r = (jax.lax.broadcasted_iota(jnp.int32, (G, 1, 1), 0)
                < 8)
        ymin_g = jnp.min(jnp.where(in_r, ymin_l, 1e9))
        ymax_g = jnp.max(jnp.where(in_r, ymax_l, -1e9))
        o = jnp.clip((ymin_g.astype(jnp.int32) // 8) * 8, 0, TH - 16)
        fits = ymax_g.astype(jnp.int32) < o + 16

        def contrib_at(ys):
            # bbox-masked like real coverage: rows outside [ymin, ymax]
            # contribute nothing, so windowing is semantically neutral
            inside = (ys >= ymin_l) & (ys <= ymax_l)
            return jnp.sum(jnp.where(inside, val_l * ys, 0.0), axis=0)

        @pl.when(fits)
        def _():
            ys = (jax.lax.broadcasted_iota(jnp.int32, (16, TW), 0)
                  + o).astype(jnp.float32)[None]
            cur = out_ref[0, pl.ds(o, 16), :]
            out_ref[0, pl.ds(o, 16), :] = cur + contrib_at(ys)

        @pl.when(jnp.logical_not(fits))
        def _():
            ys = jax.lax.broadcasted_iota(
                jnp.int32, (TH, TW), 0).astype(jnp.float32)[None]
            out_ref[0] = out_ref[0] + contrib_at(ys)

        return carry

    jax.lax.fori_loop(0, 2, body, jnp.float32(0.0))


def ref_impl(rows):
    out = np.zeros((2, TH, TW), np.float32)
    ys = np.arange(TH, dtype=np.float32)[:, None] * np.ones((1, TW), np.float32)
    for i in range(2):
        for e in range(16):
            r = rows[i * 16 + e]
            inside = (ys >= r[0]) & (ys <= r[1])
            out[i] += np.where(inside, r[2] * ys, 0.0)
    return out


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    rows = np.zeros((32, 128), np.float32)
    # entries: ymin/ymax bands, some fitting a 16-row window, some not
    rows[:, 0] = rng.integers(0, 24, 32)          # ymin
    span = rng.integers(0, 20, 32)
    rows[:, 1] = np.minimum(rows[:, 0] + span, TH - 1)  # ymax
    rows[:, 2] = rng.uniform(0.5, 1.5, 32)        # value

    out = pl.pallas_call(
        kernel,
        grid=(2,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, TH, TW), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, TH, TW), jnp.float32),
        scratch_shapes=[pltpu.VMEM((16, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )(jnp.asarray(rows))
    got = np.asarray(out)
    want = ref_impl(rows)
    err = np.abs(got - want).max()
    print("max err:", err)
    assert err < 1e-3, "MISMATCH"
    print("PROBE OK")


if __name__ == "__main__":
    main()

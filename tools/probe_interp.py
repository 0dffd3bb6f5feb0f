#!/usr/bin/env python
"""Micro-bench: bilinear interpolation formulations for one-way coupling.

Variants over [N, P] points on a [Nx+1, Ny+1, 5] field:
  a) current: 4x advanced 2-D indexing field[ix, iy]
  b) flat:    flatten grid, 4x row gathers from [(Nx+1)*(Ny+1), 5]
  c) pair:    flatten grid, 2x [2, 5]-slice gathers (y-adjacent corners
              are contiguous rows)
  d) mxu:     per-floe [cw, cw, 5] window row-gather + separable one-hot
              MXU contractions (no per-point gathers)
All variants must agree to fp tolerance.
"""

import sys
import time

sys.path.insert(0, ".")


def scan_time(fn, args, n_iter=200):
    """Times fn inside a lax.scan, perturbing the point coordinates per
    iteration so the body is not loop-invariant (XLA would hoist it)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(a):
        fx, fy = a

        def f(acc, k):
            eps = (k % 2).astype(fx.dtype) * 1e-6
            out = fn(fx + eps, fy + eps)
            return acc + jnp.sum(out) * 1e-30, ()

        acc, _ = jax.lax.scan(f, jnp.zeros((), fx.dtype), jnp.arange(n_iter))
        return acc

    acc = run(args)
    jax.block_until_ready(acc)
    t0 = time.perf_counter()
    jax.block_until_ready(run(args))
    return (time.perf_counter() - t0) / n_iter * 1e3


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    print("device:", jax.devices()[0], flush=True)

    for N, P, G in ((512, 170, 51), (8016, 170, 201)):
        rng = np.random.default_rng(0)
        field = jnp.asarray(rng.random((G, G, 5)), jnp.float32)
        # clustered points: per-floe center + local offsets within ~7 cells
        cx = rng.random((N, 1)) * (G - 16) + 8
        cy = rng.random((N, 1)) * (G - 16) + 8
        fx = jnp.asarray(cx + rng.random((N, P)) * 7 - 3.5, jnp.float32)
        fy = jnp.asarray(cy + rng.random((N, P)) * 7 - 3.5, jnp.float32)

        def corners(fx, fy):
            ix = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, G - 2)
            iy = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, G - 2)
            wx = fx - ix
            wy = fy - iy
            return ix, iy, wx[..., None], wy[..., None]

        def v_current(fx, fy):
            ix, iy, wx, wy = corners(fx, fy)
            f00 = field[ix, iy]
            f10 = field[ix + 1, iy]
            f01 = field[ix, iy + 1]
            f11 = field[ix + 1, iy + 1]
            return (
                f00 * (1 - wx) * (1 - wy) + f10 * wx * (1 - wy)
                + f01 * (1 - wx) * wy + f11 * wx * wy
            )

        flat = field.reshape(G * G, 5)

        def v_flat(fx, fy):
            ix, iy, wx, wy = corners(fx, fy)
            k00 = ix * G + iy
            f00 = flat[k00]
            f10 = flat[k00 + G]
            f01 = flat[k00 + 1]
            f11 = flat[k00 + G + 1]
            return (
                f00 * (1 - wx) * (1 - wy) + f10 * wx * (1 - wy)
                + f01 * (1 - wx) * wy + f11 * wx * wy
            )

        def v_pair(fx, fy):
            ix, iy, wx, wy = corners(fx, fy)
            k00 = ix * G + iy
            a = flat[k00[..., None] + jnp.arange(2)]        # [N,P,2,5]
            b = flat[k00[..., None] + G + jnp.arange(2)]
            fy0 = a[..., 0, :] * (1 - wy) + a[..., 1, :] * wy
            fy1 = b[..., 0, :] * (1 - wy) + b[..., 1, :] * wy
            return fy0 * (1 - wx) + fy1 * wx

        CW = 16

        def v_mxu(fx, fy):
            ix, iy, wx, wy = corners(fx, fy)
            # per-floe window origin from the first point's floor
            ox = jnp.clip(jnp.min(ix, axis=1), 0, G - CW)   # [N]
            oy = jnp.clip(jnp.min(iy, axis=1), 0, G - CW)
            win_rows = field[ox[:, None] + jnp.arange(CW)]  # [N,CW,G,5]
            win = jnp.take_along_axis(
                win_rows,
                (oy[:, None] + jnp.arange(CW))[:, None, :, None],
                axis=2,
            )  # [N,CW,CW,5]
            kx = ix - ox[:, None]
            ky = iy - oy[:, None]
            ar = jnp.arange(CW, dtype=jnp.int32)
            ohx = (
                (kx[:, :, None] == ar) * (1 - wx)
                + (kx[:, :, None] + 1 == ar) * wx
            )  # [N,P,CW]
            ohy = (
                (ky[:, :, None] == ar) * (1 - wy)
                + (ky[:, :, None] + 1 == ar) * wy
            )
            tmp = jax.lax.dot_general(
                ohx, win.reshape(N, CW, CW * 5),
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).reshape(N, P, CW, 5)
            return jnp.sum(tmp * ohy[..., None], axis=2)

        def v_winblock(fx, fy):
            # per-floe [CW, CW, 5] window via vmapped dynamic_slice of the
            # flat field (one slice-gather per window row), then separable
            # in-window one-hot contraction at HIGH precision
            ix, iy, wx, wy = corners(fx, fy)
            ox = jnp.clip(jnp.min(ix, axis=1), 0, G - CW)   # [N]
            oy = jnp.clip(jnp.min(iy, axis=1), 0, G - CW)

            def row(o_x, o_y, a):
                return jax.lax.dynamic_slice(
                    flat, (jnp.minimum((o_x + a) * G + o_y, G * G - CW), 0),
                    (CW, 5),
                )

            win = jax.vmap(
                lambda o_x, o_y: jax.vmap(lambda a: row(o_x, o_y, a))(
                    jnp.arange(CW)
                )
            )(ox, oy)  # [N, CW, CW, 5]
            kx = ix - ox[:, None]
            ky = iy - oy[:, None]
            ar = jnp.arange(CW, dtype=jnp.int32)
            ohx = (
                (kx[:, :, None] == ar) * (1 - wx)
                + (kx[:, :, None] + 1 == ar) * wx
            )  # [N,P,CW]
            ohy = (
                (ky[:, :, None] == ar) * (1 - wy)
                + (ky[:, :, None] + 1 == ar) * wy
            )
            tmp = jax.lax.dot_general(
                ohx, win.reshape(N, CW, CW * 5),
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            ).reshape(N, P, CW, 5)
            return jnp.sum(tmp * ohy[..., None], axis=2)

        vals = {}
        for name, fn in (("current", v_current), ("flat", v_flat),
                         ("pair", v_pair), ("mxu", v_mxu),
                         ("winblock", v_winblock)):
            ms = scan_time(fn, (fx, fy))
            vals[name] = np.asarray(fn(fx, fy))
            err = np.max(np.abs(vals[name] - vals["current"]))
            print(f"[N={N}] {name:8s} {ms:7.3f} ms  maxerr={err:.2e}",
                  flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Minimal TPU smoke + timing for the Pallas narrow-phase kernel.

Isolates the kernel from the rest of the step: random 16-vertex rings,
B = 128k pairs, compares one result row against the jnp path and times
both under lax.scan.
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from subzero_tpu.geometry.clip import two_cross_pass
    from subzero_tpu.geometry.pallas_clip import two_cross_pallas

    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    B = 131072
    th = np.sort(rng.random((B, 16)), axis=1) * 2 * np.pi
    r = 0.5 + rng.random((B, 16))
    pv = np.stack([r * np.cos(th), r * np.sin(th)], axis=-1).astype(np.float32)
    qv = pv[::-1].copy() + rng.uniform(-1, 1, (B, 1, 2)).astype(np.float32)
    pn = rng.integers(3, 17, B).astype(np.int32)
    qn = rng.integers(3, 17, B).astype(np.int32)
    pert = np.full((B,), 1e-6, np.float32)
    args = tuple(map(jnp.asarray, (pv, pn, qv, qn, pert)))

    def scan_time(fn, n_iter=30):
        @jax.jit
        def run(pv, pn, qv, qn, pert):
            def body(c, k):
                out = fn(pv + c * 1e-30, pn, qv, qn, pert)
                return jnp.sum(out.area) % 2.0, ()
            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(n_iter))
            return acc
        acc = run(*args)
        jax.block_until_ready(acc)
        t0 = time.perf_counter()
        acc = run(*args)
        jax.block_until_ready(acc)
        return (time.perf_counter() - t0) / n_iter * 1e3

    print("compiling pallas...", flush=True)
    got = two_cross_pallas(*args)
    jax.block_until_ready(got.area)
    print("pallas compiled OK", flush=True)
    ref = two_cross_pass(*args)
    ok = np.asarray(ref.ok)
    err = np.abs(np.asarray(got.area)[ok] - np.asarray(ref.area)[ok])
    rel = err / np.maximum(np.asarray(ref.area)[ok], 1e-9)
    print(f"agree: cnt {int((np.asarray(got.cnt) == np.asarray(ref.cnt)).sum())}/{B}, "
          f"max rel area err {rel.max() if ok.any() else 0:.2e}", flush=True)
    ms_p = scan_time(two_cross_pallas)
    print(f"pallas narrow ({B} pairs): {ms_p:8.3f} ms", flush=True)
    ms_j = scan_time(two_cross_pass)
    print(f"jnp narrow    ({B} pairs): {ms_j:8.3f} ms  ({ms_j/ms_p:.1f}x)",
          flush=True)


if __name__ == "__main__":
    main()

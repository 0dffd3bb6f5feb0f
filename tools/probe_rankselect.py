#!/usr/bin/env python
"""Micro-bench: per-row rank-select formulations on TPU.

Current: one lax.top_k (lowers to a per-row sort on TPU).
Candidate: mask cumsum -> rank, then sel[n,k] = sum_c col[c] * (rank==k+1)
as one fused compare+multiply reduction (no sort, no scatter).

Shapes from the bench configs:
  dense 512x517 k=8; bin-member 442x8016 k=66; neighborhood 8016x594 k=16.
"""

import sys
import time

sys.path.insert(0, ".")


def scan_time(fn, args, n_iter=200):
    """Times fn inside a lax.scan.  The input mask is xor-perturbed with a
    per-iteration column so the body is NOT loop-invariant (XLA hoists
    invariant computations out of the scan, which silently times nothing)."""
    import jax
    import jax.numpy as jnp

    (mask,) = args
    C = mask.shape[1]
    col = jnp.arange(C, dtype=jnp.int32)

    @jax.jit
    def run(mask):
        def f(acc, k):
            m = mask ^ (col[None, :] == k)
            out = fn(m)
            return acc + out[0].astype(jnp.float32).sum() * 1e-30, ()

        acc, _ = jax.lax.scan(f, jnp.zeros((), jnp.float32), jnp.arange(n_iter))
        return acc

    acc = run(mask)
    jax.block_until_ready(acc)
    t0 = time.perf_counter()
    jax.block_until_ready(run(mask))
    return (time.perf_counter() - t0) / n_iter * 1e3


def rank_topk(mask, K):
    import jax
    import jax.numpy as jnp

    N, C = mask.shape
    col = jnp.arange(C, dtype=jnp.int32)
    key = jnp.where(mask, C - col, 0)
    if K > C:
        key = jnp.pad(key, ((0, 0), (0, K - C)))
    topv, _ = jax.lax.top_k(key, K)
    valid = topv > 0
    sel = jnp.where(valid, C - topv, C)
    row_tot = jnp.sum(mask.astype(jnp.int32), axis=1)
    overflow = jnp.any(row_tot > K)
    return sel.astype(jnp.int32), valid, overflow


def rank_cumsum(mask, K):
    import jax.numpy as jnp

    N, C = mask.shape
    col = jnp.arange(C, dtype=jnp.int32)
    cs = jnp.cumsum(mask.astype(jnp.int32), axis=1)
    rank = cs * mask  # [N, C]
    # fused compare-reduce: [N, C, K] never materialized past fusion
    hit = rank[:, :, None] == (jnp.arange(K, dtype=jnp.int32) + 1)[None, None, :]
    sel = jnp.sum(
        jnp.where(hit, col[None, :, None], 0), axis=1, dtype=jnp.int32
    )
    valid = jnp.arange(K)[None, :] < cs[:, -1:]
    sel = jnp.where(valid, sel, C)
    overflow = jnp.any(rank[:, -1] > K)
    return sel, valid, overflow


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    for N, C, K, dens in ((512, 517, 8, 0.01), (442, 8016, 66, 0.02),
                          (8016, 594, 16, 0.01), (8016, 8021, 16, 0.002)):
        mask = jnp.asarray(rng.random((N, C)) < dens)
        a = scan_time(lambda m: rank_topk(m, K), (mask,))
        b = scan_time(lambda m: rank_cumsum(m, K), (mask,))
        s1 = rank_topk(mask, K)
        s2 = rank_cumsum(mask, K)
        same = bool(jnp.all(s1[0] == s2[0]) & jnp.all(s1[1] == s2[1]))
        print(
            f"[{N}x{C} k={K}] top_k {a:7.3f} ms   cumsum {b:7.3f} ms   "
            f"equal={same}",
            flush=True,
        )


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Integrate/wrap/remove cost split at large N (the step's ~4.6 ms
'integrate+remove only' tail at 16k).

  PYTHONPATH="$PYTHONPATH:/root/repo" python tools/probe_finish16k.py [n L]
"""

import sys
import time

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from subzero_tpu.physics import simplification as S
    from subzero_tpu.physics import update_floe as U

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16000
    L = float(sys.argv[2]) if len(sys.argv) > 2 else 5.66e5
    sim = bench.build_sim(n, L, 2e3, bins=True)
    m = sim.model
    fl, oc, gr, dm = m.floes, m.ocean, m.grid, m.domain
    dtype = fl.verts.dtype
    print("device:", jax.devices()[0], "N:", fl.capacity, flush=True)

    def scan_time(body, n_iter=30):
        @jax.jit
        def run(fl0):
            def f(carry, k):
                fl_, acc = carry
                out = body(fl_)
                eps = (out % 2.0).astype(dtype) * 1e-30
                fl_ = fl_._replace(centroid=fl_.centroid + eps)
                return (fl_, acc + out), ()

            (fl1, acc), _ = jax.lax.scan(
                f, (fl0, jnp.zeros((), jnp.float32)), jnp.arange(n_iter)
            )
            return acc

        acc = run(fl)
        jax.block_until_ready(acc)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            acc = run(fl)
            jax.block_until_ready(acc)
            best = min(best, time.perf_counter() - t0)
        return best / n_iter * 1e3

    si = jnp.zeros_like(fl.stress_accum)

    def t_integrate(f):
        f2 = U.timestep_floe_properties(f, float(sim.dt), sim.floe_settings, si)
        return jnp.sum(f2.u).astype(jnp.float32)

    print(f"timestep_floe_properties: {scan_time(t_integrate):8.3f} ms",
          flush=True)

    def t_wrap(f):
        f2 = U.wrap_periodic(f, dm)
        return jnp.sum(f2.centroid).astype(jnp.float32)

    print(f"wrap_periodic:            {scan_time(t_wrap):8.3f} ms",
          flush=True)

    def t_remove(f):
        f2, oc2 = S.remove_and_dissolve(f, oc, gr, dm, sim.floe_settings)
        return (jnp.sum(oc2.dissolved) + jnp.sum(f2.active)).astype(
            jnp.float32
        )

    print(f"remove_and_dissolve:      {scan_time(t_remove):8.3f} ms",
          flush=True)

    # layout experiments: elementwise on [N, V, 2] vs flat [N, 2V]
    V = fl.max_verts

    def t_verts_add(f):
        v2 = f.verts + f.centroid[:, None, :]
        return jnp.sum(v2).astype(jnp.float32)

    print(f"verts+centroid [N,V,2]:   {scan_time(t_verts_add):8.3f} ms",
          flush=True)

    def t_verts_add_flat(f):
        vf = f.verts.reshape(f.capacity, 2 * V)
        sh = jnp.tile(f.centroid, (1, V))
        v2 = vf + sh
        return jnp.sum(v2).astype(jnp.float32)

    print(f"verts+centroid [N,2V]:    {scan_time(t_verts_add_flat):8.3f} ms",
          flush=True)

    def t_verts_sum(f):
        return jnp.sum(f.verts * 1.0000001).astype(jnp.float32)

    print(f"verts scale+sum [N,V,2]:  {scan_time(t_verts_sum):8.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()

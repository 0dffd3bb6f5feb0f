#!/usr/bin/env python
"""Distributed-step scaling measurements at production scale (SCALING.md).

Two complementary measurements, replacing the old 1-dev-vs-8-dev "strong
scaling" ratio (meaningless at N >= 8k: the decomposed step runs a dense
per-slab broad phase, so 8 slabs do ~8x less total broad-phase work than
one dense pool and the ratio comes out > 1):

1. COMM ISOLATION on the same 8-device mesh: the production program vs
   the SAME program with every ppermute replaced by the identity
   permutation (decomp.COMM_IDENTITY) - identical buffer shapes, packing
   work, and physics compute; only the inter-device data motion differs.
   overhead = 1 - sps_prod / sps_identity is pure communication cost *on
   this proxy* (virtual CPU devices exchange via host memcpy; real
   hardware rides ICI, orders of magnitude faster per byte - see 2).

2. ICI PROJECTION from measured communication VOLUME: ppermute moves the
   full static buffers every step, so per-device bytes/step follow from
   the decomposition capacities (decomp.comm_bytes_per_step).  Dividing
   by public TPU v5e ICI bandwidth (4.5e10 B/s one-way per link; the
   1-D ring uses both directions concurrently) gives the hardware comm
   time, compared against the measured TPU per-slab step time.

   projected_efficiency = t_step / (t_step + t_comm_ici)

Also prints run-level context rows (single-device run_scan vs 8-slab
run_decomp segment driver on the shared-host mesh) and a fracture-on
run_decomp wall time.

  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache_cpu \
  python tools/measure_scaling.py [n_floes] [n_steps]
"""

import sys
import time

sys.path.insert(0, ".")

# public number: TPU v5e ICI one-way bandwidth per link (bytes/s)
ICI_BW = 4.5e10
# measured TPU v5e per-slab step time to set the compute scale for the
# projection: bench many_floes_8000/8 slabs ~ 1000 floes/slab; the closest
# single-chip measurement is shear_flow_500 (509 floes, dense broad phase,
# two-way coupling) = 0.664 ms/step, many_floes_2000 (dense) = 2.70 ms.
# Interpolating at ~1000 floes: ~1.3 ms/step; use the conservative smaller
# value (less compute -> comm looks relatively worse).
T_STEP_SLAB_S = 1.3e-3


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from subzero_tpu.parallel import decomp as DEC
    from subzero_tpu.parallel.decomp import (
        build_decomp_segment,
        build_decomp_step,
        _dec_distribute,
        comm_bytes_per_step,
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
        ("1-D 8 slabs, per-step", lambda s: make_decomp(
            s.model.floes, s.model.domain, n_devices=8), False),
        ("1-D 8 slabs, segment driver", lambda s: make_decomp(
            s.model.floes, s.model.domain, n_devices=8), True),
        ("2-D (4,2) slabs, per-step", lambda s: make_decomp_2d(
            s.model.floes, s.model.domain, n_dev=(4, 2)), False),
    ):
        t0 = time.perf_counter()
        sim = builder()
        dec = make(sim)
        DEC.COMM_IDENTITY = False
        sps_prod = measure_step(sim, dec, segment=seg)
        DEC.COMM_IDENTITY = True
        try:
            sps_ident = measure_step(sim, dec, segment=seg)
        finally:
            DEC.COMM_IDENTITY = False
        eff = min(sps_prod / sps_ident, 1.0)
        vol = comm_bytes_per_step(sim, dec)
        # 1-D ring: left+right buffers move concurrently on separate link
        # directions -> per-link one-way volume is halo_cap + mig_cap rows
        one_way = vol["total"] / 2.0
        t_comm = one_way / ICI_BW
        proj = T_STEP_SLAB_S / (T_STEP_SLAB_S + t_comm)
        rows.append((label, sps_prod, sps_ident, eff, vol["total"], t_comm,
                     proj))
        print(
            f"{label:28s}  prod {sps_prod:7.3f} sps  identity-perm "
            f"{sps_ident:7.3f} sps  proxy-efficiency {eff:.3f}  "
            f"comm {vol['total'] / 1e6:.2f} MB/step/dev "
            f"(halo {vol['halo_bytes'] / 1e6:.2f} + mig "
            f"{vol['migration_bytes'] / 1e6:.2f} + grid "
            f"{vol['grid_psum_bytes_amortized'] / 1e6:.2f})  "
            f"ICI {t_comm * 1e6:.0f} us -> projected eff {proj:.3f}"
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

    print("\n| configuration | prod sps | identity-perm sps | proxy eff | "
          "comm MB/step | ICI time | projected eff |")
    print("|---|---|---|---|---|---|---|")
    for label, sp, si, eff, volb, tc, proj in rows:
        print(f"| {label} | {sp:.3f} | {si:.3f} | {eff:.3f} | "
              f"{volb / 1e6:.2f} | {tc * 1e6:.0f} us | **{proj:.3f}** |")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Strong-scaling of the distributed step at production scale (SCALING.md).

Measures steps/s of the same global problem on 1 device vs 8 virtual CPU
devices, for the 1-D x-slab and 2-D (x, y) slab decompositions, using both
per-step dispatch and the production device-resident segment driver
(build_decomp_segment - what run_decomp runs between host events).  Also
times a run_decomp-level block with the fracture lifecycle ON so the
host-pass overhead at cadence appears in a driver-level number.

All 8 virtual devices share the host's 2 vCPUs, so the ratio measures the
PARALLEL OVERHEAD of the decomposition (halo ppermutes, seam double
compute, migration packing, grid psums); real-hardware efficiency is at
least this ratio (ICI collectives are faster than host memcpy).

  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache \
  python tools/measure_scaling.py [n_floes] [n_steps]
"""

import sys
import time

sys.path.insert(0, ".")


def main():
    import jax

    import bench
    from subzero_tpu.parallel import measure_decomp_scaling

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8000
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    L = 4e5 * (n / 8000.0) ** 0.5

    def builder():
        # f32, two-way coupling on, same physics as the TPU bench config;
        # row budget 8 per floe (bins=True sets pair_cap = 8 * capacity,
        # which the decomposition inherits as its per-row budget)
        return bench.build_sim(n, L, 2e3, bins=True)

    print(f"devices: {len(jax.devices())}  n_floes: {n}  n_steps: {n_steps}",
          flush=True)
    rows = []
    for label, kw in (
        ("1-D 8 slabs, per-step dispatch", dict(n_dev=8)),
        ("1-D 8 slabs, segment driver", dict(n_dev=8, segment=True)),
        ("2-D (4,2) slabs, segment driver", dict(n_dev=(4, 2), segment=True)),
    ):
        t0 = time.perf_counter()
        res = measure_decomp_scaling(builder, n_steps=n_steps, **kw)
        nd = kw["n_dev"]
        rows.append((label, res[1], res[nd], res["efficiency"]))
        print(
            f"{label:36s}  1dev {res[1]:7.3f} sps  8dev {res[nd]:7.3f} sps"
            f"  efficiency {res['efficiency']:.3f}"
            f"   [{time.perf_counter() - t0:.0f}s incl. compile]",
            flush=True,
        )

    # run_decomp-level block with the fracture lifecycle ON (host passes at
    # cadence + gather/redistribute).  Stochastic fracture makes the two
    # trajectories diverge after the first cadence, so this is a
    # driver-level wall-time comparison on the same initial pool, not a
    # same-work ratio like the rows above.
    from subzero_tpu.parallel import make_decomp, run_decomp
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

    print("\n| configuration | 1-dev steps/s | 8-dev steps/s | vs 1 device |")
    print("|---|---|---|---|")
    for label, s1, s8, eff in rows:
        print(f"| {label} | {s1:.3f} | {s8:.3f} | **{eff:.3f}** |")


if __name__ == "__main__":
    main()

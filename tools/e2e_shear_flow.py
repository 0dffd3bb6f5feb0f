#!/usr/bin/env python
"""End-to-end timed run of the reference's title-scale example: 500-floe
shear_flow, 5000 steps, two-way coupling, floe writer every 50 steps -
the configuration behind the reference's ">35x faster than MATLAB"
headline (README.md:14).

Run detached on TPU:
  nohup /tmp/run_tpu.sh /tmp/e2e_shear.out python tools/e2e_shear_flow.py &
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))


def main():
    import warnings

    import jax
    import numpy as np

    from shear_flow import build
    from subzero_tpu.simulation import run
    from subzero_tpu.tools.conservation import floe_energy_momentum

    print("device:", jax.devices()[0], flush=True)
    sim = build(n_dt=5000, out_dir="/tmp/e2e_shear_out")
    # capacity-clean headroom: the default 8N pair budget truncates forces
    # on ~1% of steps in this shear-packed run (46/5000 measured); 16N with
    # the correspondingly deeper slow tier (pair_cap//128) clears it
    sim.pair_cap = 16 * sim.model.floes.capacity
    n0 = int(sim.model.floes.count())
    mass0 = float(np.sum(np.where(np.asarray(sim.model.floes.active),
                                  np.asarray(sim.model.floes.mass), 0.0)))
    t0 = time.time()
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        run(sim)
    wall = time.time() - t0
    fl = sim.model.floes
    n1 = int(fl.count())
    mass1 = float(np.sum(np.where(np.asarray(fl.active),
                                  np.asarray(fl.mass), 0.0)))
    em = {k: float(v) for k, v in floe_energy_momentum(fl).items()}
    # run() aggregates per-step capacity overflows into one end-of-run
    # warning: "<n> steps exceeded pair/crossing capacity" - extract n
    import re

    n_overflow_steps = 0
    for w in caught:
        m = re.match(r"(\d+) steps exceeded", str(w.message))
        if m:
            n_overflow_steps += int(m.group(1))
    print(
        f"5000-step shear_flow (two-way coupling, writers@50): {wall:.1f} s "
        f"({5001 / wall:.1f} steps/s wall), floes {n0} -> {n1}",
        flush=True,
    )
    print(
        f"overflow steps: {n_overflow_steps}; mass {mass0:.6e} -> "
        f"{mass1:.6e} ({(mass1 - mass0) / mass0 * 100:+.4f}%: thermodynamic "
        f"growth at -1 degC atmos, minus dissolved min-area floes); "
        f"final KE {em['ke']:.4e}, |p| {np.hypot(em['px'], em['py']):.4e}",
        flush=True,
    )
    if n_overflow_steps:
        print(
            f"FAIL: {n_overflow_steps} steps truncated contact forces - "
            "grow pair_cap/clip_cap until this run is capacity-clean",
            flush=True,
        )
        sys.exit(1)
    print("PASS: capacity-clean (0 overflow steps)", flush=True)


if __name__ == "__main__":
    main()

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
    n_overflow_warn = sum(
        1 for w in caught if "capacity" in str(w.message)
    )
    print(
        f"5000-step shear_flow (two-way coupling, writers@50): {wall:.1f} s "
        f"({5001 / wall:.1f} steps/s wall), floes {n0} -> {n1}",
        flush=True,
    )
    print(
        f"overflow warnings: {n_overflow_warn}; mass {mass0:.6e} -> "
        f"{mass1:.6e} ({(mass1 - mass0) / mass0 * 100:+.4f}% incl. "
        f"dissolved min-area floes); final KE {em['ke']:.4e}, "
        f"|p| {np.hypot(em['px'], em['py']):.4e}",
        flush=True,
    )


if __name__ == "__main__":
    main()

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
    import jax

    from shear_flow import build
    from subzero_tpu.simulation import run

    print("device:", jax.devices()[0], flush=True)
    sim = build(n_dt=5000, out_dir="/tmp/e2e_shear_out")
    n0 = int(sim.model.floes.count())
    t0 = time.time()
    run(sim)
    wall = time.time() - t0
    n1 = int(sim.model.floes.count())
    print(
        f"5000-step shear_flow (two-way coupling, writers@50): {wall:.1f} s "
        f"({5001 / wall:.1f} steps/s wall), floes {n0} -> {n1}",
        flush=True,
    )


if __name__ == "__main__":
    main()

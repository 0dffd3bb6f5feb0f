#!/usr/bin/env python
"""Throughput at increasing floe counts (dense broad phase) on the default
device: where does the O(N^2) candidate matrix stop paying for itself?

Run detached on TPU:
  nohup /tmp/run_tpu.sh /tmp/scale_probe.out python tools/scale_probe.py &
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import build_sim, measure

    print("device:", jax.devices()[0], flush=True)
    for n, L in ((500, 1e5), (2000, 2e5), (4096, 2.86e5), (8192, 4.04e5)):
        sim = build_sim(n, L, 2e3)
        r = measure(sim, n_steps=20)
        print(
            f"N={r['n_floes']:6d} pairs/step={r['pairs_per_step']:7d} "
            f"steps/s={r['steps_per_s']:8.2f} "
            f"pairs/s={r['pairs_per_s'] / 1e6:7.3f}M",
            flush=True,
        )


if __name__ == "__main__":
    main()

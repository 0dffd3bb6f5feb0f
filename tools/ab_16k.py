#!/usr/bin/env python
"""Quick A/B: the 16k bench config alone (full step, two-way coupling on).

  PYTHONPATH="$PYTHONPATH:/root/repo" python tools/ab_16k.py [n L n_steps]
"""

import sys

sys.path.insert(0, ".")


def main():
    import jax

    import bench

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16000
    L = float(sys.argv[2]) if len(sys.argv) > 2 else 5.66e5
    n_steps = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    sim = bench.build_sim(n, L, 2e3, bins=True)
    print("device:", jax.devices()[0], "P:", sim.model.floes.sub_x.shape[1],
          flush=True)
    r = bench.measure(sim, n_steps=n_steps)
    print({k: (round(v, 1) if isinstance(v, float) else v)
           for k, v in r.items()}, flush=True)


if __name__ == "__main__":
    main()

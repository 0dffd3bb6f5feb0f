#!/usr/bin/env python
"""f32 vs f64 conservation drift table (SURVEY 7.3 error budget).

Runs the four conservation scenarios at BOTH precisions through the full
jitted step (the TPU production path is f32) and prints % drift over 5000
steps of KE / linear momentum / angular momentum, diagnostics accumulated
in f64 either way.  The committed results live in docs/PRECISION.md.

  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu JAX_ENABLE_X64=true \
      python tools/f32_drift_table.py
"""

import sys

sys.path.insert(0, ".")


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from subzero_tpu.tools.scenarios import SCENARIOS, conservation_run

    keys = ("ke", "px", "py", "l")
    print(f"{'scenario':18s} {'dtype':8s} " + " ".join(f"{k:>12s}" for k in keys),
          flush=True)
    for sc in SCENARIOS:
        for dtype in (jnp.float64, jnp.float32):
            drift, _ = conservation_run(dtype, sc)
            name = "f64" if dtype == jnp.float64 else "f32"
            print(
                f"{sc:18s} {name:8s} "
                + " ".join(f"{drift[k]:12.5f}" for k in keys),
                flush=True,
            )


if __name__ == "__main__":
    main()

"""f32 error-budget regression tests (SURVEY 7.3, docs/PRECISION.md).

The TPU production path is float32; these pin its conservation drift so a
Pallas/jnp fast-path or tolerance regression cannot land silently.  The
measured budget (tools/f32_drift_table.py) is ~0.04% / 0.4% angular drift
for the two scenarios; bounds here carry ~2.5x headroom.
"""

import jax.numpy as jnp

from subzero_tpu.tools.scenarios import conservation_run


def test_f32_head_on_drift():
    drift, _ = conservation_run(jnp.float32, "head_on")
    assert abs(drift["ke"]) < 0.01, drift
    assert abs(drift["px"]) < 0.01, drift
    assert abs(drift["py"]) < 0.01, drift
    assert abs(drift["l"]) < 0.2, drift


def test_f32_three_floes_drift():
    drift, _ = conservation_run(jnp.float32, "three_floes")
    assert abs(drift["ke"]) < 0.01, drift
    assert abs(drift["px"]) < 0.01, drift
    assert abs(drift["py"]) < 0.01, drift
    assert abs(drift["l"]) < 1.0, drift

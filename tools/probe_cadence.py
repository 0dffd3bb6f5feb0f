#!/usr/bin/env python
"""Does the coupling lax.cond actually skip work at cadence?

Times the full jitted step under scan with coupling OFF, every step
(dt=1), and at cadence (dt=10).  If cond works: dt10 = off + (dt1-off)/10.
If cond was select-converted: dt10 = dt1.
"""

import dataclasses
import sys

sys.path.insert(0, ".")


def main():
    import jax

    import bench

    for n, L, use_bins in ((500, 1e5, False), (8000, 4e5, True)):
        rows = {}
        for tag, kw in (("off", dict(coupling=False)), ("dt1", {}), ("dt10", {})):
            sim = bench.build_sim(n, L, 2e3, bins=use_bins, **kw)
            if tag == "dt1":
                sim.coupling_settings = dataclasses.replace(
                    sim.coupling_settings, dt=1
                )
            r = bench.measure(sim, n_steps=20)
            rows[tag] = r["step_ms"]
            print(f"N={n} coupling={tag}: step {r['step_ms']} ms", flush=True)
        occ = rows["dt1"] - rows["off"]
        pred_cond = rows["off"] + occ / 10
        print(
            f"N={n}: occurrence={occ:.2f} ms, predicted-if-cond-works "
            f"{pred_cond:.2f} vs measured dt10 {rows['dt10']:.2f}",
            flush=True,
        )


if __name__ == "__main__":
    main()

"""Simulation driver.

Mirrors the reference ``Simulation`` + ``run!`` + ``timestep_sim!``
(/root/reference/src/simulation_components/simulation.jl): the per-step
process order is identical (collisions -> ridge/raft -> coupling ->
integration -> fracture -> welding -> simplification), but each process is a
batched pure function over the floe pool and the whole step is one jitted
XLA program.  Process cadences (every-N-steps scheduling) are resolved with
``lax.cond`` so a single compiled step serves every timestep.

Floe creation/destruction (fracture, fusing, welding) occurs at low cadence;
those steps recompact the pool.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .constants import Constants
from .core.domain import Domain
from .core.model import Model
from .physics import collisions as _collisions
from .physics import coupling as _coupling
from .physics import lifecycle_host as _lifecycle
from .physics import simplification as _simplification
from .physics import update_floe as _update_floe
from .settings import (
    CollisionSettings,
    CouplingSettings,
    FloeSettings,
    FractureSettings,
    RidgeRaftSettings,
    SimplificationSettings,
    WeldSettings,
)


# Dense-vs-binned crossover for bins="auto" (active floe count).  TPU v5e
# measurements (bench.py, f32, two-way coupling on): dense wins at N=2000
# (2.63 M pairs/s), binned wins at N=8016; the crossover sits between, and
# the dense [N, N] mask's footprint grows quadratically - 6000 keeps
# comfortably to the winning side at scale.
AUTO_BINS_MIN_N = 6000


@dataclasses.dataclass
class Simulation:
    model: Model
    consts: Constants = Constants()
    dt: int = 10
    n_dt: int = 7500
    verbose: bool = False
    name: str = "sim"
    seed: int = 0
    floe_settings: FloeSettings = FloeSettings()
    coupling_settings: CouplingSettings = CouplingSettings()
    collision_settings: CollisionSettings = CollisionSettings()
    fracture_settings: FractureSettings = FractureSettings()
    simp_settings: SimplificationSettings = SimplificationSettings()
    ridgeraft_settings: RidgeRaftSettings = RidgeRaftSettings()
    weld_settings: WeldSettings = WeldSettings()
    writers: Any = None
    # saved numpy Generator state (bit_generator.state dict) applied at the
    # start of run(); set by io.writers.restart so a resumed run continues
    # the exact RNG stream of the original (the reference cannot do this -
    # simulation.jl:306-308 documents restart! as approximate)
    rng_state: Optional[dict] = None
    # run the host ridge/raft pass at the reference's mid-step position
    # (between collisions and coupling, simulation.jl:121-135) by splitting
    # the jitted step at ridge/raft cadence steps; False keeps ridge/raft
    # with the other host passes at end of step (one fused device step,
    # fewer host syncs - the ordering deviation is bounded by
    # tests/test_lifecycle.py::test_interleaved_vs_endofstep_ridge_raft)
    interleave_ridge_raft: bool = True
    # capacities (static shapes)
    pair_cap: Optional[int] = None
    cell_cap: Optional[int] = None
    clip_cap: int = 16
    # (nbx, nby, M) spatial broad-phase binning.  "auto" (the default)
    # enables binning when the active floe count reaches AUTO_BINS_MIN_N
    # (parameters from _auto_bins); None forces the dense broad phase; an
    # explicit tuple forces those bin parameters.
    bins: Any = "auto"

    def __post_init__(self):
        N = self.model.floes.capacity
        if self.pair_cap is None:
            self.pair_cap = max(8 * N, 256)
        if self.cell_cap is None:
            # enough line-centered cells to cover the largest floe
            rmax = float(jnp.max(self.model.floes.rmax))
            g = self.model.grid
            cap = int(2 * np.ceil(1.5 * rmax / min(g.dx, g.dy)) + 3)
            self.cell_cap = min(cap, max(g.Nx, g.Ny) + 1)
        # The dense [N, N] broad phase is pure well-tiled VPU work and wins
        # below a few thousand floes on TPU v5e (binned pays gather chains);
        # past the crossover the O(N * M) binned phase wins and keeps
        # growing headroom.  bins="auto" switches at AUTO_BINS_MIN_N
        # (TPU A/B at N=8016: see BENCH detail / tools/bench notes);
        # equivalence is CPU-validated by tests/test_binned.py.
        if isinstance(self.bins, str) and self.bins == "auto":
            n_act = int(jnp.sum(self.model.floes.active))
            self.bins = (
                _auto_bins(self.model) if n_act >= AUTO_BINS_MIN_N else None
            )


def _auto_bins(model: Model) -> Optional[tuple]:
    """Choose static (nbx, nby, M) bin parameters from the initial field:
    bin size >= 2.2 * max rmax (so 3x3 neighborhoods capture all pairs, with
    growth headroom), per-bin capacity 2x the initial max occupancy."""
    floes = model.floes
    act = np.asarray(floes.active)
    if act.sum() == 0:
        return None
    rmax = float(np.max(np.asarray(floes.rmax)[act]))
    vals = np.asarray(model.domain.vals, float)
    Lx = vals[2] - vals[3]
    Ly = vals[0] - vals[1]
    b = 2.2 * rmax
    nbx = max(int(Lx / b), 1)
    nby = max(int(Ly / b), 1)
    if nbx * nby < 16:
        return None  # too few bins to be worth it
    cx = np.asarray(floes.centroid)[act]
    ibx = np.clip(((cx[:, 0] - vals[3]) / (Lx / nbx)).astype(int), 0, nbx - 1)
    iby = np.clip(((cx[:, 1] - vals[1]) / (Ly / nby)).astype(int), 0, nby - 1)
    occ = np.bincount(ibx * nby + iby, minlength=nbx * nby)
    M = int(2 * occ.max() + 8)
    return (nbx, nby, M)


def build_step_parts(sim: Simulation) -> tuple[Callable, Callable]:
    """Compile the step as two jitted halves so the host ridge/raft pass can
    run at the reference's mid-step position (between collisions and
    coupling, simulation.jl:121-135):

      collide(floes, ocean, domain, tstep)
          -> (floes, domain, stress_instant, overflow)
      finish(floes, ocean, domain, stress_instant, tstep)
          -> (floes, ocean, domain, overflow)
    """
    grid = sim.model.grid
    atmos = sim.model.atmos
    consts = sim.consts
    dt = float(sim.dt)
    fs = sim.floe_settings
    cps = sim.coupling_settings
    cls = sim.collision_settings

    def collide(floes, ocean, domain: Domain, tstep):
        stress_instant = jnp.zeros_like(floes.stress_accum)
        overflow = jnp.asarray(False)

        # --- collisions (simulation.jl:108-117) ---------------------------
        if cls.collisions_on:
            res = _collisions.timestep_collisions(
                floes, domain, consts, dt, cls, sim.pair_cap, sim.clip_cap,
                sim.bins,
            )
            floes = res.floes
            stress_instant = res.stress_instant
            overflow = overflow | res.overflow
        # moving boundaries advance after collisions (collisions.jl:797)
        domain = domain.update_boundaries(dt)
        return floes, domain, stress_instant, overflow

    def finish(floes, ocean, domain: Domain, stress_instant, tstep):
        overflow = jnp.asarray(False)

        # --- coupling (simulation.jl:151-161) -----------------------------
        if cps.coupling_on:
            def do_coupling(args):
                floes_, ocean_ = args
                return _coupling.timestep_coupling(
                    floes_, grid, domain, ocean_, atmos, consts, cps, fs, dt,
                    sim.cell_cap,
                )

            floes, ocean, cp_overflow = jax.lax.cond(
                jnp.mod(tstep, cps.dt) == 0,
                do_coupling,
                lambda args: (*args, jnp.asarray(False)),
                (floes, ocean),
            )
            overflow = overflow | cp_overflow

        # --- integrate (simulation.jl:165-170) ----------------------------
        floes = _update_floe.timestep_floe_properties(
            floes, dt, fs, stress_instant
        )
        floes = _update_floe.wrap_periodic(floes, domain)

        # --- removal / dissolution (simplify_floes! device part,
        #     simulation.jl:205-214) -----------------------------------------
        floes, ocean = _simplification.remove_and_dissolve(
            floes, ocean, grid, domain, fs
        )
        return floes, ocean, domain, overflow

    return jax.jit(collide), jax.jit(finish)


def build_step(sim: Simulation) -> Callable:
    """Compile one simulation step: (floes, ocean, domain, tstep) -> same.

    The returned function is jitted once; tstep is a traced scalar so
    process cadences use lax.cond.
    """
    collide, finish = build_step_parts(sim)

    def step(floes, ocean, domain: Domain, tstep):
        floes, domain, stress_instant, ov1 = collide(
            floes, ocean, domain, tstep
        )
        floes, ocean, domain, ov2 = finish(
            floes, ocean, domain, stress_instant, tstep
        )
        return floes, ocean, domain, ov1 | ov2

    return jax.jit(step)


def run_scan(sim: Simulation, n_steps: int, start_tstep: int = 0, collect=None):
    """Run n_steps under one jitted lax.scan (no host round-trips).

    ``collect(floes, ocean)`` maps the state to small per-step outputs that
    are stacked over steps (e.g. kinematics for conservation checks).
    Returns (floes, ocean, domain, collected).

    The per-step overflow flag is accumulated across the scan and surfaced
    as a warning, exactly like ``run`` does - capacity overflow means
    contact forces were truncated and the results are unreliable.
    """
    step = build_step(sim)

    def body(carry, tstep):
        floes, ocean, domain, n_over = carry
        floes, ocean, domain, overflow = step(floes, ocean, domain, tstep)
        out = collect(floes, ocean) if collect is not None else None
        return (floes, ocean, domain, n_over + overflow.astype(jnp.int32)), out

    @jax.jit
    def scan_all(floes, ocean, domain):
        ts = jnp.arange(start_tstep, start_tstep + n_steps)
        return jax.lax.scan(
            body, (floes, ocean, domain, jnp.asarray(0, jnp.int32)), ts
        )

    (floes, ocean, domain, n_overflow), collected = scan_all(
        sim.model.floes, sim.model.ocean, sim.model.domain
    )
    if int(n_overflow):
        import warnings

        warnings.warn(
            f"{int(n_overflow)} steps exceeded pair/crossing capacity; "
            "results may be inaccurate. Increase pair_cap/clip_cap."
        )
    sim.model = sim.model.replace(floes=floes, ocean=ocean, domain=domain)
    return sim, collected


def _warn_overflow_host(overflow, which, tstep, state, logger=None):
    if bool(overflow):
        state["n_overflow"] = state.get("n_overflow", 0) + 1
        msg = (
            f"pair/crossing capacity exceeded in {which} overlap query; "
            "the overlap list may be incomplete"
        )
        if logger is not None:
            logger.warn(msg, tstep)
        else:
            import warnings

            warnings.warn(msg)


def _host_ridge_raft(sim, floes, domain, tstep, rng, state, logger=None):
    """The host ridge/raft pass (simulation.jl:121-135); called either
    mid-step (interleave_ridge_raft) or from _host_lifecycle_passes."""
    rr = sim.ridgeraft_settings
    i, j, area, valid, overflow = _collisions.pair_overlaps(
        floes, domain, sim.pair_cap, sim.clip_cap, sim.bins
    )
    _warn_overflow_host(overflow, "ridge/raft", tstep, state, logger)
    mask = np.asarray(valid)
    overlaps = list(
        zip(
            np.asarray(i)[mask].tolist(),
            np.asarray(j)[mask].tolist(),
            np.asarray(area)[mask].tolist(),
        )
    )
    if overlaps:
        floes, state["max_floe_id"] = _lifecycle.timestep_ridging_rafting(
            floes, domain, overlaps, state["max_floe_id"],
            rr, sim.floe_settings, sim.simp_settings, float(sim.dt), rng,
        )
    return floes


def _host_lifecycle_passes(
    sim, floes, domain, tstep, rng, state, logger=None,
    skip_ridge_raft=False,
):
    """Host-orchestrated topology changes at their process cadences
    (timestep_sim! order, simulation.jl:94-220). Returns updated floes."""
    fs = sim.floe_settings
    dt = float(sim.dt)

    def _warn_overflow(overflow, which):
        _warn_overflow_host(overflow, which, tstep, state, logger)

    # ridging / rafting (simulation.jl:121-135)
    rr = sim.ridgeraft_settings
    if (
        not skip_ridge_raft
        and rr.ridge_raft_on and rr.dt > 0 and tstep % rr.dt == 0 and tstep > 0
    ):
        floes = _host_ridge_raft(sim, floes, domain, tstep, rng, state, logger)

    # fracture (simulation.jl:172-182)
    fr = sim.fracture_settings
    if fr.fractures_on and fr.dt > 0 and tstep % fr.dt == 0 and tstep > 0:
        overlaps = None
        if fr.deform_on:
            # materialized interaction rows so each fracturing floe's
            # deformer displacement follows the recorded contact-force
            # vector, exactly like the reference (fractures.jl:482-507
            # reads interactions[max_overlap_idx, xforce:yforce])
            rows = _collisions.pair_interactions(
                floes, domain, sim.consts, float(sim.dt), sim.pair_cap,
                sim.clip_cap, sim.bins,
            )
            _warn_overflow(rows["overflow"], "fracture deform")
            mask = np.asarray(rows["valid"])
            overlaps = list(
                zip(
                    np.asarray(rows["i"])[mask].tolist(),
                    np.asarray(rows["j"])[mask].tolist(),
                    np.asarray(rows["overlap"])[mask].tolist(),
                    np.asarray(rows["fx"])[mask].tolist(),
                    np.asarray(rows["fy"])[mask].tolist(),
                )
            )
        floes, state["max_floe_id"] = _lifecycle.fracture_floes(
            floes, state["max_floe_id"], rng, fr, fs, dt, overlaps
        )

    # welding (simulation.jl:185-202)
    ws = sim.weld_settings
    if ws.weld_on:
        for k, wdt in enumerate(ws.dts):
            if tstep > 0 and tstep % wdt == 0:
                floes, state["max_floe_id"] = _lifecycle.timestep_welding(
                    floes, state["max_floe_id"], sim.model.grid, domain,
                    ws, fs, k, dt, rng,
                )
                break

    # smoothing (simplification.jl:56-121)
    sp = sim.simp_settings
    if (
        sp.smooth_vertices_on
        and sp.dt_smooth > 0
        and tstep > 0
        and tstep % sp.dt_smooth == 0
    ):
        floes = _lifecycle.smooth_floes(floes, sp, fs, dt, rng)

    # fusing of >max-overlap pairs flagged by collisions
    if bool(jnp.any(floes.fuse_with >= 0)):
        floes, state["max_floe_id"] = _lifecycle.fuse_floes(
            floes, state["max_floe_id"], fs, dt, rng
        )
    return floes


def run(sim: Simulation, start_tstep: int = 0, callback=None, collect=None):
    """run! (simulation.jl:287-297): step the simulation n_dt times.

    ``callback(tstep, floes, ocean, domain)`` is invoked before each step
    (mirroring write_data!'s position in timestep_sim!, simulation.jl:105);
    used by output writers.  NOTE: a callback forces one host sync per step
    (segments are disabled) - for per-step diagnostics use ``collect``.

    ``collect(floes, ocean)`` maps the post-step state to small per-step
    outputs that are accumulated DEVICE-SIDE inside the jitted segments (no
    per-step host sync) and returned stacked over steps, like
    ``run_scan``'s.  When given, ``run`` returns ``(sim, collected)``.
    """
    from .io.logger import SimulationLogger

    logger = SimulationLogger(sim.name)
    collide, finish = build_step_parts(sim)

    def step(floes, ocean, domain, tstep):
        floes, domain, si, ov1 = collide(floes, ocean, domain, tstep)
        floes, ocean, domain, ov2 = finish(floes, ocean, domain, si, tstep)
        return floes, ocean, domain, ov1 | ov2

    rr = sim.ridgeraft_settings
    rr_mid_step = (
        sim.interleave_ridge_raft and rr.ridge_raft_on and rr.dt > 0
    )
    floes = sim.model.floes
    ocean = sim.model.ocean
    domain = sim.model.domain
    tstep = start_tstep
    n_overflow = 0
    collected = []
    rng = np.random.default_rng(sim.seed)
    if sim.rng_state is not None:
        rng.bit_generator.state = sim.rng_state
    state = {"max_floe_id": int(jnp.max(sim.model.floes.id))}
    has_host_ops = (
        sim.ridgeraft_settings.ridge_raft_on
        or sim.fracture_settings.fractures_on
        or sim.weld_settings.weld_on
        or sim.simp_settings.smooth_vertices_on
        or sim.collision_settings.collisions_on  # fusing flags
    )

    # ---- device-resident segment batching ---------------------------------
    # Between host events (writer intervals, lifecycle cadences) the steps
    # run inside ONE jitted lax.while_loop, so the driver moves at scan
    # speed instead of paying a host round-trip per step.  The loop exits
    # early when collisions mark a fuse pair (the host fuse pass must run
    # before the next step, matching the reference's same-step fusing,
    # collisions.jl:364-368 -> simulation.jl:205-214).
    use_segments = callback is None
    pre_cads = []   # host needed BEFORE the step at multiples of these
    post_cads = []  # host needed AFTER the step at multiples of these
    if use_segments:
        if sim.writers is not None:
            for w in (sim.writers.floes, sim.writers.grid,
                      sim.writers.checkpoint):
                if w is not None:
                    pre_cads.append(w.interval)
        if sim.verbose:
            pre_cads.append(50)
        if rr_mid_step:
            pre_cads.append(rr.dt)
        elif rr.ridge_raft_on and rr.dt > 0:
            post_cads.append(rr.dt)
        fr = sim.fracture_settings
        if fr.fractures_on and fr.dt > 0:
            post_cads.append(fr.dt)
        if sim.weld_settings.weld_on:
            post_cads.extend(sim.weld_settings.dts)
        if (
            sim.simp_settings.smooth_vertices_on
            and sim.simp_settings.dt_smooth > 0
        ):
            post_cads.append(sim.simp_settings.dt_smooth)

        # collect buffer capacity = longest possible segment (static shape)
        seg_cap = sim.n_dt + 1
        for c in pre_cads + post_cads:
            seg_cap = min(seg_cap, c)
        seg_cap = max(1, min(seg_cap, 2048))

        @jax.jit
        def run_segment(floes, ocean, domain, t0, t_stop):
            if collect is not None:
                proto = jax.eval_shape(collect, floes, ocean)
                buf0 = jax.tree.map(
                    lambda s: jnp.zeros((seg_cap,) + s.shape, s.dtype), proto
                )
            else:
                buf0 = ()

            def cond_fn(c):
                _, _, _, t, _, fuse, _ = c
                return (t < t_stop) & ~fuse

            def body_fn(c):
                fl, oc, dm, t, nov, _, buf = c
                fl, dm, si, ov1 = collide(fl, oc, dm, t)
                fl, oc, dm, ov2 = finish(fl, oc, dm, si, t)
                fuse = jnp.any(fl.fuse_with >= 0)
                nov = nov + (ov1 | ov2).astype(jnp.int32)
                if collect is not None:
                    out = collect(fl, oc)
                    buf = jax.tree.map(
                        lambda b, o: jax.lax.dynamic_update_index_in_dim(
                            b, o.astype(b.dtype), t - t0, 0
                        ),
                        buf, out,
                    )
                return (fl, oc, dm, t + 1, nov, fuse, buf)

            return jax.lax.while_loop(
                cond_fn, body_fn,
                (floes, ocean, domain, t0,
                 jnp.zeros((), jnp.int32), jnp.zeros((), bool), buf0),
            )

    def _next_on(t, c, skip_zero):
        # smallest s >= t with s % c == 0 (writers fire at s == 0 too;
        # lifecycle cadences require s > 0)
        s = ((t + c - 1) // c) * c
        return c if (skip_zero and s == 0) else s

    end_tstep = start_tstep + sim.n_dt
    while tstep <= end_tstep:
        if use_segments:
            # stop BEFORE any event step: pre events need the host before
            # the step runs; post events (lifecycle cadences) need their
            # host pass right after it, which the single-step path below
            # provides
            t_stop = min(end_tstep + 1, tstep + seg_cap)
            for c in pre_cads:
                t_stop = min(t_stop, _next_on(tstep, c, skip_zero=False))
            for c in post_cads:
                t_stop = min(t_stop, _next_on(tstep, c, skip_zero=True))
            if t_stop > tstep:
                fl, oc, dm, t_dev, nov, fuse, buf = run_segment(
                    floes, ocean, domain,
                    jnp.asarray(tstep, jnp.int32),
                    jnp.asarray(t_stop, jnp.int32),
                )
                floes, ocean, domain = fl, oc, dm
                nov = int(nov)
                seg_len = int(t_dev) - tstep
                tstep = int(t_dev)
                if collect is not None and seg_len > 0:
                    collected.append(
                        jax.tree.map(lambda a: a[:seg_len], buf)
                    )
                if nov:
                    n_overflow += nov
                    logger.warn(
                        f"pair/crossing capacity exceeded on {nov} of the "
                        f"last {seg_len} steps; contact forces may be "
                        "incomplete",
                        tstep - 1,
                    )
                if bool(fuse) and has_host_ops:
                    floes, state["max_floe_id"] = _lifecycle.fuse_floes(
                        floes, state["max_floe_id"], sim.floe_settings,
                        float(sim.dt), rng,
                    )
                continue  # tstep now sits on a host event (or past the end)
        if sim.verbose and tstep % 50 == 0:
            print(f"{tstep} timesteps")
        if callback is not None:
            callback(tstep, floes, ocean, domain)
        if sim.writers is not None:
            sim.model = sim.model.replace(floes=floes, ocean=ocean, domain=domain)
            sim.writers.write_data(
                sim, tstep, floes, ocean, domain,
                rng_state=rng.bit_generator.state,
            )
        rr_now = rr_mid_step and tstep % rr.dt == 0 and tstep > 0
        if rr_now:
            # reference mid-step placement: collisions -> ridge/raft ->
            # coupling/integration (simulation.jl:108-135)
            floes, domain, si, ov1 = collide(
                floes, ocean, domain, jnp.asarray(tstep)
            )
            floes = _host_ridge_raft(
                sim, floes, domain, tstep, rng, state, logger
            )
            # pieces created mid-step carry zero instantaneous stress this
            # step; pad the stress rows to the (unchanged) pool capacity
            floes, ocean, domain, ov2 = finish(
                floes, ocean, domain, si, jnp.asarray(tstep)
            )
            overflow = ov1 | ov2
        else:
            floes, ocean, domain, overflow = step(
                floes, ocean, domain, jnp.asarray(tstep)
            )
        if collect is not None:
            collected.append(
                jax.tree.map(
                    lambda a: a[None], collect(floes, ocean)
                )
            )
        if bool(overflow):
            n_overflow += 1
            logger.warn(
                "pair/crossing capacity exceeded; contact forces may be "
                "incomplete this step",
                tstep,
            )
        if has_host_ops:
            floes = _host_lifecycle_passes(
                sim, floes, domain, tstep, rng, state, logger,
                skip_ridge_raft=rr_now,
            )
        tstep += 1
    n_overflow += state.get("n_overflow", 0)
    if n_overflow:
        import warnings

        warnings.warn(
            f"{n_overflow} steps exceeded pair/crossing capacity; results "
            "may be inaccurate. Increase pair_cap/clip_cap."
        )
    if sim.writers is not None:
        sim.writers.close()
    logger.close()
    sim.model = sim.model.replace(floes=floes, ocean=ocean, domain=domain)
    if collect is not None:
        out = (
            jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *collected)
            if collected else None
        )
        return sim, out
    return sim

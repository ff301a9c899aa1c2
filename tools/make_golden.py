#!/usr/bin/env python
"""Generate golden fixtures from the reference implementation (the oracle).

Runs the reference CPU/NumPy dynamics (/root/reference, read-only) with its
renderer stubbed out, records trajectories/term outputs/trim states, and writes
them to tests/fixtures/*.npz. The committed fixtures make the test suite
self-contained — the reference is only needed to REgenerate them.

Usage:  python tools/make_golden.py [--ref /root/reference]
"""
import argparse
import os
import sys
import types

import numpy as np

FIXTURE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                           "tests", "fixtures")


def import_reference(ref_root: str):
    """Import the reference heligym with the GL renderer replaced by a stub
    (the dynamics never touch it; the env only calls no-op methods)."""
    os.environ["HELIGYM_RESOURCE_DIR"] = os.path.join(
        ref_root, "heligym", "envs", "renderer", "resources")
    sys.path.insert(0, ref_root)

    class _StubRenderer:
        def __init__(self, *a, **k):
            pass

        def get_fps(self):
            return 0.0

        def create_guiText(self, *a, **k):
            return 0

        def __getattr__(self, name):
            return lambda *a, **k: None

    pkg = types.ModuleType("heligym.envs.renderer")
    pkg.__path__ = []
    api = types.ModuleType("heligym.envs.renderer.api")
    api.Renderer = _StubRenderer
    sys.modules["heligym.envs.renderer"] = pkg
    sys.modules["heligym.envs.renderer.api"] = api

    import heligym  # noqa: F401  (registers reference envs)
    from heligym.envs import helicopter_with_tasks, helicopter
    from heligym.envs.dynamics import HelicopterDynamics, WindDynamics
    return helicopter, helicopter_with_tasks, HelicopterDynamics, WindDynamics


def state_vec(dyn):
    return np.asarray(dyn.state.val, dtype=np.float32).copy()


def set_state_vec(dyn, vec):
    dyn.state.val[:] = np.asarray(vec, dtype=np.float32)


def record_params(env):
    dyn = env.heli_dyn
    out = {}
    for grp in ("MR", "TR", "FUS", "HT", "VT", "WN", "LG"):
        for k, v in dyn.HELI[grp].items():
            out[f"{grp}.{k}"] = np.asarray(v, dtype=np.float64 if np.isscalar(v) else None)
    for k in ("M", "I", "IINV", "WT", "WL_CG", "FS_CG", "VTRANS", "HP_LOSS"):
        out[f"HELI.{k}"] = np.asarray(dyn.HELI[k])
    np.savez(os.path.join(FIXTURE_DIR, "params.npz"), **out)
    print("params.npz:", len(out), "entries")


def random_states(rng, n, dyn):
    """Plausible random 18-dim states + actions + wind, with branch coverage:
    near-ground samples exercise gear contact, large w/v exercise the stall
    branches, |u| straddles VTRANS for the wake step."""
    states, actions, winds = [], [], []
    for i in range(n):
        vi_mr = rng.uniform(0, 60)
        vi_tr = rng.uniform(-10, 40)
        psi_mr = rng.uniform(-np.pi, np.pi)
        psi_tr = rng.uniform(-np.pi, np.pi)
        betas = rng.uniform(-0.3, 0.3, 2)
        u = rng.uniform(-120, 120)
        v = rng.uniform(-60, 60)
        w = rng.uniform(-60, 60)
        pqr = rng.uniform(-2, 2, 3)
        euler = np.array([rng.uniform(-1, 1), rng.uniform(-1, 1),
                          rng.uniform(-np.pi, np.pi)])
        x = rng.uniform(-3200, 3200)
        y = rng.uniform(-3200, 3200)
        if i % 4 == 0:   # near/below terrain: landing-gear contact
            set_state_vec(dyn, np.zeros(18, np.float32))
            dyn.state["xyz"] = np.array([x, y, 0], np.float32)
            h = dyn.ground_touching_altitude()
            z = -(h + rng.uniform(-2.0, 6.0))
        else:
            z = -rng.uniform(100, 9000)
        sv = np.array([vi_mr, vi_tr, psi_mr, psi_tr, *betas, u, v, w,
                       *pqr, *euler, x, y, z], dtype=np.float32)
        states.append(sv)
        actions.append(rng.uniform(-1, 1, 4).astype(np.float32))
        winds.append(rng.uniform(-30, 30, 3).astype(np.float32))
    return np.stack(states), np.stack(actions), np.stack(winds)


def record_dynamics_terms(env, rng):
    dyn = env.heli_dyn
    states, actions, winds = random_states(rng, 256, dyn)
    dots_all, obs_all, heights = [], [], []
    for sv, act, wind in zip(states, actions, winds):
        set_state_vec(dyn, sv)
        dyn.set_wind(wind.copy())
        dyn.action = act.copy()
        heights.append(np.float64(
            dyn._HelicopterDynamics__get_ground_height_from_hmap()))
        dots = dyn.dynamics(dyn.state, set_observation=True)
        dots_all.append(np.asarray(dots.val, np.float32).copy())
        obs_all.append(np.asarray(dyn.observation, np.float64).copy())
    np.savez(os.path.join(FIXTURE_DIR, "dynamics.npz"),
             states=states, actions=actions, winds=winds,
             dots=np.stack(dots_all), obs=np.stack(obs_all),
             heights=np.stack(heights))
    print("dynamics.npz:", len(states), "cases")

    # individual force/moment terms on independent random inputs
    n = 128
    rho = rng.uniform(0.0015, 0.0024, n)
    coll = rng.uniform(-0.05, 0.3, n)
    lon = rng.uniform(-0.25, 0.25, n)
    lat = rng.uniform(-0.2, 0.2, n)
    pedal = rng.uniform(-0.1, 0.5, n)
    betas = rng.uniform(-0.3, 0.3, (n, 2)).astype(np.float32)
    uvw_air = np.stack([rng.uniform(-120, 120, n), rng.uniform(-60, 60, n),
                        rng.uniform(-60, 60, n)], -1).astype(np.float32)
    pqr = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    vi_mr = rng.uniform(0, 60, n).astype(np.float32)
    vi_tr = rng.uniform(-10, 40, n).astype(np.float32)
    term_out = {k: [] for k in
                ("mr_force", "mr_moment", "mr_power", "mr_betas_dot", "mr_vi_dot",
                 "tr_force", "tr_moment", "tr_power", "tr_vi_dot",
                 "fus_force", "fus_moment", "fus_power",
                 "ht_force", "ht_moment", "vt_force", "vt_moment")}
    for i in range(n):
        f, m, p, bd, vd, _ = dyn._calc_mr_fm(
            np.float32(rho[i]), np.float32(coll[i]), np.float32(lon[i]),
            np.float32(lat[i]), betas[i], uvw_air[i], pqr[i],
            vi_mr[i:i + 1], np.zeros(1, np.float32))
        term_out["mr_force"].append(f); term_out["mr_moment"].append(m)
        term_out["mr_power"].append(np.float32(p)); term_out["mr_betas_dot"].append(bd)
        term_out["mr_vi_dot"].append(vd)
        f, m, p, vd, _ = dyn._calc_tr_fm(
            np.float32(rho[i]), np.float32(pedal[i]), uvw_air[i], pqr[i],
            vi_tr[i:i + 1], np.zeros(1, np.float32))
        term_out["tr_force"].append(f); term_out["tr_moment"].append(m)
        term_out["tr_power"].append(np.float32(p)); term_out["tr_vi_dot"].append(vd)
        f, m, p = dyn._calc_fus_fm(np.float32(rho[i]), uvw_air[i], vi_mr[i:i + 1])
        term_out["fus_force"].append(f); term_out["fus_moment"].append(m)
        term_out["fus_power"].append(np.float32(p))
        f, m = dyn._calc_ht_fm(np.float32(rho[i]), uvw_air[i], pqr[i], vi_mr[i:i + 1])
        term_out["ht_force"].append(f); term_out["ht_moment"].append(m)
        f, m = dyn._calc_vt_fm(np.float32(rho[i]), uvw_air[i], pqr[i], vi_tr[i:i + 1])
        term_out["vt_force"].append(f); term_out["vt_moment"].append(m)
    np.savez(os.path.join(FIXTURE_DIR, "terms.npz"),
             rho=rho, coll=coll, lon=lon, lat=lat, pedal=pedal, betas=betas,
             uvw_air=uvw_air, pqr=pqr, vi_mr=vi_mr, vi_tr=vi_tr,
             **{k: np.stack(v) for k, v in term_out.items()})
    print("terms.npz:", n, "cases")


def record_terrain(env, rng):
    dyn = env.heli_dyn
    xs = np.concatenate([rng.uniform(-4000, 4000, 200),
                         [-1e6, 1e6, 0.0, 3280.83, -3280.83]])
    ys = np.concatenate([rng.uniform(-4000, 4000, 200),
                         [1e6, -1e6, 0.0, -3280.83, 3280.83]])
    hs = []
    for x, y in zip(xs, ys):
        set_state_vec(dyn, np.zeros(18, np.float32))
        dyn.state["xyz"] = np.array([x, y, 0.0], np.float32)
        hs.append(np.float64(dyn._HelicopterDynamics__get_ground_height_from_hmap()))
    np.savez(os.path.join(FIXTURE_DIR, "terrain.npz"),
             x=np.asarray(xs), y=np.asarray(ys), h=np.asarray(hs))
    print("terrain.npz:", len(xs), "points")


def record_trim(env):
    dyn = env.heli_dyn
    conds = [
        {},  # default ground trim
        {"ned_vel": [100.0, 0.0, 0.0], "gr_alt": 3000.0},
        {"ned_vel": [50.0, 20.0, -5.0], "gr_alt": 1000.0, "yaw": 0.4},
        {"gr_alt": 500.0, "yaw_rate": 0.1},
    ]
    out = {}
    for i, cond in enumerate(conds):
        # trim under the mean wind, as a freshly constructed env would
        # (helicopter.py:55)
        dyn.set_wind(env.wind_dyn.wind_mean_ned)
        dyn.reset(trim_cond=cond)
        out[f"cond{i}_state"] = state_vec(dyn)
        out[f"cond{i}_action"] = np.asarray(dyn.action, np.float32)
        out[f"cond{i}_obs"] = np.asarray(dyn.observation, np.float64)
        out[f"cond{i}_dots"] = np.asarray(dyn.state_dots.val, np.float32).copy()
        out[f"cond{i}_json"] = np.asarray(repr(cond))
    np.savez(os.path.join(FIXTURE_DIR, "trim.npz"), n=len(conds), **out)
    print("trim.npz:", len(conds), "conditions")


def record_wind(WindDynamics, rng):
    """Wind-only trajectories with recorded injected noise, one per regime."""
    import yaml
    with open("/root/reference/heligym/envs/helis/aw109.yaml") as f:
        params = yaml.safe_load(f)
    cases = {}
    for name, h_gr, vel in [("low", 500.0, [40.0, 10.0, 0.0]),
                            ("mid", 1500.0, [80.0, 0.0, 0.0]),
                            ("high", 3000.0, [100.0, -20.0, 5.0])]:
        wd = WindDynamics(params["ENV"], 0.02)
        etas, states, obs = [], [], []
        rs = np.random.RandomState(42)
        orig = WindDynamics.step_before
        try:
            def rec_step_before(self):
                self.eta = rs.randn(3) * self.eta_norm
                etas.append(np.asarray(self.eta, np.float64).copy())
            WindDynamics.step_before = rec_step_before
            action = np.array(vel + [h_gr], dtype=np.float32)
            for _ in range(500):
                o = wd.step(action)
                states.append(np.asarray(wd.state.val, np.float32).copy())
                obs.append(np.asarray(o, np.float32).copy())
        finally:
            WindDynamics.step_before = orig
        cases[f"{name}_eta"] = np.stack(etas)
        cases[f"{name}_states"] = np.stack(states)
        cases[f"{name}_obs"] = np.stack(obs)
        cases[f"{name}_action"] = action
    np.savez(os.path.join(FIXTURE_DIR, "wind.npz"), **cases)
    print("wind.npz: 3 regimes x 500 steps")


def record_rollouts(helicopter_with_tasks, WindDynamics):
    """Env-level golden rollouts (HeliHover + HeliForwardFlight)."""
    out = {}

    KEYS = ("st0", "act0", "obs0", "etas", "actions", "obs", "rew", "done",
            "trunc", "states", "flags")

    def run(env, n_steps, action_fn, noise):
        etas, acts, obs_t, rew_t, done_t, trunc_t, st_t, flags = [], [], [], [], [], [], [], []
        rs = np.random.RandomState(7)
        orig = WindDynamics.step_before

        def quiet(self):
            self.eta = np.zeros(3)
            etas.append(self.eta.copy())

        def noisy(self):
            self.eta = rs.randn(3) * self.eta_norm
            etas.append(np.asarray(self.eta, np.float64).copy())

        WindDynamics.step_before = noisy if noise else quiet
        try:
            obs0, info0 = env.reset()
            st0 = np.asarray(env.heli_dyn.state.val, np.float32).copy()
            act0 = np.asarray(env.heli_dyn.action, np.float32).copy()
            for t in range(n_steps):
                a = action_fn(t, act0)
                acts.append(np.asarray(a, np.float32).copy())
                obs, rew, done, trunc, info = env.step(a)
                obs_t.append(np.asarray(obs, np.float64).copy())
                rew_t.append(np.float64(rew))
                done_t.append(bool(done)); trunc_t.append(bool(trunc))
                flags.append([info["failed"], info["successed"], info["time_up"]])
                st_t.append(np.asarray(env.heli_dyn.state.val, np.float32).copy())
                if done or trunc:
                    break
        finally:
            WindDynamics.step_before = orig
        return (st0, act0, np.asarray(obs0, np.float64), np.asarray(etas),
                np.stack(acts), np.stack(obs_t), np.asarray(rew_t),
                np.asarray(done_t), np.asarray(trunc_t), np.stack(st_t),
                np.asarray(flags))

    env = helicopter_with_tasks.HeliHover()

    # A: hold trim action, no turbulence noise (deterministic physics only)
    r = run(env, 1000, lambda t, a0: a0, noise=False)
    for k, v in zip(KEYS, r):
        out[f"hoverA_{k}"] = v
    # B: sinusoidal perturbation + recorded noise
    def pert(t, a0):
        return a0 + 0.05 * np.sin(np.array([0.11, 0.07, 0.05, 0.13]) * t).astype(np.float32)
    r = run(env, 500, pert, noise=True)
    for k, v in zip(KEYS, r):
        out[f"hoverB_{k}"] = v
    # C: collective hard down -> crash into terrain
    def dive(t, a0):
        a = a0.copy(); a[0] = -1.0
        return a
    r = run(env, 2000, dive, noise=False)
    for k, v in zip(KEYS, r):
        out[f"crash_{k}"] = v

    envf = helicopter_with_tasks.HeliForwardFlight()
    r = run(envf, 300, lambda t, a0: a0, noise=False)
    for k, v in zip(KEYS, r):
        out[f"fwd_{k}"] = v

    np.savez(os.path.join(FIXTURE_DIR, "rollouts.npz"), **out)
    print("rollouts.npz: hoverA", out["hoverA_obs"].shape, "hoverB",
          out["hoverB_obs"].shape, "crash", out["crash_obs"].shape,
          "fwd", out["fwd_obs"].shape)


def record_lookup(WindDynamics):
    import yaml
    with open("/root/reference/heligym/envs/helis/aw109.yaml") as f:
        params = yaml.safe_load(f)
    wd = WindDynamics(params["ENV"], 0.02)
    rows = np.asarray([0.5, 1.0, 2.5, 3.0, 6.9, 7.0, 9.0])
    cols = np.asarray([100.0, 500.0, 1200.0, 1750.0, 20000.0, 79999.0, 90000.0])
    vals = np.zeros((len(rows), len(cols)))
    for i, r in enumerate(rows):
        for j, c in enumerate(cols):
            wd.TEP._lastRowIndex = wd.TEP._lastColIndex = 2  # reset cache
            vals[i, j] = wd.TEP.get_value_2D(float(r), float(c))
    np.savez(os.path.join(FIXTURE_DIR, "lookup.npz"),
             rows=rows, cols=cols, vals=vals, table=wd.TEP._data)
    print("lookup.npz")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="/root/reference")
    args = ap.parse_args()
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    helicopter, hwt, HelicopterDynamics, WindDynamics = import_reference(args.ref)

    env = hwt.HeliHover()
    rng = np.random.RandomState(1234)
    record_params(env)
    record_terrain(env, rng)
    record_dynamics_terms(env, rng)
    record_lookup(WindDynamics)
    record_wind(WindDynamics, rng)
    record_trim(env)
    record_rollouts(hwt, WindDynamics)
    record_second_airframe(HelicopterDynamics)
    record_heavy_rollout(HelicopterDynamics)
    print("done ->", FIXTURE_DIR)


if __name__ == "__main__":
    main()


def record_second_airframe(HelicopterDynamics, repo_root="/root/repo"):
    """Validate the physics on a second airframe: run the reference dynamics
    with heligym_tpu's aw109_heavy parameter data and record derivative
    fixtures (the env wrapper is not needed for this check)."""
    import yaml
    with open(os.path.join(repo_root, "heligym_tpu/models/aw109_heavy.yaml")) as f:
        params = yaml.safe_load(f)
    # the reference loads its terrain through these ENV keys
    params["ENV"]["HMAP_PATH"] = "/models/terrain/terrain_hmap.png"
    params["ENV"]["NMAP_PATH"] = "/models/terrain/terrain_normal.png"
    dyn = HelicopterDynamics(params, 0.02)
    dyn.set_wind(np.zeros(3, np.float32))
    rng = np.random.RandomState(77)
    states, actions, winds = random_states(rng, 128, dyn)
    dots_all, obs_all = [], []
    for sv, act, wind in zip(states, actions, winds):
        set_state_vec(dyn, sv)
        dyn.set_wind(wind.copy())
        dyn.action = act.copy()
        dots = dyn.dynamics(dyn.state, set_observation=True)
        dots_all.append(np.asarray(dots.val, np.float32).copy())
        obs_all.append(np.asarray(dyn.observation, np.float64).copy())
    np.savez(os.path.join(FIXTURE_DIR, "dynamics_heavy.npz"),
             states=states, actions=actions, winds=winds,
             dots=np.stack(dots_all), obs=np.stack(obs_all))
    print("dynamics_heavy.npz:", len(states), "cases")


def record_heavy_rollout(HelicopterDynamics, repo_root="/root/repo"):
    """Second-airframe TRAJECTORY fixtures: reference trim + held-action RK4
    rollouts with aw109_heavy data, at the dynamics level (the reference env
    wrapper is hard-wired to aw109). Wind is held constant for the whole
    rollout so the repo side can replay with its heli-only RK4 step
    (env.heli_step) — same semantics as DynamicSystem.step (dynamics.py:158-171)
    with a frozen wind input."""
    import yaml
    with open(os.path.join(repo_root, "heligym_tpu/models/aw109_heavy.yaml")) as f:
        params = yaml.safe_load(f)
    params["ENV"]["HMAP_PATH"] = "/models/terrain/terrain_hmap.png"
    params["ENV"]["NMAP_PATH"] = "/models/terrain/terrain_normal.png"
    cases = [
        # xy offset keeps the hover off the terrain cell CORNER at (0,0):
        # the reference floors the cell index in float64, so +-5e-9 ft of
        # hover drift flips cells (the middle/north/east interpolation is
        # discontinuous across cells) in a way float32 index math can't see.
        ("ground", {"xy": [50.0, -30.0]}, np.zeros(3, np.float32)),
        ("cruise", {"ned_vel": [80.0, 0.0, 0.0], "gr_alt": 2000.0},
         np.array([5.0, -3.0, 1.0], np.float32)),
    ]
    out = {}
    for name, cond, wind in cases:
        dyn = HelicopterDynamics(params, 0.02)
        dyn.set_wind(wind.copy())
        dyn.reset(trim_cond=cond)
        out[f"{name}_cond"] = np.asarray(repr(cond))
        out[f"{name}_wind"] = wind
        out[f"{name}_state0"] = state_vec(dyn)
        out[f"{name}_action"] = np.asarray(dyn.action, np.float32).copy()
        out[f"{name}_obs0"] = np.asarray(dyn.observation, np.float64).copy()
        states, obs = [], []
        for _ in range(250):
            dyn.step(out[f"{name}_action"])
            states.append(state_vec(dyn))
            obs.append(np.asarray(dyn.observation, np.float64).copy())
        out[f"{name}_states"] = np.stack(states)
        out[f"{name}_obs"] = np.stack(obs)
    np.savez(os.path.join(FIXTURE_DIR, "rollouts_heavy.npz"), **out)
    print("rollouts_heavy.npz:", [c[0] for c in cases])

"""PPO on sharded rollouts: the learner hookup (BASELINE.json config #5).

Everything — rollout collection (lax.scan over the vmapped env step), GAE,
minibatched clipped-surrogate updates — is ONE jitted train step. Envs are
sharded over the mesh's `env` axis, network parameters are replicated; XLA
inserts the gradient all-reduce over ICI automatically from the shardings
(the TPU-native answer to the reference's absent NCCL/MPI layer,
SURVEY.md §2.4).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import Mesh

from ..envs.env import EnvState, HeliEnv
from ..envs.vector import VectorHeliEnv, auto_reset
from ..parallel.mesh import env_sharding, make_env_mesh, replicated_sharding
from .networks import ActorCritic, gaussian_entropy, gaussian_log_prob, obs_scales


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    num_envs: int = 1024
    rollout_steps: int = 64
    minibatches: int = 8
    epochs: int = 4
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip_eps: float = 0.2
    lr: float = 3e-4
    vf_coef: float = 0.5
    ent_coef: float = 1e-3
    max_grad_norm: float = 0.5
    hidden: Tuple[int, ...] = (256, 256)
    # Collect rollouts through the fused Pallas step kernel (2-3x faster on
    # real TPUs; automatically interpreted on CPU backends).
    use_fused_rollout: bool = True
    # Running mean/var observation normalization (on top of the fixed
    # physical scales), updated from each rollout, frozen within an update.
    obs_norm: bool = True
    # Stop UPDATING the running stats (still applied): the fine-tuning
    # setting. On a warm-started farm every env restarts at trim, so the
    # first rollouts' obs distribution differs sharply from the checkpoint's
    # steady-state mix; with the 5e6 count cap those batches shift the stats
    # ~nb/5e6 per update, silently perturbing the policy's effective inputs
    # (measured: a 0.953-success hover policy degraded to 0.156 within 40
    # fine-tune updates at kl~1e-3/update).
    freeze_obs_stats: bool = False
    # Linear decay horizon (in updates) for lr and entropy coefficient down
    # to `anneal_floor` of their base values; 0 disables the schedules.
    anneal_updates: int = 0
    anneal_floor: float = 0.05
    # Epoch minibatch shuffle: "perm" = full random permutation (default —
    # measurably steadier learning), "roll" = random circular shift (two
    # slices + concat, 1.64x faster per update but time-env-adjacent
    # minibatches destabilize late training). A/B on hover:
    # benchmarks/shuffle_ab.json.
    shuffle: str = "perm"
    # Center executed actions on the nominal hover-trim action: the env runs
    # clip(trim_action + a) where a ~ N(mean, std) is the learned residual.
    # A zero-mean absolute policy drops collective/cyclic to mid-range at
    # init, destroying the trim before any reward signal arrives — measured:
    # a pure trim-hold already satisfies the hover success criterion at
    # ~10 s, so a residual policy starts in the success basin instead of
    # fail_ep≈1.0. Loss/GAE see the raw residual; the bias is part of the
    # env-side action mapping (like a gym action wrapper). Under randomized
    # resets the bias stays the NOMINAL condition's trim (per-env trims
    # differ slightly; the residual absorbs the difference).
    center_actions: bool = True
    # Initial log-std of the Gaussian policy (see networks.ActorCritic).
    log_std_init: float = -0.5
    # TRAINING-ONLY reward shaping, applied inside GAE (the env's reward and
    # every reported reward metric stay the reference's). The reference
    # reward's max(final, terminal) shape pays sustained positive reward for
    # moving fast toward the target but ~0 for holding it, so naive PPO
    # learns dive-crash-reset cycles (fail_ep -> 1.0). `success_bonus` is
    # added per transition the env's own per-step success tolerance held
    # (exactly the quantity the success criterion accumulates,
    # envs/env.py:283); `fail_penalty` is subtracted on crash/OOB
    # transitions. Both default off.
    success_bonus: float = 0.0
    fail_penalty: float = 0.0
    # Potential-based descent shaping (landing): adds
    # coef * (gamma * Phi(s') - Phi(s)) with Phi = -altitude-above-ground
    # (obs[16]), gated off across episode boundaries. Telescoping: a
    # climb-then-descend cycle nets ~zero, so unlike a raw descent reward it
    # cannot be farmed; it only pulls the policy through the touchdown
    # discovery barrier (a hover-trained policy never finds the ground by
    # sigma=0.08 exploration; observed: landing runs hover indefinitely).
    agl_shaping: float = 0.0
    # Potential-based FLARE shaping (landing): Phi = -|down_velocity|
    # * exp(-alt_above_ground / flare_scale) — pays for killing descent rate
    # near the ground and charges for carrying it there. Same telescoping
    # guarantee as agl_shaping (any pure state function is a valid
    # potential). Motivation (measured, round 3): policies descending from
    # above their training band arrive at the gear window at 6-13 ft/s and
    # enter a bounce limit-cycle on the bidirectional gear spring instead of
    # settling; the flare potential makes the arrival speed itself costly.
    flare_shaping: float = 0.0
    flare_scale: float = 10.0   # [ft] e-folding altitude of the flare zone
    # Potential-based VELOCITY-VECTOR shaping: Phi = -|v_ned_horiz - target|
    # [ft/s] from obs[4:6]. Motivation (measured, round 4): tasks with a
    # directional velocity target (oblique flight) get no success-bonus
    # signal because the in-tolerance region is never visited (in_tol
    # 0.000-0.002 across every warm start) — the task's own max(final,
    # terminal) reward pays any fast movement, not the right DIRECTION.
    # Same telescoping guarantee as the other potentials.
    vel_shaping: float = 0.0
    vel_target_n: float = 0.0   # [ft/s] target north velocity
    vel_target_e: float = 0.0   # [ft/s] target east velocity
    # Potential-based DESCENT-PROFILE shaping (high-altitude landing):
    # Phi = -|down_vel - v_ref(agl)| with v_ref = vmax * (1 - exp(-agl/scale))
    # [ft/s] from obs[6]/obs[16] — pulls the vertical speed onto a safe
    # approach profile (~vmax at altitude, tapering exponentially to ~0 at
    # the ground). Motivation (measured, rounds 3-4): from 100 ft the
    # max(final, terminal) reward pays ANY fast descent, so policies either
    # dive (arrive at the gear window at 6-13 ft/s and crash) or hover
    # (timeout); flare_shaping charges for arrival speed but gives no
    # gradient toward DESCENDING AT THE RIGHT RATE at altitude. This
    # potential penalizes both failure modes at every altitude. Same
    # telescoping guarantee as the other potentials (pure state function).
    prof_shaping: float = 0.0
    prof_vmax: float = 7.0     # [ft/s] asymptotic descent rate at altitude
    prof_scale: float = 25.0   # [ft] e-folding altitude of the taper
    # Potential-based TRACK shaping (slalom): Phi = -|y - A*sin(2*pi*x/L)|
    # [ft] from obs[13:15] — pulls the lateral position onto the weave
    # reference the task scores (envs/tasks.py::SlalomTask).
    track_shaping: float = 0.0
    track_amplitude: float = 150.0   # [ft]
    track_wavelength: float = 2000.0  # [ft]
    # Value-loss clipping range; 0 disables value clipping. The default 0.2
    # matches clip_eps, which is calibrated for O(1) returns — with
    # success-bonus shaping, returns reach O(1/(1-gamma)) and a 0.2 clip
    # throttles critic learning (lagging critic -> noisy advantages ->
    # policy erosion; observed on hover run A).
    vf_clip_eps: float = 0.2
    # Skip minibatch updates once the pre-update approximate KL to the
    # rollout policy exceeds this (0 = off): a jit-compatible form of
    # KL early stopping that bounds how far one train step can drift.
    target_kl: float = 0.0
    # Freeze the ACTOR for the first N updates (critic + obs-stats still
    # learn): the warm-start protocol. A transplanted critic badly
    # mispredicts a fresh synchronized farm (v_loss ~700 at warm-start vs
    # ~30 converged), so the first updates' advantages are garbage — and the
    # resulting actor drift is invisible in KL yet fatal on a precision
    # task: measured, 8 updates at kl~1e-4 moved the hover policy's mean
    # action by ~0.015 (0.18 sigma of the exploration noise) and dropped
    # deterministic episode success 0.953 -> 0.0. Let the critic re-fit
    # first; adam moments for the actor still advance (a frozen step is a
    # no-op on params, not the optimizer — same caveat as target_kl).
    critic_warmup: int = 0
    # Scheduled exploration-std ceiling: the effective log-std is
    # min(learned, cap(t)) with cap decaying linearly from log_std_init to
    # `std_cap_final` over `std_cap_updates` updates. Collection, loss and
    # entropy all use the capped value, so log-probs stay consistent.
    # Motivation: on hover/landing the success behavior can ride on
    # exploration noise (stochastic success >> mean-policy success);
    # squeezing the std late in training forces the MEAN to carry the
    # behavior. 0 updates = off.
    std_cap_final: float = -3.5
    std_cap_updates: int = 0


@struct.dataclass
class ObsStats:
    """Running statistics of the SCALED observation (after the fixed
    physical normalizers), Chan/Welford-merged per rollout. `count` is
    capped so late batches keep a floor weight (EMA-like tail)."""
    mean: jnp.ndarray     # (17,)
    var: jnp.ndarray      # (17,)
    count: jnp.ndarray    # () f32

    @classmethod
    def init(cls):
        return cls(mean=jnp.zeros(17, jnp.float32),
                   var=jnp.ones(17, jnp.float32),
                   count=jnp.float32(1e-4))


@struct.dataclass
class TrainState:
    params: dict
    opt_state: optax.OptState
    env_state: EnvState
    key: jax.Array
    update_count: jnp.ndarray
    obs_stats: ObsStats


@struct.dataclass
class Transition:
    obs: jnp.ndarray
    action: jnp.ndarray
    log_prob: jnp.ndarray
    value: jnp.ndarray
    reward: jnp.ndarray
    # Termination (failed/successed) and time-limit truncation are kept
    # separate: GAE bootstraps V(final_obs) through truncation-only resets
    # (the reference's 40 s wall would otherwise bias ~1/31 of transitions
    # toward unbootstrapped returns at rollout_steps=64).
    terminated: jnp.ndarray
    truncated: jnp.ndarray
    v_boot: jnp.ndarray      # V(pre-reset next obs), current params
    # crash/OOB flag per transition — terminated & ~failed == env success
    # (envs/env.py:292); metrics + optional fail_penalty shaping.
    failed: jnp.ndarray
    # per-transition in-tolerance flag (the success-time accumulator's
    # increment); drives the optional success_bonus shaping + metrics.
    succ_step: jnp.ndarray
    # per-transition task one-hot, (T, B, K) with K = number of MixedTask
    # sub-tasks (K=0, i.e. zero-width, on single-task runs): rides through
    # the minibatch shuffle so the loss can rebuild the task-conditioned
    # network input for each sample.
    task_oh: jnp.ndarray


class PPOLearner:
    """Builds the jitted sharded train step for a HeliEnv."""

    def __init__(self, env: HeliEnv, config: PPOConfig = PPOConfig(),
                 mesh: Optional[Mesh] = None):
        self.env = env
        self.config = config
        self.mesh = mesh or make_env_mesh()
        self.venv = VectorHeliEnv(env, config.num_envs, auto_reset=True)
        # MixedTask: the policy must KNOW which task each env is on — hover
        # and forward-flight episodes start at the identical trim state, so
        # a task-blind deterministic policy literally cannot choose the
        # right behavior (measured: det success ~0 on both sub-tasks while
        # stochastic success rode on noise-induced divergence). A task
        # one-hot from EnvState.task_id is appended to the network input
        # (task_dim = 0 on single-task envs: nothing changes, and old
        # checkpoints stay compatible).
        self.task_dim = len(getattr(env.task, "tasks", ()))
        self.network = ActorCritic(action_dim=4, hidden=config.hidden,
                                   log_std_init=config.log_std_init)
        # executed action = clip(act_bias + residual); (4,) f32 constant
        self.act_bias = (jnp.asarray(env.trim_result().action, jnp.float32)
                         if config.center_actions
                         else jnp.zeros(4, jnp.float32))
        # adam split into scale_by_adam + a manual -lr*update so the learning
        # rate can be a traced schedule value inside the jitted train step
        self.tx = optax.chain(
            optax.clip_by_global_norm(config.max_grad_norm),
            optax.scale_by_adam())
        self._scales = jnp.asarray(obs_scales(env.params))
        # Actor-side parameter names, derived from the configured depth.
        # ActorCritic (networks.py) is an nn.compact module, so flax numbers
        # its Dense submodules in CALL order: actor torso Dense_0..Dense_{L-1},
        # mean head Dense_L, then critic tower Dense_{L+1}..Dense_{2L+1} for
        # L = len(hidden). Deriving the split from L (instead of a hardcoded
        # 2-layer name set) keeps critic_warmup freezing exactly the actor at
        # any depth; test_ppo.py::test_critic_warmup_deep pins this at L=3.
        n_hidden = len(config.hidden)
        self._actor_keys = frozenset(
            {f"Dense_{i}" for i in range(n_hidden + 1)} | {"log_std"})
        self._train_step = None
        self._fused_rollout = None

    # ------------------------------------------------------------- setup
    def init(self, key, trim_cond: Optional[dict] = None,
             cond_sampler=None, task_ids=None) -> TrainState:
        """`cond_sampler(key, n) -> batched trim-cond dict` switches the farm
        to per-env randomized initial conditions (on-device batched Newton
        trim); `task_ids` (num_envs,) assigns MixedTask sub-tasks per env."""
        k_net, k_env, k_run = jax.random.split(key, 3)
        if cond_sampler is not None:
            es, obs = self.venv.reset_randomized(k_run, cond_sampler)
        else:
            es, obs = self.venv.reset(k_run, trim_cond)
        if task_ids is not None:
            es = self.venv.assign_tasks(es, task_ids)
        params = self.network.init(
            k_net, self._net_in(obs[:1], None, self._task_oh(es.task_id[:1])))
        opt_state = self.tx.init(params)
        sh_env = env_sharding(self.mesh)
        rep = replicated_sharding(self.mesh)
        ts = TrainState(params=jax.device_put(params, rep),
                        opt_state=jax.device_put(opt_state, rep),
                        env_state=jax.device_put(es, sh_env),
                        key=jax.device_put(k_env, rep),
                        update_count=jnp.zeros((), jnp.int32),
                        obs_stats=jax.device_put(ObsStats.init(), rep))
        return ts

    def _norm(self, obs, stats: Optional[ObsStats] = None):
        """Fixed physical scaling, then (optionally) running standardization.
        Collection and the loss must use the SAME stats snapshot — log-probs
        are only comparable under one normalization.

        The scaled obs is sanitized and clipped: a blowing-up env can emit
        obs up to ~1e30 BEFORE the non-finite failsafe terminates it
        (envs/env.py:287), and a single such row in a training batch NaNs the
        whole update (observed: params dead at update 16 of hover training).
        Sane data lives in O(1) scaled units; +-50 only clips garbage."""
        x = obs / self._scales
        x = jnp.clip(jnp.nan_to_num(x, nan=0.0, posinf=50.0, neginf=-50.0),
                     -50.0, 50.0)
        if stats is not None:
            x = jnp.clip((x - stats.mean) * jax.lax.rsqrt(stats.var + 1e-8),
                         -10.0, 10.0)
        return x

    def _task_oh(self, task_id) -> jnp.ndarray:
        """(..., task_dim) one-hot of EnvState.task_id; zero-width on
        single-task envs (concatenating it is then the identity)."""
        if self.task_dim:
            return jax.nn.one_hot(task_id, self.task_dim, dtype=jnp.float32)
        return jnp.zeros(jnp.shape(task_id) + (0,), jnp.float32)

    def _net_in(self, obs, stats, task_oh=None):
        """Network input: normalized obs, plus the task one-hot on MixedTask
        runs. `task_oh` broadcasts over leading dims ((B, K) against
        (T, B, 17) obs is fine); it is REQUIRED when task_dim > 0 — the
        whole point is that the policy cannot be task-blind."""
        x = self._norm(obs, stats)
        if self.task_dim:
            if task_oh is None:
                raise ValueError(
                    "MixedTask learner needs the task one-hot for the "
                    "network input (pass _task_oh(es.task_id))")
            toh = jnp.broadcast_to(task_oh,
                                   x.shape[:-1] + (self.task_dim,))
            x = jnp.concatenate([x, toh], axis=-1)
        return x

    def _merge_stats(self, stats: ObsStats, obs) -> ObsStats:
        """Chan parallel merge of one rollout's scaled-obs statistics into the
        running stats. Non-finite obs (blowup steps) are zeroed out of the
        batch rather than poisoning the stats."""
        x = obs.reshape(-1, obs.shape[-1]) / self._scales
        x = jnp.clip(jnp.nan_to_num(x, nan=0.0, posinf=0.0, neginf=0.0),
                     -50.0, 50.0)
        nb = jnp.float32(x.shape[0])
        mb, vb = x.mean(0), x.var(0)
        n = stats.count + nb
        delta = mb - stats.mean
        mean = stats.mean + delta * (nb / n)
        m2 = stats.var * stats.count + vb * nb + delta * delta * (stats.count * nb / n)
        # cap the count so fresh data keeps a floor weight (EMA-like tail)
        return ObsStats(mean=mean, var=m2 / n, count=jnp.minimum(n, 5e6))

    def policy(self, params, obs, key=None, obs_stats: Optional[ObsStats] = None,
               task_oh=None):
        """Stochastic policy head; deterministic (mean) when key is None.
        `task_oh` is required on MixedTask learners (see _net_in)."""
        mean, log_std, _ = self.network.apply(
            params, self._net_in(obs, obs_stats, task_oh))
        if key is None:
            return jnp.clip(self.act_bias + mean, -1.0, 1.0)
        noise = jax.random.normal(key, mean.shape)
        return jnp.clip(self.act_bias + mean + jnp.exp(log_std) * noise,
                        -1.0, 1.0)

    # ------------------------------------------------------------ rollout
    def _policy_fn(self, fold_axis: Optional[str] = None):
        def policy_fn(p, obs, key_t):
            # stats: ObsStats or None (cfg.obs_norm off); cap: scalar
            # log-std ceiling (1e9 = off; see PPOConfig.std_cap_updates);
            # toh: (B, task_dim) task one-hot on MixedTask runs
            if self.task_dim:
                params, stats, cap, toh = p
            else:
                (params, stats, cap), toh = p, None
            mean, log_std, value = self.network.apply(
                params, self._net_in(obs, stats, toh))
            log_std = jnp.minimum(log_std, cap)
            if fold_axis is not None:
                # Layout-invariant action noise (round-4 verdict #5): every
                # shard draws the GLOBAL (num_envs, 4) noise block from the
                # shared per-step key and slices its own rows by global env
                # offset, so env i sees the same noise stream on any mesh
                # size — bitwise the single-device draw, and the same
                # convention as the unfused collector's global (B, 4) draw.
                # The redundant work is num_envs*4 f32 per device per step
                # (threefry on 16k floats ~ nothing next to the physics).
                local = mean.shape[0]
                full = jax.random.normal(
                    key_t, (self.config.num_envs,) + mean.shape[1:])
                off = jax.lax.axis_index(fold_axis) * local
                noise = jax.lax.dynamic_slice_in_dim(full, off, local, axis=0)
            else:
                noise = jax.random.normal(key_t, mean.shape)
            action = mean + jnp.exp(log_std) * noise
            log_prob = gaussian_log_prob(mean, log_std, action)
            return (jnp.clip(self.act_bias + action, -1.0, 1.0),
                    {"raw_action": action, "log_prob": log_prob, "value": value})
        return policy_fn

    def _build_fused_rollout(self):
        """Single-device: plain fused rollout. Multi-device: the fused rollout
        per shard wrapped in shard_map over the env axis (GSPMD cannot
        partition a pallas_call; shard_map runs one kernel per device)."""
        from jax.sharding import PartitionSpec as P

        from ..ops.pallas import build_fused_policy_rollout
        from ..parallel.mesh import ENV_AXIS

        cfg = self.config
        n_dev = self.mesh.devices.size
        if n_dev == 1:
            return build_fused_policy_rollout(
                self.env, cfg.num_envs, cfg.rollout_steps, self._policy_fn())

        local = cfg.num_envs // n_dev
        inner = build_fused_policy_rollout(
            self.env, local, cfg.rollout_steps, self._policy_fn(ENV_AXIS))
        sh = P(ENV_AXIS)
        hm = P()  # terrain table: replicated per device
        traj_specs = {"obs": P(None, ENV_AXIS, None),
                      "action": P(None, ENV_AXIS, None),
                      "raw_action": P(None, ENV_AXIS, None),
                      "log_prob": P(None, ENV_AXIS),
                      "value": P(None, ENV_AXIS),
                      "reward": P(None, ENV_AXIS),
                      "terminated": P(None, ENV_AXIS),
                      "truncated": P(None, ENV_AXIS),
                      "failed": P(None, ENV_AXIS),
                      "succ_step": P(None, ENV_AXIS),
                      "final_obs": P(None, ENV_AXIS, None)}
        # policy carry: params/stats/cap replicated; the per-env task
        # one-hot (MixedTask) is sharded along the env axis with the farm
        p_spec = (P(), P(), P(), P(ENV_AXIS)) if self.task_dim else P()
        return jax.shard_map(inner, mesh=self.mesh,
                             in_specs=(sh, p_spec, P(), hm),
                             out_specs=(sh, traj_specs), check_vma=False)

    def _collect_fused(self, params, stats, cap, es: EnvState, key, hmap):
        """Rollout through the fused Pallas step kernel: policy matmuls in
        XLA (MXU), physics in one Mosaic kernel per step (per device shard
        on multi-device meshes)."""
        if self._fused_rollout is None:
            self._fused_rollout = self._build_fused_rollout()
        toh = self._task_oh(es.task_id)          # (B, K); static per rollout
        p = (params, stats, cap, toh) if self.task_dim \
            else (params, stats, cap)
        es, traj = self._fused_rollout(es, p, key, hmap)
        reward = jnp.clip(jnp.nan_to_num(traj["reward"], nan=-100.0,
                                         posinf=100.0, neginf=-100.0),
                          -100.0, 100.0)
        v_boot = self._value_of(params, stats, traj["final_obs"], toh)
        T = traj["obs"].shape[0]
        out = Transition(obs=traj["obs"], action=traj["raw_action"],
                         log_prob=traj["log_prob"], value=traj["value"],
                         reward=reward,
                         terminated=traj["terminated"].astype(jnp.float32),
                         truncated=traj["truncated"].astype(jnp.float32),
                         v_boot=v_boot,
                         failed=traj["failed"].astype(jnp.float32),
                         succ_step=traj["succ_step"].astype(jnp.float32),
                         task_oh=jnp.broadcast_to(toh, (T,) + toh.shape))
        return es, key, out

    def _value_of(self, params, stats, obs, task_oh=None):
        """Value head over arbitrary leading dims (one batched apply)."""
        _, _, value = self.network.apply(params,
                                         self._net_in(obs, stats, task_oh))
        return value

    def _collect(self, params, stats, cap, es: EnvState, key, hmap):
        # task ids are static per env (they persist across auto-resets), so
        # the one-hot is computed once outside the scan
        toh = self._task_oh(es.task_id)

        def scan_step(carry, _):
            es, key = carry
            key, k_act = jax.random.split(key)
            mean, log_std, value = self.network.apply(
                params, self._net_in(es.obs, stats, toh))
            log_std = jnp.minimum(log_std, cap)
            noise = jax.random.normal(k_act, mean.shape)
            action = mean + jnp.exp(log_std) * noise
            log_prob = gaussian_log_prob(mean, log_std, action)
            clipped = jnp.clip(self.act_bias + action, -1.0, 1.0)
            new_es, out = jax.vmap(self.env.step, in_axes=(0, 0, None))(
                es, clipped, hmap)
            final_obs = out.obs              # pre-reset terminal/next obs
            # pre-reset success-counter delta == this transition's
            # in-tolerance flag (auto_reset would zero the counter)
            succ_step = (new_es.successed_steps
                         - es.successed_steps).astype(jnp.float32)
            new_es, out = auto_reset(new_es, out)
            # The terminating step of a blown-up env can carry a non-finite
            # reward before the env's NaN guard resets it; sanitize so one env
            # cannot poison GAE/grads for the whole batch.
            reward = jnp.clip(jnp.nan_to_num(out.reward, nan=-100.0,
                                             posinf=100.0, neginf=-100.0),
                              -100.0, 100.0)
            tr = Transition(obs=es.obs, action=action, log_prob=log_prob,
                            value=value, reward=reward,
                            terminated=out.done.astype(jnp.float32),
                            truncated=out.truncated.astype(jnp.float32),
                            v_boot=jnp.zeros_like(value),
                            failed=out.failed.astype(jnp.float32),
                            succ_step=succ_step, task_oh=toh)
            return (new_es, key), (tr, final_obs)

        (es, key), (traj, final_obs) = jax.lax.scan(
            scan_step, (es, key), None, length=self.config.rollout_steps)
        # One batched value apply over every step's pre-reset next obs: equals
        # V(s_{t+1}) on ordinary steps and the truncation bootstrap otherwise.
        traj = traj.replace(
            v_boot=self._value_of(params, stats, final_obs, toh))
        return es, key, traj

    def _gae(self, traj: Transition):
        """GAE with correct truncation handling: termination zeroes the
        bootstrap; truncation bootstraps V(final_obs) but still cuts the
        advantage accumulation across the reset boundary."""
        cfg = self.config

        shaping = jnp.zeros_like(traj.reward)
        if (cfg.agl_shaping != 0.0 or cfg.flare_shaping != 0.0
                or cfg.vel_shaping != 0.0 or cfg.track_shaping != 0.0
                or cfg.prof_shaping != 0.0):
            # potential-based: coef * (gamma * Phi(s_{t+1}) - Phi(s_t));
            # obs[t+1] is post-reset so boundary transitions are gated off
            # (their next obs is a new episode's)
            intra = ((1.0 - traj.terminated) * (1.0 - traj.truncated)
                     ).at[-1].set(0.0)

            def telescope(phi):
                phi_next = jnp.concatenate([phi[1:], phi[-1:]], axis=0)
                return intra * (cfg.gamma * phi_next - phi)

            if cfg.agl_shaping != 0.0:   # Phi = -alt_above_ground
                shaping += cfg.agl_shaping * telescope(-traj.obs[..., 16])
            if cfg.flare_shaping != 0.0:  # Phi = -|w| * exp(-agl/scale)
                phi_f = -jnp.abs(traj.obs[..., 3]) * jnp.exp(
                    -traj.obs[..., 16] / cfg.flare_scale)
                shaping += cfg.flare_shaping * telescope(phi_f)
            if cfg.prof_shaping != 0.0:  # Phi = -|w_ned - v_ref(agl)| [ft/s]
                # obs[6] = NED down velocity (positive down = descending),
                # the inertial rate — not obs[3], the body-frame air-relative
                # w the flare potential uses
                v_ref = cfg.prof_vmax * (
                    1.0 - jnp.exp(-traj.obs[..., 16] / cfg.prof_scale))
                shaping += cfg.prof_shaping * telescope(
                    -jnp.abs(traj.obs[..., 6] - v_ref))
            if cfg.vel_shaping != 0.0:  # Phi = -|v_horiz - target| [ft/s]
                phi_v = -jnp.sqrt(
                    (traj.obs[..., 4] - cfg.vel_target_n) ** 2
                    + (traj.obs[..., 5] - cfg.vel_target_e) ** 2 + 1e-6)
                shaping += cfg.vel_shaping * telescope(phi_v)
            if cfg.track_shaping != 0.0:  # Phi = -|y - y_ref(x)| [ft]
                y_ref = cfg.track_amplitude * jnp.sin(
                    2.0 * jnp.pi * traj.obs[..., 13] / cfg.track_wavelength)
                phi_t = -jnp.abs(traj.obs[..., 14] - y_ref)
                shaping += cfg.track_shaping * telescope(phi_t)

        def scan_back(gae, tr_and_sh):
            tr, sh = tr_and_sh
            not_term = 1.0 - tr.terminated
            not_reset = not_term * (1.0 - tr.truncated)
            # select, don't multiply: v_boot at a terminated blowup step is
            # V(non-finite obs) = NaN, and NaN * 0 = NaN would poison the
            # whole GAE scan (the _norm clip bounds it too; double-guarded)
            boot = jnp.where(tr.terminated > 0, 0.0, tr.v_boot)
            # training-only shaping (config docstring); env rewards untouched
            r = (tr.reward + cfg.success_bonus * tr.succ_step
                 - cfg.fail_penalty * tr.failed + sh)
            delta = r + cfg.gamma * boot - tr.value
            gae = delta + cfg.gamma * cfg.gae_lambda * not_reset * gae
            return gae, gae

        _, advantages = jax.lax.scan(
            scan_back, jnp.zeros_like(traj.value[-1]), (traj, shaping),
            reverse=True)
        returns = advantages + traj.value
        return advantages, returns

    # ------------------------------------------------------------- update
    def _loss(self, params, batch, advantages, returns, stats, ent_coef, cap):
        cfg = self.config
        mean, log_std, value = self.network.apply(
            params, self._net_in(batch.obs, stats, batch.task_oh))
        log_std = jnp.minimum(log_std, cap)
        log_prob = gaussian_log_prob(mean, log_std, batch.action)
        ratio = jnp.exp(log_prob - batch.log_prob)
        adv = (advantages - advantages.mean()) / (advantages.std() + 1e-8)
        pg1 = ratio * adv
        pg2 = jnp.clip(ratio, 1.0 - cfg.clip_eps, 1.0 + cfg.clip_eps) * adv
        pg_loss = -jnp.minimum(pg1, pg2).mean()
        if cfg.vf_clip_eps > 0:
            v_clipped = batch.value + jnp.clip(value - batch.value,
                                               -cfg.vf_clip_eps,
                                               cfg.vf_clip_eps)
            v_loss = 0.5 * jnp.maximum((value - returns) ** 2,
                                       (v_clipped - returns) ** 2).mean()
        else:
            v_loss = 0.5 * ((value - returns) ** 2).mean()
        ent = gaussian_entropy(log_std).mean()
        total = pg_loss + cfg.vf_coef * v_loss - ent_coef * ent
        return total, {"pg_loss": pg_loss, "v_loss": v_loss, "entropy": ent,
                       "approx_kl": ((ratio - 1.0) - jnp.log(ratio)).mean()}

    def _scale_actor_updates(self, updates, s):
        """Multiply actor-parameter updates by `s` (0.0 during critic
        warmup), leaving critic updates untouched. Path-based so it works
        for dict and FrozenDict param trees alike; `_actor_keys` is derived
        from the configured hidden depth in __init__."""
        def f(path, u):
            names = {getattr(k, "key", None) for k in path}
            return u * s if names & self._actor_keys else u
        return jax.tree_util.tree_map_with_path(f, updates)

    def _update_epoch(self, carry, _, stats, ent_coef, lr, cap,
                      actor_scale=None):
        params, opt_state, key, flat, advantages, returns = carry
        cfg = self.config
        n = advantages.shape[0]
        key, k_shift = jax.random.split(key)
        if cfg.shuffle == "perm":
            # full random permutation — statistically ideal minibatches at
            # the cost of a whole-batch gather (A/B vs "roll":
            # benchmarks/shuffle_ab.json)
            idx = jax.random.permutation(k_shift, n)
            mix = lambda x: jnp.take(x, idx, axis=0)
        else:
            # Epoch shuffle via a random circular shift instead of a full
            # random permutation: a 65k-element permutation gather costs
            # ~100x the actual gradient math on TPU. The rollout layout
            # (time x envs) is already uncorrelated with minibatch position;
            # the roll re-partitions minibatch membership every epoch with
            # two slices + concat.
            shift = jax.random.randint(k_shift, (), 0, n)
            mix = lambda x: jnp.roll(x, shift, axis=0)
        flat_r, adv_r, ret_r = jax.tree_util.tree_map(
            mix, (flat, advantages, returns))
        mb = n // cfg.minibatches

        def mb_step(carry, i):
            params, opt_state = carry
            sl = lambda x: jax.lax.dynamic_slice_in_dim(x, i * mb, mb)
            batch = jax.tree_util.tree_map(sl, flat_r)
            (loss, aux), grads = jax.value_and_grad(self._loss, has_aux=True)(
                params, batch, sl(adv_r), sl(ret_r), stats, ent_coef, cap)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            # scale_by_adam + manual -lr: exactly adam(lr) with a traced lr
            step_lr = lr
            if cfg.target_kl > 0:
                # KL early stop, jit-form: once this epoch pass has drifted
                # past target_kl, zero the remaining minibatch updates
                # (adam moments still advance — a skipped step is a no-op on
                # params, not on the optimizer; acceptable for a guard rail)
                step_lr = jnp.where(aux["approx_kl"] < cfg.target_kl, lr, 0.0)
            updates = jax.tree_util.tree_map(lambda u: -step_lr * u, updates)
            if actor_scale is not None:
                updates = self._scale_actor_updates(updates, actor_scale)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), {"loss": loss, **aux}

        (params, opt_state), metrics = jax.lax.scan(
            mb_step, (params, opt_state), jnp.arange(cfg.minibatches))
        return (params, opt_state, key, flat, advantages, returns), metrics

    # -------------------------------------------------------- train step
    def train_step_uses_fused(self) -> bool:
        """True when collection will run through the fused Pallas kernel
        (num_envs must fill whole 128-lane blocks on every device)."""
        return (self.config.use_fused_rollout
                and self.config.num_envs % (128 * self.mesh.devices.size) == 0)

    def train_step_fn(self):
        """One jitted PPO iteration: rollout + GAE + epochs of minibatches."""
        if self._train_step is not None:
            return self._train_step
        cfg = self.config
        sh_env = env_sharding(self.mesh)
        rep = replicated_sharding(self.mesh)

        collect = (self._collect_fused if self.train_step_uses_fused()
                   else self._collect)

        def _step(ts: TrainState, hmap):
            key, k_roll, k_upd = jax.random.split(ts.key, 3)
            stats = ts.obs_stats if cfg.obs_norm else None
            # lr / entropy linear decay by update count (0 = constant)
            if cfg.anneal_updates > 0:
                frac = jnp.clip(1.0 - ts.update_count.astype(jnp.float32)
                                / float(cfg.anneal_updates),
                                cfg.anneal_floor, 1.0)
            else:
                frac = jnp.float32(1.0)
            lr_t, ent_t = cfg.lr * frac, cfg.ent_coef * frac
            if cfg.std_cap_updates > 0:
                cfrac = jnp.clip(ts.update_count.astype(jnp.float32)
                                 / float(cfg.std_cap_updates), 0.0, 1.0)
                cap_t = (cfg.log_std_init
                         + (cfg.std_cap_final - cfg.log_std_init) * cfrac)
            else:
                cap_t = jnp.float32(1e9)   # min() no-op
            actor_scale = (jnp.where(ts.update_count
                                     < cfg.critic_warmup, 0.0, 1.0)
                           if cfg.critic_warmup > 0 else None)

            es, _, traj = collect(ts.params, stats, cap_t, ts.env_state,
                                  k_roll, hmap)
            advantages, returns = self._gae(traj)
            # (T, B, ...) -> (T*B, ...)
            # explicit T*B (not -1): the zero-width task_oh leaf on
            # single-task runs makes reshape(-1, 0) ill-defined
            flat = jax.tree_util.tree_map(
                lambda x: x.reshape((x.shape[0] * x.shape[1],)
                                    + x.shape[2:]), traj)
            adv_f = advantages.reshape(-1)
            ret_f = returns.reshape(-1)
            carry = (ts.params, ts.opt_state, k_upd, flat, adv_f, ret_f)
            carry, metrics = jax.lax.scan(
                lambda c, x: self._update_epoch(c, x, stats, ent_t, lr_t,
                                                cap_t, actor_scale),
                carry, None, length=cfg.epochs)
            params, opt_state = carry[0], carry[1]
            metrics = jax.tree_util.tree_map(lambda x: x.mean(), metrics)
            metrics["reward_mean"] = traj.reward.mean()
            metrics["succ_step_frac"] = traj.succ_step.mean()
            ended = jnp.maximum(traj.terminated, traj.truncated)
            n_ep = jnp.maximum(ended.sum(), 1.0)
            metrics["done_frac"] = ended.mean()
            # terminated & ~failed == the env's success criterion fired
            # (accumulated in-tolerance time >= max_time/4, envs/env.py:283)
            metrics["success_ep_frac"] = (
                traj.terminated * (1.0 - traj.failed)).sum() / n_ep
            metrics["fail_ep_frac"] = traj.failed.sum() / n_ep
            # MixedTask: per-sub-task breakdown (task ids are static per env)
            sub_tasks = getattr(self.env.task, "tasks", None)
            if sub_tasks:
                tid = ts.env_state.task_id[None, :]      # (1, B)
                T = jnp.float32(traj.reward.shape[0])
                for i in range(len(sub_tasks)):
                    m = (tid == i).astype(jnp.float32)
                    ep_i = jnp.maximum((ended * m).sum(), 1.0)
                    metrics[f"success_ep_frac_t{i}"] = (
                        traj.terminated * (1.0 - traj.failed) * m
                    ).sum() / ep_i
                    metrics[f"in_tol_t{i}"] = (traj.succ_step * m).sum() \
                        / jnp.maximum(m.sum() * T, 1.0)
            metrics["lr"] = lr_t
            new_stats = (self._merge_stats(ts.obs_stats, traj.obs)
                         if cfg.obs_norm and not cfg.freeze_obs_stats
                         else ts.obs_stats)
            new_ts = TrainState(params=params, opt_state=opt_state,
                                env_state=es, key=key,
                                update_count=ts.update_count + 1,
                                obs_stats=new_stats)
            return new_ts, metrics

        state_shardings = TrainState(
            params=rep, opt_state=rep, env_state=sh_env, key=rep,
            update_count=rep, obs_stats=rep)
        jitted = jax.jit(
            _step,
            in_shardings=(state_shardings, rep),
            out_shardings=(state_shardings, rep),
            donate_argnums=(0,))
        # The terrain table MUST enter the train step as a runtime ARGUMENT:
        # a closed-over table becomes a jaxpr constant that re-materializes
        # inside the rollout scan (~100 us/step; ops/terrain.py docstring).
        from ..ops import terrain as terrain_ops
        hmap = jax.device_put(terrain_ops.prep_hmap_arg(self.env.terrain), rep)
        self._train_step = lambda ts: jitted(ts, hmap)
        return self._train_step

    # -------------------------------------------------------- checkpointing
    def save(self, path: str, ts: TrainState) -> None:
        """Snapshot the FULL training state (params, optimizer, env farm,
        RNG) — resume is bit-exact because the env state is just a pytree."""
        from ..utils import checkpoint as ckpt
        ckpt.save_npz(path, ts)

    def restore(self, path: str, template: TrainState) -> TrainState:
        from ..utils import checkpoint as ckpt
        return ckpt.load_npz(path, template)

    # ----------------------------------------------------------- training
    def train(self, key, num_updates: int, log_every: int = 10,
              trim_cond: Optional[dict] = None,
              cond_sampler=None, task_ids=None,
              checkpoint_path: Optional[str] = None,
              checkpoint_every: int = 100,
              resume_from: Optional[str] = None,
              fresh_farm: bool = False,
              resume_num_envs: Optional[int] = None,
              reset_schedules: bool = False,
              set_log_std: Optional[float] = None,
              eval_every: int = 0, eval_episodes: int = 64,
              eval_env: Optional[HeliEnv] = None,
              eval_cond_sampler=None):
        """`fresh_farm`: on resume, keep the checkpoint's params/optimizer/
        obs-stats but use the freshly initialized env farm — REQUIRED when
        resuming under different initial conditions (e.g. a start-altitude
        curriculum): a full restore silently brings back the checkpoint's
        env states AND reset snapshots, so a new `trim_cond` has no effect.

        `resume_num_envs`: the checkpoint's farm size when it differs from
        this learner's (scale-up resume, e.g. warm-starting a 4096-env TPU
        run from a 512-env policy). Checkpoints snapshot the FULL TrainState,
        so their treedef embeds the farm shape; the checkpoint is restored
        through a template of ITS OWN size and only the farm-size-independent
        pieces (params, optimizer moments, obs stats) are transplanted.
        Schedules restart (update_count stays 0) — a scale-up phase is a new
        annealing regime, not a continuation.

        `set_log_std`: overwrite the restored policy's learned log-std with
        this value (std surgery). The staged-consolidation protocol for
        precision tasks: PPO's log-std gradient is near zero once the mean is
        good (measured: 300 updates moved it 0.01), and the std-cap schedule
        caps only the EFFECTIVE std — the learned parameter evaluate.py
        samples stays put. Stepping the parameter down between short
        fine-tune stages (-2.5 -> -2.8 -> -3.1 ...) re-fits the mean at each
        noise level and makes the stochastic policy converge to the
        deterministic one.

        `eval_every`: every N updates run the TRUE deterministic evaluator
        (fresh episodes to first termination, evaluate.py) and best-track on
        ITS success_frac instead of the in-training `success_ep_frac`. The
        in-training metric is selection-biased over a sliding window (only
        episodes that END in the rollout appear: right after a reset burst
        the quick successes dominate, later windows only see the stragglers)
        and PPO on this plant drifts — periodic ground-truth evaluation is
        how a genuinely-best policy gets kept. Costs one extra compiled scan
        per N updates; the evaluator's jit is built once and cached.

        `eval_env`: environment to EVALUATE in when it differs from the
        training env — the selection side of a robustness curriculum
        (e.g. train at turbulence level 3, select/report at the nominal
        level 1). Defaults to the training env.

        `eval_cond_sampler`: per-episode initial conditions for the periodic
        evaluator (batched on-device trim), e.g. a deterministic altitude
        grid across a training band — selection then rewards band-wide
        generalization instead of the single `trim_cond` point."""
        ts = self.init(key, trim_cond, cond_sampler=cond_sampler,
                       task_ids=task_ids)
        if resume_from and resume_num_envs \
                and resume_num_envs != self.config.num_envs:
            tmp = PPOLearner(self.env,
                             dataclasses.replace(self.config,
                                                 num_envs=resume_num_envs),
                             mesh=self.mesh)
            small = tmp.restore(resume_from, tmp.init(key))
            ts = ts.replace(params=small.params, opt_state=small.opt_state,
                            obs_stats=small.obs_stats)
        elif resume_from:
            restored = self.restore(resume_from, ts)
            if fresh_farm:
                restored = restored.replace(env_state=ts.env_state,
                                            key=ts.key)
            ts = restored
        if resume_from and reset_schedules:
            # a SAME-SIZE resume restores update_count, so anneal /
            # critic-warmup / std-cap schedules continue from the
            # checkpoint's counter (documented footgun) — zero it when the
            # new stage is a new annealing regime (scale-up resume already
            # restarts schedules by construction)
            ts = ts.replace(update_count=jnp.zeros((), jnp.int32))
        if resume_from and set_log_std is not None:
            params = jax.tree_util.tree_map(lambda x: x, ts.params)
            params["params"]["log_std"] = jnp.full_like(
                params["params"]["log_std"], set_log_std)
            ts = ts.replace(params=params)
        step = self.train_step_fn()
        evaluator = None
        if eval_every:
            from .evaluate import make_evaluator
            eval_tids = (np.arange(eval_episodes) % (int(np.max(task_ids))
                                                     + 1)
                         if task_ids is not None else None)
            e_env = eval_env or self.env
            evaluator = make_evaluator(
                e_env, self, episodes=eval_episodes,
                steps=e_env.time_up_steps + 3, stochastic=False,
                trim_cond=trim_cond, task_ids=eval_tids,
                cond_sampler=eval_cond_sampler)
            eval_key = jax.random.PRNGKey(1234)  # FIXED: evals comparable
        history = []
        best_succ = -1.0
        for i in range(num_updates):
            ts, metrics = step(ts)
            if evaluator is not None and ((i + 1) % eval_every == 0
                                          or i == num_updates - 1):
                ev = evaluator(ts, eval_key)
                metrics = dict(metrics)
                metrics.update({f"eval_{k}": v for k, v in ev.items()
                                if k != "episodes"})
                s = ev["success_frac"]
                # MixedTask: select on the WORST sub-task, not the mean —
                # the product goal is per-task competence, and a mean-based
                # best can hide one dead sub-task behind another's success
                per_task = [v for k, v in sorted(ev.items())
                            if k.startswith("success_frac_t")]
                if per_task:
                    s = min(per_task)
                    print(f"  eval @ update {i + 1}: det per-task "
                          f"{[round(v, 3) for v in per_task]} "
                          f"min={s:.3f} fail={ev['fail_frac']:.3f}",
                          flush=True)
                else:
                    print(f"  eval @ update {i + 1}: det success={s:.3f} "
                          f"fail={ev['fail_frac']:.3f}", flush=True)
                if checkpoint_path and s > best_succ:
                    best_succ = s
                    self.save(checkpoint_path + ".best.npz", ts)
                    print(f"  saved best at update {i + 1} "
                          f"(eval success={s:.3f})", flush=True)
            # keep the PEAK-success policy: PPO on an unstable plant can
            # unlearn a succeeding policy late in a run (observed: hover
            # success_ep 0.10 at update 130 -> 0 by 160 after one
            # kl=0.005 update); the final checkpoint is not the best one.
            # Checked EVERY update: a synchronized farm ends its successful
            # episodes in bursts every ~time_up/rollout_steps updates, so a
            # log_every-sampled check aliases against the burst cycle and
            # can miss every success window (observed on 4096-env hover:
            # sampled success_ep 0.03 while burst updates hit 0.47).
            if checkpoint_path and evaluator is None:
                s = float(metrics["success_ep_frac"])
                if s > max(best_succ, 0.0):
                    best_succ = s
                    self.save(checkpoint_path + ".best.npz", ts)
                    print(f"  saved best at update {i + 1} "
                          f"(success_ep={s:.3f})", flush=True)
            if (i + 1) % log_every == 0 or i == num_updates - 1:
                m = {k: float(v) for k, v in metrics.items()}
                m["update"] = i + 1
                history.append(m)
                print(f"update {i+1}: reward={m['reward_mean']:.4f} "
                      f"loss={m['loss']:.4f} kl={m['approx_kl']:.4f} "
                      f"success_ep={m['success_ep_frac']:.3f} "
                      f"fail_ep={m['fail_ep_frac']:.3f} "
                      f"in_tol={m['succ_step_frac']:.3f}", flush=True)
            if checkpoint_path and (i + 1) % checkpoint_every == 0:
                self.save(checkpoint_path, ts)
        if checkpoint_path:
            self.save(checkpoint_path, ts)
        return ts, history

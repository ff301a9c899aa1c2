"""Success-time accounting parity: `successed` fires when the accumulated
success time reaches max_time/4, evaluated BEFORE the current step's credit
(helicopter.py:91-92, 201-205, 236-237)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from heligym_tpu.envs import HeliEnv
from heligym_tpu.envs.tasks import Task


@dataclasses.dataclass(frozen=True)
class AlwaysSucceedTask(Task):
    def reward(self, norm, state, dots, task_id=None):
        one = jnp.ones_like(state.vi_mr)
        return one, one > 0.0   # success every step


def test_success_threshold_counts(hover_env, hover_trim):
    env = hover_env.replace(task=AlwaysSucceedTask(), max_time=4.0)
    # reference accounting: success_duration = 1.0 s = 50 steps of credit;
    # the flag is checked before the step's own credit is added, so it first
    # fires on the step after the 50th credited step.
    assert env.success_steps_required == 50
    es, _ = env.reset_from_trim(hover_trim, jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    act = jnp.asarray(hover_trim.action)
    for t in range(1, 60):
        es, out = step(es, act)
        if bool(out.successed):
            assert t == 51, f"successed first fired at step {t}"
            assert bool(out.done)
            break
    else:
        raise AssertionError("successed never fired")


def test_time_up_steps(hover_env):
    # 40 s at 50 Hz: the reference's float64 time accumulator first exceeds
    # max_time at step 2000
    assert hover_env.time_up_steps == 2000
    assert hover_env.replace(max_time=4.0).time_up_steps == 200
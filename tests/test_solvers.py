"""Higher-order solver tests (PLMS, DPM-Solver++(2M)).

Strategy: a diffusion process whose optimal eps-predictor is known in
closed form — data x0 ~ N(mu, s^2 I) gives marginals
xt ~ N(a mu, v I), v = a^2 s^2 + sigma^2 (a = sqrt(acp), sigma^2 = 1-acp),
and the posterior-mean predictor
  E[eps | xt] = sigma (xt - a mu) / v.
The probability-flow ODE is then linear, so its flow map is the exact
affine quantile transport
  x(t_end) = a_e mu + sqrt(v_e / v_s) (x(t_start) - a_s mu),
which every deterministic sampler must converge to, with the
higher-order solvers closer at equal NFE than DDIM.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldm_tf2_tpu.diffusion import make_schedule
from ldm_tf2_tpu.diffusion.sampler import ddim_sample_loop
from ldm_tf2_tpu.diffusion.solvers import (
    dpm_solver_pp_2m_sample_loop,
    plms_sample_loop,
)

pytestmark = pytest.mark.fast  # per-session green-check tier

MU = 0.7
S = 0.35
SHAPE = (4, 4, 4, 2)
XT = np.asarray(
    jax.random.normal(jax.random.PRNGKey(7), SHAPE, jnp.float32)
)


def _exact_eps_model(schedule):
    acp = jnp.asarray(schedule.alphas_cumprod)

    def eps_model(xt, t, context):
        del context
        a = jnp.take(acp, t.astype(jnp.int32)).reshape(-1, 1, 1, 1)
        v = a * S**2 + 1.0 - a
        return jnp.sqrt(1.0 - a) * (xt - jnp.sqrt(a) * MU) / v

    return eps_model


def _run(loop_fn, num_ddim_steps, timestep_spacing="uniform"):
    """Returns (sample, exact PF-ODE endpoint for this step count's
    start time)."""
    schedule = make_schedule(
        beta_start=0.00085,
        beta_end=0.012,
        num_ddim_steps=num_ddim_steps,
        timestep_spacing=timestep_spacing,
    )
    context = jnp.zeros((2 * SHAPE[0], 3, 8), jnp.float32)
    out = loop_fn(
        _exact_eps_model(schedule),
        schedule,
        context,
        SHAPE,
        jax.random.PRNGKey(0),
        guidance_scale=1.0,
        init_noise=jnp.asarray(XT),
    )
    acp = np.asarray(schedule.alphas_cumprod, np.float64)
    acp_s = acp[int(schedule.ddim_steps[-1])]
    acp_e = acp[0]  # the loops' final target (ddim_alphas_cumprod_prev[0])
    v = lambda a: a * S**2 + (1.0 - a)
    exact = np.sqrt(acp_e) * MU + np.sqrt(v(acp_e) / v(acp_s)) * (
        XT - np.sqrt(acp_s) * MU
    )
    return np.abs(np.asarray(out) - exact).max()


def test_solvers_beat_ddim_at_equal_nfe():
    err_ddim = _run(ddim_sample_loop, 20)
    err_plms = _run(plms_sample_loop, 20)
    err_dpm = _run(dpm_solver_pp_2m_sample_loop, 20)
    assert np.isfinite(err_plms) and np.isfinite(err_dpm)
    assert err_plms < err_ddim, (err_plms, err_ddim)
    assert err_dpm < err_ddim, (err_dpm, err_ddim)
    # absolute accuracy, not just relative ordering
    # (measured: ddim 0.178, plms 0.036, dpm2m 0.141)
    assert err_plms < 0.06, err_plms
    assert err_dpm < 0.16, err_dpm


@pytest.mark.parametrize(
    "loop_fn",
    [ddim_sample_loop, plms_sample_loop, dpm_solver_pp_2m_sample_loop],
    ids=["ddim", "plms", "dpm2m"],
)
def test_solver_converges_with_steps(loop_fn):
    errs = [_run(loop_fn, n) for n in (10, 50, 200)]
    assert errs[2] < errs[1] < errs[0], errs
    assert errs[2] < 0.025, errs[2]


@pytest.mark.parametrize("spacing", ["trailing", "karras"])
@pytest.mark.parametrize(
    "loop_fn",
    [ddim_sample_loop, plms_sample_loop, dpm_solver_pp_2m_sample_loop],
    ids=["ddim", "plms", "dpm2m"],
)
def test_solvers_converge_under_alternate_spacings(loop_fn, spacing):
    # Every sampler must consume a non-uniform ddim sub-sequence unchanged
    # (the schedule contract: ddim_* tables are gathers at ddim_steps).
    errs = [_run(loop_fn, n, spacing) for n in (10, 50, 200)]
    assert np.isfinite(errs).all(), errs
    assert errs[2] < errs[0], errs
    assert errs[2] < 0.03, errs[2]

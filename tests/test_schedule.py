"""Schedule-math tests vs closed-form numpy (SURVEY.md §4 test strategy).

Cross-checked against the reference's table construction
(/root/reference/model_runners.py:379-423) — same formulas, independently
re-derived here in float64.
"""

import numpy as np
import pytest

from ldm_tf2_tpu.diffusion import make_schedule


pytestmark = pytest.mark.fast  # per-session green-check tier

def test_default_tables_shapes():
    s = make_schedule()
    assert s.betas.shape == (1000,)
    assert s.ddim_steps.shape == (50,)
    for name in (
        "alphas",
        "alphas_cumprod",
        "alphas_cumprod_prev",
        "sqrt_alphas_cumprod",
        "sqrt_one_minus_alphas_cumprod",
        "posterior_variance",
        "posterior_mean_coef1",
        "posterior_mean_coef2",
    ):
        assert getattr(s, name).shape == (1000,), name
        assert getattr(s, name).dtype == np.float32, name


def test_scaled_linear_betas_endpoints():
    s = make_schedule(beta_start=0.00085, beta_end=0.012)
    assert np.isclose(s.betas[0], 0.00085, rtol=1e-6)
    assert np.isclose(s.betas[-1], 0.012, rtol=1e-6)
    # sqrt-space linearity: sqrt(betas) is an arithmetic progression
    d = np.diff(np.sqrt(s.betas.astype(np.float64)))
    assert np.allclose(d, d[0], rtol=1e-3)


def test_ddim_subsequence_matches_reference():
    # For T=1000, S=50 the reference produces [1, 21, ..., 981]
    # (model_runners.py:406-409; verified in SURVEY.md §2.2).
    s = make_schedule(num_ddim_steps=50)
    expected = np.arange(0, 1000, 20) + 1
    np.testing.assert_array_equal(s.ddim_steps, expected)


def test_ddim_full_steps_no_shift():
    # When S == T the +1 shift is skipped (model_runners.py:408-409).
    s = make_schedule(num_steps=100, num_ddim_steps=100)
    np.testing.assert_array_equal(s.ddim_steps, np.arange(100))


def test_alphas_cumprod_identities():
    s = make_schedule()
    acp = s.alphas_cumprod.astype(np.float64)
    np.testing.assert_allclose(
        s.sqrt_alphas_cumprod, np.sqrt(acp).astype(np.float32), rtol=2e-4
    )
    np.testing.assert_allclose(
        s.sqrt_one_minus_alphas_cumprod,
        np.sqrt(1 - acp).astype(np.float32),
        rtol=2e-4,
    )
    # sqrt_recip**2 * acp == 1
    np.testing.assert_allclose(
        s.sqrt_recip_alphas_cumprod**2 * acp, 1.0, rtol=1e-4
    )
    # identity: sqrt_recipm1**2 == 1/acp - 1
    np.testing.assert_allclose(
        s.sqrt_recipm1_alphas_cumprod**2, 1 / acp - 1, rtol=1e-3
    )
    # prev-shift
    np.testing.assert_allclose(s.alphas_cumprod_prev[1:], s.alphas_cumprod[:-1])
    assert s.alphas_cumprod_prev[0] == 1.0


@pytest.mark.parametrize("eta", [0.0, 0.5, 1.0])
def test_ddim_sigmas(eta):
    s = make_schedule(eta=eta)
    acp = s.alphas_cumprod.astype(np.float64)[s.ddim_steps]
    acp_prev = np.concatenate(
        [[s.alphas_cumprod[0]], s.alphas_cumprod[s.ddim_steps[:-1]]]
    ).astype(np.float64)
    expected = eta * np.sqrt((1 - acp_prev) / (1 - acp) * (1 - acp / acp_prev))
    np.testing.assert_allclose(
        s.ddim_sigmas, expected.astype(np.float32), rtol=1e-4, atol=1e-6
    )
    if eta == 0.0:
        assert np.all(s.ddim_sigmas == 0)


def test_posterior_variance_formula():
    s = make_schedule(v_posterior=0.1)
    b = s.betas.astype(np.float64)
    acp = s.alphas_cumprod.astype(np.float64)
    acp_prev = s.alphas_cumprod_prev.astype(np.float64)
    expected = 0.9 * b * (1 - acp_prev) / (1 - acp) + 0.1 * b
    np.testing.assert_allclose(
        s.posterior_variance, expected.astype(np.float32), rtol=1e-3
    )


def test_trailing_spacing():
    s = make_schedule(num_ddim_steps=20, timestep_spacing="trailing")
    assert s.ddim_steps.shape == (20,)
    # Trailing starts sampling at the FINAL timestep (uniform stops at 951
    # for S=20) and steps down uniformly by T/S.
    assert s.ddim_steps[-1] == 999
    np.testing.assert_array_equal(np.diff(s.ddim_steps), 50)


def test_karras_spacing_properties():
    s = make_schedule(num_ddim_steps=20, timestep_spacing="karras")
    steps = s.ddim_steps
    assert steps.shape == (20,)
    assert np.all(np.diff(steps) > 0)  # strictly increasing, no collisions
    assert steps[-1] == 999  # sigma_max maps to the final timestep
    # Karras rho=7 concentrates steps at LOW noise: gaps grow monotonically
    # toward high t (compare first vs last inter-step gap).
    gaps = np.diff(steps.astype(np.int64))
    assert gaps[0] < gaps[-1]
    # The selected sigmas track the analytic Karras ramp: check the
    # round-trip sigma of each chosen step is within one grid cell of the
    # ideal ramp value.
    acp = s.alphas_cumprod.astype(np.float64)
    sig = np.sqrt((1 - acp) / acp)
    rho = 7.0
    ramp = np.linspace(0, 1, 20)
    ideal = (
        sig[-1] ** (1 / rho) + ramp * (sig[1] ** (1 / rho) - sig[-1] ** (1 / rho))
    ) ** rho
    chosen = sig[steps][::-1]
    # neighbour-cell tolerance: |log sigma| error bounded by local grid step
    for i, t in enumerate(steps[::-1]):
        lo, hi = max(t - 1, 0), min(t + 1, 999)
        assert sig[lo] <= ideal[i] * 1.5 and ideal[i] * 0.66 <= sig[hi], (
            i, t, ideal[i], chosen[i])


@pytest.mark.parametrize("n", [4, 8, 20, 50])
def test_karras_final_step_not_identity(n):
    # Sub-sequence must stay off t=0: acp_prev[0] == acp[0] would make the
    # final DDIM/DPM++(2M) update an exact identity (h=0), wasting one of
    # the S U-Net evals (ADVICE r2).  Mirrors the uniform rule's +1 shift.
    s = make_schedule(num_ddim_steps=n, timestep_spacing="karras")
    assert s.ddim_steps[0] >= 1
    assert s.ddim_alphas_cumprod_prev[0] > s.ddim_alphas_cumprod[0]


def test_karras_tables_consistent_with_steps():
    # All ddim_* tables must be gathers of the full tables at ddim_steps,
    # regardless of spacing (the solver contract).
    s = make_schedule(num_ddim_steps=25, timestep_spacing="karras", eta=0.5)
    np.testing.assert_array_equal(
        s.ddim_alphas_cumprod, s.alphas_cumprod[s.ddim_steps]
    )
    np.testing.assert_array_equal(
        s.ddim_alphas_cumprod_prev,
        np.concatenate(
            [[s.alphas_cumprod[0]], s.alphas_cumprod[s.ddim_steps[:-1]]]
        ),
    )
    assert np.all(s.ddim_sigmas >= 0)


def test_unknown_spacing_raises():
    with pytest.raises(ValueError, match="timestep_spacing"):
        make_schedule(timestep_spacing="cosine")


def test_q_sample_coefficient_energy_conservation():
    # sqrt(acp)^2 + sqrt(1-acp)^2 == 1: q_sample preserves unit variance.
    s = make_schedule()
    total = (
        s.sqrt_alphas_cumprod.astype(np.float64) ** 2
        + s.sqrt_one_minus_alphas_cumprod.astype(np.float64) ** 2
    )
    np.testing.assert_allclose(total, 1.0, atol=1e-6)

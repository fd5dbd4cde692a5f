"""Golden tests for schedules against the reference formulas
(utils/utils.py:200-213, main_dino_mc.py:293-306,431-435)."""

import numpy as np

from dinomc_tpu.core import schedules


def test_cosine_scheduler_length_and_endpoints():
    s = schedules.cosine_scheduler(0.5, 1e-6, epochs=10, niter_per_ep=100, warmup_epochs=2)
    assert len(s) == 1000
    assert s[0] == 0.0  # start_warmup_value default
    np.testing.assert_allclose(s[199], 0.5, rtol=1e-6)  # end of warmup
    # cosine tail approaches final value
    assert s[-1] < 0.5 and abs(s[-1] - 1e-6) < 1e-4


def test_cosine_scheduler_golden_values():
    # Reference formula: final + 0.5*(base-final)*(1+cos(pi*i/len(iters)))
    base, final = 1.0, 0.1
    s = schedules.cosine_scheduler(base, final, epochs=4, niter_per_ep=5, warmup_epochs=0)
    iters = np.arange(20)
    expected = final + 0.5 * (base - final) * (1 + np.cos(np.pi * iters / 20))
    np.testing.assert_allclose(s, expected, rtol=1e-7)


def test_warmup_is_linear():
    s = schedules.cosine_scheduler(
        2.0, 0.0, epochs=2, niter_per_ep=10, warmup_epochs=1, start_warmup_value=0.5
    )
    np.testing.assert_allclose(s[:10], np.linspace(0.5, 2.0, 10), rtol=1e-7)


def test_teacher_temp_schedule():
    tt = schedules.teacher_temp_schedule(0.04, 0.07, 10, 100)
    assert len(tt) == 100
    np.testing.assert_allclose(tt[:10], np.linspace(0.04, 0.07, 10))
    assert (tt[10:] == 0.07).all()


def test_linear_scaled_lr():
    assert schedules.linear_scaled_lr(0.0005, 512) == 0.001

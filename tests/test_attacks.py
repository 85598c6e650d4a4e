"""Attack engine tests.

Success-rate assertions use a sharp linear toy SRS model (dense input
gradients, easily flippable) so they validate the attack machinery itself;
AudioNet integration smoke tests validate shapes/finiteness end to end.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from speakerguard_tpu.models.base import SRSModel
from speakerguard_tpu.models.audionet import AudioNet, init_audionet
from speakerguard_tpu.attacks import FGSM, PGD, CWinf, CW2, FAKEBOB, \
    SirenAttack, Kenan
from speakerguard_tpu.adaptive.eot import eot
from speakerguard_tpu.attacks.losses import resolve_loss


class ToyModel(SRSModel):
    """scores = mean-pooled frames @ W: dense gradient, sharp boundary."""
    allowed_flags = (0, 1)
    range_type = "scale"
    threshold = float("-inf")

    def __init__(self, num_class=4, frame=100, length=4000, seed=0):
        r = np.random.default_rng(seed)
        self.w = jnp.asarray(
            r.standard_normal((length // frame, num_class)).astype(
                np.float32))
        self.frame = frame
        self.spk_ids = [str(i) for i in range(num_class)]

    def _scores_from_emb(self, emb, enroll_embs=None, p=None):
        # emb: (B, T') mean over taps; pad/crop to the score matrix rows
        t = self.w.shape[0]
        if emb.shape[1] != t:
            reps = -(-t // emb.shape[1])
            emb = jnp.tile(emb, (1, reps))[:, :t]
        return emb @ self.w

    def _raw(self, wav, rng=None, p=None):
        b, length = wav.shape
        # (B, T, F) like real acoustic features (FeCo etc. need 3-D)
        return wav.reshape(b, length // self.frame, self.frame)

    def _embedding_from_top(self, feats, p=None):
        return feats.mean(-1)

    def _feat_step(self, feats, ori_flag, p=None):
        raise ValueError


@pytest.fixture(scope="module")
def toy():
    m = ToyModel()
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(-0.3, 0.3, (3, 4000)).astype(np.float32))
    y, _ = m.make_decision(x)
    return m, x, y


@pytest.fixture(scope="module")
def small_audionet():
    rng = np.random.default_rng(7)
    params, state = init_audionet(rng, num_class=4)
    m = AudioNet(params, state)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(-0.3, 0.3, (2, 4000)).astype(np.float32))
    y, _ = m.make_decision(x)
    return m, x, y


def test_eot_size1_equals_plain_grad(small_audionet):
    m, x, y = small_audionet
    loss_fn, _ = resolve_loss("Entropy", task="CSI")
    run = eot(lambda xx, k: m.score(xx), loss_fn, m.threshold)
    keys = jax.random.split(jax.random.PRNGKey(0), 1)
    scores, loss, grad, dec = run(x, y, keys)

    def direct(xx):
        return jnp.sum(loss_fn(m.score(xx), y))
    want = jax.grad(direct)(x)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(want),
                               rtol=1e-4, atol=1e-6)


def test_pgd_stays_in_ball_and_flips(toy):
    m, x, y = toy
    atk = PGD(m, task="CSI", epsilon=0.05, step_size=0.01, max_iter=10)
    adver, success = atk.attack(x, y, rng=jax.random.PRNGKey(0))
    assert adver.shape == x.shape
    assert float(jnp.max(jnp.abs(adver - x))) <= 0.05 + 1e-5
    assert all(success)


def test_fgsm_single_step(toy):
    m, x, y = toy
    atk = FGSM(m, task="CSI", epsilon=0.02)
    adver, success = atk.attack(x, y, rng=jax.random.PRNGKey(0))
    delta = np.asarray(jnp.abs(adver - x))
    assert delta.max() <= 0.02 + 1e-6
    nz = delta[delta > 1e-7]
    np.testing.assert_allclose(nz, 0.02, rtol=1e-4)


def test_pgd_random_restarts(toy):
    m, x, y = toy
    atk = PGD(m, task="CSI", epsilon=0.05, step_size=0.01, max_iter=3,
              num_random_init=2)
    adver, success = atk.attack(x, y, rng=jax.random.PRNGKey(0))
    assert float(jnp.max(jnp.abs(adver - x))) <= 0.05 + 1e-5


def test_targeted_pgd(toy):
    m, x, y = toy
    target = (np.asarray(y) + 1) % 4
    atk = PGD(m, task="CSI", epsilon=0.1, step_size=0.02, max_iter=20,
              targeted=True)
    adver, success = atk.attack(x, jnp.asarray(target),
                                rng=jax.random.PRNGKey(0))
    assert sum(success) >= 2  # targeted is harder; most should land


def test_cwinf_forces_margin(toy):
    atk = CWinf(toy[0], task="CSI", loss="Entropy")
    assert atk.grad_sign == -1


def test_cw2_succeeds_and_small_l2(toy):
    m, x, y = toy
    atk = CW2(m, task="CSI", max_iter=100, binary_search_steps=3,
              stop_early=False, lr=1e-2, initial_const=1e-1)
    adver, success = atk.attack(x, y, rng=jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(adver)).all()
    assert any(success)
    d, _ = m.make_decision(adver)
    for i, s in enumerate(success):
        if s:
            assert int(d[i]) != int(y[i])


def test_fakebob_flips_toy(toy):
    m, x, y = toy
    atk = FAKEBOB(m, task="CSI", epsilon=0.05, max_iter=50,
                  samples_per_draw=20, samples_per_draw_batch_size=20,
                  max_lr=0.01)
    adver, success = atk.attack(x, y, rng=jax.random.PRNGKey(0))
    assert float(jnp.max(jnp.abs(adver - x))) <= 0.05 + 1e-5
    assert sum(success) >= 2


def test_siren_runs(toy):
    m, x, y = toy
    atk = SirenAttack(m, task="CSI", epsilon=0.05, max_epoch=3, max_iter=10,
                      n_particles=8)
    adver, success = atk.attack(x, y, rng=jax.random.PRNGKey(0))
    assert adver.shape == x.shape
    assert float(jnp.max(jnp.abs(adver - x))) <= 0.05 + 1e-4
    assert sum(success) >= 1


def test_kenan_fft_runs(toy):
    m, x, y = toy
    atk = Kenan(m, atk_name="fft", max_iter=6)
    adver, success = atk.attack(x, y, rng=jax.random.PRNGKey(0))
    assert adver.shape == x.shape
    assert np.isfinite(np.asarray(adver)).all()


def test_attacks_on_audionet_smoke(small_audionet):
    m, x, y = small_audionet
    atk = PGD(m, task="CSI", epsilon=0.02, step_size=0.004, max_iter=3)
    adver, success = atk.attack(x, y, rng=jax.random.PRNGKey(0))
    assert adver.shape == x.shape
    assert float(jnp.max(jnp.abs(adver - x))) <= 0.02 + 1e-5

"""Task-matrix coverage: SV and OSI semantics (thresholds, rejection, the
margin-loss branches driving attacks), mirroring the driver benchmark
configs: CW2/CWinf on SV, FAKEBOB on OSI, BPDA+EOT vs FeCo-defended."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from test_attacks import ToyModel
from speakerguard_tpu.attacks import PGD, CW2, CWinf, FAKEBOB
from speakerguard_tpu.models.defended import DefendedModel
from speakerguard_tpu.defenses.registry import parser_defense


class ToySV(ToyModel):
    """Single enrolled speaker + accept/reject threshold."""

    def __init__(self, threshold=0.0, **kw):
        super().__init__(num_class=1, **kw)
        self.threshold = threshold
        self.spk_ids = ["enrolled"]


class ToyOSI(ToyModel):
    def __init__(self, threshold=0.0, num_class=4, **kw):
        super().__init__(num_class=num_class, **kw)
        self.threshold = threshold


@pytest.fixture(scope="module")
def sv_world():
    m = ToySV(threshold=0.0)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.uniform(-0.3, 0.3, (6, 4000)).astype(np.float32))
    d, s = m.make_decision(x)
    return m, x, np.asarray(d), np.asarray(s)


def test_sv_reject_semantics(sv_world):
    m, x, d, s = sv_world
    # decision is 0 iff score > threshold else -1
    want = np.where(s[:, 0] > m.threshold, 0, -1)
    np.testing.assert_array_equal(d, want)


def test_cwinf_sv_denial_of_service(sv_world):
    """Untargeted SV attack on accepted samples: enrolled -> reject."""
    m, x, d, _ = sv_world
    accepted = np.where(d == 0)[0]
    if len(accepted) == 0:
        pytest.skip("no accepted samples in fixture")
    xa = x[accepted]
    y = jnp.zeros(len(accepted), jnp.int32)
    atk = CWinf(m, task="SV", epsilon=0.1, step_size=0.02, max_iter=20)
    adver, success = atk.attack(xa, y, rng=jax.random.PRNGKey(0))
    assert all(success)
    d2, _ = m.make_decision(adver)
    np.testing.assert_array_equal(np.asarray(d2), -1)


def test_cwinf_sv_authentication_bypass(sv_world):
    """Targeted SV attack on rejected samples: imposter -> enrolled."""
    m, x, d, _ = sv_world
    rejected = np.where(d == -1)[0]
    if len(rejected) == 0:
        pytest.skip("no rejected samples in fixture")
    xr = x[rejected]
    # targeted bypass: target label 0 = the enrolled speaker (the reference's
    # attackMain picks the enrolled label as target for SV bypass)
    y = jnp.zeros(len(rejected), jnp.int32)
    atk = CWinf(m, task="SV", epsilon=0.1, step_size=0.02, max_iter=20,
                targeted=True)
    adver, success = atk.attack(xr, y, rng=jax.random.PRNGKey(0))
    assert all(success)
    d2, _ = m.make_decision(adver)
    np.testing.assert_array_equal(np.asarray(d2), 0)


def test_cw2_sv(sv_world):
    m, x, d, _ = sv_world
    accepted = np.where(d == 0)[0]
    xa = x[accepted]
    y = jnp.zeros(len(accepted), jnp.int32)
    atk = CW2(m, task="SV", max_iter=100, binary_search_steps=3,
              stop_early=False, initial_const=1e-1)
    adver, success = atk.attack(xa, y, rng=jax.random.PRNGKey(0))
    assert any(success)


def test_osi_attack_and_reject():
    m = ToyOSI(threshold=-0.5)
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.uniform(-0.3, 0.3, (4, 4000)).astype(np.float32))
    d, s = m.make_decision(x)
    y = d  # attack currently-accepted identities
    accepted = np.where(np.asarray(d) != -1)[0]
    if len(accepted) == 0:
        pytest.skip("all rejected")
    atk = PGD(m, task="OSI", epsilon=0.1, step_size=0.02, max_iter=20,
              loss="Margin")
    adver, success = atk.attack(x[accepted], y[accepted],
                                rng=jax.random.PRNGKey(0))
    assert sum(success) >= len(accepted) - 1
    d2, _ = m.make_decision(adver)
    # OSI untargeted success = reject OR different speaker
    for i in range(len(accepted)):
        if success[i]:
            assert int(d2[i]) != int(y[accepted[i]])


def test_fakebob_osi_with_threshold():
    m = ToyOSI(threshold=-0.5)
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.uniform(-0.3, 0.3, (2, 4000)).astype(np.float32))
    d, _ = m.make_decision(x)
    accepted = np.where(np.asarray(d) != -1)[0]
    atk = FAKEBOB(m, threshold=m.threshold, task="OSI", epsilon=0.1,
                  max_iter=40, samples_per_draw=20,
                  samples_per_draw_batch_size=20, max_lr=0.02)
    adver, success = atk.attack(x[accepted], d[accepted],
                                rng=jax.random.PRNGKey(0))
    assert len(success) == len(accepted)


def test_fakebob_requires_threshold():
    m = ToyOSI(threshold=-0.5)
    atk = FAKEBOB(m, task="OSI")
    with pytest.raises(RuntimeError):
        atk.attack(jnp.zeros((1, 4000)), jnp.asarray([0]))


def test_fakebob_threshold_estimation():
    m = ToySV(threshold=0.2)
    rng = np.random.default_rng(8)
    # find a rejected sample
    for seed in range(20):
        x = jnp.asarray(rng.uniform(-0.2, 0.2, (1, 4000)
                                    ).astype(np.float32))
        d, _ = m.make_decision(x)
        if int(d[0]) == -1:
            break
    else:
        pytest.skip("no rejected sample found")
    atk = FAKEBOB(m, task="SV", epsilon=0.3, max_iter=200,
                  samples_per_draw=20, samples_per_draw_batch_size=20,
                  max_lr=0.05)
    est = atk.estimate_threshold(x, step=0.5, rng=jax.random.PRNGKey(0))
    if est is not None:
        # estimate upper-bounds the true threshold within the sweep step
        assert est >= m.threshold - 1e-3


def test_fakebob_threshold_estimation_ignores_blackbox_fast(monkeypatch):
    """SG_BLACKBOX_FAST routes only the attack loop's NES forwards through
    the bf16 fast path; threshold estimation stays on the exact path (its
    accept/exceed exits compare raw scores to candidate thresholds), so
    the estimate must be bit-identical with the knob on."""
    m = ToySV(threshold=0.2)
    rng = np.random.default_rng(8)
    for seed in range(20):
        x = jnp.asarray(rng.uniform(-0.2, 0.2, (1, 4000)
                                    ).astype(np.float32))
        d, _ = m.make_decision(x)
        if int(d[0]) == -1:
            break
    else:
        pytest.skip("no rejected sample found")

    def estimate():
        atk = FAKEBOB(m, task="SV", epsilon=0.3, max_iter=200,
                      samples_per_draw=20, samples_per_draw_batch_size=20,
                      max_lr=0.05)
        return atk.estimate_threshold(x, step=0.5,
                                      rng=jax.random.PRNGKey(0))

    monkeypatch.setenv("SG_FAST", "1")
    monkeypatch.setenv("SG_BLACKBOX_FAST", "0")
    est_exact = estimate()
    monkeypatch.setenv("SG_BLACKBOX_FAST", "1")
    est_fast = estimate()
    assert est_exact == est_fast


def test_bpda_eot_vs_feco_defended():
    """Driver config 5: adaptive BPDA+EOT attack vs FeCo+QT defended model."""
    base = ToyModel()
    defense, _ = parser_defense(["QT", "FeCo"], ["512", "kmeans 0.5 L2"],
                                [0, 1], "sequential")
    dm = DefendedModel(base, defense=defense, order="sequential")
    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.uniform(-0.3, 0.3, (2, 4000)).astype(np.float32))
    y, _ = dm.make_decision(x, rng=jax.random.PRNGKey(5))
    atk = PGD(dm, task="CSI", epsilon=0.1, step_size=0.02, max_iter=15,
              EOT_size=4)
    adver, success = atk.attack(x, y, rng=jax.random.PRNGKey(0))
    assert adver.shape == x.shape
    assert sum(success) >= 1

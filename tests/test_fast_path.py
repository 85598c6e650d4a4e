"""Fast attack-gradient path (bf16 parameter copies, SG_FAST).

On TPU the PGD-family iteration scan runs the model's `fast=True` variant
(bf16 quad_proj / quad_packed / proj copies, single-pass MXU matmuls) while
the final success evaluation stays exact.  Off-TPU the gate
(models.base.fast_active) disables it, so these tests force SG_FAST=1 and
use bf16-appropriate tolerances.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from speakerguard_tpu.models.iv_plda import IvPlda, random_iv_plda_params


@pytest.fixture(scope="module")
def small_iv():
    rng = np.random.default_rng(11)
    params = random_iv_plda_params(rng, num_gaussians=128, dim=72,
                                   ivector_dim=64, reduced_dim=32)
    model = IvPlda(params)
    enroll = jnp.asarray(rng.standard_normal((3, 32)).astype(np.float32))
    model.set_enrollment(["a", "b", "c"], enroll)
    wavs = jnp.asarray(
        (rng.uniform(-0.3, 0.3, (2, 8000)) * 32768).astype(np.float32))
    return model, wavs


def test_fast_gate_defaults_off_on_cpu(small_iv, monkeypatch):
    """fast=True is a no-op off-TPU unless forced: identical scores."""
    monkeypatch.delenv("SG_FAST", raising=False)
    model, wavs = small_iv
    exact = np.asarray(model.score(wavs))
    gated = np.asarray(model.score(wavs, fast=True))
    np.testing.assert_array_equal(exact, gated)


def test_fast_scores_close(small_iv, monkeypatch):
    model, wavs = small_iv
    exact = np.asarray(model.score(wavs))
    monkeypatch.setenv("SG_FAST", "1")
    fast = np.asarray(model.score(wavs, fast=True))
    # bf16-rounded weight copies on a tiny ill-conditioned random fixture:
    # allow ~10% of the score spread (real Kaldi systems measured ~3%
    # drift in r2; the authoritative check is on-chip ASR parity)
    spread = np.abs(exact).max()
    assert np.abs(fast - exact).max() < 0.12 * max(spread, 1.0)


def test_fast_grad_direction_agrees(small_iv, monkeypatch):
    model, wavs = small_iv

    def loss(x, fast):
        return jnp.sum(model.score(x, fast=fast)[:, 0])

    g_exact = jax.grad(lambda x: loss(x, False))(wavs)
    monkeypatch.setenv("SG_FAST", "1")
    g_fast = jax.grad(lambda x: loss(x, True))(wavs)
    ge, gf = np.asarray(g_exact).ravel(), np.asarray(g_fast).ravel()
    cos = np.dot(ge, gf) / (np.linalg.norm(ge) * np.linalg.norm(gf))
    # the tiny random fixture is ill-conditioned (cos ~0.87 measured);
    # real-scale models track much closer — on-chip ASR parity is the
    # authoritative acceptance test for the fast path
    assert cos > 0.8
    # sign agreement is what PGD actually consumes
    nz = np.abs(ge) > np.abs(ge).max() * 1e-3
    agree = np.mean(np.sign(ge[nz]) == np.sign(gf[nz]))
    assert agree > 0.8


def test_pgd_with_forced_fast_stays_in_ball(small_iv, monkeypatch):
    """The attack runs the fast body + exact final eval; the epsilon-ball
    property is precision-independent."""
    from speakerguard_tpu.attacks import PGD
    monkeypatch.setenv("SG_FAST", "1")
    model, wavs = small_iv
    x = wavs / (2.0 ** 15)
    y, _ = model.make_decision(x)
    atk = PGD(model, task="CSI", epsilon=0.01, step_size=0.002, max_iter=3)
    adver, success = atk.attack(x, y, rng=jax.random.PRNGKey(0))
    assert float(jnp.max(jnp.abs(adver - x))) <= 0.01 + 1e-6
    # success is evaluated on the exact path: recomputing decisions on the
    # exact model must reproduce the returned success vector
    d, _ = model.make_decision(adver)
    assert [bool(int(di) != int(yi)) for di, yi in
            zip(np.asarray(d), np.asarray(y))] == list(success)


def test_fused_stats_block_tracks_exact_at_scale(monkeypatch):
    """The fused softmax+stats block at a realistic UBM slice (C=512,
    D=72 — the production dim class, not the tiny fixtures): forward
    stats and feature gradients track the exact f32 path (cos > 0.999,
    sign agreement > 99%)."""
    import jax
    from speakerguard_tpu.models import gmm as G

    rng = np.random.default_rng(23)
    params = G.random_gmm(rng, 512, 72)
    feats = jnp.asarray(rng.standard_normal((2, 60, 72)).astype(np.float32))
    monkeypatch.setenv("SG_FAST", "1")

    z_ex, f_ex = G.zeroth_first_stats(params, feats, fast=False)
    z_fa, f_fa = G.zeroth_first_stats(params, feats, fast=True)
    assert np.abs(np.asarray(z_fa) - np.asarray(z_ex)).max() < 0.05
    scale = np.abs(np.asarray(f_ex)).max()
    assert np.abs(np.asarray(f_fa) - np.asarray(f_ex)).max() < 0.05 * scale

    def mk(fn):
        def loss(f):
            z, fs = fn(f)
            return jnp.sum(z[:, ::7]) + jnp.sum(fs[:, ::5, :] ** 2)
        return loss

    g_ex = np.asarray(jax.grad(mk(
        lambda f: G.zeroth_first_stats(params, f, fast=False)))(feats))
    g_fa = np.asarray(jax.grad(mk(
        lambda f: G.zeroth_first_stats(params, f, fast=True)))(feats))
    cos = (g_ex * g_fa).sum() / (np.linalg.norm(g_ex)
                                 * np.linalg.norm(g_fa))
    assert cos > 0.999
    nz = np.abs(g_ex) > np.abs(g_ex).max() * 1e-3
    assert np.mean(np.sign(g_ex[nz]) == np.sign(g_fa[nz])) > 0.99


def test_tdnn_fast_backward_blocks(rng, monkeypatch):
    """SG_TDNN_FAST (r4, VERDICT r3 #3 lead): forward is bit-identical
    (exact conv chain); the bf16-residual fused backward tracks the exact
    autodiff input-gradient in direction and sign."""
    import jax
    from speakerguard_tpu.models.xv_plda import XvPlda, random_xv_plda_params

    monkeypatch.setenv("SG_FAST", "1")
    # isolate the f32-activation fast blocks (bf16-act has its own tests)
    monkeypatch.setenv("SG_TDNN_BF16_ACT", "0")
    model = XvPlda(random_xv_plda_params(np.random.default_rng(5)))
    enroll = jnp.asarray(
        np.random.default_rng(6).standard_normal((4, 150)).astype(np.float32))
    model.set_enrollment([str(i) for i in range(4)], enroll)
    wavs = jnp.asarray((np.random.default_rng(7).uniform(
        -0.3, 0.3, (2, 16000)) * 32768).astype(np.float32))

    def loss(x, env):
        monkeypatch.setenv("SG_TDNN_FAST", env)
        return jnp.sum(model.score(x, fast=True)[:, :2])

    monkeypatch.setenv("SG_TDNN_FAST", "0")
    s_exact = np.asarray(model.score(wavs, fast=True))
    g_exact = np.asarray(jax.grad(lambda x: loss(x, "0"))(wavs))
    monkeypatch.setenv("SG_TDNN_FAST", "1")
    s_fast = np.asarray(model.score(wavs, fast=True))
    g_fast = np.asarray(jax.grad(lambda x: loss(x, "1"))(wavs))

    np.testing.assert_array_equal(s_fast, s_exact)  # identical forward
    cos = (g_exact * g_fast).sum() / (np.linalg.norm(g_exact)
                                      * np.linalg.norm(g_fast) + 1e-30)
    assert cos > 0.999, cos
    nz = np.abs(g_exact) > np.abs(g_exact).max() * 1e-3
    assert np.mean(np.sign(g_exact[nz]) == np.sign(g_fast[nz])) > 0.99


def test_pgd_success_invariant_to_tdnn_fast(rng, monkeypatch):
    """The SG_TDNN_FAST backward must not change PGD outcomes at CPU
    (f32-compute) drift levels: identical per-sample success vectors and
    epsilon-ball outputs on the xv chain with SG_FAST=1."""
    import jax
    from speakerguard_tpu.models.xv_plda import XvPlda, random_xv_plda_params
    from speakerguard_tpu.attacks import PGD

    monkeypatch.setenv("SG_FAST", "1")
    # isolate the SG_TDNN_FAST 0-vs-1 comparison from bf16-act drift
    monkeypatch.setenv("SG_TDNN_BF16_ACT", "0")
    model = XvPlda(random_xv_plda_params(np.random.default_rng(8)))
    enroll = jnp.asarray(
        np.random.default_rng(9).standard_normal((4, 150)).astype(np.float32))
    model.set_enrollment([str(i) for i in range(4)], enroll)
    x = jnp.asarray(np.random.default_rng(10).uniform(
        -0.3, 0.3, (4, 16000)).astype(np.float32))
    y, _ = model.make_decision(x)
    key = jax.random.PRNGKey(2)

    monkeypatch.setenv("SG_TDNN_FAST", "0")
    adv0, s0 = PGD(model, task="CSI", epsilon=0.002, step_size=0.0005,
                   max_iter=4).attack(x, y, rng=key)
    monkeypatch.setenv("SG_TDNN_FAST", "1")
    adv1, s1 = PGD(model, task="CSI", epsilon=0.002, step_size=0.0005,
                   max_iter=4).attack(x, y, rng=key)
    assert s0 == s1
    # both stay in the common epsilon ball around x
    for adv in (adv0, adv1):
        assert float(jnp.max(jnp.abs(adv - x))) <= 0.002 + 1e-6


def test_ivec_l_bf16_scores_and_grads_track(small_iv, monkeypatch):
    """SG_IVEC_L_BF16 (r5, iv-trace-driven): the posterior-precision
    matrix L materializes bfloat16 on the fast path; the f32-factorized
    solve keeps scores close and the waveform gradient tracks the f32-L
    fast path in direction and sign."""
    model, wavs = small_iv
    monkeypatch.setenv("SG_FAST", "1")

    def loss(x, env):
        monkeypatch.setenv("SG_IVEC_L_BF16", env)
        return jnp.sum(model.score(x, fast=True)[:, :2])

    monkeypatch.setenv("SG_IVEC_L_BF16", "0")
    s_base = np.asarray(model.score(wavs, fast=True))
    g_base = np.asarray(jax.grad(lambda x: loss(x, "0"))(wavs))
    monkeypatch.setenv("SG_IVEC_L_BF16", "1")
    s_bf16 = np.asarray(model.score(wavs, fast=True))
    g_bf16 = np.asarray(jax.grad(lambda x: loss(x, "1"))(wavs))

    spread = np.abs(s_base).max()
    assert np.abs(s_bf16 - s_base).max() < 0.05 * max(spread, 1.0)
    cos = (g_base * g_bf16).sum() / (np.linalg.norm(g_base)
                                     * np.linalg.norm(g_bf16) + 1e-30)
    assert cos > 0.95, cos
    nz = np.abs(g_base) > np.abs(g_base).max() * 1e-3
    assert np.mean(np.sign(g_base[nz]) == np.sign(g_bf16[nz])) > 0.9


def test_pgd_with_ivec_l_bf16_stays_in_ball_and_exact_eval(small_iv,
                                                           monkeypatch):
    """End-to-end PGD with SG_IVEC_L_BF16 (+ top-K, the shipping combo):
    epsilon ball holds and reported success is exact-model verified."""
    from speakerguard_tpu.attacks import PGD
    monkeypatch.setenv("SG_FAST", "1")
    monkeypatch.setenv("SG_IVEC_L_BF16", "1")
    monkeypatch.setenv("SG_GMM_TOPK", "64")
    model, wavs = small_iv
    x = wavs / (2.0 ** 15)
    y, _ = model.make_decision(x)
    atk = PGD(model, task="CSI", epsilon=0.01, step_size=0.002, max_iter=3)
    adver, success = atk.attack(x, y, rng=jax.random.PRNGKey(0))
    assert float(jnp.max(jnp.abs(adver - x))) <= 0.01 + 1e-6
    d, _ = model.make_decision(adver)
    assert [bool(int(di) != int(yi)) for di, yi in
            zip(np.asarray(d), np.asarray(y))] == list(success)


def test_tdnn_bf16_act_blocks(rng, monkeypatch):
    """SG_TDNN_BF16_ACT (r5, trace-driven): activations and cotangents flow
    bfloat16 between TDNN layers.  The forward drifts at bf16 rounding
    levels only, and the input gradient tracks the exact autodiff gradient
    in direction and sign (what PGD's sign() steps consume)."""
    import jax
    from speakerguard_tpu.models.xv_plda import XvPlda, random_xv_plda_params

    monkeypatch.setenv("SG_FAST", "1")
    monkeypatch.setenv("SG_TDNN_FAST", "1")
    model = XvPlda(random_xv_plda_params(np.random.default_rng(30)))
    enroll = jnp.asarray(np.random.default_rng(31).standard_normal(
        (4, 150)).astype(np.float32))
    model.set_enrollment([str(i) for i in range(4)], enroll)
    wavs = jnp.asarray((np.random.default_rng(32).uniform(
        -0.3, 0.3, (2, 16000)) * 32768).astype(np.float32))

    def loss(x, env):
        monkeypatch.setenv("SG_TDNN_BF16_ACT", env)
        return jnp.sum(model.score(x, fast=True)[:, :2])

    monkeypatch.setenv("SG_TDNN_BF16_ACT", "0")
    s_base = np.asarray(model.score(wavs, fast=True))
    g_base = np.asarray(jax.grad(lambda x: loss(x, "0"))(wavs))
    monkeypatch.setenv("SG_TDNN_BF16_ACT", "1")
    s_bf16 = np.asarray(model.score(wavs, fast=True))
    g_bf16 = np.asarray(jax.grad(lambda x: loss(x, "1"))(wavs))

    # forward: bf16 activation rounding through 5 bn-normalized layers
    spread = np.abs(s_base).max()
    assert np.abs(s_bf16 - s_base).max() < 0.05 * max(spread, 1.0)
    cos = (g_base * g_bf16).sum() / (np.linalg.norm(g_base)
                                     * np.linalg.norm(g_bf16) + 1e-30)
    assert cos > 0.95, cos
    nz = np.abs(g_base) > np.abs(g_base).max() * 1e-3
    assert np.mean(np.sign(g_base[nz]) == np.sign(g_bf16[nz])) > 0.9


def test_pgd_with_bf16_act_stays_in_ball_and_exact_eval(rng, monkeypatch):
    """End-to-end PGD with SG_TDNN_BF16_ACT: the output stays in the
    epsilon ball and reported success is exact-model verified (the final
    evaluation never runs the bf16-activation graph)."""
    import jax
    from speakerguard_tpu.models.xv_plda import XvPlda, random_xv_plda_params
    from speakerguard_tpu.attacks import PGD

    monkeypatch.setenv("SG_FAST", "1")
    monkeypatch.setenv("SG_TDNN_FAST", "1")
    monkeypatch.setenv("SG_TDNN_BF16_ACT", "1")
    model = XvPlda(random_xv_plda_params(np.random.default_rng(33)))
    enroll = jnp.asarray(np.random.default_rng(34).standard_normal(
        (4, 150)).astype(np.float32))
    model.set_enrollment([str(i) for i in range(4)], enroll)
    x = jnp.asarray(np.random.default_rng(35).uniform(
        -0.3, 0.3, (3, 16000)).astype(np.float32))
    y, _ = model.make_decision(x)
    adver, success = PGD(model, task="CSI", epsilon=0.002, step_size=0.0005,
                         max_iter=4).attack(x, y, rng=jax.random.PRNGKey(3))
    assert float(jnp.max(jnp.abs(adver - x))) <= 0.002 + 1e-6
    d, _ = model.make_decision(adver)
    assert [bool(int(di) != int(yi)) for di, yi in
            zip(np.asarray(d), np.asarray(y))] == list(success)


def test_cw2_fast_mode_verified_success(rng, monkeypatch):
    """SG_CW2_FAST: the inner loop scores through the bf16 fast path; the
    returned audio is exact-model re-verified, so every reported success
    is real.  At CPU drift levels the outcome matches the exact run."""
    import jax
    from speakerguard_tpu.models.xv_plda import XvPlda, random_xv_plda_params
    from speakerguard_tpu.attacks import CW2

    monkeypatch.setenv("SG_FAST", "1")
    # pin f32 activations so the CW2_FAST 0-vs-1 outcomes stay comparable
    monkeypatch.setenv("SG_TDNN_BF16_ACT", "0")
    model = XvPlda(random_xv_plda_params(np.random.default_rng(11)))
    enroll = jnp.asarray(np.random.default_rng(12).standard_normal(
        (4, 150)).astype(np.float32))
    model.set_enrollment([str(i) for i in range(4)], enroll)
    x = jnp.asarray(np.random.default_rng(13).uniform(
        -0.3, 0.3, (3, 16000)).astype(np.float32))
    y, _ = model.make_decision(x)
    key = jax.random.PRNGKey(4)
    kw = dict(task="CSI", max_iter=8, binary_search_steps=2,
              stop_early=False, initial_const=10.0)

    monkeypatch.setenv("SG_CW2_FAST", "0")
    adv0, s0 = CW2(model, **kw).attack(x, y, rng=key)
    monkeypatch.setenv("SG_CW2_FAST", "1")
    adv1, s1 = CW2(model, **kw).attack(x, y, rng=key)
    assert s0 == s1
    # every reported success is verified against the exact model
    dec, _ = model.make_decision(adv1)
    for i, s in enumerate(s1):
        if s:
            assert int(dec[i]) != int(y[i])


def test_audionet_bf16_scores_grads_and_pgd(rng, monkeypatch):
    """SG_AUDIONET_BF16 (r5): the attack-gradient CNN runs bf16 params +
    activations; scores drift at bf16 levels, the waveform gradient tracks
    the f32 fast path, and end-to-end PGD stays in-ball with exact-model
    verified success."""
    import jax
    from speakerguard_tpu.models.audionet import AudioNet, init_audionet
    from speakerguard_tpu.attacks import PGD

    params, state = init_audionet(np.random.default_rng(40), num_class=6)
    m = AudioNet(params, state)
    wavs = jnp.asarray(np.random.default_rng(41).uniform(
        -0.4, 0.4, (3, 8000)).astype(np.float32))
    monkeypatch.setenv("SG_FAST", "1")

    def loss(x, env):
        monkeypatch.setenv("SG_AUDIONET_BF16", env)
        return jnp.sum(m.score(x, fast=True)[:, :2])

    monkeypatch.setenv("SG_AUDIONET_BF16", "0")
    s_base = np.asarray(m.score(wavs, fast=True))
    g_base = np.asarray(jax.grad(lambda x: loss(x, "0"))(wavs))
    monkeypatch.setenv("SG_AUDIONET_BF16", "1")
    s_bf16 = np.asarray(m.score(wavs, fast=True))
    g_bf16 = np.asarray(jax.grad(lambda x: loss(x, "1"))(wavs))

    spread = np.abs(s_base).max()
    assert np.abs(s_bf16 - s_base).max() < 0.08 * max(spread, 1.0)
    cos = (g_base * g_bf16).sum() / (np.linalg.norm(g_base)
                                     * np.linalg.norm(g_bf16) + 1e-30)
    assert cos > 0.9, cos

    y, _ = m.make_decision(wavs)
    adver, success = PGD(m, task="CSI", epsilon=0.005, step_size=0.001,
                         max_iter=3).attack(wavs, y, rng=jax.random.PRNGKey(5))
    assert float(jnp.max(jnp.abs(adver - wavs))) <= 0.005 + 1e-6
    d, _ = m.make_decision(adver)
    assert [bool(int(di) != int(yi)) for di, yi in
            zip(np.asarray(d), np.asarray(y))] == list(success)


def test_blackbox_fast_verified_success(rng, monkeypatch):
    """SG_BLACKBOX_FAST (r5): FAKEBOB's NES samples and Siren's particle
    evaluations run the bf16 fast forward, but the reported success vector
    is re-verified on the exact path — for every lane it must equal the
    exact-model decision flip on the returned waveform, and the
    perturbation stays inside the ball."""
    import jax
    from speakerguard_tpu.models.audionet import AudioNet, init_audionet
    from speakerguard_tpu.attacks import FAKEBOB, SirenAttack

    params, state = init_audionet(np.random.default_rng(50), num_class=5)
    m = AudioNet(params, state)
    x = jnp.asarray(np.random.default_rng(51).uniform(
        -0.4, 0.4, (3, 8000)).astype(np.float32))
    y, _ = m.make_decision(x)
    monkeypatch.setenv("SG_FAST", "1")
    monkeypatch.setenv("SG_BLACKBOX_FAST", "1")

    fb = FAKEBOB(m, task="CSI", epsilon=0.02, max_iter=12, max_lr=0.01,
                 samples_per_draw=10, samples_per_draw_batch_size=10,
                 stop_early=False)
    adver, success = fb.attack(x, y, rng=jax.random.PRNGKey(7))
    assert float(jnp.max(jnp.abs(adver - x))) <= 0.02 + 1e-6
    d, _ = m.make_decision(adver)
    assert [bool(int(di) != int(yi)) for di, yi in
            zip(np.asarray(d), np.asarray(y))] == list(success)

    sa = SirenAttack(m, task="CSI", epsilon=0.02, max_epoch=2, max_iter=5,
                     n_particles=4, abort_early=False)
    adver, success = sa.attack(x, y, rng=jax.random.PRNGKey(8))
    assert float(jnp.max(jnp.abs(adver - x))) <= 0.02 + 1e-6
    d, _ = m.make_decision(adver)
    assert [bool(int(di) != int(yi)) for di, yi in
            zip(np.asarray(d), np.asarray(y))] == list(success)


def test_blackbox_fast_retirement_guard_survives_deceptive_fast(monkeypatch):
    """Exact-verified lane retirement (r5): under SG_BLACKBOX_FAST a lane
    may only retire as "found" once the EXACT model confirms its loss < 0.

    Adversarial stand-in for bf16 fast-path optimism: a toy SV model whose
    fast=True scores read +1.0 above exact, so the FAST loss claims success
    on the (rejected) clean input at iteration 0 for every lane.  Without
    the guard, FAKEBOB and Siren would retire every lane immediately with
    the failing clean input locked in, and the exact-path final
    re-verification would report all-False.  With the guard, lanes stay
    active until the exact model accepts — and because the deceptive shift
    is constant (it cancels in antithetic NES estimates and in every
    PSO/plateau comparison, up to float rounding), the fast run's SUCCESS
    VECTOR must match the exact (SG_BLACKBOX_FAST=0) run.  Chip
    motivation: iv FAKEBOB fast read ASR 87.5 vs 100 exact pre-guard
    (measurements/r05_blackbox_ab_log.txt)."""
    from test_tasks import ToySV
    from speakerguard_tpu.attacks import FAKEBOB, SirenAttack
    from speakerguard_tpu.attacks.losses import margin_loss

    class DeceptiveFastSV(ToySV):
        """fast=True scores read +shift above exact."""
        shift = 1.0

        def _embedding_from_top(self, feats, p=None, fast=False):
            emb = feats.mean(-1)
            if fast:
                # add c with c @ w == shift (w is (T', 1) for SV)
                emb = emb + self.shift * self.w[:, 0] / jnp.sum(self.w ** 2)
            return emb

    m = DeceptiveFastSV()
    r = np.random.default_rng(17)
    x = jnp.asarray(r.uniform(-0.2, 0.2, (2, 4000)).astype(np.float32))
    tau = float(np.asarray(m.score(x)).max()) + 0.2
    m.threshold = tau
    y = jnp.full((2,), -1, jnp.int32)  # imposters seeking acceptance

    # the deception is real: fast claims success on the clean input
    # (loss = tau - (s + 1) < 0), exact does not (clean is rejected)
    s_exact = np.asarray(m.score(x))[:, 0]
    s_fast = np.asarray(m.score(x, fast=True))[:, 0]
    np.testing.assert_allclose(s_fast - s_exact, 1.0, atol=1e-5)
    assert np.all(tau - s_fast < 0) and np.all(tau - s_exact > 0)

    def run(attack_cls, **kw):
        out = {}
        for knob in ("0", "1"):
            monkeypatch.setenv("SG_BLACKBOX_FAST", knob)
            atk = attack_cls(m, threshold=tau, task="SV", **kw)
            out[knob] = atk.attack(x, y, rng=jax.random.PRNGKey(3))
        return out

    fb = run(FAKEBOB, epsilon=0.3, max_iter=40, max_lr=0.02,
             samples_per_draw=20, samples_per_draw_batch_size=20,
             stop_early=False)
    (adv_ex, suc_ex), (adv_fa, suc_fa) = fb["0"], fb["1"]
    assert suc_fa == suc_ex and any(suc_fa)  # no guard -> all-False here
    # reported success == exact acceptance of the returned waveform
    d, _ = m.make_decision(adv_fa)
    assert [bool(int(di) == 0) for di in np.asarray(d)] == list(suc_fa)
    assert float(jnp.max(jnp.abs(adv_fa - x))) <= 0.3 + 1e-6

    sa = run(SirenAttack, epsilon=0.3, max_epoch=3, max_iter=10,
             n_particles=16, abort_early=False)
    (adv_ex, suc_ex), (adv_fa, suc_fa) = sa["0"], sa["1"]
    assert suc_fa == suc_ex
    loss = np.asarray(margin_loss(m.score(adv_fa), y, task="SV",
                                  threshold=tau, clip_max=False))
    assert [bool(l < 0) for l in loss] == list(suc_fa)
    assert float(jnp.max(jnp.abs(adv_fa - x))) <= 0.3 + 1e-6


def test_audionet_fast_dft_precision_knob(rng, monkeypatch):
    """AudioNet attack graphs honor SG_DFT_FAST_PRECISION like xv/iv:
    'default' changes only the fast path (exact path untouched), and the
    fast scores stay close."""
    from speakerguard_tpu.models.audionet import AudioNet, init_audionet

    params, state = init_audionet(np.random.default_rng(20), num_class=6)
    m = AudioNet(params, state)
    wavs = jnp.asarray(np.random.default_rng(21).uniform(
        -0.4, 0.4, (2, 8000)).astype(np.float32))

    monkeypatch.setenv("SG_FAST", "1")
    monkeypatch.setenv("SG_DFT_FAST_PRECISION", "high")
    base_exact = np.asarray(m.score(wavs))
    base_fast = np.asarray(m.score(wavs, fast=True))
    monkeypatch.setenv("SG_DFT_FAST_PRECISION", "default")
    exact = np.asarray(m.score(wavs))
    fast = np.asarray(m.score(wavs, fast=True))
    np.testing.assert_array_equal(exact, base_exact)  # exact path untouched
    np.testing.assert_allclose(fast, base_fast, rtol=1e-3, atol=1e-3)


# ---------------------------------------------------------------------------
# Top-K Gaussian selection (SG_GMM_TOPK) — gmm.make_topk_context
# ---------------------------------------------------------------------------

def test_topk_context_none_when_k_ge_c(small_iv, monkeypatch):
    """K >= C (or K <= 0) disables selection: no context, unchanged graph."""
    from speakerguard_tpu.models import gmm as G
    model, wavs = small_iv
    monkeypatch.setenv("SG_FAST", "1")
    feats = model.compute_feat(wavs / 2.0 ** 15, flag=3, fast=True)
    assert G.make_topk_context(model.params.fgmm, feats, 128) is None
    assert G.make_topk_context(model.params.fgmm, feats, 0) is None
    assert G.make_topk_context(model.params.fgmm, feats, 64) is not None


def test_topk_stats_match_plain_autodiff_clone(small_iv, monkeypatch):
    """The selected-subspace stats (shared (F, K) slice through the fused
    fast stats block) match autodiff of an independently-written plain-jnp
    clone of the same math (selection fixed): forward stats equal,
    gradients equal to fast-dtype rounding."""
    from speakerguard_tpu.models import gmm as G
    model, wavs = small_iv
    monkeypatch.setenv("SG_FAST", "1")
    p = model.params.fgmm
    feats = model.compute_feat(wavs / 2.0 ** 15, flag=3, fast=True)
    ctx = G.make_topk_context(p, feats, 48)
    d = p.dim

    def loss_topk(f):
        z, fs = G.zeroth_first_stats(p, f, fast=True, topk_ctx=ctx)
        return jnp.sum(z ** 2) + jnp.sum(fs ** 2)

    def loss_clone(f):
        aug = G._augment(f, d)
        ll = jnp.einsum("btf,fk->btk", aug,
                        ctx.proj_sel.astype(jnp.float32))
        posts = jax.nn.softmax(ll + ctx.gconsts_sel[None, None, :], -1)
        zk = posts.sum(-2)
        fk = jnp.einsum("btk,btd->bkd", posts, f)
        return jnp.sum(zk ** 2) + jnp.sum(fk ** 2)

    v1 = float(loss_topk(feats))
    v2 = float(loss_clone(feats))
    assert abs(v1 - v2) < 1e-3 * max(abs(v2), 1.0)
    g1 = np.asarray(jax.grad(loss_topk)(feats))
    g2 = np.asarray(jax.grad(loss_clone)(feats))
    rel = np.linalg.norm(g1 - g2) / (np.linalg.norm(g2) + 1e-30)
    assert rel < 1e-4, rel


def test_topk_full_coverage_tracks_full_fast_path(small_iv, monkeypatch):
    """With K large enough to cover all posterior mass (K=C-1 covers
    everything the softmax tail doesn't), the selected-subspace stats and
    scores track the full fast path — including the selected-subspace
    i-vector contraction (ivector.IvectorTopK slices)."""
    from speakerguard_tpu.models import gmm as G
    from speakerguard_tpu.models.iv_plda import (embedding_from_cmvn,
                                                 make_fast_context)
    model, wavs = small_iv
    monkeypatch.setenv("SG_FAST", "1")
    p = model.params
    feats = model.compute_feat(wavs / 2.0 ** 15, flag=3, fast=True)
    k = p.fgmm.num_gaussians - 1
    ctx = make_fast_context(p, feats, k)
    assert ctx.gmm.sel.shape == (k,)          # shared selection, no B axis
    assert ctx.gmm.proj_sel.shape[-1] == k    # (F_aug, K) dense slice
    z_t, f_t = G.zeroth_first_stats(p.fgmm, feats, fast=True,
                                    topk_ctx=ctx.gmm)
    z_f, f_f = G.zeroth_first_stats(p.fgmm, feats, fast=True)
    # total mass preserved (renormalization over K ~ full C)
    np.testing.assert_allclose(np.asarray(z_t).sum(-1),
                               np.asarray(z_f).sum(-1), rtol=1e-3)
    emb_t = np.asarray(embedding_from_cmvn(p, feats, fast=True,
                                           topk_ctx=ctx))
    emb_f = np.asarray(embedding_from_cmvn(p, feats, fast=True))
    scale = np.abs(emb_f).max()
    assert np.abs(emb_t - emb_f).max() < 0.05 * max(scale, 1e-6)


def test_pgd_with_topk_stays_in_ball_and_exact_eval(small_iv, monkeypatch):
    """End-to-end PGD with SG_GMM_TOPK: the fast_context plumbing engages
    (context built inside the attack jit), the output stays in the epsilon
    ball, and reported success is exact-model verified."""
    from speakerguard_tpu.attacks import PGD
    monkeypatch.setenv("SG_FAST", "1")
    monkeypatch.setenv("SG_GMM_TOPK", "64")
    model, wavs = small_iv
    x = wavs / (2.0 ** 15)
    y, _ = model.make_decision(x)
    atk = PGD(model, task="CSI", epsilon=0.01, step_size=0.002, max_iter=3)
    adver, success = atk.attack(x, y, rng=jax.random.PRNGKey(0))
    assert float(jnp.max(jnp.abs(adver - x))) <= 0.01 + 1e-6
    d, _ = model.make_decision(adver)
    assert [bool(int(di) != int(yi)) for di, yi in
            zip(np.asarray(d), np.asarray(y))] == list(success)


def test_tchunk_stats_match_unchunked(small_iv, monkeypatch):
    """SG_GMM_STATS_TCHUNK (frame-chunked fast-path stats scan, the moral
    equivalent of the reference's gmm_frame_bs memory knob) must match the
    one-shot fast path: forward stats and input gradients to f32-accumulation
    reordering tolerance — including a non-dividing chunk size (tail chunk)
    and under a top-K selection context."""
    from speakerguard_tpu.models import gmm as G
    from speakerguard_tpu.models.iv_plda import make_fast_context
    model, wavs = small_iv
    monkeypatch.setenv("SG_FAST", "1")
    p = model.params.fgmm
    feats = model.compute_feat(wavs / 2.0 ** 15, flag=3, fast=True)
    t = feats.shape[1]
    assert t % 7 != 0  # exercise the remainder path

    def run(loss_feats, topk_ctx=None):
        def loss(f):
            z, fs = G.zeroth_first_stats(p, f, fast=True, topk_ctx=topk_ctx)
            return jnp.sum(z ** 2) + jnp.sum(fs ** 2)
        return float(loss(loss_feats)), jax.grad(loss)(loss_feats)

    monkeypatch.delenv("SG_GMM_STATS_TCHUNK", raising=False)
    v0, g0 = run(feats)
    for tc in ("7", "64", str(10 * t)):  # tail chunk / divisor-ish / > T
        monkeypatch.setenv("SG_GMM_STATS_TCHUNK", tc)
        v1, g1 = run(feats)
        assert abs(v1 - v0) <= 1e-4 * abs(v0)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                                   rtol=6e-3, atol=1e-6)

    # chunked + shared top-K selection compose (slightly looser: the K-
    # renormalized posteriors amplify bf16 accumulation reordering a bit
    # more; these gradients feed sign() steps, so direction is what counts)
    ctx = make_fast_context(model.params, feats, 48)
    monkeypatch.delenv("SG_GMM_STATS_TCHUNK", raising=False)
    v0, g0 = run(feats, ctx.gmm)
    monkeypatch.setenv("SG_GMM_STATS_TCHUNK", "7")
    v1, g1 = run(feats, ctx.gmm)
    assert abs(v1 - v0) <= 1e-4 * abs(v0)
    g0n, g1n = np.asarray(g0).ravel(), np.asarray(g1).ravel()
    cos = g0n @ g1n / (np.linalg.norm(g0n) * np.linalg.norm(g1n))
    assert cos > 0.99999
    np.testing.assert_allclose(g1n, g0n, rtol=3e-2, atol=2e-4)

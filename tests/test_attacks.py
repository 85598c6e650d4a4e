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

    def _raw(self, wav, rng=None, p=None, fast=False):
        b, length = wav.shape
        # (B, T, F) like real acoustic features (FeCo etc. need 3-D)
        return wav.reshape(b, length // self.frame, self.frame)

    def _embedding_from_top(self, feats, p=None, fast=False):
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


def test_pgd_restarts_match_eager_oracle(toy):
    """num_random_init=3 semantics vs an independently-written eager loop:
    per-restart unclipped init noise, iterate/clip, keep the restart with
    the best whole-batch success rate, first-wins ties (reference
    PGD.py:54-77)."""
    m, x, y = toy
    eps, step, iters, n_res = 0.05, 0.01, 3, 3
    atk = PGD(m, task="CSI", epsilon=eps, step_size=step, max_iter=iters,
              num_random_init=n_res)
    rng = jax.random.PRNGKey(5)
    adver, success = atk.attack(x, y, rng=rng)

    loss_fn, grad_sign = resolve_loss("Entropy", targeted=False, task="CSI")
    lower = jnp.clip(x - eps, -1.0)
    upper = jnp.clip(x + eps, None, 1.0)
    best_rate, best = -1.0, None
    for key in jax.random.split(rng, n_res):
        init_key, _ = jax.random.split(key)
        xx = x + jax.random.uniform(init_key, x.shape, x.dtype, -eps, eps)
        for _ in range(iters):
            g = jax.grad(lambda xv: jnp.sum(loss_fn(m.score(xv), y)))(xx)
            xx = jnp.clip(xx + step * jnp.sign(g) * grad_sign, lower, upper)
        pred, _ = m.make_decision(xx)
        succ = np.asarray(pred) != np.asarray(y)
        if succ.mean() > best_rate:
            best_rate, best = succ.mean(), (np.asarray(xx), succ)
    np.testing.assert_allclose(np.asarray(adver), best[0], atol=1e-6)
    assert list(success) == list(best[1])


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


def test_nes_grad_chunking_invariant(toy):
    """nes_grad outputs are invariant to the samples_batch memory budget:
    chunking only regroups independent lanes (every chunk shares the same
    eot_keys), so all five results must match.  Also pins the r5 fix —
    samples_batch == samples_per_draw (the default) must NOT chunk: the
    prepended clean point used to trip a (S, 1)-chunked evaluation with a
    near-full junk pad chunk (~1.96x wasted forwards per NES step)."""
    from speakerguard_tpu.adaptive.nes import nes_grad
    from speakerguard_tpu.adaptive.eot import eot_no_grad
    from speakerguard_tpu.attacks.losses import margin_loss

    m, x, y = toy
    loss_fn = lambda s, yy: margin_loss(  # noqa: E731
        s, yy, task="CSI", targeted=False, confidence=0.0,
        threshold=None, clip_max=False)
    eot_fn = eot_no_grad(lambda xx, kk: m.score(xx), loss_fn, m.threshold)
    eot_keys = jax.random.split(jax.random.PRNGKey(0), 1)
    key = jax.random.PRNGKey(1)

    outs = []
    for sb in (None, 8, 5, 3, 1):
        outs.append(nes_grad(eot_fn, x, y, samples_per_draw=8, sigma=1e-3,
                             key=key, num_classes=4, eot_keys=eot_keys,
                             samples_batch=sb))
    for o in outs[1:]:
        for ref, got in zip(outs[0], o):
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       rtol=1e-6, atol=1e-7)


def test_siren_runs(toy):
    m, x, y = toy
    atk = SirenAttack(m, task="CSI", epsilon=0.05, max_epoch=3, max_iter=10,
                      n_particles=8)
    adver, success = atk.attack(x, y, rng=jax.random.PRNGKey(0))
    assert adver.shape == x.shape
    assert float(jnp.max(jnp.abs(adver - x))) <= 0.05 + 1e-4
    assert sum(success) >= 1


def test_siren_device_epoch_loop_matches_host_loop(toy):
    """The r5 device-resident epoch while_loop (default) must reproduce
    the host epoch loop (verbose mode) bit for bit — same PRNG fold
    structure, re-init keeping best, and epoch-plateau abort.  Config
    chosen to exercise multi-epoch re-init and the outer abort."""
    m, x, y = toy
    kw = dict(task="CSI", epsilon=0.02, max_epoch=4, max_iter=7,
              n_particles=5, abort_early_iter=3, abort_early_epoch=2)
    rng = jax.random.PRNGKey(42)
    a_dev = SirenAttack(m, **kw)
    adv_dev, suc_dev = a_dev.attack(x, y, rng=rng)
    a_host = SirenAttack(m, verbose=1, **kw)
    adv_host, suc_host = a_host.attack(x, y, rng=rng)
    assert suc_dev == suc_host
    np.testing.assert_array_equal(np.asarray(adv_dev), np.asarray(adv_host))


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


def test_cw2_matches_eager_loop_oracle(toy):
    """The while-of-scan-chunks engine must reproduce a straightforward
    eager python loop of the same algorithm step for step (guards the
    chunking/masking machinery: overshoot past max_iter and the in-chunk
    early-stop no-ops must not perturb results)."""
    import optax
    from speakerguard_tpu.attacks.losses import margin_loss
    from speakerguard_tpu.models.base import decide
    from speakerguard_tpu.attacks.base import normalize_wav_input

    m, x, y = toy
    max_iter, bss, c0, lr = 23, 2, 1e-1, 1e-2  # 23 % chunk sizes != 0
    rng = jax.random.PRNGKey(0)

    atk = CW2(m, task="CSI", max_iter=max_iter, binary_search_steps=bss,
              stop_early=True, stop_early_iter=7, lr=lr, initial_const=c0)
    adver, success = atk.attack(x, y, rng=rng)

    # ---- independent eager loop (mirrors reference CW2.py semantics) ----
    xn, restore = normalize_wav_input(x)
    b = xn.shape[0]
    const = np.full(b, c0)
    lower_b, upper_b = np.zeros(b), np.full(b, 1e10)
    g_l2 = np.full(b, np.inf)
    g_score = np.full(b, -2, np.int64)
    g_x = np.asarray(xn)
    opt = optax.adam(lr)
    x_atanh = jnp.arctanh(xn * 0.999999)

    def losses(modifier, key, cvec):
        input_x = jnp.tanh(modifier + x_atanh)
        scores = m.score(input_x, rng=key)
        l1 = margin_loss(scores, y, task="CSI", targeted=False,
                         confidence=0.0, threshold=None, clip_max=True)
        l2 = jnp.sum(jnp.square(input_x - xn), axis=-1)
        return jnp.sum(cvec * l1 + l2), (l1, l2, scores, input_x)

    for step in range(bss):
        key0 = jax.random.fold_in(rng, step)
        cvec = jnp.asarray(const, jnp.float32)
        modifier = jnp.zeros_like(xn)
        ostate = opt.init(modifier)
        best_l2 = np.full(b, np.inf)
        best_score = np.full(b, -2, np.int64)
        s_l2 = np.full(b, np.inf)
        s_score = np.full(b, -2, np.int64)
        s_x = np.asarray(xn)
        prev_loss = np.inf
        it = 0
        while it <= max_iter:
            key = jax.random.fold_in(key0, it)
            grads, (l1, l2, scores, input_x) = jax.grad(
                losses, has_aux=True)(modifier, key, cvec)
            dec, _ = decide(scores, m.threshold)
            if it < max_iter:
                upd, ostate = opt.update(grads, ostate, modifier)
                modifier = modifier + upd
            l1n, l2n = np.asarray(l1), np.asarray(l2)
            hit = l1n <= 0
            better = hit & (l2n < best_l2)
            best_l2 = np.where(better, l2n, best_l2)
            best_score = np.where(better, np.asarray(dec), best_score)
            sb = hit & (l2n < s_l2)
            s_l2 = np.where(sb, l2n, s_l2)
            s_score = np.where(sb, np.asarray(dec), s_score)
            s_x = np.where(sb[:, None], np.asarray(input_x), s_x)
            lm = float(np.mean(np.asarray(const) * l1n + l2n))
            if it % 7 == 0:
                if lm > 0.9999 * prev_loss:
                    it += 1
                    break
                prev_loss = lm
            it += 1
        improved = s_l2 < g_l2
        g_l2 = np.where(improved, s_l2, g_l2)
        g_score = np.where(improved, s_score, g_score)
        g_x = np.where(improved[:, None], s_x, g_x)
        for j in range(b):
            if best_score[j] != -2:
                upper_b[j] = min(upper_b[j], const[j])
                if upper_b[j] < 1e9:
                    const[j] = (lower_b[j] + upper_b[j]) / 2
            else:
                lower_b[j] = max(lower_b[j], const[j])
                if upper_b[j] < 1e9:
                    const[j] = (lower_b[j] + upper_b[j]) / 2
                else:
                    const[j] *= 10

    want_adv = np.asarray(restore(jnp.asarray(g_x)))
    want_success = (g_score != -2).tolist()
    assert want_success == success
    np.testing.assert_allclose(np.asarray(adver), want_adv,
                               rtol=1e-5, atol=1e-6)


def test_siren_matches_eager_pso_oracle(toy):
    """The jitted PSO epoch scan must reproduce an independently-written
    eager python loop of the same algorithm (same PRNG stream) step for
    step.  Pins the semantics the engine claims to preserve from reference
    attack/SirenAttack.py:66-181: velocity update + annealed inertia
    (:166-177), pbest/gbest bookkeeping (:115-132), epoch re-init keeping
    only the best particle (:71-79), masked lanes standing in for
    delete_found (:191-232, success freezes a lane), the max_iter+1
    overshoot with no location step on the last iter (:96, :166), and the
    two-level 0.9999-plateau early abort (:138-144, :176-181)."""
    from speakerguard_tpu.attacks.losses import margin_loss
    from speakerguard_tpu.models.base import decide

    m, x, y = toy
    # eps chosen so epoch 0 solves SOME utterances (exercises the lane
    # mask) but not all (exercises epoch re-init + the outer abort)
    eps, p, max_iter, max_epoch = 0.02, 5, 7, 4
    abort_iter, abort_epoch = 3, 2
    rng = jax.random.PRNGKey(42)

    atk = SirenAttack(m, task="CSI", epsilon=eps, max_epoch=max_epoch,
                      max_iter=max_iter, n_particles=p,
                      abort_early_iter=abort_iter,
                      abort_early_epoch=abort_epoch)
    adver, success = atk.attack(x, y, rng=rng)

    # ---- independent eager oracle, same key stream ----
    b, length = x.shape
    lower = jnp.clip(-1.0 - x, -eps)
    upper = jnp.clip(1.0 - x, None, eps)
    v_upper = jnp.abs(upper - lower)

    def loss_of(scores, labels):
        return margin_loss(scores, labels, task="CSI", targeted=False,
                           confidence=0.0, threshold=None, clip_max=False)

    gbest_loc = jnp.zeros((b, length), x.dtype)
    gbests = jnp.full((b,), jnp.inf, jnp.float32)
    active = np.ones((b,), bool)
    prev_gbest_epoch = gbests
    epochs_run = 0
    inner_aborts = 0

    for epoch in range(max_epoch):
        ekey = jax.random.fold_in(rng, epoch)
        ikey, ekey2 = jax.random.split(ekey)
        if epoch == 0:
            pbest_locations = jax.random.uniform(
                ikey, (b, p, length), x.dtype, lower[:, None, :],
                upper[:, None, :])
            pbests = jnp.full((b, p), jnp.inf, jnp.float32)
        else:
            # re-init keeps ONLY the best particle (slot 0), fresh rest
            best_idx = jnp.argmin(pbests, axis=1)
            best_loc = jnp.take_along_axis(pbest_locations,
                                           best_idx[:, None, None], 1)
            best_val = jnp.take_along_axis(pbests, best_idx[:, None], 1)
            fresh = jax.random.uniform(
                ikey, (b, p - 1, length), x.dtype, lower[:, None, :],
                upper[:, None, :])
            pbest_locations = jnp.concatenate([best_loc, fresh], axis=1)
            pbests = jnp.concatenate(
                [best_val, jnp.full((b, p - 1), jnp.inf, jnp.float32)], 1)

        vkey, lkey = jax.random.split(ekey2)
        velocities = jax.random.uniform(vkey, (b, p, length), x.dtype,
                                        -v_upper[:, None, :],
                                        v_upper[:, None, :])
        locations = pbest_locations
        prev_gbest = gbests
        epochs_run += 1

        for it in range(max_iter + 1):
            key = jax.random.fold_in(lkey, it)
            k_eot, k1, k2 = jax.random.split(key, 3)
            eval_x = (locations + x[:, None, :]).reshape(b * p, length)
            scores = m.score(eval_x, rng=jax.random.split(k_eot, 1)[0])
            loss = np.asarray(loss_of(scores, jnp.repeat(y, p))
                              ).reshape(b, p)
            pred = np.asarray(decide(scores, m.threshold)[0]).reshape(b, p)

            do = active  # cont is True while this loop runs
            upd = do[:, None] & (loss < np.asarray(pbests))
            pbests = jnp.where(upd, loss, pbests)
            pbest_locations = jnp.where(upd[..., None], locations,
                                        pbest_locations)

            best_idx = np.argmin(np.asarray(pbests), axis=1)
            best_val = np.asarray(pbests)[np.arange(b), best_idx]
            better = do & (best_val < np.asarray(gbests))
            gbests = jnp.where(better, best_val, gbests)
            gbest_loc = jnp.where(
                better[:, None],
                jnp.take_along_axis(pbest_locations,
                                    jnp.asarray(best_idx)[:, None, None],
                                    1)[:, 0], gbest_loc)

            stop = False
            if (it + 1) % abort_iter == 0:
                if float(jnp.mean(gbests)) > 0.9999 * float(
                        jnp.mean(prev_gbest)):
                    stop = True
                    inner_aborts += 1
                prev_gbest = gbests

            active = active & (np.asarray(gbests) >= 0)
            if not active.any():
                stop = True

            # the location step STILL happens in the abort iteration (the
            # engine's step_ok uses the pre-abort `do`), except on the
            # overshoot iteration it == max_iter
            if it < max_iter:
                w = (0.9 - 0.1) * (max_iter - it - 1) / max_iter + 0.1
                r1 = jax.random.uniform(k1, (b, p, length)) + 1e-5
                r2 = jax.random.uniform(k2, (b, p, length)) + 1e-5
                vel_new = (w * velocities
                           + 1.4961 * r1 * (pbest_locations - locations)
                           + 1.4961 * r2 * (gbest_loc[:, None, :]
                                            - locations))
                loc_new = jnp.clip(locations + vel_new, lower[:, None, :],
                                   upper[:, None, :])
                step_ok = do[:, None, None]
                velocities = jnp.where(step_ok, vel_new, velocities)
                locations = jnp.where(step_ok, loc_new, locations)
            if stop:
                break

        if not active.any():
            break
        if (epoch + 1) % abort_epoch == 0:
            if float(jnp.mean(gbests)) > 0.9999 * float(
                    jnp.mean(prev_gbest_epoch)):
                break
            prev_gbest_epoch = gbests

    want_adv = np.asarray(gbest_loc + x)
    want_success = (np.asarray(gbests) < 0).tolist()

    # the config must actually exercise re-init, the inner plateau abort,
    # and the success lane mask (one solved utterance, two never solved)
    assert epochs_run >= 2
    assert inner_aborts >= 1
    assert any(want_success) and not all(want_success)
    assert want_success == success
    np.testing.assert_allclose(np.asarray(adver), want_adv,
                               rtol=1e-5, atol=1e-6)

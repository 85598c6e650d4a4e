"""Same-weights parity between the jax xv-PLDA stack and an independently
written torch mirror of the reference pipeline.

This is the BASELINE.md parity gate the bench numbers rest on: one fixed
parameter set is exported into a torch pipeline that follows the reference's
computational structure (per-utterance loops, torch ops — reference
model/xv_plda.py:107-156 feature chain, model/_xv_plda/xvecTDNN.py forward,
model/_iv_plda/plda.py scoring), and we assert

  * raw score agreement on identical inputs (atol ~1e-3 on O(10) scores)
  * identical PGD attack success on identical inputs/hyperparameters

The torch side is written from the Kaldi / reference *semantics*, not from
the jax code, so a shared misreading would have to be made twice
independently to pass.
"""

import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from speakerguard_tpu.models.xv_plda import XvPlda, random_xv_plda_params
from speakerguard_tpu.ops.kaldi_mfcc import (XV_PLDA_MFCC,
                                             IV_PLDA_MFCC)
from speakerguard_tpu.attacks import PGD

import dataclasses

MFCC_NO_DITHER = dataclasses.replace(XV_PLDA_MFCC, dither=0.0)


# ---------------------------------------------------------------------------
# torch mirror (reference-style: per-utterance, torch ops)
# ---------------------------------------------------------------------------

def _torch_mfcc30(wav):
    """Kaldi MFCC, num_ceps=30, snip_edges=False, povey, preemph 0.97,
    raw energy, lifter 22, mel 30 bins 20..7600 Hz.  wav: (L,) origin."""
    sr, win, shift, nfft, nmel, nceps = 16000, 400, 160, 512, 30, 30
    n = wav.shape[0]
    t = (n + shift // 2) // shift
    pad = win // 2 - shift // 2
    idx = (torch.arange(t)[:, None] * shift - pad
           + torch.arange(win)[None, :])
    idx = torch.where(idx < 0, -idx - 1, idx)
    idx = torch.where(idx >= n, 2 * n - 1 - idx, idx)
    frames = wav[idx]
    frames = frames - frames.mean(dim=1, keepdim=True)
    eps = torch.finfo(torch.float32).eps
    energy = torch.log(torch.clamp((frames ** 2).sum(1), min=eps))
    frames = frames - 0.97 * torch.cat(
        [frames[:, :1], frames[:, :-1]], dim=1)
    i = torch.arange(win, dtype=torch.float64)
    povey = ((0.5 - 0.5 * torch.cos(2 * math.pi * i / (win - 1))) ** 0.85
             ).float()
    frames = frames * povey
    power = torch.fft.rfft(frames, n=nfft).abs() ** 2

    def melscale(f):
        return 1127.0 * np.log(1.0 + np.asarray(f, np.float64) / 700.0)

    lo, hi = melscale(20.0), melscale(7600.0)
    delta = (hi - lo) / (nmel + 1)
    freqs = melscale(np.arange(nfft // 2) * sr / nfft)
    banks = np.zeros((nmel, nfft // 2 + 1))
    for b in range(nmel):
        left, center, right = (lo + b * delta, lo + (b + 1) * delta,
                               lo + (b + 2) * delta)
        up = (freqs - left) / (center - left)
        down = (right - freqs) / (right - center)
        banks[b, :nfft // 2] = np.maximum(0.0, np.minimum(up, down))
    mel = torch.log(torch.clamp(
        power @ torch.tensor(banks, dtype=torch.float32).T, min=eps))
    k = np.arange(nceps, dtype=np.float64)[:, None]
    j = np.arange(nmel, dtype=np.float64)[None, :]
    dct = np.sqrt(2.0 / nmel) * np.cos(np.pi / nmel * (j + 0.5) * k)
    dct[0, :] = np.sqrt(1.0 / nmel)
    feat = mel @ torch.tensor(dct, dtype=torch.float32).T
    q = 22.0
    lift = torch.tensor(
        (1.0 + 0.5 * q * np.sin(np.pi * np.arange(nceps) / q)),
        dtype=torch.float32)
    feat = feat * lift
    feat = torch.cat([energy[:, None], feat[:, 1:]], dim=1)
    return feat


def _torch_cmvn(feat, window=300):
    """Per-frame sliding CMN loop (center=True), reference iv_plda.py:296."""
    t = feat.shape[0]
    rows = []
    for i in range(t):
        ws = i - window // 2
        we = ws + window
        if ws < 0:
            we -= ws
            ws = 0
        if we > t:
            ws -= we - t
            we = t
            ws = max(ws, 0)
        rows.append(feat[i] - feat[ws:we].mean(0))
    return torch.stack(rows)


class _TorchXv:
    """Reference-structured xv-PLDA forward in torch, weights injected from
    the jax XvPldaParams pytree."""

    def __init__(self, params, enroll):
        def t(a):
            return torch.tensor(np.asarray(a), dtype=torch.float32)

        self.conv_w = [t(w).permute(2, 1, 0) for w in params.tdnn.conv_w]
        self.conv_b = [t(b) for b in params.tdnn.conv_b]
        self.bn = [(t(s.mean), t(s.var)) for s in params.tdnn.bn_tdnn]
        self.dil = [1, 2, 3, 1, 1]
        self.fc1_w, self.fc1_b = t(params.tdnn.fc1_w), t(params.tdnn.fc1_b)
        self.emb_mean = t(params.emb_mean)
        self.lda = t(params.transform_mat)
        self.plda_mean = t(params.plda.mean)
        self.plda_tr = t(params.plda.transform)
        self.psi = t(params.plda.psi)
        self.enroll = t(enroll)

    def _embedding(self, feat):  # feat: (T, 30)
        x = feat.T[None]  # (1, 30, T)
        for w, b, (m, v), d in zip(self.conv_w, self.conv_b, self.bn,
                                   self.dil):
            x = F.conv1d(x, w, b, dilation=d)
            x = F.relu(x)
            x = (x - m[None, :, None]) / torch.sqrt(v[None, :, None] + 1e-5)
        stats = torch.cat([x.mean(2), x.std(2)], dim=1)  # unbiased std
        return stats @ self.fc1_w + self.fc1_b  # (1, 512)

    def _plda_transform(self, x):  # (D,) -> transformed (D,)
        d = x.shape[0]
        x = self.plda_tr @ (x - self.plda_mean)
        inv_covar = 1.0 / (self.psi + 1.0)
        factor = torch.sqrt(d / (inv_covar @ (x * x)))
        return x * factor

    def score_one(self, wav):  # wav: (L,) origin domain, differentiable
        feat = _torch_cmvn(_torch_mfcc30(wav))
        emb = self._embedding(feat)[0] - self.emb_mean
        x = self.lda[:, :-1] @ emb + self.lda[:, -1]
        x = x * (math.sqrt(x.shape[0]) / x.norm())
        x = self._plda_transform(x)
        d = x.shape[0]
        mean = (self.psi / (self.psi + 1.0))[None, :] * self.enroll
        var_g = 1.0 + self.psi / (self.psi + 1.0)
        ll_g = -0.5 * (torch.log(var_g).sum() + math.log(2 * math.pi) * d
                       + (((x[None] - mean) ** 2) / var_g).sum(1))
        var_w = self.psi + 1.0
        ll_w = -0.5 * (torch.log(var_w).sum() + math.log(2 * math.pi) * d
                       + ((x ** 2) / var_w).sum())
        return ll_g - ll_w  # (S,)


# ---------------------------------------------------------------------------
# fixtures
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def pair():
    rng = np.random.default_rng(1234)
    params = random_xv_plda_params(rng)
    enroll = rng.standard_normal((5, 150)).astype(np.float32)
    model = XvPlda(params, mfcc_config=MFCC_NO_DITHER)
    model.set_enrollment([str(i) for i in range(5)], enroll)
    ref = _TorchXv(params, enroll)
    return model, ref


def test_score_parity(pair):
    model, ref = pair
    rng = np.random.default_rng(7)
    wavs = (rng.uniform(-0.25, 0.25, (4, 16000)) * 32768).astype(np.float32)
    jax_scores = np.asarray(model.score(jnp.asarray(wavs)))
    torch_scores = np.stack([
        ref.score_one(torch.tensor(w)).detach().numpy() for w in wavs])
    assert jax_scores.shape == torch_scores.shape == (4, 5)
    np.testing.assert_allclose(jax_scores, torch_scores,
                               rtol=1e-4, atol=2e-3)


def test_pgd_asr_parity(pair):
    """Identical PGD (CSI untargeted, Entropy loss) on both stacks: the
    per-sample success vectors must agree (reference test_attack.py ASR
    semantics: decision != label)."""
    model, ref = pair
    rng = np.random.default_rng(11)
    batch, wav_len, eps, step, iters = 6, 16000, 0.002, 0.0004, 10
    wavs = rng.uniform(-0.25, 0.25, (batch, wav_len)).astype(np.float32)
    labels = rng.integers(0, 5, batch)

    atk = PGD(model, task="CSI", epsilon=eps, step_size=step,
              max_iter=iters, loss="Entropy")
    _, success_jax = atk.attack(jnp.asarray(wavs), jnp.asarray(labels))

    # torch PGD, reference-structured (FGSM.py:38-70 inner loop)
    x = torch.tensor(wavs)
    lower, upper = torch.clamp(x - eps, min=-1.0), torch.clamp(x + eps,
                                                               max=1.0)
    y = torch.tensor(labels, dtype=torch.long)
    for _ in range(iters):
        grads = []
        for b in range(batch):
            xb = (x[b] * 32768.0).detach().requires_grad_()
            scores = ref.score_one(xb)
            loss = F.cross_entropy(scores[None], y[b:b + 1])
            loss.backward()
            grads.append(xb.grad)
        g = torch.stack(grads)
        x = torch.clamp(x + step * torch.sign(g), min=lower, max=upper)
    decisions = np.asarray([
        int(ref.score_one(torch.tensor(np.asarray(x[b]) * 32768.0)
                          ).argmax()) for b in range(batch)])
    success_torch = (decisions != labels).tolist()
    assert success_torch == [bool(s) for s in success_jax]


# ---------------------------------------------------------------------------
# iv-PLDA parity (GMM-UBM -> i-vector -> LDA -> PLDA chain)
# ---------------------------------------------------------------------------

class _TorchIv:
    """Reference-structured iv-PLDA forward in torch, weights injected from
    the jax IvPldaParams pytree (reference model/iv_plda.py:380-443,
    _iv_plda/gmm.py:120-171, ivector_extract.py:98-125)."""

    def __init__(self, params, enroll):
        def t(a):
            return torch.tensor(np.asarray(a), dtype=torch.float32)

        self.gconsts = t(params.fgmm.gconsts)
        self.mic = t(params.fgmm.means_invcovars)         # (C, D)
        self.invcov = t(params.fgmm.invcovars)            # (C, D, D)
        self.m = t(params.extractor.extractor_matrix)     # (C, D, IV)
        self.sigma_inv = t(params.extractor.sigma_inv)    # (C, D, D)
        self.offset = float(params.extractor.offset)
        self.emb_mean = t(params.emb_mean)
        self.lda = t(params.transform_mat)
        self.plda_mean = t(params.plda.mean)
        self.plda_tr = t(params.plda.transform)
        self.psi = t(params.plda.psi)
        self.enroll = t(enroll)

    def _delta(self, feat, window=3, order=2):
        scales = [torch.tensor([1.0])]
        for i in range(1, order + 1):
            prev = scales[i - 1]
            prev_off = (len(prev) - 1) // 2
            cur = torch.zeros(len(prev) + 2 * window)
            norm = 0.0
            for j in range(-window, window + 1):
                norm += j * j
                for k in range(-prev_off, prev_off + 1):
                    cur[j + k + prev_off + window] += j * prev[k + prev_off]
            scales.append(cur / norm)
        t_, f = feat.shape
        outs = []
        for sc in scales:
            off = (len(sc) - 1) // 2
            idx = torch.clamp(
                torch.arange(t_)[:, None] + torch.arange(-off, off + 1),
                0, t_ - 1)
            outs.append((feat[idx] * sc[None, :, None]).sum(1))
        return torch.cat(outs, dim=1)

    def score_one(self, wav):  # (L,) origin domain, differentiable
        feat = _torch_mfcc24(wav)
        feat = self._delta(feat)
        feat = _torch_cmvn(feat)
        # full-cov GMM loglikes (reference gmm.py:120-131, un-chunked)
        ll = (feat @ self.mic.T + self.gconsts
              - 0.5 * torch.einsum("td,cde,te->tc", feat, self.invcov, feat))
        post = torch.softmax(ll, dim=1)
        zeroth = post.sum(0)                               # (C,)
        first = post.T @ feat                              # (C, D)
        # i-vector posterior system (reference ivector_extract.py:98-114)
        proj = torch.einsum("cdi,cde->cie", self.m, self.sigma_inv)
        quad = torch.einsum("cie,cej->cij", proj, self.m)
        iv_dim = self.m.shape[2]
        L = torch.eye(iv_dim) + (zeroth[:, None, None] * quad).sum(0)
        linear = torch.einsum("cid,cd->i", proj, first)
        linear = linear + self.offset * torch.eye(iv_dim)[0]
        ivec = torch.linalg.solve(L, linear)
        ivec = ivec - self.offset * torch.eye(iv_dim)[0]
        # LDA -> length-norm -> PLDA (reference iv_plda.py:411-443)
        x = ivec - self.emb_mean
        x = self.lda[:, :-1] @ x + self.lda[:, -1]
        x = x * (math.sqrt(x.shape[0]) / x.norm())
        d = x.shape[0]
        x = self.plda_tr @ (x - self.plda_mean)
        x = x * torch.sqrt(d / ((1.0 / (self.psi + 1.0)) @ (x * x)))
        mean = (self.psi / (self.psi + 1.0))[None, :] * self.enroll
        var_g = 1.0 + self.psi / (self.psi + 1.0)
        ll_g = -0.5 * (torch.log(var_g).sum() + math.log(2 * math.pi) * d
                       + (((x[None] - mean) ** 2) / var_g).sum(1))
        var_w = self.psi + 1.0
        ll_w = -0.5 * (torch.log(var_w).sum() + math.log(2 * math.pi) * d
                       + ((x ** 2) / var_w).sum())
        return ll_g - ll_w


def _torch_mfcc24(wav):
    """Kaldi MFCC num_ceps=24 — same chain as _torch_mfcc30 with a 24-wide
    DCT/lifter."""
    sr, win, shift, nfft, nmel, nceps = 16000, 400, 160, 512, 30, 24
    n = wav.shape[0]
    t = (n + shift // 2) // shift
    pad = win // 2 - shift // 2
    idx = (torch.arange(t)[:, None] * shift - pad
           + torch.arange(win)[None, :])
    idx = torch.where(idx < 0, -idx - 1, idx)
    idx = torch.where(idx >= n, 2 * n - 1 - idx, idx)
    frames = wav[idx]
    frames = frames - frames.mean(dim=1, keepdim=True)
    eps = torch.finfo(torch.float32).eps
    energy = torch.log(torch.clamp((frames ** 2).sum(1), min=eps))
    frames = frames - 0.97 * torch.cat(
        [frames[:, :1], frames[:, :-1]], dim=1)
    i = torch.arange(win, dtype=torch.float64)
    povey = ((0.5 - 0.5 * torch.cos(2 * math.pi * i / (win - 1))) ** 0.85
             ).float()
    frames = frames * povey
    power = torch.fft.rfft(frames, n=nfft).abs() ** 2

    def melscale(f):
        return 1127.0 * np.log(1.0 + np.asarray(f, np.float64) / 700.0)

    lo, hi = melscale(20.0), melscale(7600.0)
    delta = (hi - lo) / (nmel + 1)
    freqs = melscale(np.arange(nfft // 2) * sr / nfft)
    banks = np.zeros((nmel, nfft // 2 + 1))
    for b in range(nmel):
        left, center, right = (lo + b * delta, lo + (b + 1) * delta,
                               lo + (b + 2) * delta)
        up = (freqs - left) / (center - left)
        down = (right - freqs) / (right - center)
        banks[b, :nfft // 2] = np.maximum(0.0, np.minimum(up, down))
    mel = torch.log(torch.clamp(
        power @ torch.tensor(banks, dtype=torch.float32).T, min=eps))
    k = np.arange(nceps, dtype=np.float64)[:, None]
    j = np.arange(nmel, dtype=np.float64)[None, :]
    dct = np.sqrt(2.0 / nmel) * np.cos(np.pi / nmel * (j + 0.5) * k)
    dct[0, :] = np.sqrt(1.0 / nmel)
    feat = mel @ torch.tensor(dct, dtype=torch.float32).T
    q = 22.0
    lift = torch.tensor(
        (1.0 + 0.5 * q * np.sin(np.pi * np.arange(nceps) / q)),
        dtype=torch.float32)
    feat = feat * lift
    return torch.cat([energy[:, None], feat[:, 1:]], dim=1)


@pytest.fixture(scope="module")
def iv_pair():
    from speakerguard_tpu.models.iv_plda import (IvPlda,
                                                 random_iv_plda_params)
    rng = np.random.default_rng(99)
    params = random_iv_plda_params(rng, num_gaussians=64, dim=72,
                                   ivector_dim=32, reduced_dim=16)
    enroll = rng.standard_normal((5, 16)).astype(np.float32)
    model = IvPlda(params, mfcc_config=dataclasses.replace(IV_PLDA_MFCC,
                                                           dither=0.0))
    model.set_enrollment([str(i) for i in range(5)], enroll)
    return model, _TorchIv(params, enroll)


def test_iv_plda_score_parity(iv_pair):
    model, ref = iv_pair
    rng = np.random.default_rng(17)
    wavs = (rng.uniform(-0.25, 0.25, (3, 8000)) * 32768).astype(np.float32)
    jax_scores = np.asarray(model.score(jnp.asarray(wavs)))
    torch_scores = np.stack([
        ref.score_one(torch.tensor(w)).detach().numpy() for w in wavs])
    assert jax_scores.shape == torch_scores.shape == (3, 5)
    np.testing.assert_allclose(jax_scores, torch_scores, rtol=1e-3,
                               atol=5e-3)


def test_iv_plda_pgd_asr_parity(iv_pair):
    model, ref = iv_pair
    rng = np.random.default_rng(23)
    batch, wav_len, eps, step, iters = 4, 8000, 0.003, 0.0008, 8
    wavs = rng.uniform(-0.25, 0.25, (batch, wav_len)).astype(np.float32)
    labels = rng.integers(0, 5, batch)

    atk = PGD(model, task="CSI", epsilon=eps, step_size=step,
              max_iter=iters, loss="Entropy")
    _, success_jax = atk.attack(jnp.asarray(wavs), jnp.asarray(labels))

    x = torch.tensor(wavs)
    lower = torch.clamp(x - eps, min=-1.0)
    upper = torch.clamp(x + eps, max=1.0)
    y = torch.tensor(labels, dtype=torch.long)
    for _ in range(iters):
        grads = []
        for b in range(batch):
            xb = (x[b] * 32768.0).detach().requires_grad_()
            loss = F.cross_entropy(ref.score_one(xb)[None], y[b:b + 1])
            loss.backward()
            grads.append(xb.grad)
        x = torch.clamp(x + step * torch.sign(torch.stack(grads)),
                        min=lower, max=upper)
    decisions = np.asarray([
        int(ref.score_one(torch.tensor(np.asarray(x[b]) * 32768.0)
                          ).argmax()) for b in range(batch)])
    success_torch = (decisions != labels).tolist()
    assert success_torch == [bool(s) for s in success_jax]


# ---------------------------------------------------------------------------
# AudioNet CSI-NE FGSM parity (BASELINE config 1)
# ---------------------------------------------------------------------------

def _torch_logmel(wav):
    """Reference Preprocessor in torch (model/_audionet/Preprocessor.py:
    48-112): preemph -> torch.stft (center, reflect, periodic hann) ->
    power -> Slaney mel -> 10*log10.  Genuinely independent: uses
    torch.stft, the reference's own op."""
    from speakerguard_tpu.ops.logmel import slaney_mel_banks, AUDIONET_LOGMEL
    x = wav[1:] - 0.97 * wav[:-1]
    spec = torch.stft(x, n_fft=1024, hop_length=160, win_length=800,
                      window=torch.hann_window(800, periodic=True),
                      center=True, pad_mode="reflect", return_complex=True)
    power = spec.real ** 2 + spec.imag ** 2        # (bins, T)
    banks = torch.tensor(slaney_mel_banks(AUDIONET_LOGMEL))
    mel = banks @ power                            # (n_mels, T)
    return 10.0 * torch.log10(torch.clamp(mel, min=1e-16))


@pytest.fixture(scope="module")
def audionet_pair():
    import sys
    sys.path.insert(0, "/root/repo/tests")
    from test_networks import TorchAudioNet
    from speakerguard_tpu.models.audionet import (
        AudioNet, load_audionet_from_torch_state)

    torch.manual_seed(7)
    net = TorchAudioNet(num_class=6).eval()
    params, state = load_audionet_from_torch_state(net.state_dict())
    model = AudioNet(params, state)
    return model, net


def test_audionet_score_parity(audionet_pair):
    model, net = audionet_pair
    rng = np.random.default_rng(31)
    wavs = rng.uniform(-0.4, 0.4, (3, 8000)).astype(np.float32)
    jax_scores = np.asarray(model.score(jnp.asarray(wavs)))
    with torch.no_grad():
        torch_scores = np.stack([
            net(_torch_logmel(torch.tensor(w))[None]).numpy()[0]
            for w in wavs])
    np.testing.assert_allclose(jax_scores, torch_scores, rtol=1e-3,
                               atol=2e-3)


def test_audionet_fgsm_parity(audionet_pair):
    """BASELINE config 1: FGSM on AudioNet CSI-NE — identical per-sample
    success on both stacks (reference FGSM.py single step, global clip)."""
    from speakerguard_tpu.attacks import FGSM

    model, net = audionet_pair
    rng = np.random.default_rng(37)
    batch, wav_len, eps = 6, 8000, 0.002
    wavs = rng.uniform(-0.4, 0.4, (batch, wav_len)).astype(np.float32)
    labels = rng.integers(0, 6, batch)

    atk = FGSM(model, task="CSI", epsilon=eps, loss="Entropy")
    _, success_jax = atk.attack(jnp.asarray(wavs), jnp.asarray(labels))

    x = torch.tensor(wavs)
    y = torch.tensor(labels, dtype=torch.long)
    grads = []
    for b in range(batch):
        xb = x[b].detach().requires_grad_()
        loss = F.cross_entropy(net(_torch_logmel(xb)[None]), y[b:b + 1])
        loss.backward()
        grads.append(xb.grad)
    adv = torch.clamp(x + eps * torch.sign(torch.stack(grads)), -1.0, 1.0)
    with torch.no_grad():
        decisions = np.asarray([
            int(net(_torch_logmel(adv[b])[None]).argmax())
            for b in range(batch)])
    success_torch = (decisions != labels).tolist()
    assert success_torch == [bool(s) for s in success_jax]

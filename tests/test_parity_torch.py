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
from speakerguard_tpu.ops.kaldi_mfcc import XV_PLDA_MFCC
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

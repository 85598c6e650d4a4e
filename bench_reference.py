"""Reference-equivalent CPU baseline for bench.py.

The reference repo cannot run unmodified here (torchaudio is not installed),
so this harness reproduces its computational structure for the PGD /
xv-PLDA benchmark config in torch on CPU, preserving the properties that
determine its speed:

  * per-utterance Python loop over the batch at every feature stage
    (reference iv_plda.py:201, xv_plda.py:111, extract_emb per utt)
  * per-frame Python loop for sliding CMVN (reference iv_plda.py:319-369)
  * MFCC via framing + FFT + mel matmul + DCT in torch (same ops/FLOPs as
    torchaudio.compliance.kaldi.mfcc)
  * full TDNN + PLDA forward and input-gradient backward per PGD iteration
  * per-iteration `.cpu().numpy()` host syncs (reference FGSM.py:55-56)

Writes bench_baseline.json with the measured utterances/sec.
"""

import json
import math
import time

import numpy as np
import torch
import torch.nn.functional as F

torch.manual_seed(0)

SR = 16000
NUM_CEPS = 30
NUM_MEL = 30


def mfcc_torch(wav):  # wav: (L,) tensor, origin domain
    shift, win, nfft = 160, 400, 512
    n = wav.shape[0]
    t = (n + shift // 2) // shift
    pad = win // 2 - shift // 2
    idx = torch.arange(t)[:, None] * shift - pad + torch.arange(win)[None, :]
    idx = torch.where(idx < 0, -idx - 1, idx)
    idx = torch.where(idx >= n, 2 * n - 1 - idx, idx)
    frames = wav[idx]
    frames = frames - frames.mean(dim=1, keepdim=True)
    energy = torch.log(torch.clamp((frames ** 2).sum(1), min=1e-10))
    first = frames[:, :1]
    frames = frames - 0.97 * torch.cat([first, frames[:, :-1]], dim=1)
    i = torch.arange(win, dtype=torch.float64)
    povey = (0.5 - 0.5 * torch.cos(2 * math.pi * i / (win - 1))) ** 0.85
    frames = frames * povey.float()
    spec = torch.fft.rfft(frames, n=nfft)
    power = spec.real ** 2 + spec.imag ** 2
    global _MELW, _DCT, _LIFT
    mel = torch.log(torch.clamp(power @ _MELW.T, min=1e-7))
    feat = mel @ _DCT.T * _LIFT
    feat[:, 0] = energy
    return feat


def build_consts():
    global _MELW, _DCT, _LIFT
    # mel filterbank (Kaldi-style), 30 bins, 20..7600 Hz
    def melscale(f):
        return 1127.0 * np.log(1.0 + f / 700.0)
    nfft = 512
    lo, hi = melscale(20.0), melscale(7600.0)
    delta = (hi - lo) / (NUM_MEL + 1)
    banks = np.zeros((NUM_MEL, nfft // 2 + 1))
    freqs = np.arange(nfft // 2) * SR / nfft
    mels = melscale(freqs)
    for b in range(NUM_MEL):
        l, c, r = lo + b * delta, lo + (b + 1) * delta, lo + (b + 2) * delta
        up = (mels - l) / (c - l)
        down = (r - mels) / (r - c)
        banks[b, :nfft // 2] = np.maximum(0, np.minimum(up, down))
    _MELW = torch.tensor(banks, dtype=torch.float32)
    k = np.arange(NUM_CEPS)[:, None]
    j = np.arange(NUM_MEL)[None, :]
    dct = np.sqrt(2.0 / NUM_MEL) * np.cos(np.pi / NUM_MEL * (j + 0.5) * k)
    dct[0, :] = np.sqrt(1.0 / NUM_MEL)
    _DCT = torch.tensor(dct, dtype=torch.float32)
    q = 22.0
    _LIFT = torch.tensor(1.0 + 0.5 * q * np.sin(np.pi * np.arange(NUM_CEPS)
                                                / q), dtype=torch.float32)


def cmvn_loop(feat):  # (T, F): the reference's per-frame python loop
    t, f = feat.shape
    out = feat.clone()
    cur_sum = torch.zeros(f)
    last_ws = last_we = -1
    for i in range(t):
        ws = i - 150
        we = ws + 300
        if ws < 0:
            we -= ws
            ws = 0
        if we > t:
            ws -= we - t
            we = t
            ws = max(ws, 0)
        if last_ws == -1:
            cur_sum = feat[ws:we].sum(0)
        else:
            if ws > last_ws:
                cur_sum = cur_sum - feat[last_ws]
            if we > last_we:
                cur_sum = cur_sum + feat[last_we]
        last_ws, last_we = ws, we
        out[i] = out[i] - cur_sum / (we - ws)
    return out


class TDNN(torch.nn.Module):
    def __init__(self):
        super().__init__()
        spec = [(30, 512, 5, 1), (512, 512, 5, 2), (512, 512, 7, 3),
                (512, 512, 1, 1), (512, 1500, 1, 1)]
        self.convs = torch.nn.ModuleList(
            [torch.nn.Conv1d(i, o, k, dilation=d) for i, o, k, d in spec])
        self.bns = torch.nn.ModuleList(
            [torch.nn.BatchNorm1d(o, affine=False) for _, o, _, _ in spec])
        self.fc1 = torch.nn.Linear(3000, 512)

    def forward(self, x):  # (1, 30, T)
        for c, b in zip(self.convs, self.bns):
            x = b(F.relu(c(x)))
        stats = torch.cat([x.mean(2), x.std(2)], dim=1)
        return self.fc1(stats)


def main_iv():
    """Reference-equivalent iv_plda pipeline: per-utterance GMM Baum-Welch
    stats (frame-chunked at gmm_frame_bs=200, reference gmm.py:120-131) and
    the per-call T^T Sigma^-1 T matmul chain of Extractivector
    (ivector_extract.py:106 — the reference recomputes it every forward).
    Cost is deterministic, so we measure one utterance-iteration and
    extrapolate to the PGD-100 batch."""
    import os
    build_consts()
    C, D, IV = 2048, 72, 600
    gconsts = torch.randn(C)
    mic = torch.randn(C, D) * 0.1
    a = torch.randn(C, D, D) * 0.05
    invcov = a @ a.transpose(1, 2) + torch.eye(D)
    m = torch.randn(C, D, IV) * 0.05
    sig = invcov.clone()

    wav_len = 48000
    wav = ((torch.rand(wav_len) - 0.5) * 0.6 * 32768).requires_grad_()

    t0 = time.perf_counter()
    feat = mfcc_torch(wav)
    feat3 = torch.cat([feat, feat, feat], dim=1)[:, :D]  # delta stand-in
    feat3 = cmvn_loop(feat3)
    # GMM loglike, frame-chunked like the reference
    ll = (feat3 @ mic.T)
    bs = 200
    for s in range(0, feat3.shape[0], bs):
        xx = feat3[s:s + bs]
        ll[s:s + bs] -= 0.5 * torch.einsum(
            "td,cde,te->tc", xx, invcov, xx)
    ll = ll + gconsts
    post = torch.softmax(ll, dim=1)
    zeroth = post.sum(0)
    first = post.T @ feat3
    # per-call matmul chain (the reference's Extractivector)
    quad = torch.matmul(torch.matmul(m.transpose(1, 2), sig), m)
    L = torch.eye(IV) + (zeroth.view(C, 1, 1) * quad).sum(0)
    linear = torch.matmul(torch.matmul(m.transpose(1, 2), sig),
                          first.unsqueeze(-1)).sum(dim=(0, 2))
    ivec = torch.linalg.solve(L, linear)
    loss = ivec.square().sum()
    loss.backward()
    dt = time.perf_counter() - t0
    # PGD-100: 101 model evaluations per utterance
    utts_per_sec = 1.0 / (dt * 101)
    out = {"utts_per_sec": round(utts_per_sec, 5), "per_iter_s": round(dt, 2),
           "model": "iv_plda", "extrapolated_from": "1 utt x 1 iter"}
    with open("bench_baseline_iv_plda.json", "w") as f:
        json.dump(out, f)
    print(json.dumps(out))


def main_audionet():
    """Reference-equivalent AudioNet CSI-NE pipeline (audionet_csine.py):
    per-utterance logmel Preprocessor (preemph -> STFT 1024/160/800 hann ->
    power -> 32-mel -> 10log10, Preprocessor.py:88-112) + conv1 2D prefilter
    + conv2-8 1D conv/BN/ReLU/maxpool stack + max-over-time + fc, with the
    reference's per-utterance python loop and per-iteration host syncs.
    Measures PGD on a small batch and scales to 100 iterations (cost per
    iteration is deterministic)."""
    import os

    class AudioNetTorch(torch.nn.Module):
        def __init__(self, num_class=10):
            super().__init__()
            self.conv1 = torch.nn.Sequential(
                torch.nn.Conv2d(1, 1, [5, 5], 1, [2, 2]),
                torch.nn.BatchNorm2d(1))
            spec = [(32, 64, 1, True), (64, 128, 1, False),
                    (128, 128, 1, False), (128, 128, 1, True),
                    (128, 128, 1, False), (128, 64, 1, True),
                    (64, 32, 0, False)]
            blocks = []
            for cin, cout, pad, pool in spec:
                layers = [torch.nn.Conv1d(cin, cout, 3, padding=pad),
                          torch.nn.BatchNorm1d(cout), torch.nn.ReLU()]
                if pool:
                    layers.append(torch.nn.MaxPool1d(2, 2))
                blocks.append(torch.nn.Sequential(*layers))
            self.blocks = torch.nn.ModuleList(blocks)
            self.fc = torch.nn.Linear(32, num_class)

        def forward(self, x):  # (1, 32, T)
            x = self.conv1(x.unsqueeze(1)).squeeze(1)
            for blk in self.blocks:
                x = blk(x)
            return self.fc(x.max(2).values)

    # 32-bin mel filterbank on the 513-bin power spectrum
    def melscale(f):
        return 1127.0 * np.log(1.0 + f / 700.0)
    nfft, nmel = 1024, 32
    lo, hi = melscale(0.0), melscale(SR / 2.0)
    delta = (hi - lo) / (nmel + 1)
    freqs = np.arange(nfft // 2 + 1) * SR / nfft
    mels = melscale(freqs)
    banks = np.zeros((nmel, nfft // 2 + 1), np.float32)
    for b in range(nmel):
        l, c, r = lo + b * delta, lo + (b + 1) * delta, lo + (b + 2) * delta
        banks[b] = np.maximum(0, np.minimum((mels - l) / (c - l),
                                            (r - mels) / (r - c)))
    melw = torch.tensor(banks)
    window = torch.hann_window(800)

    def logmel(wav):  # (L,) scale domain, like Preprocessor.forward
        w = torch.cat([wav[:1], wav[1:] - 0.97 * wav[:-1]])
        spec = torch.stft(w, n_fft=nfft, hop_length=160, win_length=800,
                          window=window, return_complex=True, center=True,
                          pad_mode="reflect")
        power = spec.real ** 2 + spec.imag ** 2        # (513, T)
        mel = melw @ power
        return 10.0 * torch.log10(torch.clamp(mel, min=1e-10))

    net = AudioNetTorch().eval()
    batch, wav_len = 4, 48000
    iters = int(os.environ.get("REF_PGD_ITERS", "20"))
    wavs = (torch.rand(batch, wav_len) - 0.5) * 0.6
    labels = torch.randint(0, 10, (batch,))

    t0 = time.perf_counter()
    eps, step = 0.002, 0.0004
    x = wavs.clone()
    lower, upper = wavs - eps, wavs + eps
    for _ in range(iters):
        grads = []
        for b in range(batch):           # per-utterance python loop
            xb = x[b].detach().requires_grad_()
            logits = net(logmel(xb)[None])
            loss = F.cross_entropy(logits, labels[b:b + 1])
            loss.backward()
            grads.append(xb.grad.clone())
            loss.detach().cpu().numpy()  # per-iter host sync
        g = torch.stack(grads)
        x = torch.clamp(x + step * torch.sign(g), min=lower, max=upper)
    dt = time.perf_counter() - t0
    utts_per_sec = batch / (dt * (100.0 / iters))
    out = {"utts_per_sec": round(utts_per_sec, 4), "batch": batch,
           "wav_len": wav_len, "measured_iters": iters, "host": "cpu",
           "model": "audionet"}
    with open("bench_baseline_audionet.json", "w") as f:
        json.dump(out, f)
    print(json.dumps(out))


def _audionet_torch_parts(num_class=251):
    """Shared AudioNet-CSINE torch net + batched logmel frontend
    (reference model/audionet_csine.py + Preprocessor.py:88-112)."""

    class AudioNetTorch(torch.nn.Module):
        def __init__(self, num_class):
            super().__init__()
            self.conv1 = torch.nn.Sequential(
                torch.nn.Conv2d(1, 1, [5, 5], 1, [2, 2]),
                torch.nn.BatchNorm2d(1))
            spec = [(32, 64, 1, True), (64, 128, 1, False),
                    (128, 128, 1, False), (128, 128, 1, True),
                    (128, 128, 1, False), (128, 64, 1, True),
                    (64, 32, 0, False)]
            blocks = []
            for cin, cout, pad, pool in spec:
                layers = [torch.nn.Conv1d(cin, cout, 3, padding=pad),
                          torch.nn.BatchNorm1d(cout), torch.nn.ReLU()]
                if pool:
                    layers.append(torch.nn.MaxPool1d(2, 2))
                blocks.append(torch.nn.Sequential(*layers))
            self.blocks = torch.nn.ModuleList(blocks)
            self.fc = torch.nn.Linear(32, num_class)

        def forward(self, x):  # (B, 32, T)
            x = self.conv1(x.unsqueeze(1)).squeeze(1)
            for blk in self.blocks:
                x = blk(x)
            return self.fc(x.max(2).values)

    def melscale(f):
        return 1127.0 * np.log(1.0 + f / 700.0)
    nfft, nmel = 1024, 32
    lo, hi = melscale(0.0), melscale(SR / 2.0)
    delta = (hi - lo) / (nmel + 1)
    freqs = np.arange(nfft // 2 + 1) * SR / nfft
    mels = melscale(freqs)
    banks = np.zeros((nmel, nfft // 2 + 1), np.float32)
    for b in range(nmel):
        l, c, r = lo + b * delta, lo + (b + 1) * delta, lo + (b + 2) * delta
        banks[b] = np.maximum(0, np.minimum((mels - l) / (c - l),
                                            (r - mels) / (r - c)))
    melw = torch.tensor(banks)
    window = torch.hann_window(800)

    def logmel(wavs):  # (B, L) scale domain -> (B, 32, T), batched
        w = torch.cat([wavs[:, :1], wavs[:, 1:] - 0.97 * wavs[:, :-1]], 1)
        spec = torch.stft(w, n_fft=nfft, hop_length=160, win_length=800,
                          window=window, return_complex=True, center=True,
                          pad_mode="reflect")
        power = spec.real ** 2 + spec.imag ** 2       # (B, 513, T)
        mel = torch.einsum("mf,bft->bmt", melw, power)
        return 10.0 * torch.log10(torch.clamp(mel, min=1e-10))

    return AudioNetTorch(num_class), logmel


def main_train():
    """Reference-equivalent training-step baseline (natural_train.py /
    adver_train.py defaults: AudioNet Spk251, Adam, batch 128, 5 s wavs;
    adver = batched PGD-10 against the live model on half the minibatch +
    a make_decision pass for the accuracy printout, adver_train.py:190-237).
    Fully batched torch (generous to the reference — its attack and model
    are batched here, unlike the per-utterance attackMain paths); measured
    on a smaller batch, throughput is per-utterance."""
    import os
    mode = os.environ.get("REF_MODE", "train")          # train|adver_train
    adver = mode == "adver_train"
    net, logmel = _audionet_torch_parts(num_class=251)
    net.train()
    optim = torch.optim.Adam(net.parameters(), lr=1e-3)
    batch = int(os.environ.get("REF_BATCH", "16"))
    wav_len = 80000
    steps = int(os.environ.get("REF_STEPS", "3"))
    wavs = (torch.rand(batch, wav_len) - 0.5) * 0.6
    labels = torch.randint(0, 251, (batch,))

    def train_step():
        x = wavs.clone()
        if adver:
            nb = batch // 2
            xa = x[:nb]
            lower, upper = xa - 0.002, xa + 0.002
            for _ in range(10):                        # PGD-10 in the loop
                xg = xa.detach().requires_grad_()
                loss = F.cross_entropy(net(logmel(xg)), labels[:nb])
                loss.backward()
                xa = torch.clamp(xg + 0.0004 * xg.grad.sign(),
                                 min=lower, max=upper)
            x = torch.cat([xa.detach(), x[nb:]], 0)
        else:
            a = float(np.random.rand())
            noise = 2 * a * 0.002 * torch.rand_like(x) - a * 0.002
            x = torch.cat([x, x + noise], 0)
        y = torch.cat([labels, labels], 0) if not adver else labels
        logits = net(logmel(x))
        loss = F.cross_entropy(logits, y)
        optim.zero_grad()
        loss.backward()
        optim.step()
        with torch.no_grad():                          # make_decision pass
            net(logmel(x)).argmax(1)
        return float(loss.detach())

    train_step()                                       # BN/optim warmup
    t0 = time.perf_counter()
    for _ in range(steps):
        train_step()
    dt = (time.perf_counter() - t0) / steps
    out = {"utts_per_sec": round(batch / dt, 4), "batch": batch,
           "wav_len": wav_len, "steps": steps, "host": "cpu",
           "mode": mode}
    fn = ("bench_baseline_train_adver.json" if adver
          else "bench_baseline_train_natural.json")
    with open(fn, "w") as f:
        json.dump(out, f)
    print(json.dumps(out))


def main():
    ref_model = __import__("os").environ.get("REF_MODEL")
    if ref_model == "iv_plda":
        return main_iv()
    if ref_model == "audionet":
        return main_audionet()
    if ref_model == "train":
        return main_train()
    build_consts()
    tdnn = TDNN().eval()
    lda = torch.randn(150, 513) * 0.05
    plda_psi = torch.rand(150) + 0.5
    plda_tr = torch.linalg.qr(torch.randn(150, 150))[0]
    plda_mean = torch.randn(150) * 0.1
    enroll = torch.randn(10, 150)

    def score_one(wav):  # wav: (L,) requires_grad, origin domain
        feat = mfcc_torch(wav)
        feat = cmvn_loop(feat)
        emb = tdnn(feat.T.unsqueeze(0))[0]
        x = lda[:, :-1] @ emb + lda[:, -1]
        x = x * (math.sqrt(150) / x.norm())
        x = plda_tr @ (x - plda_mean)
        x = x * torch.sqrt(150 / ((1.0 / (plda_psi + 1.0)) @ (x ** 2)))
        mean = plda_psi / (plda_psi + 1.0) * enroll
        var = 1.0 + plda_psi / (plda_psi + 1.0)
        ll_g = -0.5 * (torch.log(var).sum() + math.log(2 * math.pi) * 150
                       + (((x - mean) ** 2) / var).sum(1))
        var0 = plda_psi + 1.0
        ll_w = -0.5 * (torch.log(var0).sum() + math.log(2 * math.pi) * 150
                       + ((x ** 2) / var0).sum())
        return ll_g - ll_w

    batch = 4          # keep wall time sane; throughput is per-utterance
    wav_len = 48000
    os_ = __import__("os")
    iters = int(os_.environ.get("REF_PGD_ITERS", "100"))
    attack = os_.environ.get("REF_ATTACK", "pgd")
    wavs = (torch.rand(batch, wav_len) - 0.5) * 0.6
    labels = torch.randint(0, 10, (batch,))

    t0 = time.perf_counter()
    if attack == "cw2":
        # CW2-equivalent iteration cost (reference CW2.py:57-111): tanh box
        # reparam, margin loss + c*||delta||^2, Adam on the modifier,
        # per-sample best bookkeeping on host.  Measured per-iteration so
        # BENCH_ATTACK=cw2's baseline need not be PGD-iteration-scaled.
        modifier = torch.zeros(batch, wav_len)
        best_l2 = [float("inf")] * batch
        for it in range(iters):
            grads = []
            for b in range(batch):
                mb = modifier[b].detach().requires_grad_()
                adv = torch.tanh(torch.atanh(wavs[b] * 0.999999) + mb)
                scores = score_one((adv * 32768.0))
                l2 = ((adv - wavs[b]) ** 2).sum()
                margin = F.cross_entropy(scores[None], labels[b:b + 1])
                loss = 0.01 * margin + l2
                loss.backward()
                grads.append(mb.grad.clone())
                # per-sample best tracking (host sync like CW2.py:102-111)
                l2v = float(l2.detach().cpu().numpy())
                if l2v < best_l2[b]:
                    best_l2[b] = l2v
            g = torch.stack(grads)
            # Adam-equivalent update cost
            if it == 0:
                m1, v1 = torch.zeros_like(g), torch.zeros_like(g)
            m1 = 0.9 * m1 + 0.1 * g
            v1 = 0.999 * v1 + 0.001 * g * g
            modifier = modifier - 0.01 * m1 / (v1.sqrt() + 1e-8)
    else:
        eps, step = 0.002, 0.0004
        x = wavs.clone()
        lower, upper = wavs - eps, wavs + eps
        for it in range(iters):
            grads = []
            losses = []
            # the reference loops utterances in python at every stage
            for b in range(batch):
                xb = (x[b] * 32768.0).detach().requires_grad_()
                scores = score_one(xb)
                loss = F.cross_entropy(scores[None], labels[b:b + 1])
                loss.backward()
                grads.append(xb.grad.clone())
                losses.append(loss.detach().cpu().numpy())  # host sync
            g = torch.stack(grads)
            x = torch.clamp(x + step * torch.sign(g), min=lower, max=upper)
    dt = time.perf_counter() - t0
    if attack == "cw2":
        # CW2-600 benchmark = 600 Adam iterations
        utts_per_sec = batch / (dt * (600.0 / iters))
        out = {"utts_per_sec": round(utts_per_sec, 5), "batch": batch,
               "wav_len": wav_len, "measured_iters": iters, "host": "cpu",
               "attack": "cw2-600"}
        with open("bench_baseline_cw2.json", "w") as f:
            json.dump(out, f)
    else:
        # scale measured time to the benchmark's 100 iterations
        full_dt = dt * (100.0 / iters)
        utts_per_sec = batch / full_dt
        out = {"utts_per_sec": round(utts_per_sec, 4),
               "batch": batch, "wav_len": wav_len,
               "measured_iters": iters, "host": "cpu"}
        with open("bench_baseline.json", "w") as f:
            json.dump(out, f)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

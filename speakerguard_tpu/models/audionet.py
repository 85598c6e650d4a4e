"""AudioNet CNN for CSI-NE (closed-set, not-enrolled), functional JAX.

Re-design of reference model/audionet_csine.py (adaption of AudioNet,
arXiv:1807.03418): 2D pre-filter conv + 7 Conv1d/BN/ReLU blocks with three
/2 max-pools, the repeat-if-too-short trick (audionet_csine.py:195-203),
max-over-time pooling, and a linear classifier head.

Trainable end to end: params (conv/bn affine/fc) are a pytree for optax;
batch-norm running stats live in a separate state pytree updated in train
mode (momentum 0.1, matching torch defaults).

Feature flags (audionet_csine.py:127-129): 0=wav, 1=raw logmel feat.
"""

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from speakerguard_tpu.models.base import SRSModel, NEG_INF
from speakerguard_tpu.ops.logmel import audionet_logmel, AUDIONET_LOGMEL

# conv1d blocks: (cin, cout, kernel, padding, maxpool)
CONV_SPEC = (
    (32, 64, 3, 1, True),    # conv2
    (64, 128, 3, 1, False),  # conv3
    (128, 128, 3, 1, False),  # conv4
    (128, 128, 3, 1, True),  # conv5
    (128, 128, 3, 1, False),  # conv6
    (128, 64, 3, 1, True),   # conv7
    (64, 32, 3, 0, False),   # conv8 (valid padding)
)
BN_MOMENTUM = 0.1
BN_EPS = 1e-5


class AudioNetParams(NamedTuple):
    conv1_w: jax.Array   # (5, 5, 1, 1) HWIO
    conv1_b: jax.Array
    conv1_gamma: jax.Array
    conv1_beta: jax.Array
    conv_w: tuple        # 7 x (k, cin, cout)
    conv_b: tuple
    gamma: tuple
    beta: tuple
    fc_w: jax.Array      # (32, num_class)
    fc_b: jax.Array


class AudioNetState(NamedTuple):
    conv1_mean: jax.Array
    conv1_var: jax.Array
    means: tuple
    vars: tuple


def init_audionet(rng: np.random.Generator, num_class: int
                  ) -> tuple[AudioNetParams, AudioNetState]:
    def u(shape, fan_in):
        bound = 1.0 / np.sqrt(fan_in)
        return jnp.asarray(rng.uniform(-bound, bound, shape), jnp.float32)

    conv1_w = u((5, 5, 1, 1), 25)
    conv1_b = u((1,), 25)
    ws, bs, gs, bts, ms, vs = [], [], [], [], [], []
    for cin, cout, k, pad, pool in CONV_SPEC:
        ws.append(u((k, cin, cout), cin * k))
        bs.append(u((cout,), cin * k))
        gs.append(jnp.ones(cout))
        bts.append(jnp.zeros(cout))
        ms.append(jnp.zeros(cout))
        vs.append(jnp.ones(cout))
    params = AudioNetParams(conv1_w, conv1_b, jnp.ones(1), jnp.zeros(1),
                            tuple(ws), tuple(bs), tuple(gs), tuple(bts),
                            u((32, num_class), 32), u((num_class,), 32))
    state = AudioNetState(jnp.zeros(1), jnp.ones(1), tuple(ms), tuple(vs))
    return params, state


def _bn(x, gamma, beta, mean, var, axes, train):
    """Returns (y, batch_mean, batch_var) — batch stats None in eval."""
    if train:
        m = jnp.mean(x, axis=axes)
        v = jnp.var(x, axis=axes)
        y = (x - m) * jax.lax.rsqrt(v + BN_EPS) * gamma + beta
        n = np.prod([x.shape[a] for a in axes])
        unbiased = v * (n / max(n - 1, 1))
        return y, m, unbiased
    y = (x - mean) * jax.lax.rsqrt(var + BN_EPS) * gamma + beta
    return y, None, None


def _maxpool1d(x):
    """(B, T, C) -> (B, T//2, C), torch MaxPool1d(2,2) semantics."""
    t = x.shape[1]
    x = x[:, :2 * (t // 2), :]
    return jnp.max(x.reshape(x.shape[0], t // 2, 2, x.shape[2]), axis=2)


def audionet_embedding(params: AudioNetParams, state: AudioNetState,
                       feats: jnp.ndarray, train: bool = False):
    """feats: (B, T, F=32) -> ((B, 32) embedding, new_state)."""
    new_m, new_v = list(state.means), list(state.vars)

    # 2D pre-filter: (B, T, F) -> NHWC (B, F, T, 1)
    x = jnp.transpose(feats, (0, 2, 1))[..., None]
    x = jax.lax.conv_general_dilated(
        x, params.conv1_w, (1, 1), [(2, 2), (2, 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + params.conv1_b
    x, bm, bv = _bn(x, params.conv1_gamma, params.conv1_beta,
                    state.conv1_mean, state.conv1_var, (0, 1, 2), train)
    c1_m, c1_v = state.conv1_mean, state.conv1_var
    if train:
        c1_m = (1 - BN_MOMENTUM) * state.conv1_mean + BN_MOMENTUM * bm
        c1_v = (1 - BN_MOMENTUM) * state.conv1_var + BN_MOMENTUM * bv
    x = x[..., 0]                       # (B, F=32, T)
    x = jnp.transpose(x, (0, 2, 1))     # (B, T, C=32)

    for i, (cin, cout, k, pad, pool) in enumerate(CONV_SPEC):
        if i == len(CONV_SPEC) - 1:
            # repeat-if-too-short before the valid-padding conv8
            target_len = 3
            t = x.shape[1]
            if t < target_len:
                n = -(-target_len // t)
                x = jnp.tile(x, (1, n, 1))
        x = jax.lax.conv_general_dilated(
            x, params.conv_w[i], (1,), [(pad, pad)],
            dimension_numbers=("NWC", "WIO", "NWC")) + params.conv_b[i]
        x, bm, bv = _bn(x, params.gamma[i], params.beta[i],
                        state.means[i], state.vars[i], (0, 1), train)
        if train:
            new_m[i] = (1 - BN_MOMENTUM) * state.means[i] + BN_MOMENTUM * bm
            new_v[i] = (1 - BN_MOMENTUM) * state.vars[i] + BN_MOMENTUM * bv
        x = jax.nn.relu(x)
        if pool:
            x = _maxpool1d(x)

    emb = jnp.max(x, axis=1)            # max over time -> (B, 32)
    new_state = AudioNetState(c1_m, c1_v, tuple(new_m), tuple(new_v))
    return emb, new_state


def audionet_logits(params: AudioNetParams, state: AudioNetState,
                    feats: jnp.ndarray, train: bool = False):
    emb, new_state = audionet_embedding(params, state, feats, train)
    return emb @ params.fc_w + params.fc_b, emb, new_state


def load_audionet_from_torch_state(state: dict
                                   ) -> tuple[AudioNetParams, AudioNetState]:
    """Convert a torch state_dict in the reference layout
    (audionet_csine.py: conv1 Sequential(Conv2d, BatchNorm2d), conv2..conv8
    Sequential(Conv1d, BatchNorm1d, ...), fc Linear) into params/state.
    torch Conv1d weight (out, in, k) -> (k, in, out); Conv2d (out, in, kh,
    kw) -> (kh, kw, in, out); Linear (out, in) -> (in, out)."""
    def arr(k):
        v = state[k]
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                          else v)

    ws, bs, gs, bts, ms, vs = [], [], [], [], [], []
    for i in range(2, 9):
        ws.append(jnp.asarray(arr(f"conv{i}.0.weight").transpose(2, 1, 0),
                              jnp.float32))
        bs.append(jnp.asarray(arr(f"conv{i}.0.bias"), jnp.float32))
        gs.append(jnp.asarray(arr(f"conv{i}.1.weight"), jnp.float32))
        bts.append(jnp.asarray(arr(f"conv{i}.1.bias"), jnp.float32))
        ms.append(jnp.asarray(arr(f"conv{i}.1.running_mean"), jnp.float32))
        vs.append(jnp.asarray(arr(f"conv{i}.1.running_var"), jnp.float32))
    params = AudioNetParams(
        conv1_w=jnp.asarray(arr("conv1.0.weight").transpose(2, 3, 1, 0),
                            jnp.float32),
        conv1_b=jnp.asarray(arr("conv1.0.bias"), jnp.float32),
        conv1_gamma=jnp.asarray(arr("conv1.1.weight"), jnp.float32),
        conv1_beta=jnp.asarray(arr("conv1.1.bias"), jnp.float32),
        conv_w=tuple(ws), conv_b=tuple(bs), gamma=tuple(gs),
        beta=tuple(bts),
        fc_w=jnp.asarray(arr("fc.weight").T, jnp.float32),
        fc_b=jnp.asarray(arr("fc.bias"), jnp.float32))
    bstate = AudioNetState(
        jnp.asarray(arr("conv1.1.running_mean"), jnp.float32),
        jnp.asarray(arr("conv1.1.running_var"), jnp.float32),
        tuple(ms), tuple(vs))
    return params, bstate


def audionet_bf16_active() -> bool:
    """SG_AUDIONET_BF16: bf16 params+activations through the AudioNet CNN
    in attack-gradient graphs only (see AudioNet._embedding_from_top).
    Gradients feed sign() steps and the reported success is always
    exact-path verified.

    Default ON since chip-A/B'd (2026-08-19, measurements/r05_chip_log.txt):
    PGD-100 @512 229.7 -> 237.5 utts/s (+3.4%) at identical ASR 88.5 —
    the smaller multiplier vs xv's +8.3% reflects AudioNet being
    frontend/elementwise-dominated (channels 32-128 vs the TDNN's 512).
    SG_AUDIONET_BF16=0 restores the f32 CNN."""
    import os
    return os.environ.get("SG_AUDIONET_BF16", "1") == "1"


def parse_label_encoder(path: str):
    """Reference label-encoder txt: rows of 'spk_id' label
    (audionet_csine.py:37-48).  Returns ordered spk_ids list."""
    id_label = np.loadtxt(path, dtype=str,
                          converters={0: lambda s: s[1:-1]})
    label2id = {int(row[1]): row[0] for row in id_label}
    return [label2id[i] for i in range(len(label2id))]


class AudioNet(SRSModel):
    allowed_flags = (0, 1)
    range_type = "scale"
    threshold = NEG_INF  # CSI-NE never rejects

    def __init__(self, params: AudioNetParams, state: AudioNetState,
                 spk_ids=None, logmel_config=AUDIONET_LOGMEL):
        self.net_params = params
        self.state = state
        self.logmel_config = logmel_config
        num_class = int(params.fc_b.shape[0])
        self.spk_ids = (list(spk_ids) if spk_ids is not None
                        else [str(i) for i in range(num_class)])

    @property
    def params(self):
        """The jit-threaded pytree is (net params, bn state)."""
        return (self.net_params, self.state)

    @params.setter
    def params(self, value):
        if value is None:
            return
        self.net_params, self.state = value

    def _raw(self, wav, rng=None, p=None, fast=False):
        # attack-gradient graphs honor SG_DFT_FAST_PRECISION (like xv/iv);
        # the exact final evaluation always runs the HIGH default
        from speakerguard_tpu.models.base import fast_active, \
            fast_dft_precision
        prec = fast_dft_precision() if fast and fast_active() else None
        return audionet_logmel(wav, self.logmel_config, precision=prec)

    def _feat_step(self, feats, ori_flag, p=None):
        raise ValueError("audionet has no feature ladder above flag 1")

    def _embedding_from_top(self, feats, p=None, fast=False,
                            fast_ctx=None):
        from speakerguard_tpu.models.base import fast_active
        net, state = p if p is not None else (self.net_params, self.state)
        if fast and fast_active() and audionet_bf16_active():
            # bf16 CNN for attack-gradient graphs (r5, the xv/iv lesson
            # applied): cast params + features bf16 and let the whole
            # conv/bn/relu/maxpool chain — and therefore autodiff's
            # residuals AND cotangents — flow bf16 (the MXU accumulates
            # f32 internally and rounds once per conv).  No custom_vjp
            # needed: bf16 activations make autodiff's saved tensors
            # half-width by construction.  The final attack success
            # evaluation stays on the exact f32 path (attacks/
            # gradient.py:76-90).
            sg = jax.lax.stop_gradient
            cast = lambda a: sg(a.astype(jnp.bfloat16)  # noqa: E731
                                if a.dtype == jnp.float32 else a)
            net16 = jax.tree.map(cast, net)
            state16 = jax.tree.map(cast, state)
            emb, _ = audionet_embedding(net16, state16,
                                        feats.astype(jnp.bfloat16),
                                        train=False)
            return emb.astype(jnp.float32)
        emb, _ = audionet_embedding(net, state, feats, train=False)
        return emb

    def _scores_from_emb(self, emb, enroll_embs=None, p=None):
        net, _ = p if p is not None else (self.net_params, self.state)
        # enroll_embs unused: CSI-NE scores are classifier logits
        return emb @ net.fc_w + net.fc_b

    def predict_from_embeddings(self, emb, params=None):
        """Reference-API alias (audionet_csine.py:210-211)."""
        return self._scores_from_emb(emb, p=self.resolve_params(params))

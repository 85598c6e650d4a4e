"""x-vector TDNN (5 dilated conv layers + stats pooling), functional JAX.

Re-design of reference model/_xv_plda/xvecTDNN.py: Conv1d stacks become
lax.conv_general_dilated in (B, T, C) layout (XLA maps these onto the MXU),
BatchNorm1d(affine=False) is a pure normalize with running stats, and the
CUDA-only train-mode noise injection (xvecTDNN.py:55-60) becomes an explicit
PRNG-keyed perturbation.

Stats pooling concatenates mean and (unbiased) std over time
(xvecTDNN.py:62), matching torch.Tensor.std's correction=1 default.
"""

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

# (kernel, dilation, out_channels) for tdnn1..tdnn5; input channels = 30
TDNN_SPEC = ((5, 1, 512), (5, 2, 512), (7, 3, 512), (1, 1, 512), (1, 1, 1500))


class BNStats(NamedTuple):
    mean: jax.Array
    var: jax.Array


class TDNNParams(NamedTuple):
    conv_w: tuple      # 5 x (k, in, out)
    conv_b: tuple      # 5 x (out,)
    bn_tdnn: tuple     # 5 x BNStats
    fc1_w: jax.Array   # (3000, 512)
    fc1_b: jax.Array
    bn_fc1: BNStats
    fc2_w: jax.Array   # (512, 512)
    fc2_b: jax.Array
    bn_fc2: BNStats
    fc3_w: jax.Array   # (512, num_spks)
    fc3_b: jax.Array


def random_tdnn(rng: np.random.Generator, num_spks: int = 251,
                in_dim: int = 30) -> TDNNParams:
    ws, bs, bns = [], [], []
    cin = in_dim
    for k, dil, cout in TDNN_SPEC:
        bound = 1.0 / np.sqrt(cin * k)
        ws.append(jnp.asarray(
            rng.uniform(-bound, bound, (k, cin, cout)), jnp.float32))
        bs.append(jnp.asarray(rng.uniform(-bound, bound, cout), jnp.float32))
        bns.append(BNStats(jnp.zeros(cout), jnp.ones(cout)))
        cin = cout

    def lin(i, o):
        bound = 1.0 / np.sqrt(i)
        return (jnp.asarray(rng.uniform(-bound, bound, (i, o)), jnp.float32),
                jnp.asarray(rng.uniform(-bound, bound, o), jnp.float32))

    fc1_w, fc1_b = lin(3000, 512)
    fc2_w, fc2_b = lin(512, 512)
    fc3_w, fc3_b = lin(512, num_spks)
    return TDNNParams(tuple(ws), tuple(bs), tuple(bns),
                      fc1_w, fc1_b, BNStats(jnp.zeros(512), jnp.ones(512)),
                      fc2_w, fc2_b, BNStats(jnp.zeros(512), jnp.ones(512)),
                      fc3_w, fc3_b)


def _conv1d(x, w, b, dilation):
    """x: (B, T, Cin); w: (k, Cin, Cout) -> (B, T', Cout), valid padding."""
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding="VALID",
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"))
    return out + b


def _bn(x, stats: BNStats, eps=1e-5):
    return (x - stats.mean) * jax.lax.rsqrt(stats.var + eps)


import functools
import os


def tdnn_fast_bwd_active() -> bool:
    """SG_TDNN_FAST routes the attack-gradient TDNN through the
    bf16-residual fused blocks below (r4, VERDICT r3 #3 lead).  Default
    ON since chip-measured: 129.2 -> 135.4 utts/s xv-PLDA PGD-100 @128
    with an identical 89.8% ASR (the forward is IDENTICAL either way;
    only attack-gradient graphs, which feed sign() steps, take this
    path).  SG_TDNN_FAST=0 restores the autodiff backward."""
    return os.environ.get("SG_TDNN_FAST", "1") == "1"


@functools.lru_cache(maxsize=None)
def _block_fast(dilation: int):
    """conv -> relu -> bn as ONE custom-VJP block for attack-gradient
    graphs (fast=True): the forward is the exact default-precision chain,
    but the residual is just the relu MASK (bool, 1 byte/elem) + weights +
    bn var — autodiff instead saves the f32 conv output AND bn input
    (8 bytes/elem of (B, T', 512) HBM per layer).  The backward computes
    the input cotangent as one padded transpose-convolution with
    bf16-rounded operands and f32 accumulation (gradients feed sign()
    steps; mirrors gmm.BWD_PRECISION's approach, which measured +13% on
    iv).  Parameter cotangents are zero — attacks differentiate wrt the
    waveform only (same contract as gmm._loglike_fast)."""

    @jax.custom_vjp
    def block(x, w, b, mean, var):
        y = _conv1d(x, w, b, dilation)
        return (jax.nn.relu(y) - mean) * jax.lax.rsqrt(var + 1e-5)

    def fwd(x, w, b, mean, var):
        y = _conv1d(x, w, b, dilation)
        mask = y > 0
        out = (jnp.where(mask, y, 0.0) - mean) * jax.lax.rsqrt(var + 1e-5)
        return out, (mask, w, var)

    def bwd(res, g):
        from speakerguard_tpu.models.gmm import fast_dot_dtype
        mask, w, var = res
        s = jax.lax.rsqrt(var + 1e-5)
        gy = jnp.where(mask, g * s, 0.0)
        k = w.shape[0]
        pad = (k - 1) * dilation
        wk = w[::-1].transpose(0, 2, 1)            # (k, out, in)
        dt = fast_dot_dtype()
        gx = jax.lax.conv_general_dilated(
            gy.astype(dt), wk.astype(dt), window_strides=(1,),
            padding=[(pad, pad)], rhs_dilation=(dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=jnp.float32)
        return (gx, jnp.zeros_like(w), jnp.zeros(w.shape[2], gx.dtype),
                jnp.zeros_like(var), jnp.zeros_like(var))

    block.defvjp(fwd, bwd)
    return block


def tdnn_bf16_act_active() -> bool:
    """SG_TDNN_BF16_ACT routes the attack-gradient TDNN (fast=True graphs
    only) through the bf16-ACTIVATION blocks below: activations AND their
    cotangents flow bfloat16 between layers.  Motivation is the r5 chip
    profiler trace (measurements/r05_xv_trace_top_ops.txt): with f32
    activations, the three largest named non-MXU consumers in the PGD
    while-body are standalone f32->bf16 convert fusions over the
    (B, T', 512) gradient tensors (~26%% of the loop body) — custom_vjp
    pins cotangent dtype to the primal's, so every layer boundary
    round-trips f32<->bf16 through HBM.  Storing the activations bf16
    removes the convert passes and halves conv I/O.  The final attack
    success evaluation always re-runs the exact fast=False path
    (attacks/gradient.py:76-90).

    Default ON since chip-A/B'd (2026-08-19, measurements/r05_chip_log.txt):
    xv-PLDA PGD-100 @512 178.05 -> 192.80 utts/s (+8.3%, 48.9% of bf16
    peak) at ASR 92.4 vs 92.2 baseline.  The win required emitting the
    convs in bf16 (preferred_element_type=bf16) — the first attempt kept
    f32 conv outputs and measured NEUTRAL (178.4: XLA materialized the
    f32 (B,T',512) conv result and ran the round-to-bf16 epilogue as a
    separate full-size fusion, so nothing changed; both traces in
    measurements/).  SG_TDNN_BF16_ACT=0 restores f32 activations."""
    return os.environ.get("SG_TDNN_BF16_ACT", "1") == "1"


@functools.lru_cache(maxsize=None)
def _block_fast_bf16(dilation: int):
    """conv -> relu -> bn with bf16 activations end-to-end (fast=True +
    SG_TDNN_BF16_ACT): x arrives bf16, the conv accumulates f32 on the MXU,
    the bias+relu+bn epilogue computes f32 and writes bf16, and the
    backward's transpose-convolution takes the bf16 cotangent directly —
    no standalone f32<->bf16 convert passes between layers (the epilogue
    converts fuse into the convs).  Residual = relu mask + bf16 weights +
    bn var, as in _block_fast.  Parameter cotangents are zero (attacks
    differentiate wrt the waveform only)."""

    def _fwd_math(x, w, b, mean, var):
        # preferred_element_type=bf16: the MXU accumulates f32 internally
        # and rounds ONCE at the conv output — requesting f32 out instead
        # materializes the full (B, T', 512) tensor f32 and leaves the
        # bias+relu+bn+round epilogue as a separate f32-read fusion (the
        # r5 trace showed those fusions unchanged and the A/B neutral
        # until this output-dtype fix)
        y = jax.lax.conv_general_dilated(
            x, w.astype(jnp.bfloat16), window_strides=(1,),
            padding="VALID", rhs_dilation=(dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=jnp.bfloat16)
        return y.astype(jnp.float32) + b

    @jax.custom_vjp
    def block(x, w, b, mean, var):
        y = _fwd_math(x, w, b, mean, var)
        out = (jax.nn.relu(y) - mean) * jax.lax.rsqrt(var + 1e-5)
        return out.astype(jnp.bfloat16)

    def fwd(x, w, b, mean, var):
        y = _fwd_math(x, w, b, mean, var)
        mask = y > 0
        out = (jnp.where(mask, y, 0.0) - mean) * jax.lax.rsqrt(var + 1e-5)
        return out.astype(jnp.bfloat16), (mask, w, var)

    def bwd(res, g):
        mask, w, var = res
        s = jax.lax.rsqrt(var + 1e-5)
        gy = jnp.where(mask, g.astype(jnp.float32) * s,
                       0.0).astype(jnp.bfloat16)
        k = w.shape[0]
        pad = (k - 1) * dilation
        wk = w[::-1].transpose(0, 2, 1)            # (k, out, in)
        gx = jax.lax.conv_general_dilated(
            gy, wk.astype(jnp.bfloat16), window_strides=(1,),
            padding=[(pad, pad)], rhs_dilation=(dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=jnp.bfloat16)
        return (gx.astype(jnp.bfloat16), jnp.zeros_like(w),
                jnp.zeros(w.shape[2], jnp.float32),
                jnp.zeros_like(var), jnp.zeros_like(var))

    block.defvjp(fwd, bwd)
    return block


@jax.custom_vjp
def _stats_pool_fast_bf16(x):
    """mean ++ unbiased std over time for a bf16 activation tensor:
    f32 accumulation, f32 (B, 3000) output; the residual is the bf16 x
    itself (free — no rounding pass, unlike _stats_pool_fast's f32->bf16
    residual convert of the ~205 MB (B, T', 1500) tensor)."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=1)
    var = jnp.var(x32, axis=1, ddof=1)
    std = jnp.sqrt(jnp.maximum(var, 0.0))
    return jnp.concatenate([mean, std], axis=-1)


def _spf16_fwd(x):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=1)
    var = jnp.var(x32, axis=1, ddof=1)
    std = jnp.sqrt(jnp.maximum(var, 0.0))
    return (jnp.concatenate([mean, std], axis=-1),
            (x, mean, std, x.shape[1]))


def _spf16_bwd(res, g):
    x16, mean, std, t = res
    c = mean.shape[-1]
    gm, gs = g[:, :c], g[:, c:]
    centered = x16.astype(jnp.float32) - mean[:, None, :]
    denom = jnp.maximum((t - 1) * std, 1e-12)
    dx = gm[:, None, :] / t + gs[:, None, :] * centered / denom[:, None, :]
    return (dx.astype(x16.dtype),)


_stats_pool_fast_bf16.defvjp(_spf16_fwd, _spf16_bwd)


@jax.custom_vjp
def _stats_pool_fast(x):
    """mean ++ unbiased std over time with a bf16 residual (fast path):
    autodiff keeps the (B, T', 1500) f32 activations (~205 MB at bench
    shapes) for the std backward; this saves them bf16-rounded plus the
    f32 (B, 1500) mean/std."""
    mean = jnp.mean(x, axis=1)
    var = jnp.var(x, axis=1, ddof=1)
    std = jnp.sqrt(jnp.maximum(var, 0.0))
    return jnp.concatenate([mean, std], axis=-1)


def _spf_fwd(x):
    mean = jnp.mean(x, axis=1)
    var = jnp.var(x, axis=1, ddof=1)
    std = jnp.sqrt(jnp.maximum(var, 0.0))
    return (jnp.concatenate([mean, std], axis=-1),
            (x.astype(jnp.bfloat16), mean, std, x.shape[1]))


def _spf_bwd(res, g):
    x16, mean, std, t = res
    c = mean.shape[-1]
    gm, gs = g[:, :c], g[:, c:]
    # d mean / dx = 1/T ; d std / dx = (x - mean) / ((T-1) std)
    centered = x16.astype(jnp.float32) - mean[:, None, :]
    denom = jnp.maximum((t - 1) * std, 1e-12)
    dx = gm[:, None, :] / t + gs[:, None, :] * centered / denom[:, None, :]
    return (dx,)


_stats_pool_fast.defvjp(_spf_fwd, _spf_bwd)


def tdnn_embedding(params: TDNNParams, feats: jnp.ndarray,
                   train: bool = False, rng: jax.Array | None = None,
                   noise_eps: float = 1e-5, fast: bool = False
                   ) -> jnp.ndarray:
    """feats: (B, T, F=30) -> (B, 512) x-vector (pre-nonlinearity fc1 output,
    matching reference xvecTDNN.embedding).  fast=True (attack-gradient
    graphs only, gated by SG_TDNN_FAST): identical forward, bf16-residual
    fused backward (_block_fast)."""
    x = feats
    use_fast = fast and not train and tdnn_fast_bwd_active()
    use_bf16_act = use_fast and tdnn_bf16_act_active()
    if use_bf16_act:
        x = x.astype(jnp.bfloat16)
    for i, (k, dil, _) in enumerate(TDNN_SPEC):
        if use_fast:
            sg = jax.lax.stop_gradient
            bn = params.bn_tdnn[i]
            blk = (_block_fast_bf16 if use_bf16_act else _block_fast)(dil)
            x = blk(x, sg(params.conv_w[i]),
                    sg(params.conv_b[i]), sg(bn.mean),
                    sg(bn.var))
            continue
        x = _conv1d(x, params.conv_w[i], params.conv_b[i], dil)
        x = jax.nn.relu(x)
        x = _bn(x, params.bn_tdnn[i])
    if train and rng is not None:
        x = x + noise_eps * jax.random.normal(rng, x.shape, x.dtype)
    if use_bf16_act:
        stats = _stats_pool_fast_bf16(x)                  # (B, 3000) f32
    elif use_fast:
        stats = _stats_pool_fast(x)                       # (B, 3000)
    else:
        mean = jnp.mean(x, axis=1)
        var = jnp.var(x, axis=1, ddof=1)                  # torch unbiased std
        std = jnp.sqrt(jnp.maximum(var, 0.0))
        stats = jnp.concatenate([mean, std], axis=-1)     # (B, 3000)
    return stats @ params.fc1_w + params.fc1_b


def tdnn_forward(params: TDNNParams, feats: jnp.ndarray,
                 train: bool = False, rng=None) -> jnp.ndarray:
    """Full classifier head -> (B, num_spks) logits
    (reference xvecTDNN.forward)."""
    x = tdnn_embedding(params, feats, train=train, rng=rng)
    x = _bn(jax.nn.relu(x), params.bn_fc1)
    x = _bn(jax.nn.relu(x @ params.fc2_w + params.fc2_b), params.bn_fc2)
    return x @ params.fc3_w + params.fc3_b


def load_tdnn_from_torch_state(state: dict) -> TDNNParams:
    """Convert a torch state_dict (tensors or numpy) from the reference
    checkpoint layout into TDNNParams.  torch Conv1d weight is (out, in, k);
    we store (k, in, out).  Linear weight (out, in) -> (in, out)."""
    def arr(k):
        v = state[k]
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                          else v)
    ws, bs, bns = [], [], []
    for i in range(1, 6):
        w = arr(f"tdnn{i}.weight").transpose(2, 1, 0)
        ws.append(jnp.asarray(w, jnp.float32))
        bs.append(jnp.asarray(arr(f"tdnn{i}.bias"), jnp.float32))
        bns.append(BNStats(
            jnp.asarray(arr(f"bn_tdnn{i}.running_mean"), jnp.float32),
            jnp.asarray(arr(f"bn_tdnn{i}.running_var"), jnp.float32)))

    def lin(name):
        return (jnp.asarray(arr(f"{name}.weight").T, jnp.float32),
                jnp.asarray(arr(f"{name}.bias"), jnp.float32))

    fc1_w, fc1_b = lin("fc1")
    fc2_w, fc2_b = lin("fc2")
    fc3_w, fc3_b = lin("fc3")
    return TDNNParams(
        tuple(ws), tuple(bs), tuple(bns),
        fc1_w, fc1_b,
        BNStats(jnp.asarray(arr("bn_fc1.running_mean"), jnp.float32),
                jnp.asarray(arr("bn_fc1.running_var"), jnp.float32)),
        fc2_w, fc2_b,
        BNStats(jnp.asarray(arr("bn_fc2.running_mean"), jnp.float32),
                jnp.asarray(arr("bn_fc2.running_var"), jnp.float32)),
        fc3_w, fc3_b)

"""IIR filtering for TPU: FIR truncation of the impulse response.

The reference applies Butterworth LPF/BPF via torch_lfilter on CPU with a
per-sample Python loop (reference defense/frequency_domain.py:33-112, native
dep N1).  A direct IIR recurrence is inherently sequential — hostile to the
TPU's vector units — so instead we truncate the (stable) filter's impulse
response on the host to a tolerance and apply it as one causal FIR
convolution (exactly equal to lfilter up to the discarded sub-tolerance
tail).  An exact `lax.scan` recurrence is kept for verification.
"""

import functools

import numpy as np
from scipy import signal as ssig
import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def _truncated_impulse_response(b: tuple, a: tuple, tol: float = 1e-7,
                                max_len: int = 1 << 16) -> np.ndarray:
    """Impulse response of lfilter(b, a), truncated once |tail| < tol."""
    n = 1024
    while n <= max_len:
        imp = np.zeros(n)
        imp[0] = 1.0
        h = ssig.lfilter(np.asarray(b), np.asarray(a), imp)
        tail = np.max(np.abs(h[-(n // 4):]))
        if tail < tol or n == max_len:
            # find cut point where remaining tail is < tol
            mags = np.abs(h[::-1])
            keep = n - np.argmax(np.maximum.accumulate(mags) >= tol)
            return h[:max(keep, len(b))].astype(np.float32)
        n *= 2
    raise RuntimeError("filter impulse response does not decay")


def fir_from_iir(b, a, tol: float = 1e-7) -> np.ndarray:
    return _truncated_impulse_response(tuple(np.asarray(b, np.float64)),
                                       tuple(np.asarray(a, np.float64)), tol)


def apply_fir(x: jnp.ndarray, h: np.ndarray) -> jnp.ndarray:
    """Causal convolution matching scipy.signal.lfilter semantics.
    x: (B, L) -> (B, L)."""
    k = len(h)
    xp = jnp.pad(x, ((0, 0), (k - 1, 0)))[:, None, :]
    w = jnp.asarray(h[::-1].copy())[None, None, :]
    y = jax.lax.conv_general_dilated(
        xp, w, window_strides=(1,), padding="VALID",
        dimension_numbers=("NCW", "OIW", "NCW"),
        precision=jax.lax.Precision.HIGHEST)
    return y[:, 0, :]


def lfilter_scan(x: jnp.ndarray, b, a) -> jnp.ndarray:
    """Exact IIR via lax.scan (direct form II transposed), for tests.
    x: (B, L)."""
    b = jnp.asarray(b, jnp.float32)
    a = jnp.asarray(a, jnp.float32)
    b = b / a[0]
    a = a / a[0]
    order = max(len(b), len(a))
    bb = jnp.pad(b, (0, order - len(b)))
    aa = jnp.pad(a, (0, order - len(a)))

    def step(state, xt):
        yt = bb[0] * xt + state[:, 0]
        new = (state[:, 1:] if order > 2
               else jnp.zeros((x.shape[0], 0), x.dtype))
        new = jnp.pad(new, ((0, 0), (0, 1)))
        new = new + bb[1:][None, :] * xt[:, None] - aa[1:][None, :] * yt[:, None]
        return new, yt

    init = jnp.zeros((x.shape[0], order - 1), x.dtype)
    _, y = jax.lax.scan(step, init, x.T)
    return y.T

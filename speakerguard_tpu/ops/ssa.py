"""Singular-spectrum analysis (SSA) for the Kenansville ssa attack variant.

Re-design of reference attack/ssa_core.py: Hankel trajectory matrix + SVD +
diagonal-averaging reconstruction.  The reference forces CPU for this
(ssa_core.py:28); the SVD of a (window x N) trajectory matrix with window up
to 3000 is equally hostile to the TPU's MXU, so this stays host-side numpy —
the attack around it (binary search, model calls) runs on device.
"""

import numpy as np


def ssa(x: np.ndarray, window: int):
    """x: (N,) -> (pc (window, K), s (window,), v (K, window))
    with K = N - window + 1; pc = U * s (principal components)."""
    x = np.asarray(x, np.float64).ravel()
    n = len(x)
    k = n - window + 1
    idx = np.arange(window)[:, None] + np.arange(k)[None, :]
    traj = x[idx]                                   # (window, K)
    u, s, vt = np.linalg.svd(traj, full_matrices=False)
    pc = u * s[None, :]
    return pc, s, vt.T


def inv_ssa(pc: np.ndarray, v: np.ndarray, indices) -> np.ndarray:
    """Reconstruct from selected components by diagonal averaging."""
    window, _ = pc.shape
    k = v.shape[0]
    n = window + k - 1
    traj = pc[:, indices] @ v[:, indices].T          # (window, K)
    out = np.zeros(n)
    counts = np.zeros(n)
    for i in range(window):
        out[i:i + k] += traj[i]
        counts[i:i + k] += 1.0
    return out / counts


def ssa_compress(x: np.ndarray, keep: int, window: int) -> np.ndarray:
    pc, s, v = ssa(x, window)
    return inv_ssa(pc, v, np.arange(keep))

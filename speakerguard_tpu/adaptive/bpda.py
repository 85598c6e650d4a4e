"""BPDA — Backward-Pass Differentiable Approximation as jax.custom_vjp.

Re-design of reference adaptive_attack/BPDA.py: instead of a torch autograd
Function that re-runs a substitute forward in the backward pass, a
``custom_vjp`` whose forward runs the (possibly non-differentiable, possibly
host-callback) original function and whose backward is the VJP of the
substitute evaluated at the same primal input.

Used to make QT/BDR and the ffmpeg speech-compression defenses attackable
(reference defense/time_domain.py:44, defense/speech_compression.py:137 wrap
with an identity substitute == straight-through estimator).
"""

import jax


def bpda(ori_f, sub_f=None):
    """Returns g(x, *static_args) differentiable in x via sub_f's VJP.
    ``sub_f`` defaults to identity (straight-through)."""
    if sub_f is None:
        def sub_f(x, *a):  # noqa: E306
            return x

    @jax.custom_vjp
    def f(x, *args):
        return ori_f(x, *args)

    def fwd(x, *args):
        return ori_f(x, *args), (x, args)

    def bwd(res, g):
        x, args = res
        _, vjp = jax.vjp(lambda xx: sub_f(xx, *args), x)
        return vjp(g) + (None,) * len(args)

    f.defvjp(fwd, bwd)
    return f

"""In-scan timing harness for hot-path microbenches on the tunneled chip.

Eager per-dispatch probes on this stack are unreliable: r3 measured the
GMM augmentation at ~35 ms/iter for BOTH the gather and one-hot-matmul
constructions eagerly, while in-scan timing showed 8.8 vs 2.4 ms — the
3.7x production win was invisible to the eager probe (dispatch artifacts
dominate, and identical-executable repeats can be served from a cache).

The honest probe: lax.scan of N reps inside ONE jitted dispatch, each rep
regenerating its inputs from a folded PRNG key (so no rep can be cached or
DCE'd), accumulating a scalar that depends on every output.  Per-rep time
= (total - 0)/N; the single dispatch overhead amortizes to ~0.

Usage:
    from tools.inscan import time_grad_body
    ms = time_grad_body(lambda x: loss(x), gen=lambda k: make_input(k))
"""

import time

import numpy as np
import jax
import jax.numpy as jnp


def time_scan(step, n_reps=10, n_meas=3, key=None, params=()):
    """step(key, *params) -> scalar; returns median ms/rep over n_meas
    runs of an n_reps-long in-jit scan (first run compiles, discarded).

    Thread EVERY multi-MB device array through `params` — a closure-
    captured device array is inlined into the HLO payload on this stack
    and a GB-scale literal kills the remote compile service (broken
    pipe); explicit jit args are passed by buffer.

    The base key is salted with time_ns: the tunnel's result cache is
    PERSISTENT across processes and keyed on (executable, args) — a
    probe rerun with the same fixed PRNGKeys is served from cache and
    reads as ~0 ms (observed r3: identical chol probes measured 8.8 ms
    in the first process and 0.0 ms in the next)."""
    import time as _time
    if key is None:
        key = jax.random.PRNGKey(_time.time_ns() % (2 ** 31))

    @jax.jit
    def run(k, *ps):
        def body(acc, kk):
            return acc + step(kk, *ps), None
        acc, _ = jax.lax.scan(body, 0.0, jax.random.split(k, n_reps))
        return acc

    out = run(jax.random.fold_in(key, 2 ** 30), *params)
    jax.block_until_ready(out)
    times = []
    for i in range(n_meas):
        t0 = time.perf_counter()
        out = run(jax.random.fold_in(key, i), *params)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / n_reps)
    ms = float(np.median(times)) * 1e3
    if ms < 0.2:
        # observed r3: the tunnel sometimes "completes" a probe in ~0 ms
        # with correct outputs — some result-serving path bypasses real
        # execution.  Flag it loudly; the caller must not trust this rep.
        import sys
        print(f"[inscan] WARNING: probe measured {ms:.3f} ms/rep — likely "
              "VOID (tunnel served without real execution); re-run in a "
              "fresh process and cross-check with a bench.py e2e delta",
              file=sys.stderr)
    return ms


def time_grad_body(loss, gen, n_reps=10, n_meas=3, params=()):
    """loss(x, *params) -> scalar, gen(key) -> x.  Times fwd+grad of loss
    per rep (the attack-iteration shape: one VJP through the probed
    stage).  Big arrays go in `params` (see time_scan)."""
    gfn = jax.grad(loss)

    def step(k, *ps):
        x = gen(k)
        g = gfn(x, *ps)
        return jax.tree_util.tree_reduce(
            lambda a, l: a + jnp.sum(l.astype(jnp.float32) ** 2), g, 0.0)

    return time_scan(step, n_reps=n_reps, n_meas=n_meas, params=params)

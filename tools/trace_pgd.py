"""Capture a real jax.profiler trace of the PGD attack step on chip and
print the top device ops (VERDICT r4 next #3: settle the xv roofline with
a trace, not inscan probes).

Runs a short PGD (BENCH-like setup: random-weights model, CSI task) under
jax.profiler.trace, then parses the captured .xplane.pb programmatically
via jax.profiler.ProfileData and aggregates device-plane event durations
by op name.

    TRACE_MODEL={xv_plda,iv_plda}  TRACE_BATCH  TRACE_ITERS  TRACE_WAV_LEN
    python tools/trace_pgd.py

Artifacts: measurements/r05_trace_<model>/ (raw trace) and a printed
top-op table (redirect to measurements/).
"""

import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def main():
    import jax  # noqa: E402
    import jax.numpy as jnp  # noqa: E402
    from speakerguard_tpu.attacks import PGD  # noqa: E402
    from speakerguard_tpu.utils.compile_cache import enable as enable_cache

    enable_cache()
    model_kind = os.environ.get("TRACE_MODEL", "xv_plda")
    batch = int(os.environ.get("TRACE_BATCH", "512"))
    iters = int(os.environ.get("TRACE_ITERS", "20"))
    wav_len = int(os.environ.get("TRACE_WAV_LEN", "48000"))
    rng = np.random.default_rng(0)

    if model_kind == "iv_plda":
        from speakerguard_tpu.models.iv_plda import (IvPlda,
                                                     random_iv_plda_params)
        model = IvPlda(random_iv_plda_params(rng))
        enroll = jnp.asarray(
            rng.standard_normal((10, 200)).astype(np.float32))
    else:
        from speakerguard_tpu.models.xv_plda import (XvPlda,
                                                     random_xv_plda_params)
        model = XvPlda(random_xv_plda_params(rng))
        enroll = jnp.asarray(
            rng.standard_normal((10, 150)).astype(np.float32))
    model.set_enrollment([str(i) for i in range(10)], enroll)

    x = jnp.asarray(
        (rng.uniform(-0.3, 0.3, (batch, wav_len))).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 10, batch))
    atk = PGD(model, task="CSI", epsilon=0.002, step_size=0.0004,
              max_iter=iters, loss="Entropy")

    key = jax.random.PRNGKey(0)
    adver, _ = atk.attack(x, y, rng=key)  # compile + warm
    jax.block_until_ready(adver)

    logdir = f"measurements/r05_trace_{model_kind}"
    t0 = time.perf_counter()
    with jax.profiler.trace(logdir):
        adver, _ = atk.attack(x, y, rng=jax.random.fold_in(key, 1))
        jax.block_until_ready(adver)
    wall = time.perf_counter() - t0
    print(f"traced attack call: {wall:.3f}s wall, {batch} utts, "
          f"{iters} iters -> {batch / wall:.1f} utts/s")

    # find the newest xplane.pb under logdir
    xplanes = []
    for root, _dirs, files in os.walk(logdir):
        xplanes += [os.path.join(root, f) for f in files
                    if f.endswith(".xplane.pb")]
    if not xplanes:
        print("NO_XPLANE_CAPTURED (tunnel may not export device traces)")
        return
    path = max(xplanes, key=os.path.getmtime)
    data = jax.profiler.ProfileData.from_serialized_xspace(
        open(path, "rb").read())

    for plane in data.planes:
        is_device = ("TPU" in plane.name or "/device" in plane.name
                     or "GPU" in plane.name)
        totals = defaultdict(float)
        count = defaultdict(int)
        span_lo, span_hi = float("inf"), 0.0
        for line in plane.lines:
            for ev in line.events:
                dur = ev.duration_ns
                totals[ev.name] += dur
                count[ev.name] += 1
                span_lo = min(span_lo, ev.start_ns)
                span_hi = max(span_hi, ev.start_ns + dur)
        if not totals:
            continue
        span = max(span_hi - span_lo, 1.0)
        print(f"\n== plane: {plane.name} "
              f"({'DEVICE' if is_device else 'host'}) "
              f"span {span / 1e6:.1f} ms ==")
        top = sorted(totals.items(), key=lambda kv: -kv[1])[:25]
        for name, ns in top:
            print(f"  {ns / 1e6:10.2f} ms  {100 * ns / span:5.1f}%  "
                  f"x{count[name]:<6d} {name[:90]}")


if __name__ == "__main__":
    main()

"""Attack base: the uniform attack(x, y) -> (adver_x, success) contract
(reference attack/Attack.py) plus shared helpers.

All attacks operate on waveforms in the *scale* domain ([-1, 1)) with shape
(B, L) (the reference's (B, 1, T) is accepted and squeezed).  Iteration
loops are lax.scan / lax.while_loop bodies; per-sample early-stop /
sample-dropping are mask lanes, not host-side batch compaction.
"""

import numpy as np
import jax
import jax.numpy as jnp

from speakerguard_tpu.attacks.losses import compare


def blackbox_fast_active() -> bool:
    """SG_BLACKBOX_FAST: route the black-box attacks' inner scoring loops
    (FAKEBOB's NES samples, SirenAttack's particle evaluations — thousands
    of forward passes per utterance) through the models' bf16 fast forward
    path (``score(fast=True)``, same graphs PGD's gradient steps use).

    Composes with the master SG_FAST gate (models check ``fast_active()``
    before honoring ``fast=True``), so off-TPU test meshes stay exact.
    When active, both attacks re-evaluate their final candidates on the
    exact (f32) path once, so the reported success vector is verified
    exactly — matching the PGD/CW2 convention (attacks/gradient.py:86-90).

    Default ON since chip-A/B'd (2026-08-19,
    measurements/r05_blackbox_ab_log.txt): FAKEBOB xv @128 2.588 -> 3.055
    utts/s (+18.0%) and Siren xv @32 3.078 -> 3.439 (+11.7%), both at
    ASR IDENTICAL to the exact arms (89.1 / 84.4) — NES difference
    signals at sigma=1e-3 and PSO loss ordering survive bf16 score noise
    at these operating points.  SG_BLACKBOX_FAST=0 restores exact inner
    forwards."""
    import os
    return os.environ.get("SG_BLACKBOX_FAST", "1") == "1"


class Attack:
    targeted: bool = False
    batch_size: int = 1
    mesh = None  # optional jax.sharding.Mesh: shard the batch over 'data'

    def attack(self, x, y, rng=None):
        raise NotImplementedError

    def shard_inputs(self, x, y):
        """When a mesh is set, lay out the attack batch sharded over the
        mesh's 'data' axis (params stay replicated via replicate_params).
        The attack computation is per-sample, so XLA runs it fully
        data-parallel with no collectives — computation follows data."""
        if self.mesh is None:
            return x, y
        from jax.sharding import NamedSharding, PartitionSpec as P
        assert x.shape[0] % self.mesh.shape["data"] == 0, (
            f"batch {x.shape[0]} must divide over the "
            f"{self.mesh.shape['data']}-way data axis")
        x = jax.device_put(x, NamedSharding(self.mesh, P("data", None)))
        y = jax.device_put(y, NamedSharding(self.mesh, P("data")))
        return x, y

    def replicate_params(self, params):
        if self.mesh is None or params is None:
            return params
        from jax.sharding import NamedSharding, PartitionSpec as P
        repl = NamedSharding(self.mesh, P())
        return jax.tree.map(lambda a: jax.device_put(a, repl), params)

    def compare(self, y, y_pred, targeted):
        return np.asarray(compare(jnp.asarray(y), jnp.asarray(y_pred),
                                  targeted)).tolist()

    def run_batched(self, attack_batch_fn, x, y, rng, batch_size=None):
        """Split the input into batch_size chunks like the reference's
        attack() loops (FGSM.py:83-96); equal-size chunks share one
        compilation, a ragged tail compiles once more."""
        import jax
        n = x.shape[0]
        bs = min(batch_size or getattr(self, "batch_size", n) or n, n)
        if bs >= n:
            return attack_batch_fn(x, y, rng)
        advers, successes = [], []
        for i, s in enumerate(range(0, n, bs)):
            a, su = attack_batch_fn(x[s:s + bs], y[s:s + bs],
                                    jax.random.fold_in(rng, i))
            advers.append(a)
            successes += list(su)
        return jnp.concatenate(advers, axis=0), successes


def normalize_wav_input(x):
    """(B, 1, L) | (B, L) | (L,) -> ((B, L) jnp array, restore_fn).

    Also a structural domain gate: every attack entry point funnels through
    here, so origin-domain (int16-valued float) audio is rejected loudly
    instead of silently attacking a 32768x mis-scaled signal."""
    x = jnp.asarray(x)
    assert_scale_domain(x)
    shape = x.shape
    if x.ndim == 1:
        flat = x[None, :]
    elif x.ndim == 3:
        assert x.shape[1] == 1, "only mono audio"
        flat = x[:, 0, :]
    else:
        flat = x
    return flat, lambda y: jnp.reshape(y, shape)


def assert_scale_domain(x, what="attack input"):
    """Raise if a concrete array is clearly not scale-domain audio.

    Attacks operate in [-1, 1) (the reference feeds Dataset(normalize=True)
    straight into attacks, attackMain.py:188-189); an array with |x| >> 1
    here means the caller scaled to the origin domain (or divided twice the
    other way) — a bug class invisible to epsilon-ball math, so fail loudly.
    Tracers are skipped (attacks only call this eagerly at entry)."""
    if isinstance(x, jax.core.Tracer):
        return
    m = float(jnp.max(jnp.abs(x))) if x.size else 0.0
    if m > 2.0:
        raise ValueError(
            f"{what} has max|x|={m:.1f}; expected scale-domain audio in "
            "[-1, 1). Origin-domain (int16-valued float) audio must be "
            "divided by 2**15 exactly once before attacking; "
            "Dataset(normalize=True) already yields the scale domain.")
    if x.size and 0.0 < m < 1e-3:
        # the opposite mis-scale: scale-domain audio divided by 2**15 again
        # (max|x| ~3e-5) runs attacks on near-silence with meaningless
        # success rates — warn loudly (real audio can be quiet, so not fatal)
        import warnings
        warnings.warn(
            f"{what} has max|x|={m:.2e}; implausibly small for audio — "
            "was scale-domain input divided by 2**15 a second time? "
            "Dataset(normalize=True) already yields the scale domain.",
            stacklevel=2)

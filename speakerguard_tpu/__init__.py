"""speakerguard_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
adversarial machine learning on speaker recognition systems.

Re-designed from scratch with the capabilities of the SpeakerGuard reference
(PyTorch): 3 SRS model families x 4 recognition tasks (CSI-E, CSI-NE, SV,
OSI), 7 attacks, ~22 input-transformation defenses + robust training,
adaptive-attack wrappers (EOT / NES / BPDA), and 8 evaluation metrics.

Design stance (TPU-first):
  * every model is a pure function ``params x wav-batch -> scores``;
  * every attack is a ``lax.scan`` over iterations with forward+VJP inside;
  * EOT / NES / PSO / restart axes are array axes (vmap) shardable over a
    ``jax.sharding.Mesh``;
  * early-stop / sample-dropping are boolean mask lanes, never host syncs.
"""

__version__ = "0.1.0"

from speakerguard_tpu.utils import ranges  # noqa: F401

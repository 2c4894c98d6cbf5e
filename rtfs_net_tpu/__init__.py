"""RTFS-Net TPU: a TPU-native audio-visual speech separation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of spkgyk/RTFS-Net
(ICLR 2024, arXiv:2309.17189): config-driven assembly of time-frequency
separation networks (RTFS-Net, CTCNet, DPTNet) with cross-modal audio-visual
fusion, PIT losses, a training/eval system, and data-parallel execution over
a `jax.sharding.Mesh`.

Design stance (TPU-first, not a port):
  * the model is a pure function ``(params, mix, mouth_emb) -> separated``
    built from flax.linen modules chosen by string registries from YAML
    configs (schema-compatible with the reference's ``config/*.yaml``);
  * STFT/iSTFT run as strided matmuls against a windowed DFT basis (MXU),
    not host FFT calls;
  * the SRU recurrence of the RTFS blocks runs its input projections as one
    large batched matmul and only the elementwise recurrence as a
    ``lax.scan`` (optionally an associative scan);
  * everything compiles under one ``jax.jit`` with static shapes;
  * data parallelism = 1-D ``data`` mesh axis + ``shard_map``/psum.
"""

__version__ = "0.1.0"

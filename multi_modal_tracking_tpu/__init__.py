"""multi_modal_tracking_tpu: a TPU-native (JAX/XLA/Pallas) multi-modal visual
tracking framework.

Re-designed from scratch with the capabilities of the MixFormer-based
LZ-QWQ/Multi-modal-Tracking reference framework (RGB / RGB-T / RGB-D single
object tracking): MixFormer backbones (ViT / CvT / ConvMAE), RGB-T
asymmetric-shared backbones with cross-modal mixed attention, deformable
attention fusion, candidate elimination, score prediction (SPM), corner heads,
a full training + evaluation + analysis stack.

Design principles (TPU-first, not a port):
  * pure-functional models (flax.linen) under `jax.jit` / `pjit`
  * modalities and templates batched on leading axes; static shapes everywhere
  * crop / resize / color-map preprocessing fused on device for the tracking
    hot loop (no per-frame host round-trips beyond one H2D image copy)
  * bf16 compute / f32 params precision policy
  * data parallelism via `jax.sharding.Mesh` + NamedSharding (XLA collectives
    over ICI), not NCCL
"""

__version__ = "0.1.0"

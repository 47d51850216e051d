"""avatarclip_tpu: a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of AvatarCLIP — zero-shot text-driven generation and animation of
3D avatars.

Stages (mirroring the reference pipeline layout):
  * :mod:`avatarclip_tpu.pipelines.shape` — CLIP-guided coarse body shape
  * :mod:`avatarclip_tpu.pipelines.appearance` — NeuS implicit avatar
    sculpting/texturing under CLIP guidance (the flagship hot loop)
  * :mod:`avatarclip_tpu.pipelines.animate` — pose + motion synthesis
  * :mod:`avatarclip_tpu.export` — mesh extraction, retargeting, rigged export
"""

__version__ = "0.1.0"

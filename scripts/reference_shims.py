"""Import shims for running the torch reference (/root/reference) on CPU.

The reference imports GPU-era media/vision packages that are absent here
(torchvision, decord, av, pytorchvideo) and one symbol newer transformers
removed (ALL_LAYERNORM_LAYERS). None of them participate in the parity
path — video decode is bypassed (both sides are fed the same preprocessed
pixel tensor) and the trainer is never constructed — so empty package
stubs are enough to import `llava` and run its model code unchanged.

Used by scripts/parity_rehearsal.py and tests/test_parity_rehearsal.py.
"""

from __future__ import annotations

import importlib.machinery as _machinery
import sys
import types


def _permissive(name: str):
    """A class that accepts any constructor/call arguments — the reference
    builds transform pipelines from these at processor-construction time
    even though the parity path never invokes them."""
    return type(name, (), {
        "__init__": lambda self, *a, **k: None,
        "__call__": lambda self, *a, **k: None,
    })


def _stub(name: str, attrs=()):
    if name in sys.modules:
        return sys.modules[name]
    m = types.ModuleType(name)
    m.__spec__ = _machinery.ModuleSpec(name, None)
    m.__path__ = []  # behave as a package for submodule imports
    for a in attrs:
        setattr(m, a, _permissive(a))
    sys.modules[name] = m
    return m


def install_reference_shims(reference_root: str = "/root/reference") -> None:
    """Make `import llava` work from the read-only reference checkout."""
    tv = _stub("torchvision")
    transforms = _stub(
        "torchvision.transforms",
        ["Compose", "Lambda", "ToTensor", "Normalize", "Resize",
         "CenterCrop", "RandomHorizontalFlip", "InterpolationMode"],
    )
    tv.transforms = transforms
    _stub(
        "torchvision.transforms._transforms_video",
        ["NormalizeVideo", "RandomCropVideo", "RandomHorizontalFlipVideo",
         "CenterCropVideo"],
    )
    _stub("av")
    decord = _stub("decord", ["VideoReader"])
    decord.cpu = lambda *a, **k: None
    bridge = _stub("decord.bridge")
    bridge.set_bridge = lambda *a, **k: None
    decord.bridge = bridge
    _stub("pytorchvideo")
    _stub("pytorchvideo.data")
    _stub("pytorchvideo.data.encoded_video", ["EncodedVideo"])
    _stub("pytorchvideo.transforms",
          ["ApplyTransformToKey", "ShortSideScale", "UniformTemporalSubsample"])

    import torch
    import transformers.trainer as tt

    if not hasattr(tt, "ALL_LAYERNORM_LAYERS"):
        tt.ALL_LAYERNORM_LAYERS = [torch.nn.LayerNorm]

    if reference_root not in sys.path:
        sys.path.insert(0, reference_root)

"""Load reference pure-math modules by file path for parity testing.

The reference package's __init__ pulls in heavy deps (torchvision, transformers model
classes), so we stub what the pure functions don't actually use and exec the module
files directly. Used only in tests — the framework itself never imports the reference.
"""
import importlib.util
import sys
import types

_REF = "/root/reference/llava"


def _stub(name, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    m = types.ModuleType(name)
    m.__spec__ = importlib.util.spec_from_loader(name, loader=None)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def _load(name, path):
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(name, path)
    m = importlib.util.module_from_spec(spec)
    sys.modules[name] = m
    spec.loader.exec_module(m)
    return m


def load_ref_modules():
    """Returns (process_image, mm_utils) reference modules."""
    # torchvision stubs: reference only uses ToTensor/ToPILImage/TF at module scope
    tv = _stub("torchvision")
    _stub("torchvision.transforms", ToTensor=object, ToPILImage=object)
    _stub("torchvision.transforms.functional")
    tv.transforms = sys.modules["torchvision.transforms"]

    pi = _load("ref_process_image", f"{_REF}/process_image.py")

    # llava package stubs so mm_utils's `from llava.constants import ...` resolves
    _stub("llava")
    _stub("llava.constants", IGNORE_INDEX=-100, IMAGE_TOKEN_INDEX=-200,
          DEFAULT_IMAGE_TOKEN="<image>", DEFAULT_IMAGE_PATCH_TOKEN="<im_patch>",
          DEFAULT_IM_START_TOKEN="<im_start>", DEFAULT_IM_END_TOKEN="<im_end>",
          IMAGE_PLACEHOLDER="<image-placeholder>")
    sys.modules["llava.process_image"] = pi
    mm = _load("ref_mm_utils", f"{_REF}/mm_utils.py")
    return pi, mm


def load_ref_conversation():
    return _load("ref_conversation", f"{_REF}/conversation.py")


def load_ref_model_modules():
    """Returns (resampler_sampler, projector_builder, resampler_builder) torch modules."""
    _stub("llava")
    _stub("llava.model")
    _stub("llava.model.multimodal_resampler")
    _stub("llava.model.multimodal_projector")
    samp = _load("ref_sampler", f"{_REF}/model/multimodal_resampler/sampler.py")
    sys.modules["llava.model.multimodal_resampler.sampler"] = samp
    moe = _load("ref_moe", f"{_REF}/model/multimodal_projector/moe.py")
    sys.modules["llava.model.multimodal_projector.moe"] = moe
    proj = _load("ref_projector_builder", f"{_REF}/model/multimodal_projector/builder.py")
    rsb = _load("ref_resampler_builder", f"{_REF}/model/multimodal_resampler/builder.py")
    return samp, proj, rsb

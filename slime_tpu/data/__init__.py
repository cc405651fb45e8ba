from . import anyres, image_ops, tokenization  # noqa: F401

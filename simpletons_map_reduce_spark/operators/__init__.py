from . import multimodal  # noqa: F401

__all__ = ["multimodal"]

"""Host runtime: native golden engine bindings and streaming execution."""

from .native import NativeGolden, native_available

__all__ = ["NativeGolden", "native_available"]

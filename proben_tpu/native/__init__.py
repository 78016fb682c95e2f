from .io import NativeLoader, native_available

__all__ = ["NativeLoader", "native_available"]

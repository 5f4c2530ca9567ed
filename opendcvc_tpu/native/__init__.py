"""Native (C++) runtime components, built lazily with g++."""

from .build import load_library, library_available

__all__ = ["load_library", "library_available"]

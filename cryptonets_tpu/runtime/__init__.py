"""Native C++ host runtime (ctypes bindings with Python fallbacks)."""

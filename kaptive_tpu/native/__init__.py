r"""Native (C++) host-side components, loaded via ctypes.

Build happens lazily on first import (cached as a shared object next to the
package); every native function has a pure-Python fallback, so the framework
works without a compiler — the native path just makes host ingest faster.
"""

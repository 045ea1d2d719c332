"""Native (C++) runtime components, built on demand and ctypes-wrapped.

The reference implements its IO/runtime layer in C++ (src/cpp/readindata.cpp,
Table.cpp); here the hot file-parsing path is a small C++ shared library
compiled at first use with the system toolchain.  Everything degrades
gracefully to the pure-numpy path if no compiler is available.
"""

from .build import get_fastio, fast_parse_doubles  # noqa: F401

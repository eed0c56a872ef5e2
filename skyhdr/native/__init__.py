"""Native (C) runtime pieces, built lazily with the system compiler and
loaded via ctypes. Everything here has a pure-Python fallback so the
framework works without a toolchain."""

from skyhdr.native.build import crc32c, masked_crc32c, has_native  # noqa: F401

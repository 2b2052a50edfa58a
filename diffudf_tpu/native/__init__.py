"""Native (C++) components. Modules here raise ImportError until their
shared library has been built (see native/udf_mc/build.py); callers fall
back to the pure-Python equivalents."""

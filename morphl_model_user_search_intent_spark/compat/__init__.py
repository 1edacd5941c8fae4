"""Runtime-environment compatibility shims (no vendored code).

Currently one member: :mod:`protobuf_shim`, which makes Spark 4's
transformWithStateInPandas Python worker runnable in containers where
the ``google.protobuf`` runtime is not pip-installed but a pure-Python
copy ships inside another public SDK already on disk.
"""

"""Worker-interpreter startup hook for the TWS protobuf shim.

This directory is placed on the Python *worker* PYTHONPATH by
``compat.protobuf_shim.inject_worker_env``; the stdlib ``site`` module
imports ``sitecustomize`` from ``sys.path`` at interpreter startup, so
the lenient same-major gencode/runtime gate is installed before any
pyspark streaming proto module loads.  Kept dependency-free (no engine
imports): the engine package may not be on the worker path, and a
failure here must never break an unrelated worker — hence the blanket
except.  See compat/protobuf_shim.py for the full rationale.
"""

try:
    from google.protobuf import runtime_version as _rv

    if not getattr(_rv, "_morphl_lenient", False):
        _orig = _rv.ValidateProtobufRuntimeVersion

        def _lenient(domain, major, minor, patch, suffix, location):
            try:
                _orig(domain, major, minor, patch, suffix, location)
            except _rv.VersionError:
                if major != _rv.MAJOR:
                    raise

        _rv.ValidateProtobufRuntimeVersion = _lenient
        _rv._morphl_lenient = True
except Exception:  # noqa: BLE001 — never break a worker over the shim
    pass

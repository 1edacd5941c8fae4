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

# Chain-load the platform's own sitecustomize, if any.  The stdlib
# ``site`` module imports only the FIRST ``sitecustomize`` found on
# sys.path, and this directory is PREPENDED by the shim — without
# chaining, a managed image's own interpreter-startup hook would
# silently never run for ANY Python worker (round-6 advice).  The
# next sitecustomize.py further down sys.path is executed in its own
# module namespace; same blanket-except discipline.
try:
    import importlib.util as _ilu
    import os as _os
    import sys as _sys

    _here = _os.path.dirname(_os.path.abspath(__file__))
    for _d in _sys.path:
        if not _d or _os.path.abspath(_d) == _here:
            continue
        _cand = _os.path.join(_d, "sitecustomize.py")
        if _os.path.isfile(_cand):
            _spec = _ilu.spec_from_file_location(
                "_chained_sitecustomize", _cand
            )
            _mod = _ilu.module_from_spec(_spec)
            _sys.modules["_chained_sitecustomize"] = _mod
            _spec.loader.exec_module(_mod)
            break
except Exception:  # noqa: BLE001 — never break a worker over the shim
    pass

"""Gates for compat/protobuf_shim.py — the piece that lets the REAL
transformWithStateInPandas codepath run in containers where the
protobuf runtime is not pip-installed (it is found inside another
public SDK on disk and injected into the worker PYTHONPATH).
"""

from __future__ import annotations

import os
import sys

import pytest

from morphl_model_user_search_intent_spark.compat import protobuf_shim

HAVE_RUNTIME = protobuf_shim.find_protobuf_dir() is not None


def test_find_protobuf_dir_is_cached_across_syspath_mutation():
    """Regression for the round-6 worker crash: enable() adds the
    runtime dir to the DRIVER's sys.path; a naive re-probe then says
    'natively importable' and worker_pythonpath() silently drops the
    runtime dir from the worker env — the TWS driver worker dies at
    protobuf import while every driver-side probe passes."""
    first = protobuf_shim.find_protobuf_dir()
    protobuf_shim.enable()
    assert protobuf_shim.find_protobuf_dir() == first


@pytest.mark.skipif(not HAVE_RUNTIME, reason="no protobuf runtime on disk")
def test_worker_pythonpath_carries_runtime_dir_when_bundled():
    d = protobuf_shim.find_protobuf_dir()
    wp = protobuf_shim.worker_pythonpath()
    assert wp is not None
    parts = wp.split(os.pathsep)
    assert any(p.endswith("worker_path") for p in parts)
    if d:  # bundled (not pip-installed) → the dir itself must ride along
        assert d in parts


@pytest.mark.skipif(not HAVE_RUNTIME, reason="no protobuf runtime on disk")
def test_lenient_gate_same_major_only():
    """The relaxed version gate must tolerate a same-major minor skew
    (pyspark gencode 6.33 vs on-disk runtime 6.32) but still reject a
    cross-major one — the published compatibility guarantee boundary."""
    assert protobuf_shim.enable()
    from google.protobuf import runtime_version as rv

    # same major, gencode minor ahead of runtime: must NOT raise
    rv.ValidateProtobufRuntimeVersion(
        rv.DOMAIN, rv.MAJOR, rv.MINOR + 1, 0, "", "test.proto"
    )
    # one major ahead: must still raise
    with pytest.raises(rv.VersionError):
        rv.ValidateProtobufRuntimeVersion(
            rv.DOMAIN, rv.MAJOR + 1, 0, 0, "", "test.proto"
        )


@pytest.mark.skipif(not HAVE_RUNTIME, reason="no protobuf runtime on disk")
def test_enable_makes_tws_proto_importable():
    assert protobuf_shim.enable()
    import pyspark.sql.streaming.proto.StateMessage_pb2 as pb

    m = pb.StateRequest()
    m.version = 2
    m2 = pb.StateRequest()
    m2.ParseFromString(m.SerializeToString())
    assert m2.version == 2


def test_inject_worker_env_idempotent(spark):
    protobuf_shim.inject_worker_env(spark)
    env1 = dict(spark.sparkContext.environment)
    protobuf_shim.inject_worker_env(spark)
    assert dict(spark.sparkContext.environment) == env1
    wp = protobuf_shim.worker_pythonpath()
    if wp:
        assert wp in env1.get("PYTHONPATH", "")


def test_sitecustomize_is_dependency_free():
    """The worker hook must import cleanly in a bare interpreter (no
    engine, no protobuf) — a failure there would break EVERY Python
    worker, not just TWS ones."""
    import subprocess

    here = os.path.dirname(
        os.path.abspath(protobuf_shim.__file__)
    )
    wp = os.path.join(here, "worker_path")
    r = subprocess.run(
        [sys.executable, "-c", "import sitecustomize; print('ok')"],
        env={**os.environ, "PYTHONPATH": wp},
        capture_output=True,
        text=True,
        timeout=60,
    )
    assert r.returncode == 0 and "ok" in r.stdout, r.stderr


def test_sitecustomize_chains_the_platform_hook(tmp_path):
    """Round-6 advice: Python imports only the FIRST sitecustomize on
    sys.path, and the shim's dir is prepended — it must chain-load the
    platform's own hook further down the path, or managed images lose
    their worker startup hook for every Python worker."""
    import subprocess

    platform_dir = tmp_path / "platform"
    platform_dir.mkdir()
    (platform_dir / "sitecustomize.py").write_text(
        "import sys\nsys._platform_hook_ran = True\n"
    )
    here = os.path.dirname(os.path.abspath(protobuf_shim.__file__))
    wp = os.path.join(here, "worker_path")
    r = subprocess.run(
        [
            sys.executable,
            "-c",
            (
                "import sys, sitecustomize;"
                "assert getattr(sys, '_platform_hook_ran', False),"
                " 'platform hook shadowed';"
                "assert sitecustomize.__file__.startswith("
                f"{wp!r}), 'wrong sitecustomize won';"
                "print('ok')"
            ),
        ],
        env={
            **os.environ,
            "PYTHONPATH": wp + os.pathsep + str(platform_dir),
        },
        capture_output=True,
        text=True,
        timeout=60,
    )
    assert r.returncode == 0 and "ok" in r.stdout, r.stderr

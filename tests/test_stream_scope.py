"""Round-10 optimization internals: the scale-adaptive streaming
state-partition scope (streaming/ops.py).

Stateful streaming operators pin their state partitioning to
``spark.sql.shuffle.partitions`` at query start; the round-10 scope
derives that count from the source's byte size for the duration of one
drain and restores the session conf afterwards.  These tests pin the
sizing formula, the env overrides, and the restore discipline —
the properties the streaming A/B wins rest on.
"""

from __future__ import annotations

import os

import pytest

from morphl_model_user_search_intent_spark.streaming.ops import (
    _adaptive_stream_partitions,
    _source_bytes,
    _stream_shuffle_scope,
)

CONF = "spark.sql.shuffle.partitions"


def test_adaptive_partitions_floor_and_cap(spark):
    cap = int(spark.conf.get(CONF))
    # tiny source → floor of 2 (never 1: partition-spanning paths stay
    # exercised), regardless of how small
    assert _adaptive_stream_partitions(spark, 0) == 2
    assert _adaptive_stream_partitions(spark, 1) == 2
    # one 32 MiB unit per partition, ceil division
    per = 32 << 20
    assert _adaptive_stream_partitions(spark, 3 * per) == min(cap, 3)
    assert _adaptive_stream_partitions(spark, 3 * per + 1) == min(cap, 4)
    # huge source rides the session cap (what a cluster raises)
    assert _adaptive_stream_partitions(spark, 10**15) == cap


def test_adaptive_partitions_env_overrides(spark, monkeypatch):
    monkeypatch.setenv("SPARK_STREAM_STATE_PARTITIONS", "7")
    assert _adaptive_stream_partitions(spark, 0) == 7
    assert _adaptive_stream_partitions(spark, 10**15) == 7
    monkeypatch.delenv("SPARK_STREAM_STATE_PARTITIONS")
    # bytes-per-partition knob: 1 MiB units over a 3 MiB source → 3
    monkeypatch.setenv(
        "SPARK_STREAM_STATE_BYTES_PER_PART", str(1 << 20)
    )
    cap = int(spark.conf.get(CONF))
    assert _adaptive_stream_partitions(spark, 3 << 20) == min(cap, 3)


def test_scope_sets_and_restores(spark):
    before = spark.conf.get(CONF)
    with _stream_shuffle_scope(spark, 1):
        assert spark.conf.get(CONF) == "2"
    assert spark.conf.get(CONF) == before


def test_scope_restores_on_exception(spark):
    before = spark.conf.get(CONF)
    with pytest.raises(RuntimeError):
        with _stream_shuffle_scope(spark, 1):
            assert spark.conf.get(CONF) == "2"
            raise RuntimeError("drain died")
    assert spark.conf.get(CONF) == before


def test_scope_noop_when_unsized(spark):
    # adaptive=False call sites pass None — the scope must not touch
    # the session conf at all (Python-stateful streams keep their
    # worker parallelism)
    before = spark.conf.get(CONF)
    with _stream_shuffle_scope(spark, None):
        assert spark.conf.get(CONF) == before
    assert spark.conf.get(CONF) == before


def test_source_bytes_file_and_dir(tmp_path):
    f = tmp_path / "a.bin"
    f.write_bytes(b"x" * 1234)
    assert _source_bytes(str(f)) == 1234
    d = tmp_path / "d"
    d.mkdir()
    (d / "p1").write_bytes(b"y" * 100)
    sub = d / "sub"
    sub.mkdir()
    (sub / "p2").write_bytes(b"z" * 50)
    assert _source_bytes(str(d)) == 150
    # missing path: 0, not an exception (callers fall back to the
    # session default)
    assert _source_bytes(str(tmp_path / "nope")) == 0

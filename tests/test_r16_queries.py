"""Round-16 additions: j11 TTL stream dedup (registered this round —
graduated from the r16 staging module per the SURVEY §7.12 ledger's
named fate): the TTL-lifecycle mechanism pins, migrated from
tests/test_staged_r16.py.  Oracle parity runs through the registry-wide
differential suite (tests/test_differential.py) like every registered
query."""

from __future__ import annotations

import collections
import datetime

from csv_to_parquet_aws_datalake_spark import registry

registry.load_all()


def test_j11_ttl_lifecycle_pins(spark, sf_dir):
    # mechanism pins behind the oracle: (1) burst keys emit EXACTLY
    # twice — once at first sight, once at the post-eviction
    # recurrence; (2) the T0+5min echo (inside the TTL, in a LATER
    # micro-batch than the first sighting) never emits for a burst key,
    # proving cross-batch suppression, not just intra-batch distinct;
    # (3) the re-emission timestamp is the burst-1 time, proving state
    # was evicted rather than the first row replayed
    rows = registry.QUERIES["j11_stream_dedup_ttl"](spark, sf_dir).collect()
    t0 = datetime.datetime(2024, 1, 1, 0, 0)
    per_key = collections.defaultdict(list)
    for r in rows:
        per_key[r["key"]].append(r["ts"])
    burst_keys = [k for k in per_key if k < 100]
    assert burst_keys
    for k in burst_keys:
        assert sorted(per_key[k]) == [
            t0, t0 + datetime.timedelta(minutes=180)]
    assert all(len(per_key[k]) == 1 for k in per_key if k >= 100)


def test_j11_fixture_is_five_ordered_files(spark, sf_dir):
    # the 5-micro-batch replay is the observable-TTL contract's
    # foundation: the fixture must be exactly 5 files and the file
    # stream source must see them in schedule order — (mtime, path)
    # agreeing — or "eviction before burst 1" is no longer guaranteed
    import os

    from csv_to_parquet_aws_datalake_spark.sources.io_paths import (
        schedule_tag,
        scratch_dir,
    )
    from csv_to_parquet_aws_datalake_spark.streaming.queries import (
        _J11_BURST1_MIN,
        _J11_ECHO_MIN,
        _J11_FILLERS,
        _J11_T0,
    )

    registry.QUERIES["j11_stream_dedup_ttl"](spark, sf_dir)  # builds it
    src = scratch_dir(
        "j11", sf_dir,
        "ttl_arrivals_" + schedule_tag(
            _J11_T0, _J11_ECHO_MIN, _J11_FILLERS, _J11_BURST1_MIN,
            (3, 1, 2)))
    names = sorted(f for f in os.listdir(src) if f.endswith(".parquet"))
    assert names == [f"{i:02d}.parquet" for i in range(5)]
    mtimes = [os.stat(os.path.join(src, f)).st_mtime_ns for f in names]
    assert mtimes == sorted(mtimes)

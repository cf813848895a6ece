from __future__ import annotations

import os
import tempfile

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # keep test JVM light

# Test scratch (pytest tmp_path, engine workdirs, Spark scratch in CLI
# subprocesses) goes to tmpfs when available: this sandbox's virtual disk
# sustains ~10 MB/s with multi-second stall bursts (round-5 measurement),
# which turns KB-sized table commits into minutes-long test runs. The
# engine's own layout/commit logic is identical either way — only the
# backing medium changes. FCS_TEST_TMPDIR overrides; unset TMPDIR hosts
# (CI with a real disk) are untouched.
if "TMPDIR" not in os.environ and os.access("/dev/shm", os.W_OK):
    _tmp = os.environ.get("FCS_TEST_TMPDIR", "/dev/shm/fcs-tests")
    os.makedirs(_tmp, exist_ok=True)
    os.environ["TMPDIR"] = _tmp
    tempfile.tempdir = None  # drop any cached gettempdir() result


@pytest.fixture(scope="session")
def spark():
    from facebook_crawler_spark.session import get_spark

    s = get_spark(app_name="fcs-tests", master="local[8]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")

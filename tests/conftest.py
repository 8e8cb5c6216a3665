from __future__ import annotations

import os
import shutil
import tempfile

import pytest

from odibel_spark.session import get_spark

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # fast test startup


@pytest.fixture(scope="session")
def spark():
    s = get_spark("odibel-tests", cpus=int(os.environ["SPARK_GRAFT_CPUS"]), shuffle_partitions=8)
    yield s


@pytest.fixture()
def tmpdir_path():
    d = tempfile.mkdtemp(prefix="odibel-test-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR

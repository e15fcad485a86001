"""Shared fixtures: reference-library loader and a local SparkSession."""

from __future__ import annotations

import os
import sys
import types

import numpy as np
import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE_ROOT = "/root/reference"

if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def load_reference():
    """Import the reference ddsketch package (read-only, for equivalence
    oracles).  Its __init__ needs a version stub because it is not installed."""
    if "ddsketch" not in sys.modules:
        if REFERENCE_ROOT not in sys.path:
            sys.path.insert(0, REFERENCE_ROOT)
        stub = types.ModuleType("ddsketch.__version")
        stub.version = "0.0.0"
        sys.modules["ddsketch.__version"] = stub
    import ddsketch  # noqa: F401

    return ddsketch


@pytest.fixture(scope="session")
def ref():
    return load_reference()


@pytest.fixture(scope="session")
def spark():
    from ddspark.session import get_spark

    s = get_spark(app_name="ddspark-tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


SF_TEST_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def sf_dir():
    return SF_TEST_DIR

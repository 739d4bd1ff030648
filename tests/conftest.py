"""Shared fixtures: one local SparkSession per test session."""

from __future__ import annotations

import os

import pytest


SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from confidential_storm_spark.session import get_spark

    spark = get_spark(app_name="csspark-tests", cpus=4, shuffle_partitions=4)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR

import os

import pytest


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .appName("toshokan_spark_tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    yield s
    s.stop()


@pytest.fixture(params=["local", "hadoop"])
def catalog(tmp_path, request, spark):
    """Catalog over both storage backends — the local fs and the
    Hadoop FileSystem API (the exact code path s3a:// uses, driven
    against file: paths since the sandbox has no object store),
    mirroring the reference's dual fs/S3 test matrix
    (`/root/reference/tests/config.rs:133-233`)."""
    from toshokan_spark.catalog import FsCatalog
    from toshokan_spark.storage import storage_for

    root = str(tmp_path / "catalog")
    if request.param == "hadoop":
        return FsCatalog(root, storage=storage_for(root, spark, force_hadoop=True))
    return FsCatalog(root)


SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR

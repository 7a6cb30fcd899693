import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .appName("whoosh-reloaded-spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.default.parallelism", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "6g")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


def reference_importable() -> bool:
    ref = "/root/reference/src"
    if os.path.isdir(ref):
        if ref not in sys.path:
            sys.path.insert(0, ref)
        # the reference imports the `cached_property` backport package, which
        # isn't installed here — shim it with the stdlib implementation
        if "cached_property" not in sys.modules:
            import functools
            import types

            shim = types.ModuleType("cached_property")
            shim.cached_property = functools.cached_property
            sys.modules["cached_property"] = shim
        try:
            import whoosh  # noqa: F401

            return True
        except Exception:
            return False
    return False

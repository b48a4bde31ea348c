import os

import pytest

from kafka_replicator_spark import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# Vendored minimal protobuf runtime (protoshim): pyspark's
# transformWithState state protocol needs `google.protobuf`, which is not
# installed here.  ensure_protoshim() prepends the shim to sys.path
# (driver) and PYTHONPATH (inherited by the JVM and thus by Spark's
# Python workers, where the state-server client runs); a real protobuf
# install wins.  Must run before any SparkSession is created.
from kafka_replicator_spark.vendor import ensure_protoshim

ensure_protoshim()


@pytest.fixture(scope="session")
def spark():
    cpus = os.environ.get("SPARK_GRAFT_TEST_CPUS", "8")
    s = get_spark(
        app_name="kafka_replicator_spark_tests",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def messages(spark, sf_dir):
    from kafka_replicator_spark.sources.messages import events_as_messages

    return events_as_messages(spark, sf_dir).cache()

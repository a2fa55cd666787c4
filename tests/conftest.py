import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

from np_data_validation_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="npdv-tests", cpus=4, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def synth_dataset(tmp_path_factory):
    """Deterministic snapshot+manifest with all fault classes injected."""
    from np_data_validation_spark import synth

    root = str(tmp_path_factory.mktemp("synth"))
    labels = synth.generate_dataset(root, n_rows=4000, seed=42)
    return root, labels


@pytest.fixture(scope="session")
def seq_man(spark, synth_dataset):
    root, labels = synth_dataset
    seq = spark.read.parquet(os.path.join(root, "sequences"))
    man = spark.read.parquet(os.path.join(root, "manifest"))
    return seq, man, labels

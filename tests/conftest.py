import numpy as np
import pytest

from ariadne_spark.session import get_spark
from ariadne_spark.synth.images import write_images
from ariadne_spark.synth.regions import generate_regions, write_regions

N_IMAGES = 3000


@pytest.fixture(scope="session")
def spark():
    s = get_spark(cores=4, app_name="ariadne_spark_tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("synth")
    write_images(str(d / "images.parquet"), N_IMAGES)
    write_regions(str(d / "regions.parquet"))
    return d


@pytest.fixture(scope="session")
def images_df(spark, data_dir):
    return spark.read.parquet(str(data_dir / "images.parquet"))


@pytest.fixture(scope="session")
def regions():
    return generate_regions()


@pytest.fixture(scope="session")
def images_np(data_dir):
    """The same images table as numpy arrays (pure-python oracle input)."""
    import pyarrow.parquet as pq

    t = pq.read_table(str(data_dir / "images.parquet"))
    return {name: t[name].to_numpy(zero_copy_only=False) for name in t.column_names}


def popcount64(a: np.ndarray) -> np.ndarray:
    """Vectorized popcount for int64 arrays (oracle-side)."""
    v = a.astype(np.uint64).view(np.uint8).reshape(*a.shape, 8)
    return np.unpackbits(v, axis=-1).sum(axis=-1).astype(np.int64)

import pytest


@pytest.fixture(scope="session")
def spark():
    from extract_ocr_spark.session import get_spark

    s = get_spark("local[4]", app_name="tests", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()

import pytest

from use_case_real_time_anomaly_detection_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        "local[8]",
        extra_confs={
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.shuffle.partitions": "8",
        },
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s

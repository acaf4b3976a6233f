from __future__ import annotations

import pytest

from wikidata_pq_spark import datagen
from wikidata_pq_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus():
    """Deterministic small corpus shared by the Spark-side tests."""
    return {
        "transcripts": datagen.gen_transcripts(n_convs=60, mean_turns=8, n_entities=150),
        "alias_dict": datagen.gen_entities(150),
        "same_as": datagen.gen_same_as(150),
    }


@pytest.fixture(scope="session")
def spark_corpus(spark, corpus):
    return {
        "transcripts": spark.createDataFrame(corpus["transcripts"]),
        "alias_dict": spark.createDataFrame(corpus["alias_dict"]),
        "same_as": spark.createDataFrame(corpus["same_as"]),
    }


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "classic_session_only: exercises an API absent from the Spark "
        "Connect client (df.rdd probes, applyInPandasWithState); see "
        "ARCHITECTURE.md 'Spark Connect compatibility seams'",
    )

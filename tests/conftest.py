from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from corhist_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("corhist-tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def corpus():
    from corhist_spark.fixtures import generate_corpus

    return generate_corpus(seed=42, scale=8)


@pytest.fixture(scope="session")
def sdf(spark, corpus):
    from corhist_spark.fixtures import to_spark

    return to_spark(spark, corpus)

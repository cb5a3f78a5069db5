import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from timeseriestokenizer_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tts-tests", master="local[8]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def transcripts(spark):
    from timeseriestokenizer_spark.datagen import transcripts_df

    df = transcripts_df(spark, C=40, seed=42).cache()
    df.count()
    return df


@pytest.fixture(scope="session")
def transcripts_pdf():
    from timeseriestokenizer_spark.datagen import make_transcripts_pdf

    return make_transcripts_pdf(C=40, seed=42)
